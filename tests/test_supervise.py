"""Supervisor: stall detection, resume flag construction, completion."""

import json
import os
import sys

from loans_tpu.cli.supervise import main


def test_supervisor_completes_healthy_child(tmp_path):
    script = tmp_path / "fake_train.py"
    script.write_text(
        """
import json, os, sys, time
log_dir = os.path.join(sys.argv[sys.argv.index('--log-dir') + 1], 'run')
os.makedirs(log_dir, exist_ok=True)
entries = []
for it in (1, 2, 3):
    entries.append({'iteration': it})
    json.dump(entries, open(os.path.join(log_dir, 'log'), 'w'))
    time.sleep(0.1)
"""
    )
    rc = main([
        "--stall-timeout", "60", "--poll-interval", "0.2",
        "--max-restarts", "1",
        "--", sys.executable, str(script), "--log-dir", str(tmp_path / "logs"),
    ])
    assert rc == 0


def test_supervisor_restarts_stalled_child_with_resume(tmp_path):
    """A child that writes one snapshot then hangs must be killed and
    relaunched with --resume-localizer pointing at that snapshot; the
    relaunched child (which sees the flag) exits cleanly."""
    script = tmp_path / "fake_train.py"
    script.write_text(
        """
import json, os, sys, time
base = sys.argv[sys.argv.index('--log-dir') + 1]
log_dir = os.path.join(base, 'run')
os.makedirs(log_dir, exist_ok=True)
if '--resume-localizer' in sys.argv:
    snap = sys.argv[sys.argv.index('--resume-localizer') + 1]
    assert os.path.exists(snap), snap
    json.dump([{'iteration': 9}], open(os.path.join(log_dir, 'log'), 'w'))
    sys.exit(0)
json.dump([{'iteration': 1}], open(os.path.join(log_dir, 'log'), 'w'))
open(os.path.join(log_dir, 'Localizer_1.msgpack'), 'wb').write(b'x')
time.sleep(3600)  # stall forever
"""
    )
    rc = main([
        "--stall-timeout", "15", "--poll-interval", "0.5",
        "--max-restarts", "2", "--snapshot-names", "Localizer",
        "--", sys.executable, str(script), "--log-dir", str(tmp_path / "logs"),
    ])
    assert rc == 0
    log = json.load(open(tmp_path / "logs" / "run" / "log"))
    assert log[-1]["iteration"] == 9  # resumed child ran


def test_supervisor_rejects_immediate_clean_death(tmp_path):
    """rc=0 with zero logged iterations is a FAILED run (round-3 queue
    lost seed 3 to a launcher that died instantly yet reported success);
    the supervisor must retry and, still failing, propagate rc=1."""
    script = tmp_path / "fake_train.py"
    script.write_text("import sys; sys.exit(0)\n")
    rc = main([
        "--stall-timeout", "60", "--poll-interval", "0.2",
        "--max-restarts", "1",
        "--", sys.executable, str(script), "--log-dir", str(tmp_path / "logs"),
    ])
    assert rc == 1


def test_supervisor_min_iterations_zero_disables_guard(tmp_path):
    script = tmp_path / "fake_train.py"
    script.write_text("import sys; sys.exit(0)\n")
    rc = main([
        "--stall-timeout", "60", "--poll-interval", "0.2",
        "--max-restarts", "1", "--min-iterations", "0",
        "--", sys.executable, str(script), "--log-dir", str(tmp_path / "logs"),
    ])
    assert rc == 0
