"""Training supervisor: stall detection + automatic resume.

The reference has no failure detection or elastic recovery (SURVEY.md
§5) — only manual snapshot resume flags. This supervisor runs a
training CLI as a child process, watches its JSON log for progress, and
on a stall (no new log entry within ``--stall-timeout``) or crash kills
the child and relaunches it resuming from the newest snapshots. On
TPU-over-tunnel development setups this also papers over transport
stalls that freeze the device stream mid-run.

Usage:
  python -m loans_tpu.cli.supervise --stall-timeout 900 -- \
      python train_sheep_localizer.py ... --log-dir logs --snapshot-interval 1000
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import time


def get_parser():
    p = argparse.ArgumentParser(
        description="supervise a training run with auto-resume"
    )
    p.add_argument("--stall-timeout", type=float, default=900.0,
                   help="seconds without log progress before restart")
    p.add_argument("--max-restarts", type=int, default=5)
    p.add_argument("--poll-interval", type=float, default=20.0)
    p.add_argument("--snapshot-names", nargs="+",
                   default=["Localizer", "ResnetAssessor"],
                   help="snapshot prefixes to resume from (order matches "
                   "the train CLI's -rl / -rd flags)")
    p.add_argument("--min-iterations", type=int, default=1,
                   help="a child that exits rc=0 with log progress below "
                   "this iteration count is treated as FAILED (an "
                   "immediate clean death must not read as success; a "
                   "round-3 queue run lost a whole seed to exactly that). "
                   "0 disables the check.")
    p.add_argument("--resume-flags", nargs="+", default=None,
                   help="CLI flags to pass each resumed snapshot with, "
                   "matching --snapshot-names order (default: "
                   "--resume-localizer / --resume-discriminator+--no-freeze; "
                   "use '--resume' for the SSD trainer)")
    p.add_argument("command", nargs=argparse.REMAINDER,
                   help="training command after '--'")
    return p


def _find_log_dir(base_dir: str, after: float) -> str | None:
    """Newest run dir created after ``after`` under the --log-dir."""
    if not os.path.isdir(base_dir):
        return None
    candidates = [
        os.path.join(base_dir, d)
        for d in os.listdir(base_dir)
        if os.path.isdir(os.path.join(base_dir, d))
    ]
    candidates = [d for d in candidates if os.path.getmtime(d) >= after - 5]
    return max(candidates, key=os.path.getmtime) if candidates else None


def _log_progress(log_dir: str | None) -> tuple[float, int]:
    """(mtime, last_iteration) of the run's JSON log."""
    if not log_dir:
        return 0.0, 0
    path = os.path.join(log_dir, "log")
    if not os.path.exists(path):
        return 0.0, 0
    try:
        entries = json.load(open(path))
        it = int(entries[-1].get("iteration", 0)) if entries else 0
    except Exception:
        it = 0
    return os.path.getmtime(path), it


def _newest_snapshots(log_dir: str, names) -> dict[str, str]:
    from loans_tpu.train.checkpoint import list_snapshots

    out = {}
    for name in names:
        snaps = list_snapshots(log_dir, name + "_")
        if snaps:
            out[name] = snaps[-1][1]
    return out


def _extract_base_log_dir(cmd: list[str]) -> str:
    for i, tok in enumerate(cmd):
        if tok in ("--log-dir", "-l") and i + 1 < len(cmd):
            return cmd[i + 1]
    return "logs"


def main(argv=None):
    args = get_parser().parse_args(argv)
    cmd = [c for c in args.command if c != "--"]
    if not cmd:
        raise SystemExit("no training command given (use -- <command>)")
    base_log_dir = _extract_base_log_dir(cmd)
    resume: dict[str, str] = {}
    prev_log_dir: str | None = None

    for attempt in range(args.max_restarts + 1):
        launch = list(cmd)
        if resume:
            names = args.snapshot_names
            if args.resume_flags:
                for name, flag in zip(names, args.resume_flags):
                    if name in resume:
                        launch += [flag, resume[name]]
            else:
                if names and names[0] in resume:
                    launch += ["--resume-localizer", resume[names[0]]]
                if len(names) > 1 and names[1] in resume:
                    launch += ["--resume-discriminator", resume[names[1]],
                               "--no-freeze"]
        print(f"[supervise] attempt {attempt}: {' '.join(launch)}",
              flush=True)
        start = time.time()
        child = subprocess.Popen(launch, start_new_session=True)
        log_dir = None
        last_progress = time.time()
        last_iter = 0
        stalled = False
        while child.poll() is None:
            time.sleep(args.poll_interval)
            log_dir = log_dir or _find_log_dir(base_log_dir, start) \
                or prev_log_dir
            mtime, it = _log_progress(log_dir)
            if it > last_iter or mtime > last_progress:
                last_iter = max(last_iter, it)
                last_progress = max(mtime, last_progress)
            if time.time() - last_progress > args.stall_timeout:
                print(
                    f"[supervise] stall: no progress for "
                    f"{args.stall_timeout:.0f}s at iteration {last_iter}; "
                    f"restarting", flush=True,
                )
                stalled = True
                try:
                    os.killpg(child.pid, signal.SIGKILL)
                except ProcessLookupError:
                    pass
                child.wait()
                break
        if not stalled and child.returncode == 0:
            # Guard against false success: a child that exits cleanly
            # without ever logging an iteration (backend refused, bad
            # flag combination, killed-and-reaped launcher) is a failed
            # run, not a completed one. runH_s3 (round 3) died ~4 min in
            # and the queue recorded rc=0; this check closes that hole.
            # a resumed child may have reused the previous attempt's run
            # dir (no new dir to find) — fall back to it for the check
            log_dir = log_dir or _find_log_dir(base_log_dir, start) \
                or prev_log_dir
            _, it = _log_progress(log_dir)
            done_iter = max(last_iter, it)
            if args.min_iterations and done_iter < args.min_iterations:
                print(
                    f"[supervise] child exited rc=0 but log shows only "
                    f"iteration {done_iter} (< --min-iterations "
                    f"{args.min_iterations}); treating as FAILURE",
                    flush=True,
                )
            else:
                print("[supervise] training completed", flush=True)
                return 0
        elif not stalled:
            print(f"[supervise] child exited rc={child.returncode}",
                  flush=True)
        if log_dir:
            prev_log_dir = log_dir
            resume = _newest_snapshots(log_dir, args.snapshot_names)
            if resume:
                print(f"[supervise] will resume from {resume}", flush=True)
        time.sleep(5)  # let a killed-mid-claim device grant expire
    print("[supervise] giving up after max restarts", flush=True)
    return 1


if __name__ == "__main__":
    sys.exit(main())
