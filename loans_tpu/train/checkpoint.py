"""Checkpointing: pytree snapshots + JSON config manifest.

Replaces the reference's npz contract (``extensions.snapshot_object``
every epoch/interval, ``train_sheep_localizer.py:182-186``;
``NpzDeserializer(strict=False)`` partial loads, :45-47; key-stripping
surgery, ``sheep/remove_weights_from_model.py`` and
``schaaaafrichter/convert_model.py``).

Format: one ``<Name>_<iteration>.msgpack`` per model (flax
serialization of ``{params, batch_stats, opt_state, step}``), plus a
``manifest.json`` in the log dir recording registry names + kwargs +
train config — together a log dir is sufficient to rebuild and resume,
like the reference's log-with-copied-sources, without executing code
from data directories.

Partial/transfer loads (the reference's ``strict=False`` + "remove
param_predictor before transferring to a new output size" workflow) are
``restore_params(..., skip_prefixes=('param_predictor',))`` — matching
subtrees load, listed prefixes keep their fresh init.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Iterable

import jax
import numpy as np
from flax import serialization


def _to_state_dict(state) -> dict[str, Any]:
    return {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }


def save_state(path: str, state) -> str:
    """Serialize a TrainState (minus the static tx) to ``path``.

    Atomic (tmp + rename): a run killed mid-write — e.g. by the
    training supervisor — never leaves a truncated snapshot behind.
    """
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = jax.device_get(_to_state_dict(state))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.to_bytes(payload))
    os.replace(tmp, path)
    return path


def restore_state(path: str, state):
    """Restore a full TrainState snapshot (shape-strict)."""
    with open(path, "rb") as f:
        payload = serialization.from_bytes(_to_state_dict(state), f.read())
    return state.replace(**payload)


def save_params(path: str, params, batch_stats=None) -> str:
    """Model-only snapshot (the reference's per-model npz analogue)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = jax.device_get(
        {"params": params, "batch_stats": batch_stats or {}}
    )
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.to_bytes(payload))
    os.replace(tmp, path)
    return path


def _merge(target, loaded, skip_prefixes: tuple[str, ...], path=""):
    """Recursively overlay ``loaded`` onto ``target`` skipping prefixes."""
    if any(path.startswith(p) or path == p for p in skip_prefixes if p):
        return target
    if isinstance(target, dict):
        out = {}
        for k, v in target.items():
            sub = f"{path}/{k}" if path else str(k)
            if isinstance(loaded, dict) and k in loaded:
                out[k] = _merge(v, loaded[k], skip_prefixes, sub)
            else:
                out[k] = v
        return out
    if loaded is None:
        return target
    loaded = np.asarray(loaded)
    if np.shape(target) != loaded.shape:
        return target  # strict=False: shape mismatch keeps fresh init
    # .dtype is metadata — never np.asarray(target), which would force a
    # device->host transfer per leaf (catastrophic through a TPU tunnel)
    dtype = getattr(target, "dtype", None) or np.asarray(target).dtype
    return loaded.astype(dtype)


def restore_params(
    path: str,
    params,
    batch_stats=None,
    skip_prefixes: Iterable[str] = (),
):
    """Partial restore: load matching leaves, keep init elsewhere.

    ``skip_prefixes`` use '/'-joined key paths relative to the params
    root, e.g. ``('param_predictor',)`` reproduces
    ``remove_weights_from_model.py``'s transfer workflow.
    """
    with open(path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    skip = tuple(skip_prefixes)
    new_params = _merge(params, raw.get("params", raw), skip)
    new_stats = _merge(batch_stats or {}, raw.get("batch_stats", {}), skip)
    return new_params, new_stats


def snapshot_name(model_name: str, iteration: int) -> str:
    return f"{model_name}_{iteration}.msgpack"


_SNAP_RE = re.compile(r"_(\d+)\.msgpack$")


def list_snapshots(log_dir: str, prefix: str) -> list[tuple[int, str]]:
    """(iteration, path) for all ``<prefix>*_<iter>.msgpack``, sorted by
    iteration (the resumable-sweep ordering, ``evaluate.py:374``)."""
    out = []
    if not os.path.isdir(log_dir):
        return out
    for fname in os.listdir(log_dir):
        if not fname.startswith(prefix):
            continue
        m = _SNAP_RE.search(fname)
        if m:
            out.append((int(m.group(1)), os.path.join(log_dir, fname)))
    return sorted(out)


def save_manifest(log_dir: str, manifest: dict[str, Any]) -> str:
    os.makedirs(log_dir, exist_ok=True)
    path = os.path.join(log_dir, "manifest.json")
    with open(path, "w") as f:
        json.dump(manifest, f, indent=2, default=_json_default)
    return path


def load_manifest(log_dir: str) -> dict[str, Any]:
    with open(os.path.join(log_dir, "manifest.json")) as f:
        return json.load(f)


def _json_default(obj):
    if isinstance(obj, (np.integer,)):
        return int(obj)
    if isinstance(obj, (np.floating,)):
        return float(obj)
    if isinstance(obj, np.ndarray):
        return obj.tolist()
    if hasattr(obj, "_asdict"):
        return list(obj)
    return str(obj)
