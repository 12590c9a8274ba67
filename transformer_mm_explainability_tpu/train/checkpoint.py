"""Checkpoint save/load (mmf/utils/checkpoint.py:88-503 equivalent).

Full trainer state (params, optimizer state, step counts, best-metric
tracking) via orbax when available, with a portable msgpack/npz fallback
so checkpoints never depend on optional packages. Also records VCS
fields (git sha) like the reference, and supports key-remapped partial
restores (the ``pretrained_state_mapping`` capability).
"""

from __future__ import annotations

import json
import os
import subprocess
from typing import Any, Dict, Optional

import jax
import numpy as np


def _git_sha(repo_dir: Optional[str] = None) -> str:
    try:
        return subprocess.check_output(
            ["git", "rev-parse", "HEAD"], cwd=repo_dir,
            stderr=subprocess.DEVNULL).decode().strip()
    except Exception:
        return "unknown"


def _flatten(tree, prefix=""):
    flat = {}
    leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    for path, leaf in leaves:
        flat[jax.tree_util.keystr(path)] = np.asarray(leaf)
    return flat


def save(directory: str, state: Any, step: int,
         metadata: Optional[Dict[str, Any]] = None,
         best_metric: Optional[float] = None) -> str:
    """Save a pytree state. Returns the checkpoint path."""
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, f"ckpt_{step}")
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(os.path.abspath(path), state, force=True)
        fmt = "orbax"
    except Exception:
        np.savez_compressed(path + ".npz", **_flatten(state))
        fmt = "npz"
    meta = {
        "step": step,
        "format": fmt,
        "git_sha": _git_sha(),
        "best_metric": best_metric,
        **(metadata or {}),
    }
    with open(os.path.join(directory, f"ckpt_{step}.meta.json"), "w") as f:
        json.dump(meta, f)
    with open(os.path.join(directory, "latest"), "w") as f:
        f.write(str(step))
    return path


def latest_step(directory: str) -> Optional[int]:
    latest = os.path.join(directory, "latest")
    if not os.path.exists(latest):
        return None
    return int(open(latest).read().strip())


def restore(directory: str, target: Any, step: Optional[int] = None) -> Any:
    """Restore a pytree saved by :func:`save` into the structure of
    ``target``."""
    if step is None:
        step = latest_step(directory)
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {directory}")
    path = os.path.join(directory, f"ckpt_{step}")
    meta = json.load(open(path + ".meta.json"))
    if meta["format"] == "orbax":
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        return ckptr.restore(os.path.abspath(path), item=target)
    data = np.load(path + ".npz")
    leaves, treedef = jax.tree_util.tree_flatten_with_path(target)
    new_leaves = []
    for p, leaf in leaves:
        key = jax.tree_util.keystr(p)
        arr = data[key]
        new_leaves.append(arr.astype(np.asarray(leaf).dtype))
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(target), new_leaves)


def load_with_mapping(state_dict: Dict[str, np.ndarray], target: Any,
                      mapping: Dict[str, str]) -> Any:
    """Partial restore with key prefixes remapped — the MMF
    ``pretrained_state_mapping`` capability (checkpoint.py:367+)."""
    remapped = {}
    for k, v in state_dict.items():
        for src, dst in mapping.items():
            if k.startswith(src):
                remapped[dst + k[len(src):]] = v
                break
        else:
            remapped[k] = v
    leaves, treedef = jax.tree_util.tree_flatten_with_path(target)
    new_leaves = []
    for p, leaf in leaves:
        key = jax.tree_util.keystr(p)
        new_leaves.append(remapped.get(key, leaf))
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(target), new_leaves)
