"""Checkpoint save/restore (orbax, with pickle fallback).

Replaces the reference's torch ``.pth`` ``{'model_state_dict': ...}``
checkpoints (reference ``text_detector.py:106-113``) and Lightning's
ModelCheckpoint files with orbax-format directories; ``.pth`` import
parity lives in ``models/import_torch.py``.
"""
from __future__ import annotations

import pickle
from pathlib import Path
from typing import Any

import jax

try:
    import orbax.checkpoint as ocp

    _HAVE_ORBAX = True
except ImportError:  # pragma: no cover
    _HAVE_ORBAX = False


def save_variables(path: str, variables: Any) -> str:
    """Save a flax variables pytree; returns the path written."""
    p = Path(path)
    host_vars = jax.device_get(variables)
    if _HAVE_ORBAX:
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(p.absolute(), host_vars, force=True)
        ckptr.wait_until_finished()
        return str(p)
    p.mkdir(parents=True, exist_ok=True)
    with open(p / "variables.pkl", "wb") as f:
        pickle.dump(host_vars, f)
    return str(p)


def restore_variables(path: str, target: Any = None) -> Any:
    p = Path(path)
    pkl = p / "variables.pkl"
    if pkl.exists():
        with open(pkl, "rb") as f:
            return pickle.load(f)
    if _HAVE_ORBAX:
        ckptr = ocp.StandardCheckpointer()
        if target is not None:
            return ckptr.restore(p.absolute(), target=target)
        return ckptr.restore(p.absolute())
    raise FileNotFoundError(f"No checkpoint at {path}")
