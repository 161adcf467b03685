"""Model-weight checkpointing: save/load numpy parameter sets.

The reference persists trained torch state dicts under
``<task_dir>/ckpt/<ModelName>.<identifier>.pth`` and reloads them via
``BaseTask.load`` / ``from_taskdir``
(``/root/reference/rex/tasks/base_task.py:122-232``, ``:264-283``;
naming from ``rex/utils/vars.py:1-5``).  This engine's scorers hold
plain numpy arrays, so the analogue is an ``.npz`` per weight object
plus a JSON meta sidecar for the scalar hyperparameters:

    <task_dir>/ckpt/<ClassName>.<identifier>.npz
    <task_dir>/ckpt/<ClassName>.<identifier>.meta.json

Works for any weight class whose state is numpy-array and scalar
attributes (PcnnWeights, BiLstmAttWeights, CrfWeights, ...): loading
reconstructs the instance WITHOUT running the seeded ``__init__`` —
a trained checkpoint therefore drops into the serving path untouched.
Writes are atomic (tmp + rename), matching the engine's checkpoint
discipline (state/checkpoint.py).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Type

import numpy as np

CHECKPOINT_DIRNAME = "ckpt"
BEST_IDENTIFIER = "best"


def _split_state(w: Any):
    arrays: Dict[str, np.ndarray] = {}
    scalars: Dict[str, Any] = {}
    for k, v in vars(w).items():
        if isinstance(v, np.ndarray):
            arrays[k] = v
        elif isinstance(v, (int, float, str, bool)):
            scalars[k] = v
        elif isinstance(v, (np.integer, np.floating)):
            scalars[k] = v.item()
        else:
            raise TypeError(
                f"{type(w).__name__}.{k}: unsupported state type "
                f"{type(v).__name__} (numpy arrays and scalars only)"
            )
    return arrays, scalars


def ckpt_paths(task_dir: str, cls_name: str, identifier: str):
    base = os.path.join(
        task_dir, CHECKPOINT_DIRNAME, f"{cls_name}.{identifier}"
    )
    return base + ".npz", base + ".meta.json"


def save_weights(
    w: Any, task_dir: str, identifier: str = BEST_IDENTIFIER
) -> str:
    """Persist a weight object; returns the .npz path."""
    npz_path, meta_path = ckpt_paths(task_dir, type(w).__name__, identifier)
    os.makedirs(os.path.dirname(npz_path), exist_ok=True)
    arrays, scalars = _split_state(w)
    tmp = npz_path + ".tmp.npz"
    np.savez(tmp, **arrays)
    os.replace(tmp, npz_path)
    tmp_meta = meta_path + ".tmp"
    with open(tmp_meta, "w") as f:
        json.dump({"class": type(w).__name__, "scalars": scalars}, f)
    os.replace(tmp_meta, meta_path)
    return npz_path


def load_weights(
    cls: Type, task_dir: str, identifier: str = BEST_IDENTIFIER
) -> Any:
    """Rebuild a weight object from its checkpoint — bypasses the
    seeded ``__init__`` entirely (reference ``load_state_dict``
    semantics: the stored parameters ARE the model)."""
    npz_path, meta_path = ckpt_paths(task_dir, cls.__name__, identifier)
    if not os.path.exists(npz_path):
        raise ValueError(f"Checkpoint does not exist, {npz_path}")
    with open(meta_path) as f:
        meta = json.load(f)
    if meta["class"] != cls.__name__:
        raise ValueError(
            f"Checkpoint class mismatch: {meta['class']} != {cls.__name__}"
        )
    obj = cls.__new__(cls)
    with np.load(npz_path) as z:
        for k in z.files:
            setattr(obj, k, z[k])
    for k, v in meta["scalars"].items():
        setattr(obj, k, v)
    return obj


def from_taskdir(
    cls: Type, task_dir: str, load_best_model: bool = True
) -> Any:
    """Reference ``from_taskdir`` shape (base_task.py:264-283): point
    at a task directory, get the best checkpoint's weights."""
    if not load_best_model:
        raise ValueError("from_taskdir without load_best_model is a no-op")
    return load_weights(cls, task_dir, BEST_IDENTIFIER)
