"""Collate: columnar batch -> dict of stacked numpy arrays, with the
reference's subclass hook points.

Reference semantics: rex/data/collate_fn.py:12-103 ``GeneralCollateFn``
— ``key2type``-filtered projection (keys not in the map are DROPPED),
optional type guessing from the first instance, and two override
hooks: ``update_data`` (rows, before grouping) and
``update_before_tensorify`` (grouped columns, before dtype coercion).

Ray-first shape: a collate instance is plain per-batch state used
INSIDE a ``map_batches`` actor/task (never a dataset stage of its own
— tensors should not transit the object store mid-model).  The hot
path is fully vectorized; the row-wise ``update_data`` hook only
triggers a rows round-trip when a subclass actually overrides it, so
the default pays no per-row cost.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import numpy as np
import pandas as pd
import pyarrow as pa

# reference DEFAULT_TYPE_MAP (collate_fn.py:27) with torch dtypes
# swapped for numpy: int -> long, float -> float32, str -> keep as-is
DEFAULT_TYPE_MAP: Dict[type, Any] = {
    int: np.int64,
    float: np.float32,
    str: None,
}


def _to_columns(batch) -> Dict[str, list]:
    if isinstance(batch, pa.Table):
        return {name: batch[name].to_pylist() for name in batch.column_names}
    if isinstance(batch, pd.DataFrame):
        return {c: batch[c].tolist() for c in batch.columns}
    if isinstance(batch, dict):
        return {k: list(v) for k, v in batch.items()}
    raise TypeError(f"unsupported batch type: {type(batch)!r}")


class GeneralCollate:
    """Columnar re-expression of the reference's ``GeneralCollateFn``.

    Call with an Arrow table, pandas frame, or dict-of-lists; returns a
    dict of numpy arrays (or plain lists for ``None``-typed keys).
    Only keys present in ``key2type`` survive — projection-on-collate,
    the reference's unused-key drop (collate_fn.py:18-24).
    """

    def __init__(
        self,
        key2type: Optional[Dict[str, Any]] = None,
        guessing: bool = False,
        missing_key_as_null: bool = False,
    ) -> None:
        self.key2type: Dict[str, Any] = dict(key2type or {})
        self.guessing = guessing
        self.missing_key_as_null = missing_key_as_null

    # -- hook points (override in subclasses) ---------------------------
    def update_data(self, rows: List[dict]) -> List[dict]:
        """Row-wise transform before grouping (collate_fn.py:68-70)."""
        return rows

    def update_before_tensorify(
        self, data: Dict[str, list]
    ) -> Dict[str, list]:
        """Grouped-columns transform before dtype coercion
        (collate_fn.py:72-73)."""
        return data

    # -- type handling ---------------------------------------------------
    def update_type_mapping(self, key2type: Dict[str, Any]) -> None:
        self.key2type.update(key2type)

    def guess_types(self, columns: Dict[str, list]) -> Dict[str, Any]:
        """Infer a dtype per key from the first instance
        (collate_fn.py:48-66): scalars via DEFAULT_TYPE_MAP, lists via
        their (unique) leaf type, anything else ``None``."""
        from rex_ray.functions.collections import flatten_all_iter

        key2type: Dict[str, Any] = {}
        for key, vals in columns.items():
            v = vals[0] if vals else None
            t = type(v)
            if t in DEFAULT_TYPE_MAP:
                key2type[key] = DEFAULT_TYPE_MAP[t]
            elif isinstance(v, (list, np.ndarray)):
                leaf = {type(x) for x in flatten_all_iter(v)}
                key2type[key] = (
                    DEFAULT_TYPE_MAP.get(leaf.pop(), None)
                    if len(leaf) == 1
                    else None
                )
            else:
                key2type[key] = None
        return key2type

    # -- the collate -----------------------------------------------------
    def __call__(self, batch) -> Dict[str, Any]:
        columns = _to_columns(batch)
        if not self.key2type and self.guessing:
            self.update_type_mapping(self.guess_types(columns))
        if self.missing_key_as_null:
            for key in columns:
                self.key2type.setdefault(key, None)

        # the row-wise hook costs a rows round-trip — only pay it when
        # a subclass actually overrides it
        if type(self).update_data is not GeneralCollate.update_data:
            n = len(next(iter(columns.values()), []))
            rows = [
                {k: columns[k][i] for k in columns} for i in range(n)
            ]
            rows = self.update_data(rows)
            columns = (
                {k: [r[k] for r in rows] for k in rows[0]}
                if rows
                else {k: [] for k in columns}
            )

        data = {
            k: columns.get(k, []) for k in self.key2type if k in columns
            or self.missing_key_as_null
        }
        data = self.update_before_tensorify(data)

        out: Dict[str, Any] = {}
        for key, vals in data.items():
            dtype = self.key2type.get(key)
            if dtype is not None and all(v is not None for v in vals):
                out[key] = np.asarray(vals, dtype=dtype)
            else:
                out[key] = vals
        return out
