"""GlobalPointer/USM-style matrix decode stage.

Reference family: biaffine pointer matrices with per-class (seq, seq)
span scores (rex/models/global_pointer.py:10-213, USM decode
rex/models/usm.py:83-168), decoded by the multiclass pointer-matrix
kernel (rex/utils/position.py:119-132).

The "model" emits a DETERMINISTIC per-class pointer matrix from the
gazetteer (cell [cls, s, e] = 1 for each type-cls mention span), so the
full matrix -> span -> entity decode path runs end-to-end and is
oracle-checkable; a trained GlobalPointer replaces ``_pointer_matrix``
with its biaffine scores + threshold, the decode stays identical.
"""

from __future__ import annotations

from typing import List

import numpy as np
import pandas as pd
import pyarrow as pa

from rex_ray.functions.blocks import arrow_block
from rex_ray.functions.position import (
    decode_multiclass_pointer_matrix_spans,
)
from rex_ray.pipelines import spec

ENT_TYPES: List[str] = sorted(set(spec.GAZETTEER.values()))


def _pointer_matrix(tokens: List[str], max_len: int) -> np.ndarray:
    """(n_cls, L, L) 0/1 matrix with [cls, pos, pos] = 1 per mention
    (single-token spans; a real model fills arbitrary (s, e) cells)."""
    mat = np.zeros((len(ENT_TYPES), max_len, max_len), dtype=np.int8)
    for pos, tok in enumerate(tokens[:max_len]):
        t = spec.GAZETTEER.get(tok)
        if t is not None:
            mat[ENT_TYPES.index(t), pos, pos] = 1
    return mat


def pointer_entities_batch(batch: pd.DataFrame) -> pa.Table:
    """(doc_id, text) -> decoded entity rows
    (doc_id, ent_type, start_pos, end_pos) via the multiclass
    pointer-matrix decoder; end is exclusive (reference +1 shift)."""
    rows = []
    for doc_id, text in zip(batch["doc_id"], batch["text"]):
        tokens = text.split(" ")
        L = max(1, len(tokens))
        mats = _pointer_matrix(tokens, L)[None, :, :, :]
        for s, e, cls in decode_multiclass_pointer_matrix_spans(mats)[0]:
            rows.append((doc_id, ENT_TYPES[cls], s, e))
    return arrow_block(
        pd.DataFrame(
            rows, columns=["doc_id", "ent_type", "start_pos", "end_pos"]
        ),
        schema=pa.schema(
            [
                ("doc_id", pa.int64()),
                ("ent_type", pa.string()),
                ("start_pos", pa.int64()),
                ("end_pos", pa.int64()),
            ]
        ),
    )


def pointer_entities(docs_ds):
    return docs_ds.map_batches(pointer_entities_batch, batch_format="pandas")
