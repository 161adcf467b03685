"""Per-row error policy: dead-letter rows instead of log-and-drop.

Reference semantics: the transform driver wraps every instance in
try/except, skips failures and counts them
(rex/data/transforms/base.py:50-106, ``ignore_error``).  The dataflow
version keeps failures AS DATA: a wrapped stage emits good rows
unchanged plus a ``_error`` column; failed rows carry the exception
text so a downstream ``filter`` splits clean output from the
dead-letter stream (SURVEY.md §4 'error rows').

Fast path first: the whole batch runs vectorized; only a failing batch
falls back to row-at-a-time (the common case pays nothing).
"""

from __future__ import annotations

from typing import Callable

import pandas as pd
import pyarrow as pa

from rex_ray.functions.blocks import arrow_block

ERROR_COL = "_error"


def with_deadletter(fn: Callable[[pd.DataFrame], pd.DataFrame]):
    """Wrap a pandas-batch UDF with per-row error capture.

    The wrapped callable returns the union of fn's output over the
    rows that succeed (with ``_error`` = "") and one row per failing
    input (its ``doc_id`` if present, ``_error`` = exception text).
    """

    def wrapped(batch: pd.DataFrame) -> pa.Table:
        try:
            out = fn(batch)
            out = out.assign(**{ERROR_COL: ""})
            return arrow_block(out)
        except Exception:
            pass  # fall through to row-at-a-time
        goods = []
        errors = []
        for i in range(len(batch)):
            row = batch.iloc[i : i + 1]
            try:
                goods.append(fn(row))
            except Exception as exc:  # noqa: BLE001 - captured as data
                errors.append(
                    {
                        "doc_id": row["doc_id"].iloc[0]
                        if "doc_id" in row.columns
                        else i,
                        ERROR_COL: f"{type(exc).__name__}: {exc}",
                    }
                )
        good_df = (
            pd.concat(goods, ignore_index=True)
            if goods
            else pd.DataFrame()
        )
        if len(good_df):
            good_df[ERROR_COL] = ""
        err_df = pd.DataFrame(errors)
        out = pd.concat([good_df, err_df], ignore_index=True)
        # error rows have NaN in fn's columns; normalize dtypes to object
        return arrow_block(out.where(out.notna(), None))

    return wrapped


def split_deadletter(ds):
    """(clean_ds, errors_ds) from a wrapped stage's output."""
    clean = ds.filter(expr=f"{ERROR_COL} == ''").drop_columns([ERROR_COL])
    errors = ds.filter(expr=f"{ERROR_COL} != ''")
    return clean, errors
