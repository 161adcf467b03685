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

Schema stability: every emitted block carries identical columns and
dtypes — fn's output columns plus ``_error`` — with nulls in fn's
columns on failed rows.  Pass ``out_schema`` when fn's output schema
is known up front; otherwise it is inferred from the first succeeding
row of each batch (an ALL-fail batch without ``out_schema`` cannot
know fn's columns and raises, pointing at the parameter).
"""

from __future__ import annotations

from typing import Callable, Optional

import pandas as pd
import pyarrow as pa

from rex_ray.functions.blocks import arrow_block

ERROR_COL = "_error"


def _with_error_field(schema: pa.Schema) -> pa.Schema:
    if ERROR_COL in schema.names:
        return schema
    return schema.append(pa.field(ERROR_COL, pa.string()))


def with_deadletter(
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    out_schema: Optional[pa.Schema] = None,
):
    """Wrap a pandas-batch UDF with per-row error capture.

    The wrapped callable returns the union of fn's output over the
    rows that succeed (with ``_error`` = "") and one row per failing
    input (its ``doc_id`` carried through if fn's schema has one,
    ``_error`` = exception text, nulls elsewhere).  All blocks share
    one fixed schema (see module docstring).
    """

    def wrapped(batch: pd.DataFrame) -> pa.Table:
        try:
            out = fn(batch)
            out = out.assign(**{ERROR_COL: ""})
            tbl = arrow_block(out)
            if out_schema is not None:
                tbl = tbl.select(
                    _with_error_field(out_schema).names
                ).cast(_with_error_field(out_schema))
            return tbl
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
                    (
                        row["doc_id"].iloc[0]
                        if "doc_id" in row.columns
                        else i,
                        f"{type(exc).__name__}: {exc}",
                    )
                )
        if out_schema is not None:
            base = out_schema
        elif goods:
            base = arrow_block(
                pd.concat(goods, ignore_index=True)
            ).schema
        else:
            raise ValueError(
                "with_deadletter: every row of a batch failed and no "
                "out_schema was given — cannot emit a schema-stable "
                "block.  Pass out_schema=<fn's output schema>."
            )
        schema = _with_error_field(base)
        parts = []
        if goods:
            good_df = pd.concat(goods, ignore_index=True)
            good_df[ERROR_COL] = ""
            parts.append(
                arrow_block(good_df).select(schema.names).cast(schema)
            )
        if errors:
            n = len(errors)
            cols = []
            for f in schema:
                if f.name == ERROR_COL:
                    cols.append(pa.array([e[1] for e in errors], f.type))
                elif f.name == "doc_id":
                    cols.append(pa.array([e[0] for e in errors], f.type))
                else:
                    cols.append(pa.nulls(n, f.type))
            parts.append(pa.Table.from_arrays(cols, schema=schema))
        return pa.concat_tables(parts)

    return wrapped


def split_deadletter(ds):
    """(clean_ds, errors_ds) from a wrapped stage's output."""
    clean = ds.filter(expr=f"{ERROR_COL} == ''").drop_columns([ERROR_COL])
    errors = ds.filter(expr=f"{ERROR_COL} != ''")
    return clean, errors
