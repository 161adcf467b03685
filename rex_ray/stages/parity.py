"""Distributed triple-set P/R/F1 — the reference's ``measure_triple``
(rex/metrics/triple.py:6-43) re-expressed as a Ray dataflow.

Reference semantics: per-instance set comparison of (subj, rel, obj)
tuples plus subject/relation/object projections, tp/fp/fn summed
globally, P/R/F1 by safe division (rex/metrics/__init__.py:6-21).
Sets are per-document: duplicate triples within a doc count once.

Dataflow per view (no driver-side row loops):

    pred rows, gold rows
      -> project to (doc_id, key...), per-batch dedupe, tag side
      -> union, per-batch partial groupby max(side-flags)   [combiner]
      -> groupby(doc_id, key...): max(in_pred), max(in_gold)  [1 shuffle]
      -> per-batch tp/fp/fn partials -> global sum
"""

from __future__ import annotations

from typing import Dict, Sequence

import pandas as pd
import pyarrow as pa

from rex_ray.functions.blocks import arrow_block, pre_shuffle
from rex_ray.functions.metrics import prf1_from_counts

VIEWS: Dict[str, Sequence[str]] = {
    "triple": ("subj", "pred", "obj"),
    "subject": ("subj",),
    "relation": ("pred",),
    "object": ("obj",),
}


def _tagged(ds, keys, in_pred: int, in_gold: int):
    cols = list(keys)

    def tag(b: pd.DataFrame):
        out = b[cols].drop_duplicates()
        out = out.assign(in_pred=in_pred, in_gold=in_gold)
        return arrow_block(out)

    return ds.map_batches(tag, batch_format="pandas")


def membership(pred_ds, gold_ds, keys):
    """One row per distinct key tuple with in_pred/in_gold flags."""
    from ray.data.aggregate import Max

    cols = list(keys)
    u = _tagged(pred_ds, cols, 1, 0).union(_tagged(gold_ds, cols, 0, 1))

    def combine(b: pd.DataFrame):
        g = (
            b.groupby(cols, sort=False, observed=True)[["in_pred", "in_gold"]]
            .max()
            .reset_index()
        )
        return arrow_block(g)

    partial = pre_shuffle(u.map_batches(combine, batch_format="pandas"))
    return partial.groupby(cols).aggregate(
        Max("in_pred", alias_name="in_pred"),
        Max("in_gold", alias_name="in_gold"),
    )


def _counts(member_ds) -> Dict[str, int]:
    def count_batch(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        p = t["in_pred"]
        g = t["in_gold"]
        both = pc.and_(pc.equal(p, 1), pc.equal(g, 1))
        only_p = pc.and_(pc.equal(p, 1), pc.equal(g, 0))
        only_g = pc.and_(pc.equal(p, 0), pc.equal(g, 1))
        return pa.Table.from_pydict(
            {
                "tp": [pc.sum(pc.cast(both, pa.int64())).as_py() or 0],
                "fp": [pc.sum(pc.cast(only_p, pa.int64())).as_py() or 0],
                "fn": [pc.sum(pc.cast(only_g, pa.int64())).as_py() or 0],
            }
        )

    partial = member_ds.map_batches(count_batch, batch_format="pyarrow")
    agg = partial.sum(["tp", "fp", "fn"])
    return {
        "tp": int(agg["sum(tp)"]),
        "fp": int(agg["sum(fp)"]),
        "fn": int(agg["sum(fn)"]),
    }


def triple_prf(
    pred_ds, gold_ds, doc_col: str = "doc_id"
) -> Dict[str, Dict[str, float]]:
    """Reference-shaped metric dict: per view, p/r/f1/tp/fp/fn.

    Both inputs carry (doc_id, subj, pred, obj) rows; per-doc set
    semantics match rex/metrics/triple.py:13-19 (set() casts per
    instance)."""
    out = {}
    for view, vcols in VIEWS.items():
        keys = [doc_col, *vcols]
        out[view] = prf1_from_counts(**_counts(membership(pred_ds, gold_ds, keys)))
    return out


def parity_table(pred_ds, gold_ds, doc_col: str = "doc_id") -> pa.Table:
    """Metric rows as a small Arrow table for the query registry:
    (view, p, r, f1, tp, fp, fn), view-sorted."""
    metrics = triple_prf(pred_ds, gold_ds, doc_col=doc_col)
    rows = sorted(metrics.items())
    return pa.Table.from_pydict(
        {
            "view": [v for v, _ in rows],
            "p": [float(m["p"]) for _, m in rows],
            "r": [float(m["r"]) for _, m in rows],
            "f1": [float(m["f1"]) for _, m in rows],
            "tp": [int(m["tp"]) for _, m in rows],
            "fp": [int(m["fp"]) for _, m in rows],
            "fn": [int(m["fn"]) for _, m in rows],
        }
    )
