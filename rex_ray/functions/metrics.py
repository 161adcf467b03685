"""P/R/F1 arithmetic and triple-set metrics.

Reference semantics: ``rex/metrics/__init__.py:6-21`` and
``rex/metrics/triple.py:6-43``.  The tp/fp/fn counts are associative
(set intersection/difference cardinalities summed over instances), so
they pre-aggregate per batch inside ``map_batches`` and finalize with a
single small reduction — see ``stages.parity`` for the distributed form.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, Iterable, Sequence, Union


def safe_division(numerator: float, denominator: float) -> float:
    try:
        return numerator / denominator
    except ZeroDivisionError:
        return 0.0


def prf1_from_counts(tp: int, fp: int, fn: int) -> Dict[str, Union[int, float]]:
    p = safe_division(tp, tp + fp)
    r = safe_division(tp, tp + fn)
    f1 = safe_division(2 * p * r, p + r)
    return {"p": p, "r": r, "f1": f1, "tp": tp, "fp": fp, "fn": fn}


_TRIPLE_VIEWS = {
    "triple": lambda t: t,
    "subject": lambda t: t[0],
    "relation": lambda t: t[1],
    "object": lambda t: t[2],
}


def triple_counts(
    preds: Iterable[Sequence], golds: Iterable[Sequence]
) -> Dict[str, Dict[str, int]]:
    """Per-instance set tp/fp/fn summed across instances, for the full
    triple plus subject/relation/object projections.  This is the
    mergeable partial; sum dicts across batches then call
    :func:`prf1_from_counts` per view."""
    stat: Dict[str, Dict[str, int]] = defaultdict(lambda: {"tp": 0, "fp": 0, "fn": 0})
    for pred, gold in zip(preds, golds):
        pred_set = set(map(tuple, pred))
        gold_set = set(map(tuple, gold))
        for view, proj in _TRIPLE_VIEWS.items():
            ps = {proj(t) for t in pred_set}
            gs = {proj(t) for t in gold_set}
            stat[view]["tp"] += len(ps & gs)
            stat[view]["fp"] += len(ps - gs)
            stat[view]["fn"] += len(gs - ps)
    return dict(stat)


def merge_counts(
    a: Dict[str, Dict[str, int]], b: Dict[str, Dict[str, int]]
) -> Dict[str, Dict[str, int]]:
    out: Dict[str, Dict[str, int]] = {}
    for view in set(a) | set(b):
        out[view] = {
            k: a.get(view, {}).get(k, 0) + b.get(view, {}).get(k, 0)
            for k in ("tp", "fp", "fn")
        }
    return out


def measure_triples(preds: Iterable[Sequence], golds: Iterable[Sequence]) -> dict:
    """Full metric dict matching the reference's ``measure_triple``
    output shape (p/r/f1 + raw counts per view)."""
    stat = triple_counts(preds, golds)
    result = {}
    for view in ("triple", "subject", "object", "relation"):
        counts = stat.get(view, {"tp": 0, "fp": 0, "fn": 0})
        result[view] = prf1_from_counts(**counts)
    return result
