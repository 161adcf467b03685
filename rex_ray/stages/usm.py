"""USM stage: deterministic three-pointer emission + structured join
decode -> entities and relations.

The learned half of the reference's USM (three BertGlobalPointer heads,
``/root/reference/rex/models/usm.py:17-80``) is replaced by a
DETERMINISTIC emitter that derives the ttl/ltl/tll link lists from the
spec's gazetteer + windowed-pair rules, so the full five-way join
decode (``rex_ray/functions/usm.py``) runs end-to-end and its relation
output is oracle-checkable against the same ``tri`` CTE as the
extraction path.  A trained USM replaces :func:`emit_links` with three
thresholded pointer matrices; the decode stays identical.

Label space: entity types as ``'m'`` labels, predicates as ``'p'``
labels, in one order-stable index.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import pandas as pd
import pyarrow as pa

from rex_ray.functions.blocks import arrow_block
from rex_ray.functions.usm import usm_join_decode
from rex_ray.pipelines import spec


def usm_label_map() -> Dict[int, dict]:
    """{label_index: {"type": 'm'|'p', "string": name}} — entity types
    first, predicates after, both sorted."""
    ents = sorted(set(spec.GAZETTEER.values()))
    preds = sorted(set(spec.PRED_MAP.values()) | {spec.PRED_FALLBACK})
    out: Dict[int, dict] = {}
    for i, e in enumerate(ents):
        out[i] = {"type": "m", "string": e}
    for j, p in enumerate(preds):
        out[len(ents) + j] = {"type": "p", "string": p}
    return out


def emit_links(
    tokens: List[str],
    label_map: Dict[int, dict],
    window: int = spec.PAIR_WINDOW,
) -> Tuple[list, list, list]:
    """Deterministic (ttl, ltl, tll) link lists for one doc — the
    model-output stand-in.  Mentions are single-token spans (h == t);
    pairs follow the spec window rule."""
    lab_of = {
        (v["type"], v["string"]): k for k, v in label_map.items()
    }
    mentions = [
        (pos, spec.GAZETTEER[tok])
        for pos, tok in enumerate(tokens)
        if tok in spec.GAZETTEER
    ]
    ttl, ltl, tll = [], [], []
    for pos, ty in mentions:
        ttl.append((pos, pos, 0))  # h2t: single-token span
        lm = lab_of[("m", ty)]
        ltl.append((lm, pos, 0))   # type label -> span head
        ltl.append((lm, pos, 1))   # type label -> span tail
    for i, (ph, hty) in enumerate(mentions):
        for pt, tty in mentions[i + 1:]:
            if not (1 <= pt - ph <= window):
                continue
            pred = spec.PRED_MAP.get((hty, tty), spec.PRED_FALLBACK)
            lp = lab_of[("p", pred)]
            ttl.append((ph, pt, 1))  # h2h across the pair
            ttl.append((ph, pt, 2))  # t2t across the pair
            ltl.append((lp, ph, 0))  # predicate -> head span (l2h)
            ltl.append((lp, ph, 1))  # predicate -> head span (l2t)
            tll.append((pt, lp, 0))  # tail span -> predicate (h2l)
            tll.append((pt, lp, 1))  # tail span -> predicate (t2l)
    return ttl, ltl, tll


_REL_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("head_pos", pa.int64()),
        ("pred", pa.string()),
        ("tail_pos", pa.int64()),
    ]
)


def usm_relations_batch(batch: pd.DataFrame) -> pa.Table:
    """(doc_id, text) -> decoded relation rows
    (doc_id, head_pos, pred, tail_pos); single-token spans, so each
    span is reported by its head position."""
    lm = usm_label_map()
    rows = []
    for doc_id, text in zip(batch["doc_id"], batch["text"]):
        ttl, ltl, tll = emit_links(text.split(" "), lm)
        dec = usm_join_decode(ttl, ltl, tll, lm)
        for (hh, _ht), pred, (th, _tt) in dec["relations"]:
            rows.append((doc_id, hh, pred, th))
    return arrow_block(
        pd.DataFrame(
            rows, columns=["doc_id", "head_pos", "pred", "tail_pos"]
        ),
        schema=_REL_SCHEMA,
    )


def usm_relations(docs_ds):
    """documents -> USM-decoded relations (task stage; the emitter +
    decode state is trivial)."""
    return docs_ds.map_batches(usm_relations_batch, batch_format="pandas")
