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
    # mention positions are strictly increasing, so the first
    # out-of-window tail ends the scan — O(M x window), not O(M^2)
    # (matters for book-length docs; identical emission order)
    for i, (ph, hty) in enumerate(mentions):
        for pt, tty in mentions[i + 1:]:
            if pt - ph > window:
                break
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


# ---------------------------------------------------------------------------
# Event extraction on the same decode base (reference event shape,
# ``/root/reference/rex/data/transforms/joint.py:97``: event types join
# the entity-label space, argument roles the relation-label space).
# Triggers carry their event type as the span's 'm' label; each
# trigger->argument role link is a 'p' label — so ONE unchanged
# usm_join_decode yields both the event inventory (ents) and the
# role-labeled argument links (relations with head == trigger span).
# ---------------------------------------------------------------------------


def usm_event_label_map() -> Dict[int, dict]:
    """{label_index: {"type": 'm'|'p', "string": name}} — event types
    first, roles after, both sorted."""
    etypes = sorted(set(spec.EVENT_TYPE_MAP.values()))
    roles = sorted(set(spec.ROLE_MAP.values()) | {spec.ROLE_FALLBACK})
    out: Dict[int, dict] = {}
    for i, e in enumerate(etypes):
        out[i] = {"type": "m", "string": e}
    for j, r in enumerate(roles):
        out[len(etypes) + j] = {"type": "p", "string": r}
    return out


def emit_event_links(
    tokens: List[str],
    label_map: Dict[int, dict],
    window: int = spec.EVENT_WINDOW,
) -> Tuple[list, list, list]:
    """Deterministic (ttl, ltl, tll) for one doc's EVENT layer — the
    trained-USM stand-in.  Every mention is an h2t-valid single-token
    span; triggers additionally carry their event type as an 'm'
    label; arguments are in-window mentions on EITHER side with the
    spec role rule as the linking 'p' label."""
    lab_of = {
        (v["type"], v["string"]): k for k, v in label_map.items()
    }
    mentions = [
        (pos, spec.GAZETTEER[tok])
        for pos, tok in enumerate(tokens)
        if tok in spec.GAZETTEER
    ]
    triggers = [
        (pos, spec.EVENT_TYPE_MAP[ty])
        for pos, ty in mentions
        if ty in spec.EVENT_TYPE_MAP
    ]
    ttl, ltl, tll = [], [], []
    for pos, _ty in mentions:
        ttl.append((pos, pos, 0))  # h2t: every mention is a valid span
    for pos, et in triggers:
        lm = lab_of[("m", et)]
        ltl.append((lm, pos, 0))   # event type -> trigger head
        ltl.append((lm, pos, 1))   # event type -> trigger tail
    # two-sided window: slice the position-sorted mention list with
    # bisect instead of scanning every mention per trigger —
    # O(T x window), not O(T x M); identical emission order
    from bisect import bisect_left, bisect_right

    positions = [p for p, _ in mentions]
    for tp, et in triggers:
        lo = bisect_left(positions, tp - window)
        hi = bisect_right(positions, tp + window)
        for ap, aty in mentions[lo:hi]:
            if ap == tp:
                continue
            role = spec.ROLE_MAP.get((et, aty), spec.ROLE_FALLBACK)
            lp = lab_of[("p", role)]
            ttl.append((tp, ap, 1))  # h2h trigger -> argument
            ttl.append((tp, ap, 2))  # t2t trigger -> argument
            ltl.append((lp, tp, 0))  # role -> trigger span (l2h)
            ltl.append((lp, tp, 1))  # role -> trigger span (l2t)
            tll.append((ap, lp, 0))  # argument span -> role (h2l)
            tll.append((ap, lp, 1))  # argument span -> role (t2l)
    return ttl, ltl, tll


_EVENT_ARG_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("event_type", pa.string()),
        ("trigger_pos", pa.int64()),
        ("role", pa.string()),
        ("arg_pos", pa.int64()),
    ]
)

_EVENT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("event_type", pa.string()),
        ("trigger_pos", pa.int64()),
        ("n_args", pa.int64()),
        ("n_roles", pa.int64()),
        ("n_links", pa.int64()),
    ]
)


def _decode_doc_events(text: str, lm: Dict[int, dict]) -> dict:
    ttl, ltl, tll = emit_event_links(text.split(" "), lm)
    return usm_join_decode(ttl, ltl, tll, lm)


def usm_event_args_batch(batch: pd.DataFrame) -> pa.Table:
    """(doc_id, text) -> one row per decoded trigger->argument role
    link: (doc_id, event_type, trigger_pos, role, arg_pos).  The
    relation head span is always a trigger (only triggers receive
    'p'-label ltl attachments), so the event type is the head span's
    'm' label."""
    lm = usm_event_label_map()
    rows = []
    for doc_id, text in zip(batch["doc_id"], batch["text"]):
        dec = _decode_doc_events(text, lm)
        etype = {span[0]: ty for span, ty in dec["ents"]}
        for (hh, _ht), role, (ah, _at) in dec["relations"]:
            rows.append((doc_id, etype[hh], hh, role, ah))
    return arrow_block(
        pd.DataFrame(
            rows,
            columns=[
                "doc_id", "event_type", "trigger_pos", "role", "arg_pos",
            ],
        ),
        schema=_EVENT_ARG_SCHEMA,
    )


def usm_events_batch(batch: pd.DataFrame) -> pa.Table:
    """(doc_id, text) -> one row per decoded EVENT (= trigger span in
    ents, argless triggers included with zero counts): distinct
    argument count, distinct role count, total surviving links.
    Assembly is doc-local (a doc's whole structure decodes inside one
    batch) — no shuffle anywhere in the stage."""
    lm = usm_event_label_map()
    rows = []
    for doc_id, text in zip(batch["doc_id"], batch["text"]):
        dec = _decode_doc_events(text, lm)
        links: Dict[int, list] = {span[0]: [] for span, _ in dec["ents"]}
        for (hh, _ht), role, (ah, _at) in dec["relations"]:
            links[hh].append((role, ah))
        for span, ty in dec["ents"]:
            ls = links[span[0]]
            rows.append(
                (
                    doc_id,
                    ty,
                    span[0],
                    len({a for _r, a in ls}),
                    len({r for r, _a in ls}),
                    len(ls),
                )
            )
    return arrow_block(
        pd.DataFrame(
            rows,
            columns=[
                "doc_id", "event_type", "trigger_pos",
                "n_args", "n_roles", "n_links",
            ],
        ),
        schema=_EVENT_SCHEMA,
    )


def usm_event_args(docs_ds):
    """documents -> flat decoded trigger->argument role links."""
    return docs_ds.map_batches(
        usm_event_args_batch, batch_format="pandas"
    )


def usm_events(docs_ds):
    """documents -> per-event assembly rows (doc-local, zero-shuffle)."""
    return docs_ds.map_batches(usm_events_batch, batch_format="pandas")
