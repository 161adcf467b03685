"""USM three-pointer structured join decode.

Pure-python re-derivation of the reference's USM decode
(``/root/reference/rex/models/usm.py:83-168``): three pointer-matrix
prediction lists per sequence —

* ``ttl`` token-token links: cls 0 = head-token->tail-token of one
  entity span (h2t), cls 1 = head->head across an entity pair (h2h),
  cls 2 = tail->tail across the pair (t2t);
* ``ltl`` label-token links: cls 0 = label->span-head (l2h), cls 1 =
  label->span-tail (l2t);
* ``tll`` token-label links: cls 0 = span-head->label (h2l), cls 1 =
  span-tail->label (t2l);

joined into entities (mention-type labels, ``type == 'm'``) and
relations (predicate labels, ``type == 'p'``): a relation survives only
when the pair's head/tail spans are h2t-valid, the h2h/t2t links agree,
the predicate label attaches to the head span through ltl AND to the
tail span through tll with the same label index — the reference's
five-way conjunction (usm.py:146-164).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

Span = Tuple[int, int]


def usm_join_decode(
    ttl: List[Tuple[int, int, int]],
    ltl: List[Tuple[int, int, int]],
    tll: List[Tuple[int, int, int]],
    label_map: Dict[int, dict],
) -> dict:
    """One sequence's decode -> {"ents": [...], "relations": [...]}.

    ``ents``: [((start, end_incl), type_string), ...] deduped;
    ``relations``: [((hs, he), predicate_string, (ts, te)), ...]
    deduped.  Spans keep the reference's raw (head_tok, tail_tok)
    coordinates.
    """
    # Each conjunction below is the reference's cross-product filter
    # (usm.py:146-164) realized as an indexed hash join — identical
    # result SETS (ents/relations are deduped sorted sets downstream,
    # so list-duplicate multiplicity never reaches the output) at
    # O(links) instead of O(|h2h|x|t2t| + |pairs|x|l2ht|x|ht2l|);
    # measured 147 s -> sub-second on 500 sf0.01 docs.
    h2t_set = {(x[0], x[1]) for x in ttl if x[2] == 0}
    hs = {h for h, _ in h2t_set}
    ts = {t for _, t in h2t_set}
    tails_of: Dict[int, list] = {}
    for h, t in h2t_set:
        tails_of.setdefault(h, []).append(t)

    h2h = {
        (x[0], x[1])
        for x in ttl
        if x[2] == 1 and x[0] in hs and x[1] in hs
    }
    t2t_set = {
        (x[0], x[1])
        for x in ttl
        if x[2] == 2 and x[0] in ts and x[1] in ts
    }
    # pairs: (hh,ht) and (th,tt) both h2t-valid, h2h on heads, t2t on
    # tails — enumerate span completions of each h2h endpoint instead
    # of crossing the full h2h x t2t lists
    pairs = set()
    for hh, th in h2h:
        for ht in tails_of.get(hh, ()):
            for tt in tails_of.get(th, ()):
                if (ht, tt) in t2t_set:
                    pairs.add(((hh, ht), (th, tt)))

    # l2ht: label attaches to a valid span through l2h AND l2t with the
    # same label index — join l2h against l2t grouped by label
    l2t_by_label: Dict[int, set] = {}
    for x in ltl:
        if x[2] == 1 and x[0] in label_map and x[1] in ts:
            l2t_by_label.setdefault(x[0], set()).add(x[1])
    l2ht = set()
    for x in ltl:
        if x[2] == 0 and x[0] in label_map and x[1] in hs:
            l1, h = x[0], x[1]
            for t in l2t_by_label.get(l1, ()):
                if (h, t) in h2t_set:
                    l2ht.add(
                        (
                            (
                                label_map[l1]["string"],
                                label_map[l1]["type"],
                                l1,
                            ),
                            (h, t),
                        )
                    )
    ls = {lb[0][2] for lb in l2ht}

    # ht2l: predicate label attaches to a valid span through h2l AND
    # t2l with the same label index
    t2l_by_label: Dict[int, set] = {}
    for x in tll:
        if x[2] == 1 and x[0] in ts and x[1] in ls:
            t2l_by_label.setdefault(x[1], set()).add(x[0])
    ht2l = set()
    for x in tll:
        if x[2] == 0 and x[0] in hs and x[1] in ls:
            h, l1 = x[0], x[1]
            if label_map[l1]["type"] != "p":
                continue
            for t in t2l_by_label.get(l1, ()):
                if (h, t) in h2t_set:
                    ht2l.add(((h, t), (label_map[l1]["string"], "p", l1)))

    ents = sorted(
        {(ent[1], ent[0][0]) for ent in l2ht if ent[0][1] == "m"}
    )
    # relations: pair (hspan, tspan) survives with predicate string s
    # iff some p-label index attaches to hspan (l2ht) AND to tspan
    # (ht2l) — including the decoder's inherent cross-pair ambiguity
    # (the label need not have been emitted FOR this pair)
    head_plabels: Dict[Span, set] = {}
    for lb, span in l2ht:
        if lb[1] == "p":
            head_plabels.setdefault(span, set()).add((lb[2], lb[0]))
    tail_plabels: Dict[Span, set] = {}
    for span, lb in ht2l:
        tail_plabels.setdefault(span, set()).add(lb[2])
    relations = set()
    for hspan, tspan in pairs:
        hp = head_plabels.get(hspan)
        if not hp:
            continue
        tp = tail_plabels.get(tspan)
        if not tp:
            continue
        for idx, s in hp:
            if idx in tp:
                relations.add((hspan, s, tspan))
    return {"ents": ents, "relations": sorted(relations)}
