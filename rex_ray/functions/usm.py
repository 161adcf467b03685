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
    h2t = [(x[0], x[1]) for x in ttl if x[2] == 0]
    h2t_set = set(h2t)
    hs = {x[0] for x in h2t}
    ts = {x[1] for x in h2t}
    h2h = [
        (x[0], x[1])
        for x in ttl
        if x[2] == 1 and x[0] in hs and x[1] in hs
    ]
    t2t = [
        (x[0], x[1])
        for x in ttl
        if x[2] == 2 and x[0] in ts and x[1] in ts
    ]
    pairs = []
    for hh, th in h2h:
        for ht, tt in t2t:
            if (hh, ht) in h2t_set and (th, tt) in h2t_set:
                pairs.append(((hh, ht), (th, tt)))

    l2h = [
        (x[0], x[1])
        for x in ltl
        if x[2] == 0 and x[0] in label_map and x[1] in hs
    ]
    l2t = [
        (x[0], x[1])
        for x in ltl
        if x[2] == 1 and x[0] in label_map and x[1] in ts
    ]
    l2ht = []
    for l1, h in l2h:
        for l2, t in l2t:
            if l1 == l2 and (h, t) in h2t_set:
                l2ht.append(
                    (
                        (label_map[l1]["string"], label_map[l1]["type"], l1),
                        (h, t),
                    )
                )
    ls = {lb[0][2] for lb in l2ht}

    h2l = [
        (x[0], x[1]) for x in tll if x[2] == 0 and x[0] in hs and x[1] in ls
    ]
    t2l = [
        (x[0], x[1]) for x in tll if x[2] == 1 and x[0] in ts and x[1] in ls
    ]
    ht2l = []
    for h, l1 in h2l:
        for t, l2 in t2l:
            if (
                l1 == l2
                and (h, t) in h2t_set
                and label_map[l1]["type"] == "p"
            ):
                ht2l.append(((h, t), (label_map[l1]["string"], "p", l1)))

    ents = sorted(
        {(ent[1], ent[0][0]) for ent in l2ht if ent[0][1] == "m"}
    )
    relations = set()
    for (hh, ht), (th, tt) in pairs:
        for l1, (h1, t1) in l2ht:
            if l1[1] == "p":
                for (h2, t2), l2 in ht2l:
                    if (
                        hh == h1
                        and ht == t1
                        and th == h2
                        and tt == t2
                        and l1[2] == l2[2]
                    ):
                        relations.add(((hh, ht), l1[0], (th, tt)))
    return {"ents": ents, "relations": sorted(relations)}
