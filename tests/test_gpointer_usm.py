"""GlobalPointer scoring forward (stages/gpointer) and USM structured
join decode (functions/usm, stages/usm)."""

import numpy as np
import pandas as pd

from rex_ray.functions.usm import usm_join_decode
from rex_ray.stages.gpointer import (
    ENT_TYPES,
    GlobalPointerScorer,
    GlobalPointerWeights,
    rope_rotate,
)
from rex_ray.state.dictionaries import Vocab


def _scorer(**kw):
    v = Vocab(["spark", "join", "table", "zz", "yy"])
    w = GlobalPointerWeights(len(v), len(ENT_TYPES))
    return GlobalPointerScorer(v, w, **kw), v


def test_rope_matches_reference_recipe():
    """rope_rotate reproduces the reference tensor recipe
    (global_pointer.py:37-57) step for step — including its
    concat-halves rotated component paired with interleaved cos/sin
    (NOT a norm-preserving canonical RoPE; replicated faithfully).
    Independent literal transcription below."""
    rng = np.random.default_rng(3)
    q = rng.normal(size=(2, 6, 8))
    k = rng.normal(size=(2, 6, 8))
    qr, kr = rope_rotate(q, k)

    B, L, d = q.shape
    position_ids = np.arange(L, dtype=float)[:, None]
    indices = np.power(
        10000.0, -2.0 * np.arange(d // 2, dtype=float) / d
    )
    pos = position_ids * indices
    pos_emb = np.stack([np.sin(pos), np.cos(pos)], axis=-1).reshape(L, d)
    cos_pos = np.repeat(pos_emb[:, 1::2], 2, axis=-1)
    sin_pos = np.repeat(pos_emb[:, 0::2], 2, axis=-1)
    for b in range(B):
        qw2 = np.concatenate([-q[b][:, 1::2], q[b][:, 0::2]], axis=-1)
        kw2 = np.concatenate([-k[b][:, 1::2], k[b][:, 0::2]], axis=-1)
        assert np.allclose(qr[b], q[b] * cos_pos + qw2 * sin_pos)
        assert np.allclose(kr[b], k[b] * cos_pos + kw2 * sin_pos)
    # position 0: sin = 0 on every frequency pair's first component ->
    # the rotation leaves cos-weighted q only; ensure position
    # dependence exists at later positions
    assert not np.allclose(qr[:, 1], q[:, 1])


def test_gpointer_tril_mask_kills_lower_triangle_and_pad():
    sc, v = _scorer(threshold=-1e9)  # keep everything decodable
    ids, mask = v.encode_batch([["spark", "join", "zz"]], 5)
    logits = sc.forward(np.asarray(ids), np.asarray(mask))
    # spans with end < start (strict lower triangle) are masked out
    assert (logits[0, :, 2, 0] < -1e8).all()
    assert (logits[0, :, 1, 0] < -1e8).all()
    # pad positions (3, 4) are masked out
    assert (logits[0, :, 0, 3] < -1e8).all()
    assert (logits[0, :, 4, 4] < -1e8).all()
    # valid upper-triangle cells are finite and scaled
    assert abs(logits[0, 0, 0, 2]) < 1e6


def test_gpointer_deterministic_and_threshold_monotone():
    sc, _ = _scorer()
    batch = pd.DataFrame(
        {"doc_id": [1, 2], "text": ["spark join table zz", "yy zz spark"]}
    )
    a = sc(batch).to_pandas()
    b = sc(batch).to_pandas()
    assert a.equals(b)
    sc_hi, _ = _scorer(threshold=10.0)
    assert len(sc_hi(batch).to_pandas()) == 0
    assert (a["score"] > sc.threshold).all()
    assert (a["end_pos"] > a["start_pos"]).all()  # tril mask respected


def test_gpointer_rule_twin_exact_integer_logits():
    """The integer-rule parameterization (spec.GP_RULE_*) through the
    REAL forward yields exact integer logits equal to a from-scratch
    per-pair recompute (md5 emb -> linear heads -> Pythagorean RoPE ->
    biaffine), truncation at GP_RULE_MAX_LEN included."""
    import hashlib

    from rex_ray.pipelines import spec
    from rex_ray.stages.gpointer import GlobalPointerRuleWeights

    toks = ["spark", "join", "table", "zz", "yy", "qq"] * 4  # 24 > 16
    v = Vocab(sorted(set(toks)))
    w = GlobalPointerRuleWeights(v)
    sc = GlobalPointerScorer(
        v, w, rope="int", scale=False, threshold=0.0,
        max_seq_len=spec.GP_RULE_MAX_LEN,
    )
    out = sc(
        pd.DataFrame({"doc_id": [1], "text": [" ".join(toks)]})
    ).to_pandas()
    # exact integers, truncated to the rule window
    assert (out["score"] == out["score"].round()).all()
    assert (out["end_pos"] <= spec.GP_RULE_MAX_LEN).all()

    def emb(tok):
        h = hashlib.md5(tok.encode()).hexdigest()
        return [
            int(h[2 * k: 2 * k + 2], 16) % spec.GP_RULE_EMB_MOD - 4
            for k in range(2)
        ]

    def rule_logit(ti, tj, i, j, et):
        e_i, e_j = emb(ti), emb(tj)
        Wh, bh = spec.GP_RULE_WH, spec.GP_RULE_BH
        Wt, bt = spec.GP_RULE_WT, spec.GP_RULE_BT
        h = [
            e_i[0] * Wh[0][0] + e_i[1] * Wh[1][0] + bh[0],
            e_i[0] * Wh[0][1] + e_i[1] * Wh[1][1] + bh[1],
        ]
        t = [
            e_j[0] * Wt[0][0] + e_j[1] * Wt[1][0] + bt[0],
            e_j[0] * Wt[0][1] + e_j[1] * Wt[1][1] + bt[1],
        ]
        ci, si = spec.GP_RULE_ROT[i % 4]
        cj, sj = spec.GP_RULE_ROT[j % 4]
        rh = [h[0] * ci - h[1] * si, h[1] * ci + h[0] * si]
        rt = [t[0] * cj - t[1] * sj, t[1] * cj + t[0] * sj]
        U = spec.GP_RULE_U[et]
        hb, tb = rh + [1], rt + [1]
        return sum(
            hb[a] * U[a][b] * tb[b] for a in range(3) for b in range(3)
        )

    expect = []
    for i in range(spec.GP_RULE_MAX_LEN):
        for j in range(i, spec.GP_RULE_MAX_LEN):
            for et in sorted(spec.GP_RULE_U):
                lg = rule_logit(toks[i], toks[j], i, j, et)
                if lg > 0:
                    expect.append((et, i, j + 1, float(lg)))
    got = sorted(
        zip(out["ent_type"], out["start_pos"], out["end_pos"], out["score"])
    )
    assert got == sorted(expect)


def test_usm_join_decode_entity_and_relation():
    """Hand-built links for 'A implements B' (single-token spans at
    positions 1 and 3) — reference usm.py:107-166 semantics."""
    lm = {
        0: {"type": "m", "string": "SYS"},
        1: {"type": "m", "string": "ALGO"},
        2: {"type": "p", "string": "implements"},
    }
    ttl = [(1, 1, 0), (3, 3, 0), (1, 3, 1), (1, 3, 2)]
    ltl = [(0, 1, 0), (0, 1, 1), (1, 3, 0), (1, 3, 1),
           (2, 1, 0), (2, 1, 1)]
    tll = [(3, 2, 0), (3, 2, 1)]
    dec = usm_join_decode(ttl, ltl, tll, lm)
    assert dec["ents"] == [((1, 1), "SYS"), ((3, 3), "ALGO")]
    assert dec["relations"] == [((1, 1), "implements", (3, 3))]


def test_usm_join_decode_requires_all_five_links():
    """Dropping any leg of the conjunction kills the relation."""
    lm = {0: {"type": "p", "string": "rel"}}
    full_ttl = [(0, 0, 0), (2, 2, 0), (0, 2, 1), (0, 2, 2)]
    full_ltl = [(0, 0, 0), (0, 0, 1)]
    full_tll = [(2, 0, 0), (2, 0, 1)]
    ok = usm_join_decode(full_ttl, full_ltl, full_tll, lm)
    assert ok["relations"] == [((0, 0), "rel", (2, 2))]
    # no h2h -> no pair
    no_h2h = [x for x in full_ttl if x[2] != 1]
    assert usm_join_decode(no_h2h, full_ltl, full_tll, lm)["relations"] == []
    # no label->head-span -> no predicate attachment
    assert usm_join_decode(full_ttl, [], full_tll, lm)["relations"] == []
    # no tail-span->label -> no predicate attachment
    assert usm_join_decode(full_ttl, full_ltl, [], lm)["relations"] == []


def test_usm_decode_label_ambiguity_is_faithful():
    """Chained same-pred pairs (1->2, 2->3) plus a window pair (1, 3)
    with a DIFFERENT pred: the decoder's pair-agnostic label links
    also emit (1, predX, 3) — the reference semantics the SQL oracle
    replicates."""
    lm = {
        0: {"type": "p", "string": "X"},
        1: {"type": "p", "string": "W"},
    }
    ttl = [(1, 1, 0), (2, 2, 0), (3, 3, 0),
           (1, 2, 1), (1, 2, 2), (2, 3, 1), (2, 3, 2),
           (1, 3, 1), (1, 3, 2)]
    ltl = [(0, 1, 0), (0, 1, 1),    # X on head span (1,1)  [pair 1->2]
           (0, 2, 0), (0, 2, 1),    # X on head span (2,2)  [pair 2->3]
           (1, 1, 0), (1, 1, 1)]    # W on head span (1,1)  [pair 1->3]
    tll = [(2, 0, 0), (2, 0, 1),    # X on tail span (2,2)
           (3, 0, 0), (3, 0, 1),    # X on tail span (3,3)
           (3, 1, 0), (3, 1, 1)]    # W on tail span (3,3)
    rels = usm_join_decode(ttl, ltl, tll, lm)["relations"]
    assert ((1, 1), "X", (2, 2)) in rels
    assert ((2, 2), "X", (3, 3)) in rels
    assert ((1, 1), "W", (3, 3)) in rels
    assert ((1, 1), "X", (3, 3)) in rels  # the inherent ambiguity


def test_usm_stage_matches_pairwise_rule(ray_session):
    import ray.data as rd

    from rex_ray.stages.usm import usm_relations

    docs = pd.DataFrame(
        {"doc_id": [1], "text": ["spark join zz table"]}
    )
    out = usm_relations(rd.from_pandas(docs)).to_pandas()
    got = sorted(zip(out["head_pos"], out["pred"], out["tail_pos"]))
    # pairs: spark(0)->join(1) implements, spark(0)->table(3) stores,
    # join(1)->table(3) pred of (ALGO, OBJ)
    from rex_ray.pipelines import spec

    algo_obj = spec.PRED_MAP.get(("ALGO", "OBJ"), spec.PRED_FALLBACK)
    assert (0, "implements", 1) in got
    assert (0, "stores", 3) in got
    assert (1, algo_obj, 3) in got


# ---------------------------------------------------------------------------
# Event extraction on the USM decode base (spec.EVENT_TYPE_MAP /
# ROLE_MAP / EVENT_WINDOW; stages/usm.emit_event_links).
# ---------------------------------------------------------------------------


def _brute_events(tokens):
    """Closed-form recompute of the decoded event layer INCLUDING the
    five-way join's cross-pair label ambiguity — the same hp/tp
    semantics the SQL oracle renders."""
    from rex_ray.pipelines import spec

    mentions = [
        (p, spec.GAZETTEER[t])
        for p, t in enumerate(tokens)
        if t in spec.GAZETTEER
    ]
    triggers = [
        (p, spec.EVENT_TYPE_MAP[ty])
        for p, ty in mentions
        if ty in spec.EVENT_TYPE_MAP
    ]
    ea = set()
    for tp_, et in triggers:
        for ap, aty in mentions:
            if ap != tp_ and abs(ap - tp_) <= spec.EVENT_WINDOW:
                role = spec.ROLE_MAP.get((et, aty), spec.ROLE_FALLBACK)
                ea.add((tp_, et, role, ap))
    hp = {}
    tp = {}
    for t, _et, r, a in ea:
        hp.setdefault(t, set()).add(r)
        tp.setdefault(a, set()).add(r)
    dec = set()
    for t, et, _r, a in ea:
        for role in hp[t] & tp[a]:
            dec.add((et, t, role, a))
    ents = sorted((p, et) for p, et in triggers)
    return ents, sorted(dec)


def _decoded_events(tokens):
    from rex_ray.functions.usm import usm_join_decode
    from rex_ray.stages.usm import emit_event_links, usm_event_label_map

    lm = usm_event_label_map()
    ttl, ltl, tll = emit_event_links(tokens, lm)
    d = usm_join_decode(ttl, ltl, tll, lm)
    etype = {span[0]: ty for span, ty in d["ents"]}
    ents = sorted((span[0], ty) for span, ty in d["ents"])
    rels = sorted(
        (etype[hh], hh, role, ah)
        for (hh, _), role, (ah, _) in d["relations"]
    )
    return ents, rels


def test_event_decode_matches_brute_force_randomized():
    """emit_event_links -> usm_join_decode equals the hp/tp closed
    form on random gazetteer/noise token mixes."""
    import random

    from rex_ray.pipelines import spec

    rng = random.Random(7)
    vocab = list(spec.GAZETTEER) + ["zz", "qq", "pp"]
    for _ in range(40):
        tokens = [rng.choice(vocab) for _ in range(rng.randint(1, 14))]
        assert _decoded_events(tokens) == _brute_events(tokens), tokens


def test_event_decode_ambiguity_is_faithful():
    """A role that reaches a trigger through one argument and the
    argument through another trigger ALSO survives the five-way join:
    agg@2's ACTOR arg attaches 'participant' to agg, merge@5 attaches
    'participant' to join@3, so (agg, participant, join) joins up even
    though agg->join's rule role is 'method'."""
    tokens = ["zz", "customer", "agg", "join", "zz", "merge"]
    _ents, rels = _decoded_events(tokens)
    assert ("operation", 2, "method", 3) in rels      # the rule link
    assert ("operation", 2, "participant", 3) in rels  # ambiguity link
    assert _decoded_events(tokens) == _brute_events(tokens)


def test_event_stage_rows_and_argless_trigger(ray_session):
    """usm_events keeps argless triggers (zero counts) and its counts
    agree with usm_event_args."""
    import ray.data as rd

    from rex_ray.stages.usm import usm_event_args, usm_events

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": ["zz customer agg join zz merge", "agg"],
        }
    )
    args = usm_event_args(rd.from_pandas(docs)).to_pandas()
    evs = usm_events(rd.from_pandas(docs)).to_pandas()
    # doc 2: a lone trigger, no mentions in window -> one event row,
    # zero counts, and no arg rows
    lone = evs[evs["doc_id"] == 2]
    assert len(lone) == 1
    assert lone.iloc[0][["n_args", "n_roles", "n_links"]].tolist() == [0, 0, 0]
    assert (args["doc_id"] == 2).sum() == 0
    # doc 1: per-trigger counts recompute from the flat arg rows
    for _, ev in evs[evs["doc_id"] == 1].iterrows():
        sub = args[
            (args["doc_id"] == 1)
            & (args["trigger_pos"] == ev["trigger_pos"])
        ]
        assert ev["n_links"] == len(sub)
        assert ev["n_args"] == sub["arg_pos"].nunique()
        assert ev["n_roles"] == sub["role"].nunique()
        assert (sub["event_type"] == ev["event_type"]).all()


# ---------------------------------------------------------------------------
# Indexed-join decode vs literal cross-product reference
# ---------------------------------------------------------------------------


def _naive_join_decode(ttl, ltl, tll, label_map):
    """Literal cross-product transcription of the reference decode
    (usm.py:107-166) — the shape functions/usm.py had before the
    indexed-join rewrite.  Kept here as the semantic oracle: the
    production decode must produce the SAME deduped sets at any input."""
    h2t = [(x[0], x[1]) for x in ttl if x[2] == 0]
    h2t_set = set(h2t)
    hs = {x[0] for x in h2t}
    ts = {x[1] for x in h2t}
    h2h = [(x[0], x[1]) for x in ttl if x[2] == 1 and x[0] in hs and x[1] in hs]
    t2t = [(x[0], x[1]) for x in ttl if x[2] == 2 and x[0] in ts and x[1] in ts]
    pairs = [
        ((hh, ht), (th, tt))
        for hh, th in h2h
        for ht, tt in t2t
        if (hh, ht) in h2t_set and (th, tt) in h2t_set
    ]
    l2h = [(x[0], x[1]) for x in ltl if x[2] == 0 and x[0] in label_map and x[1] in hs]
    l2t = [(x[0], x[1]) for x in ltl if x[2] == 1 and x[0] in label_map and x[1] in ts]
    l2ht = [
        ((label_map[l1]["string"], label_map[l1]["type"], l1), (h, t))
        for l1, h in l2h
        for l2, t in l2t
        if l1 == l2 and (h, t) in h2t_set
    ]
    ls = {lb[0][2] for lb in l2ht}
    h2l = [(x[0], x[1]) for x in tll if x[2] == 0 and x[0] in hs and x[1] in ls]
    t2l = [(x[0], x[1]) for x in tll if x[2] == 1 and x[0] in ts and x[1] in ls]
    ht2l = [
        ((h, t), (label_map[l1]["string"], "p", l1))
        for h, l1 in h2l
        for t, l2 in t2l
        if l1 == l2 and (h, t) in h2t_set and label_map[l1]["type"] == "p"
    ]
    ents = sorted({(ent[1], ent[0][0]) for ent in l2ht if ent[0][1] == "m"})
    relations = set()
    for (hh, ht), (th, tt) in pairs:
        for l1, (h1, t1) in l2ht:
            if l1[1] == "p":
                for (h2, t2), l2 in ht2l:
                    if (hh, ht) == (h1, t1) and (th, tt) == (h2, t2) \
                            and l1[2] == l2[2]:
                        relations.add(((hh, ht), l1[0], (th, tt)))
    return {"ents": ents, "relations": sorted(relations)}


def test_usm_decode_matches_naive_reference_on_random_links():
    """Property: the indexed-join decode equals the literal
    cross-product reference on dense random link lists — including
    duplicate links, dangling positions, labels outside the map, and
    multi-token (h != t) spans that never arise from the emitters."""
    lm = {
        0: {"type": "m", "string": "T0"},
        1: {"type": "m", "string": "T1"},
        2: {"type": "p", "string": "P0"},
        3: {"type": "p", "string": "P1"},
    }
    rng = np.random.default_rng(7)
    for trial in range(60):
        n_pos, n_lab = 6, 6  # labels 4..5 are OUTSIDE the map
        def links(n, a_hi, b_hi, cls_hi):
            return [
                (int(rng.integers(a_hi)), int(rng.integers(b_hi)),
                 int(rng.integers(cls_hi)))
                for _ in range(n)
            ]
        ttl = links(int(rng.integers(0, 40)), n_pos, n_pos, 3)
        ltl = links(int(rng.integers(0, 30)), n_lab, n_pos, 2)
        tll = links(int(rng.integers(0, 30)), n_pos, n_lab, 2)
        got = usm_join_decode(ttl, ltl, tll, lm)
        want = _naive_join_decode(ttl, ltl, tll, lm)
        assert got == want, (trial, ttl, ltl, tll)
