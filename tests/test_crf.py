"""CRF viterbi kernels (functions/crf) and the CRF NER stage
(stages/crf) — verified against brute-force path enumeration."""

import itertools

import numpy as np
import pandas as pd
import pytest

from rex_ray.functions import crf as crf_fn


def brute_force_best(em, length, trans, start_t, end_t):
    """Enumerate all T^length paths; return (best_path, best_score)."""
    T = em.shape[1]
    best, best_s = None, -np.inf
    for path in itertools.product(range(T), repeat=length):
        s = start_t[path[0]] + em[0, path[0]]
        for i in range(1, length):
            s += trans[path[i - 1], path[i]] + em[i, path[i]]
        s += end_t[path[-1]]
        if s > best_s:
            best, best_s = path, s
    return list(best), best_s


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_viterbi_matches_brute_force_variable_lengths(seed):
    rng = np.random.default_rng(seed)
    B, L, T = 5, 6, 4
    em = rng.normal(size=(B, L, T))
    trans = rng.normal(size=(T, T))
    start_t = rng.normal(size=T)
    end_t = rng.normal(size=T)
    lens = rng.integers(1, L + 1, size=B)
    mask = (np.arange(L)[None, :] < lens[:, None]).astype(np.int64)

    tags, scores = crf_fn.viterbi_decode_batch(em, mask, trans, start_t, end_t)
    for b in range(B):
        n = int(lens[b])
        bf_path, bf_score = brute_force_best(
            em[b, :n], n, trans, start_t, end_t
        )
        assert list(tags[b, :n]) == bf_path
        assert np.isclose(scores[b], bf_score)
        assert (tags[b, n:] == -1).all()


def test_viterbi_requires_first_step_on():
    with pytest.raises(ValueError, match="first timestep"):
        crf_fn.viterbi_decode_batch(
            np.zeros((1, 2, 2)),
            np.array([[0, 1]]),
            np.zeros((2, 2)),
            np.zeros(2),
            np.zeros(2),
        )


def _bio_labels():
    return ["O", "B-PER", "I-PER", "B-LOC", "I-LOC"]


def test_allowed_transitions_bio_rules():
    labels = dict(enumerate(_bio_labels()))
    allowed = set(crf_fn.allowed_transitions("BIO", labels))
    l2i = {v: k for k, v in labels.items()}
    # B-PER -> I-PER legal; O -> I-PER illegal; B-PER -> I-LOC illegal
    assert (l2i["B-PER"], l2i["I-PER"]) in allowed
    assert (l2i["O"], l2i["I-PER"]) not in allowed
    assert (l2i["B-PER"], l2i["I-LOC"]) not in allowed
    # START(5) -> O/B legal, START -> I illegal; I -> END(6) legal
    assert (5, l2i["O"]) in allowed and (5, l2i["B-LOC"]) in allowed
    assert (5, l2i["I-PER"]) not in allowed
    assert (l2i["I-LOC"], 6) in allowed


@pytest.mark.parametrize("mode", ["masked", "constrained"])
def test_masked_and_constrained_decode_never_emit_illegal(mode):
    """Emissions that bribe an illegal O -> I transition: the
    constrained decoders must refuse it, plain must take it."""
    labels = _bio_labels()
    T = len(labels)
    l2i = {l: i for i, l in enumerate(labels)}
    allowed = crf_fn.allowed_transitions("BIO", dict(enumerate(labels)))
    em = np.zeros((1, 3, T))
    em[0, 0, l2i["O"]] = 5.0
    em[0, 1, l2i["I-PER"]] = 5.0  # illegal after O
    em[0, 2, l2i["O"]] = 5.0
    mask = np.ones((1, 3), dtype=np.int64)
    trans = np.zeros((T, T))
    zt = np.zeros(T)

    plain_tags, _ = crf_fn.viterbi_decode_batch(em, mask, trans, zt, zt)
    assert plain_tags[0, 1] == l2i["I-PER"]

    if mode == "masked":
        tm, sm, em_mask = crf_fn.transition_mask(T, allowed)
        tags, _ = crf_fn.masked_decode(
            em, mask, trans, zt, zt, tm, sm, em_mask
        )
    else:
        tags, _ = crf_fn.constrained_decode(em, mask, trans, zt, zt, allowed)
    # decoded sequence contains no illegal BIO transition
    prev = None
    for t in tags[0]:
        lab = labels[t]
        if lab.startswith("I-"):
            assert prev is not None and prev[2:] == lab[2:] and (
                prev.startswith("B-") or prev.startswith("I-")
            )
        prev = lab
    assert tags[0, 1] != l2i["I-PER"]


def test_crf_tagger_merges_consecutive_same_type_mentions():
    from rex_ray.stages.crf import CrfNerTagger

    tagger = CrfNerTagger()
    batch = pd.DataFrame(
        {
            "doc_id": [1, 2],
            # 'join merge' = two consecutive ALGO tokens -> ONE span;
            # 'table' OBJ singleton; 'zz' is no mention
            "text": ["join merge zz table", "zz spark zz"],
        }
    )
    out = tagger(batch).to_pandas().sort_values(
        ["doc_id", "start_pos"]
    ).reset_index(drop=True)
    assert out.to_dict("records") == [
        {"doc_id": 1, "start_pos": 0, "end_pos": 2,
         "surface": "join merge", "ent_type": "ALGO"},
        {"doc_id": 1, "start_pos": 3, "end_pos": 4,
         "surface": "table", "ent_type": "OBJ"},
        {"doc_id": 2, "start_pos": 1, "end_pos": 2,
         "surface": "spark", "ent_type": "SYS"},
    ]


def test_crf_tagger_decode_modes_agree_on_closed_form_emissions():
    from rex_ray.stages.crf import CrfNerTagger

    batch = pd.DataFrame(
        {
            "doc_id": [1],
            "text": ["spark join join zz table row hash"],
        }
    )
    outs = []
    for mode in ("masked", "plain", "constrained"):
        t = CrfNerTagger(decode_mode=mode)
        outs.append(
            t(batch).to_pandas().sort_values("start_pos").reset_index(
                drop=True
            )
        )
    assert outs[0].equals(outs[1]) and outs[0].equals(outs[2])


def test_crf_tagger_truncates_at_max_seq_len():
    from rex_ray.stages.crf import CrfNerTagger

    # mention at position 70 is beyond the 64-token window -> dropped;
    # a run straddling the cap is cut at the cap
    toks = ["zz"] * 62 + ["join", "merge", "hash"] + ["zz"] * 4 + ["table"]
    batch = pd.DataFrame({"doc_id": [9], "text": [" ".join(toks)]})
    out = CrfNerTagger()(batch).to_pandas()
    assert out.to_dict("records") == [
        {"doc_id": 9, "start_pos": 62, "end_pos": 64,
         "surface": "join merge", "ent_type": "ALGO"}
    ]
