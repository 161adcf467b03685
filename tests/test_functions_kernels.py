"""Kernel library unit tests.

Golden vectors are taken from the reference's own test suite
(/root/reference/tests/utils/*, tests/metrics/*) so the re-derived
kernels provably match reference behavior.
"""

import numpy as np
import pytest

from rex_ray.functions import (
    construct_piecewise_mask,
    construct_relative_positions,
    count_illegal_tags,
    find_all_positions,
    find_closest_span_pairs,
    find_closest_span_pairs_with_index,
    find_element_in_list,
    extract_spans_from_start_end,
    get_entities_from_tags,
    measure_triples,
    prf1_from_counts,
    safe_division,
    sent_seg,
    split_list_by_element,
)
from rex_ray.functions.collections import (
    flatten_all_iter,
    get_dict_content,
    flatten_dict,
    windowed_queue_iter,
)
from rex_ray.functions.mask import piecewise_mask_batch
from rex_ray.functions.metrics import merge_counts, triple_counts
from rex_ray.functions.padding import pad_batch, pad_or_truncate


# ---- span pairing (vectors: reference tests/utils/test_span.py) ----

def test_span_pairs_common():
    head = [1, 0, 0, 1, 0, 0, 1]
    tail = [0, 1, 0, 1, 0, 1, 1]
    assert find_closest_span_pairs(head, tail, backtrace=False) == [
        (0, 1), (3, 3), (6, 6),
    ]
    assert find_closest_span_pairs(head, tail, backtrace=True) == [
        (0, 1), (3, 3), (6, 6), (3, 5),
    ]


def test_span_pairs_multihead():
    head = [1, 0, 1, 1, 0, 0, 1]
    tail = [0, 1, 0, 1, 0, 1, 1]
    assert find_closest_span_pairs(head, tail, backtrace=True) == [
        (0, 1), (2, 3), (3, 3), (6, 6), (3, 5),
    ]


def test_span_pairs_with_index():
    heads = [[1, 0, 0, 1, 0, 0, 1], [1, 0, 0, 1, 0, 0, 1]]
    tails = [[0, 1, 0, 1, 0, 1, 1], [0, 1, 0, 0, 0, 1, 0]]
    assert find_closest_span_pairs_with_index(heads, tails, backtrace=False) == [
        (0, 0, 1), (0, 3, 3), (0, 6, 6), (1, 0, 1), (1, 3, 5),
    ]
    assert find_closest_span_pairs_with_index(heads, tails, backtrace=True) == [
        (0, 0, 1), (0, 3, 3), (0, 6, 6), (0, 3, 5), (1, 0, 1), (1, 3, 5),
    ]


# ---- positions (vectors: reference tests/utils/test_position.py) ----

def test_find_all_positions():
    assert find_all_positions("123123123", "123") == [(0, 3), (3, 6), (6, 9)]
    assert find_all_positions(["123", "1234", "12345"], ["123"]) == [(0, 1)]


def test_find_all_positions_errors():
    with pytest.raises(ValueError):
        find_all_positions(list("123456"), list("1234567"))
    with pytest.raises(TypeError):
        find_all_positions("123456", 1234)


def test_relative_positions():
    assert construct_relative_positions(2, 5) == [2, 1, 0, 1, 2]
    with pytest.raises(ValueError):
        construct_relative_positions(81, 80)


def test_find_element_in_list():
    assert find_element_in_list([1, 2, 3, 1, 5], 1) == [0, 3]


def test_start_end_decode():
    assert extract_spans_from_start_end([0, 1, 0, 1, 0], [0, 0, 1, 0, 1]) == [
        (1, 2), (3, 4),
    ]


# ---- piecewise mask (vectors: reference tests/utils/test_mask.py) ----

def test_piecewise_mask():
    assert construct_piecewise_mask(2, 7, 10, 15) == [
        1, 1, 2, 2, 2, 2, 2, 3, 3, 3, 0, 0, 0, 0, 0,
    ]
    assert construct_piecewise_mask(0, 7, 10, 15) == [
        2, 2, 2, 2, 2, 2, 2, 3, 3, 3, 0, 0, 0, 0, 0,
    ]
    assert construct_piecewise_mask(7, 1, 10, 15) == [
        1, 2, 2, 2, 2, 2, 2, 3, 3, 3, 0, 0, 0, 0, 0,
    ]
    with pytest.raises(AssertionError):
        construct_piecewise_mask(-1, 0, 0, 0)
    with pytest.raises(AssertionError):
        construct_piecewise_mask(0, -1, 0, 0)


def test_piecewise_mask_batch_matches_scalar():
    rng = np.random.RandomState(0)
    seq_len = rng.randint(1, 30, size=50)
    head = np.array([rng.randint(0, s) for s in seq_len])
    tail = np.array([rng.randint(0, s) for s in seq_len])
    batch = piecewise_mask_batch(head, tail, seq_len, 32)
    for i in range(50):
        assert batch[i].tolist() == construct_piecewise_mask(
            int(head[i]), int(tail[i]), int(seq_len[i]), 32
        )


# ---- tagging decode (behavior per reference rex/utils/tagging.py) ----

def test_bio_decode():
    chars = list("aabbcc")
    tags = ["B-X", "I-X", "O", "B-Y", "I-Y", "I-Y"]
    assert get_entities_from_tags(chars, tags) == [
        ("aa", "X", (0, 2)),
        ("bcc", "Y", (3, 6)),
    ]


def test_bmes_decode():
    chars = list("abcde")
    tags = ["B-X", "M-X", "E-X", "S-Y", "O"]
    assert get_entities_from_tags(chars, tags) == [
        ("abc", "X", (0, 3)),
        ("d", "Y", (3, 4)),
    ]


def test_decode_illegal_transition_early_stop():
    chars = list("abcd")
    tags = ["B-X", "I-Y", "I-X", "O"]
    # I-Y after B-X closes "a"; I-X with no open entity emits nothing
    assert get_entities_from_tags(chars, tags) == [("a", "X", (0, 1))]


def test_decode_trailing_entity():
    chars = list("ab")
    tags = ["B-X", "I-X"]
    assert get_entities_from_tags(chars, tags) == [("ab", "X", (0, 2))]


def test_decode_len_mismatch_truncates():
    assert get_entities_from_tags(list("abc"), ["B-X"]) == [("a", "X", (0, 1))]


def test_decode_untyped_tags():
    assert get_entities_from_tags(list("ab"), ["B", "I"]) == [
        ("ab", "default", (0, 2))
    ]


def test_illegal_tag_count():
    assert count_illegal_tags(["O", "I-X", "B-X", "I-X", "E-X", "S-X"]) == 1
    assert count_illegal_tags(["B-X", "I-Y"]) == 1
    assert count_illegal_tags(["B-X", "M-X", "S-X"]) == 1
    assert count_illegal_tags(["B-X", "I-X", "O"]) == 0


# ---- metrics (vectors: reference tests/metrics/test_prf1.py) ----

def test_prf1():
    r = prf1_from_counts(1, 1, 1)
    assert (r["p"], r["r"], r["f1"]) == (0.5, 0.5, 0.5)
    r = prf1_from_counts(0, 0, 0)
    assert (r["p"], r["r"], r["f1"]) == (0.0, 0.0, 0.0)
    assert safe_division(1, 0) == 0.0


def test_measure_triples():
    preds = [[("a", "r1", "b"), ("a", "r2", "c")]]
    golds = [[("a", "r1", "b"), ("x", "r2", "c")]]
    m = measure_triples(preds, golds)
    assert m["triple"]["tp"] == 1 and m["triple"]["fp"] == 1 and m["triple"]["fn"] == 1
    assert m["relation"]["tp"] == 2  # r1 and r2 both present on each side
    assert m["subject"]["tp"] == 1 and m["subject"]["fp"] == 0  # {a} vs {a,x}
    assert m["object"]["tp"] == 2


def test_triple_counts_mergeable():
    preds = [[("a", "r", "b")], [("c", "r", "d")]]
    golds = [[("a", "r", "b")], [("c", "r", "e")]]
    whole = triple_counts(preds, golds)
    merged = merge_counts(
        triple_counts(preds[:1], golds[:1]), triple_counts(preds[1:], golds[1:])
    )
    assert whole == merged


# ---- segmentation / collections (reference tests/utils/...) ----

def test_sent_seg_en():
    assert sent_seg("Hello world. How are you?", lang="en") == [
        "Hello world.", "How are you?",
    ]


def test_split_list_by_element():
    assert split_list_by_element([1, 0, 2, 0], 0) == [[1], [2]]
    assert split_list_by_element([1, 2], 0) == [[1, 2]]
    assert split_list_by_element([0, 1], 0, keep_empty_segments=True) == [[], [1]]


def test_flatten_all():
    assert list(flatten_all_iter([1, 3, [3, 4, [5, 6]], [7, 8]])) == [
        1, 3, 3, 4, 5, 6, 7, 8,
    ]


def test_windowed_queue():
    q = [1, 2, 3, 4, 5]
    assert list(windowed_queue_iter(q, 2)) == [[1, 2], [3, 4], [5]]
    assert list(windowed_queue_iter(q, 2, 1, drop_last=True)) == [
        [1, 2], [2, 3], [3, 4], [4, 5],
    ]
    assert list(windowed_queue_iter(q, 2, 1, drop_last=False)) == [
        [1, 2], [2, 3], [3, 4], [4, 5], [5],
    ]


def test_dict_utils():
    assert get_dict_content({"a": {"b": 1}}, "a.b") == 1
    assert flatten_dict({"a": {"b": 1}, "c": 2}) == {"a.b": 1, "c": 2}


def test_padding():
    ids, mask = pad_or_truncate([1, 2, 3], 5)
    assert ids == [1, 2, 3, 0, 0] and mask == [1, 1, 1, 0, 0]
    ids, mask = pad_or_truncate([1, 2, 3], 2)
    assert ids == [1, 2] and mask == [1, 1]
    m_ids, m_mask = pad_batch([[1, 2, 3], [4]], 3)
    assert m_ids.tolist() == [[1, 2, 3], [4, 0, 0]]
    assert m_mask.tolist() == [[1, 1, 1], [1, 0, 0]]


def test_vectorized_hash_paths_bit_identical():
    """Batch FNV / MinHash / SimHash kernels must equal their scalar
    forms bit-for-bit (bucketing consistency across workers depends on
    it)."""
    import numpy as np

    from rex_ray.functions import hashing as H

    def fnv1a64(s):
        h = 0xCBF29CE484222325
        for b in s.encode("utf-8"):
            h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
        return h

    vals = ["", "a", "hello world", "x" * 300, "ünïcode"]
    assert [int(x) for x in H._stable_hash64_batch(vals)] == [
        fnv1a64(v) for v in vals
    ]

    rng = np.random.RandomState(0)
    docs = [
        sorted(H.token_shingles([f"w{rng.randint(99)}" for _ in range(30)], 3))
        for _ in range(20)
    ] + [[]]
    mh = H.MinHasher()
    sigs = mh.signatures(docs)
    bm = mh.band_matrix(sigs, 16)
    for i, d in enumerate(docs):
        assert (sigs[i] == mh.signature(set(d))).all()
        assert [int(x) for x in bm[i]] == [bh for _, bh in mh.bands(sigs[i], 16)]
        assert int(H.simhash64_batch([d])[0]) == H.simhash64(d)
