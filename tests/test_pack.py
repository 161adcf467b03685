"""Ordered prefix-sum scan and sequence packing vs local cumsum."""

import numpy as np
import ray.data as rd

from rex_ray.stages.pack import ordered_prefix_sum, pack_sequences


def test_ordered_prefix_sum_int_keys_multibucket():
    rng = np.random.default_rng(3)
    n = 400
    vals = rng.integers(1, 50, size=n)
    rows = [
        {"doc_id": int(i), "n_tokens": int(v)}
        for i, v in zip(rng.permutation(n), vals)
    ]
    got = {
        r["doc_id"]: r["prefix"]
        for r in ordered_prefix_sum(
            rd.from_items(rows), "doc_id", "n_tokens", num_buckets=4
        ).take_all()
    }
    ordered = sorted(rows, key=lambda r: r["doc_id"])
    run = 0
    for r in ordered:
        assert got[r["doc_id"]] == run, r
        run += r["n_tokens"]


def test_ordered_prefix_sum_string_keys_single_bucket():
    rows = [
        {"doc_id": k, "n_tokens": v}
        for k, v in [("b", 5), ("a", 3), ("d", 7), ("c", 2)]
    ]
    got = {
        r["doc_id"]: r["prefix"]
        for r in ordered_prefix_sum(
            rd.from_items(rows), "doc_id", "n_tokens", num_buckets=8
        ).take_all()
    }
    assert got == {"a": 0, "b": 3, "c": 8, "d": 10}


def test_pack_sequences_bins_and_offsets():
    docs = [
        {"doc_id": 1, "text": "a b c"},          # 3 tokens, prefix 0
        {"doc_id": 2, "text": " ".join(["w"] * 6)},  # prefix 3
        {"doc_id": 3, "text": "x  y"},           # double space: 2 tokens
    ]
    out = {
        r["doc_id"]: r
        for r in pack_sequences(
            rd.from_items(docs), window=4, num_buckets=2
        ).take_all()
    }
    assert out[1]["prefix"] == 0 and out[1]["bin_id"] == 0
    assert out[2]["prefix"] == 3 and out[2]["bin_id"] == 0
    assert out[2]["bin_offset"] == 3          # straddles bins 0..2
    assert out[3]["prefix"] == 9 and out[3]["bin_id"] == 2
    assert out[3]["bin_offset"] == 1


def test_hash_split_deterministic_and_ratioed():
    from rex_ray.stages.relational import hash_split

    rows = [{"doc_id": i} for i in range(2000)]
    out = hash_split(rd.from_items(rows), id_col="doc_id").take_all()
    counts = {}
    for r in out:
        counts[r["split"]] = counts.get(r["split"], 0) + 1
    assert set(counts) == {"train", "val", "test"}
    assert abs(counts["train"] / 2000 - 0.8) < 0.05
    # stable across runs and block layouts: a re-split of any subset
    # agrees with the full-set assignment
    sub = hash_split(
        rd.from_items(rows[500:600]), id_col="doc_id"
    ).take_all()
    full = {r["doc_id"]: r["split"] for r in out}
    assert all(full[r["doc_id"]] == r["split"] for r in sub)
