"""Deduplication family: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale notes (each documented per stage): exact dedup and LSH bucketing
shuffle only small derived keys; the embedding near-dup broadcasts the
normalized matrix (fine to ~10^6 rows; beyond that switch to the
LSH-bucketed variant in ``stages/similarity.py``).
"""

from __future__ import annotations

from itertools import combinations
from typing import List

import numpy as np
import pandas as pd

from rex_ray.functions import hashing as H
from rex_ray.functions import text as T
from rex_ray.functions.blocks import (
    arrow_block,
    default_concurrency,
    pre_shuffle,
)

import pyarrow as pa

_PAIR_SCHEMA = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64())])


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup_groups(docs_ds):
    """Group docs by normalized content; emit (survivor_doc_id = min id,
    group_size).  The shuffle key is the normalized text itself (at
    scale: its md5, same semantics, fixed-width key); partial per-batch
    min/count keeps the exchange small."""
    from ray.data.aggregate import Min, Sum

    def combine(batch: pd.DataFrame) -> pd.DataFrame:
        key = T.normalize_dedup_text(batch["text"])
        g = (
            pd.DataFrame({"k": key, "doc_id": batch["doc_id"]})
            .groupby("k", sort=False)
            .agg(survivor_doc_id=("doc_id", "min"), group_size=("doc_id", "size"))
        )
        g["group_size"] = g["group_size"].astype("int64")
        return arrow_block(g.reset_index())  # Arrow into the shuffle

    partial = pre_shuffle(docs_ds.map_batches(combine, batch_format="pandas"))
    merged = partial.groupby("k").aggregate(
        Min("survivor_doc_id", alias_name="survivor_doc_id"),
        Sum("group_size", alias_name="group_size"),
    )
    return merged.drop_columns(["k"])


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup
# ---------------------------------------------------------------------------

class MinHashBander:
    """doc -> LSH band rows (band_key, doc_id, norm_text).

    Hash family built once per actor.  ``band_key`` folds
    (band_id, band_hash) into one int64 — a key collision merely
    merges two buckets, adding candidates that the exact-Jaccard
    verify rejects, so correctness is unaffected.  norm_text rides
    along so the verify step can compute exact Jaccard inside the
    bucket group without a second join (at 10^12-doc scale, replace
    with a doc_id -> shingle-sketch side table join to avoid
    duplicating text x num_bands through the shuffle)."""

    def __init__(self, num_perm: int = 64, num_bands: int = 16, k: int = 3):
        self.mh = H.MinHasher(num_perm=num_perm)
        self.num_bands = num_bands
        self.k = k

    def __call__(self, batch: pd.DataFrame) -> pa.Table:
        norm = T.normalize_dedup_text(batch["text"])
        rows: List[tuple] = []
        for doc_id, nt in zip(batch["doc_id"], norm):
            sig = self.mh.signature(H.token_shingles(nt.split(" "), self.k))
            for band_id, band_hash in self.mh.bands(sig, self.num_bands):
                key = (band_hash ^ (band_id * 0x9E3779B97F4A7C15)) & (
                    (1 << 63) - 1
                )
                rows.append((key, doc_id, nt))
        return arrow_block(
            pd.DataFrame(rows, columns=["band_key", "doc_id", "norm_text"])
        )


def _hot_buckets(bands_ds, key_col: str):
    """Keys of buckets holding >= 2 rows — the only ones that can emit
    a candidate pair.  Counted with a vectorized Arrow partial + one
    tiny aggregate; the hot-key list is driver-collected (collisions
    are rare by construction — at extreme scale swap the collect for a
    broadcast filter built from the counts dataset)."""
    from ray.data.aggregate import Sum

    partial = bands_ds.map_batches(
        lambda t: t.select([key_col])
        .group_by(key_col)
        .aggregate([(key_col, "count")])
        .rename_columns([key_col, "n"]),
        batch_format="pyarrow",
    )
    counts = pre_shuffle(partial).groupby(key_col).aggregate(
        Sum("n", alias_name="n")
    )
    hot = counts.filter(expr="n >= 2")
    return [r[key_col] for r in hot.take_all()]


def _bucket_pairs_ds(bands_ds, key_col: str, bucket_pairs):
    """Filter to hot buckets, then per-bucket pair generation.  The
    map_groups only ever sees colliding buckets — per-group overhead
    is paid on the (tiny) candidate set, not on every band row."""
    import pyarrow as _pa
    import pyarrow.compute as pc

    hot = _hot_buckets(bands_ds, key_col)
    if not hot:
        return bands_ds.map_batches(
            lambda t: _PAIR_SCHEMA.empty_table(), batch_format="pyarrow"
        )
    value_set = _pa.array(sorted(hot), type=_pa.int64())
    hot_rows = bands_ds.map_batches(
        lambda t: t.filter(pc.is_in(t[key_col], value_set=value_set)),
        batch_format="pyarrow",
    )
    return pre_shuffle(hot_rows).groupby(key_col).map_groups(
        bucket_pairs, batch_format="pandas"
    )


def minhash_dup_pairs(docs_ds, threshold: float = 0.9, k: int = 3):
    """LSH candidate generation + exact-Jaccard verification.

    groupby (band_id, band_hash) buckets co-banded docs; within each
    bucket every pair is verified with exact k-shingle Jaccard >=
    threshold; pairs are then globally deduped (a pair can collide in
    several bands).  Returns (doc_a, doc_b) with doc_a < doc_b.
    """
    from ray.data.aggregate import Count

    # task-based: the hash family is tiny and ships with the task
    # (actor pools pay seconds of per-pipeline spin-up for no benefit)
    bands = docs_ds.map_batches(
        MinHashBander(k=k), batch_format="pandas"
    ).materialize()  # consumed twice: bucket counts + hot-bucket rows

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        if len(g) > 1:
            docs = list(zip(g["doc_id"], g["norm_text"]))
            docs.sort(key=lambda x: x[0])
            shingles = {
                d: H.token_shingles(t.split(" "), k) for d, t in docs
            }
            for (da, ta), (db, tb) in combinations(docs, 2):
                if H.jaccard(shingles[da], shingles[db]) >= threshold:
                    rows.append((da, db))
        return arrow_block(
            pd.DataFrame(rows, columns=["doc_a", "doc_b"]),
            schema=_PAIR_SCHEMA,
        )

    cand = _bucket_pairs_ds(bands, "band_key", bucket_pairs)
    # global pair dedup (a pair may surface from several bands)
    return pre_shuffle(cand).groupby(["doc_a", "doc_b"]).aggregate(
        Count(alias_name="_nb")
    ).drop_columns(["_nb"])


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

class SimHasher:
    """doc -> 64-bit SimHash (hex) of its normalized tokens."""

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        norm = T.normalize_dedup_text(batch["text"])
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "simhash": [
                    f"{H.simhash64(t.split(' ')):016x}" for t in norm
                ],
            }
        )


def simhash_table(docs_ds):
    return docs_ds.map_batches(SimHasher(), batch_format="pandas")


def simhash_dup_pairs(docs_ds, max_hamming: int = 3):
    """SimHash near-dup: bucket by each of 4 16-bit chunks (a pair
    within hamming distance 3 of 64 bits shares at least one exact
    16-bit chunk — pigeonhole), verify hamming inside buckets."""
    from ray.data.aggregate import Count

    def band_rows(batch: pd.DataFrame):
        norm = T.normalize_dedup_text(batch["text"])
        rows = []
        for doc_id, t in zip(batch["doc_id"], norm):
            sh = H.simhash64(t.split(" "))
            for c in range(4):
                # exact composite key: chunk_id in the high bits
                key = (c << 16) | ((sh >> (16 * c)) & 0xFFFF)
                rows.append((key, doc_id, sh))
        return arrow_block(
            pd.DataFrame(rows, columns=["band_key", "doc_id", "simhash"])
        )

    bands = docs_ds.map_batches(band_rows, batch_format="pandas").materialize()

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        if len(g) > 1:
            docs = sorted(zip(g["doc_id"], g["simhash"]))
            for (da, ha), (db, hb) in combinations(docs, 2):
                if da != db and H.hamming64(int(ha), int(hb)) <= max_hamming:
                    rows.append((da, db))
        return arrow_block(
            pd.DataFrame(rows, columns=["doc_a", "doc_b"]),
            schema=_PAIR_SCHEMA,
        )

    cand = _bucket_pairs_ds(bands, "band_key", bucket_pairs)
    return pre_shuffle(cand).groupby(["doc_a", "doc_b"]).aggregate(
        Count(alias_name="_nb")
    ).drop_columns(["_nb"])


# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------

def embedding_dup_pairs(emb_ds, threshold: float, id_col: str = "vec_id"):
    """All pairs with cosine similarity >= threshold.

    Block-nested loop: the full L2-normalized matrix is broadcast once
    (``ray.put``); each batch multiplies against it (float64 matmul).
    O(n^2/batch) compute but NO shuffle; right-sized up to ~10^6 rows.
    Beyond that use LSH/IVF bucketing (stages/similarity.py) to bound
    the candidate set."""
    import ray

    full = emb_ds.to_pandas()
    ids = full[id_col].to_numpy()
    M = np.stack(full["embedding"].to_numpy()).astype(np.float64)
    M /= np.linalg.norm(M, axis=1, keepdims=True)
    ref = ray.put((ids, M))

    class PairFinder:
        def __init__(self):
            self.ids, self.M = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            bids = batch[id_col].to_numpy()
            B = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
            B /= np.linalg.norm(B, axis=1, keepdims=True)
            sims = B @ self.M.T
            bi, mj = np.nonzero(sims >= threshold)
            a = bids[bi]
            b = self.ids[mj]
            keep = a < b  # dedupe + drop self
            return pd.DataFrame({"a_id": a[keep], "b_id": b[keep]})

    return emb_ds.map_batches(
        PairFinder, batch_format="pandas", concurrency=default_concurrency()
    )
