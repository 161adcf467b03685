"""Deduplication family: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale notes (each documented per stage): exact dedup and LSH bucketing
shuffle only small derived keys; the embedding near-dup is an exact
block-partitioned distributed self-join (bounded per-group memory, no
driver materialization); the sub-quadratic approximate path is IVF /
LSH bucketing in ``stages/similarity.py``.
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

SHINGLE_SEP = "\x1f"  # unit separator; never occurs in token text


class ShingleSketcher:
    """doc -> (doc_id, sh: string) distinct k-token shingles joined
    with :data:`SHINGLE_SEP` (Arrow's hash join rejects list-typed
    payload columns, so the sketch rides as one string).  The sketch
    side table is computed ONCE and joined to hot bucket rows only —
    the per-band shuffle never carries text."""

    def __init__(self, k: int = 3):
        self.k = k

    def __call__(self, batch: pd.DataFrame) -> pa.Table:
        norm = T.normalize_dedup_text(batch["text"])
        sh = [
            SHINGLE_SEP.join(sorted(H.token_shingles(t.split(" "), self.k)))
            for t in norm
        ]
        return pa.table(
            {
                "doc_id": pa.array(batch["doc_id"], type=pa.int64()),
                "sh": pa.array(sh, type=pa.string()),
            }
        )


class MinHashBander:
    """sketch rows -> SLIM LSH band rows (band_key, doc_id) — 16 bytes
    of key + id per band, constant regardless of document size (the
    round-1 version shipped norm_text x num_bands through the
    shuffle).  ``band_key`` folds (band_id, band_hash) into one int64;
    a key collision merely merges two buckets, adding candidates the
    exact-Jaccard verify rejects."""

    def __init__(self, num_perm: int = 64, num_bands: int = 16):
        self.mh = H.MinHasher(num_perm=num_perm)
        self.num_bands = num_bands

    def __call__(self, batch: pd.DataFrame) -> pa.Table:
        rows: List[tuple] = []
        for doc_id, sh in zip(batch["doc_id"], batch["sh"]):
            sig = self.mh.signature(set(sh.split(SHINGLE_SEP)))
            for band_id, band_hash in self.mh.bands(sig, self.num_bands):
                key = (band_hash ^ (band_id * 0x9E3779B97F4A7C15)) & (
                    (1 << 63) - 1
                )
                rows.append((key, doc_id))
        return arrow_block(
            pd.DataFrame(rows, columns=["band_key", "doc_id"]),
            schema=pa.schema(
                [("band_key", pa.int64()), ("doc_id", pa.int64())]
            ),
        )


def _hot_bucket_rows(bands_ds, key_col: str):
    """Band rows whose bucket holds >= 2 rows — the only ones that can
    emit a candidate pair.  Vectorized Arrow partial count + one tiny
    aggregate, then a SEMI-JOIN of the bands against the hot-key set —
    entirely dataset-to-dataset, nothing through the driver."""
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
    hot_keys = counts.filter(expr="n >= 2").drop_columns(["n"])
    from rex_ray.stages.relational import hash_join

    return hash_join(bands_ds, hot_keys, on=key_col, num_partitions=16)


def minhash_dup_pairs(docs_ds, threshold: float = 0.9, k: int = 3):
    """LSH candidate generation + exact-Jaccard verification.

    Dataflow (every exchange carries bounded rows):
      1. sketch side table (doc_id, shingles) — one pass over text;
      2. slim band rows (band_key, doc_id) from the sketches;
      3. hot buckets via counts + semi-join (no driver collect);
      4. sketches joined to HOT rows only, exact Jaccard verified
         inside each bucket group;
      5. global pair dedup (a pair can collide in several bands).
    Returns (doc_a, doc_b) with doc_a < doc_b.
    """
    from ray.data.aggregate import Count

    from rex_ray.stages.relational import hash_join

    # task-based: the hash family is tiny and ships with the task
    # (actor pools pay seconds of per-pipeline spin-up for no benefit)
    sketches = docs_ds.map_batches(
        ShingleSketcher(k=k), batch_format="pandas"
    ).materialize()  # consumed twice: band derivation + hot-row verify
    bands = sketches.map_batches(
        MinHashBander(), batch_format="pandas"
    ).materialize()  # consumed twice: bucket counts + semi-join probe

    # stage the (small) hot-row set between the two joins: chained
    # un-materialized join operators each reserve an actor pool and can
    # deadlock the streaming executor on small CPU counts
    hot = pre_shuffle(_hot_bucket_rows(bands, "band_key"))
    verif_in = hash_join(hot, sketches, on="doc_id", num_partitions=16)

    def bucket_pairs(g: pd.DataFrame) -> pa.Table:
        rows = []
        if len(g) > 1:
            docs = sorted(zip(g["doc_id"], g["sh"]), key=lambda x: x[0])
            shingles = {d: set(sh.split(SHINGLE_SEP)) for d, sh in docs}
            for (da, _), (db, _) in combinations(docs, 2):
                if H.jaccard(shingles[da], shingles[db]) >= threshold:
                    rows.append((da, db))
        return arrow_block(
            pd.DataFrame(rows, columns=["doc_a", "doc_b"]),
            schema=_PAIR_SCHEMA,
        )

    cand = pre_shuffle(verif_in).groupby("band_key").map_groups(
        bucket_pairs, batch_format="pandas"
    )
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

    # simhash band rows are self-contained (8-byte hash rides along) —
    # hot-bucket semi-join, then per-bucket hamming verify
    hot = _hot_bucket_rows(bands, "band_key")
    cand = pre_shuffle(hot).groupby("band_key").map_groups(
        bucket_pairs, batch_format="pandas"
    )
    return pre_shuffle(cand).groupby(["doc_a", "doc_b"]).aggregate(
        Count(alias_name="_nb")
    ).drop_columns(["_nb"])


# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------

def embedding_dup_pairs(
    emb_ds,
    threshold: float,
    id_col: str = "vec_id",
    chunk_rows: int = 65536,
):
    """Exact all pairs with cosine similarity >= threshold, distributed.

    Block-partitioned self-join (no driver materialization anywhere):

    1. vectors hash into ``P = ceil(n / chunk_rows)`` chunks by id;
    2. each vector fans out to the P chunk-PAIR groups its chunk
       participates in (one shuffle of n x P rows);
    3. each group (a, b) holds ONLY chunks a and b — bounded worker
       memory — and runs one float64 matmul: triangular within the
       diagonal group, full cross between distinct chunks.

    Every unordered vector pair lands in exactly ONE group (the group
    of its two chunks), so the output needs no global pair dedup and
    no second shuffle.  Compute is the inherent O(n^2) of exact
    all-pairs, spread over P*(P+1)/2 independent groups; for a
    sub-quadratic approximate path, bucket with
    ``similarity.IvfCentroidAssigner`` (or hyperplane LSH) first and
    verify inside buckets — recall < 1 by design there.
    """
    import math

    n = emb_ds.count()
    P = max(1, math.ceil(n / chunk_rows))

    def fanout(batch: pd.DataFrame) -> pa.Table:
        nb = len(batch)
        c = (batch[id_col].to_numpy() % P).astype(np.int64)
        rep = np.repeat(np.arange(nb), P)
        q = np.tile(np.arange(P, dtype=np.int64), nb)
        cr = c[rep]
        a = np.minimum(cr, q)
        b = np.maximum(cr, q)
        out = batch.iloc[rep].reset_index(drop=True)
        out["pair_key"] = a * P + b
        out["side"] = (cr != a).astype(np.int8)
        return arrow_block(out)

    pair_schema = pa.schema([("a_id", pa.int64()), ("b_id", pa.int64())])

    def pair_group(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0:
            return pair_schema.empty_table()
        key = int(g["pair_key"].iloc[0])
        a, b = key // P, key % P
        ga = g[g["side"] == 0].sort_values(id_col)
        A = np.stack(ga["embedding"].to_numpy()).astype(np.float64)
        A /= np.linalg.norm(A, axis=1, keepdims=True)
        aids = ga[id_col].to_numpy()
        if a == b:
            sims = A @ A.T
            i, j = np.nonzero(np.triu(sims >= threshold, k=1))
            out_a, out_b = aids[i], aids[j]  # aids sorted -> a < b
        else:
            gb = g[g["side"] == 1]
            if len(ga) == 0 or len(gb) == 0:
                return pair_schema.empty_table()
            B = np.stack(gb["embedding"].to_numpy()).astype(np.float64)
            B /= np.linalg.norm(B, axis=1, keepdims=True)
            bids = gb[id_col].to_numpy()
            sims = A @ B.T
            i, j = np.nonzero(sims >= threshold)
            x, y = aids[i], bids[j]
            out_a, out_b = np.minimum(x, y), np.maximum(x, y)
        return arrow_block(
            pd.DataFrame(
                {"a_id": out_a.astype(np.int64),
                 "b_id": out_b.astype(np.int64)}
            ),
            schema=pair_schema,
        )

    fanned = emb_ds.map_batches(fanout, batch_format="pandas")
    return pre_shuffle(fanned).groupby("pair_key").map_groups(
        pair_group, batch_format="pandas"
    )
