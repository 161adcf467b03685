"""Distributed ordered prefix-sum (scan) and sequence packing.

Training-data pipelines concatenate documents in a canonical order and
chunk the token stream into fixed context windows ("sequence packing").
The primitive underneath is an exclusive prefix sum over an ordered
key — a classic two-level scan, here expressed as Ray Data dataflow:

1. range-bucketize the order key against split points taken from a
   deterministic md5-sampled subset (boundaries affect only balance,
   never correctness);
2. per-bucket totals via per-batch partial sums + one tiny groupby;
3. exclusive cumsum of the O(num_buckets) bucket totals on the driver
   (bounded by construction), broadcast back;
4. in-bucket exact prefix via ``groupby(bucket).map_groups`` (sort the
   bucket by key, cumsum, add the bucket's global offset).

All integers end-to-end, so the result hash-matches a SQL window
``SUM(...) OVER (ORDER BY key ROWS UNBOUNDED PRECEDING)`` oracle
exactly.  Scale note: ``num_buckets`` bounds in-bucket group size at
~n/num_buckets rows — size it to data/cluster (buckets are the scan's
parallelism); the driver only ever holds the sampled split points and
the bucket totals.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from rex_ray.functions.blocks import arrow_block, pre_shuffle


def _sampled_boundaries(ds, order_col: str, num_buckets: int,
                        per_batch: int = 32) -> list:
    """Deterministic split points: each batch contributes its
    ``per_batch`` keys with the smallest md5 (an order-independent
    pseudo-random sample), the driver sorts the O(per_batch x batches)
    pool and takes equispaced points — the same size class as Spark's
    RangePartitioner sketch (~20 keys per partition).  Boundaries only
    affect bucket BALANCE; the prefix sum is exact for any boundaries.
    Falls back to a single bucket for tiny inputs."""
    def sample(t: pa.Table) -> pa.Table:
        vals = t[order_col].to_pylist()  # native type: int or str keys
        ranked = sorted(
            vals, key=lambda v: hashlib.md5(str(v).encode()).hexdigest()
        )[:per_batch]
        return pa.table(
            {order_col: pa.array(ranked, t.schema.field(order_col).type)}
        )

    sampled = sorted(
        r[order_col]
        for r in ds.map_batches(sample, batch_format="pyarrow").take_all()
    )
    if len(sampled) < num_buckets:
        return []
    step = len(sampled) / num_buckets
    return [sampled[int(i * step)] for i in range(1, num_buckets)]


def ordered_prefix_sum(ds, order_col: str, value_col: str,
                       num_buckets: int = 32):
    """Exclusive prefix sum of ``value_col`` over rows ordered by
    ``order_col`` (string key, byte-lexicographic — matches SQL ``ORDER
    BY`` on ASCII keys).  Returns the input columns plus ``prefix``.
    ``order_col`` values must be unique (they are doc ids)."""
    from ray.data.aggregate import Sum

    import ray

    bounds = _sampled_boundaries(ds, order_col, num_buckets)
    bounds_arr = np.asarray(bounds)  # native dtype: int64 or unicode
    bounds_ref = ray.put(bounds_arr)

    def assign(t: pa.Table, _ref=bounds_ref) -> pa.Table:
        b = ray.get(_ref) if hasattr(_ref, "hex") else _ref
        keys = np.asarray(t[order_col].to_pylist())
        bucket = (
            np.searchsorted(b, keys, side="right")
            if len(b)
            else np.zeros(len(keys), dtype=np.int64)
        )
        return t.append_column("_bucket", pa.array(bucket, pa.int64()))

    # materialized: both the totals pass and the in-bucket groupby read
    # it, and callers project to narrow columns first (pack_sequences
    # passes only (doc_id, n_tokens)) — so this stages the scan input
    # once instead of recomputing the upstream per consumer.
    with_bucket = ds.map_batches(assign, batch_format="pyarrow").materialize()

    def totals(t: pa.Table) -> pa.Table:
        return (
            pa.table({"_bucket": t["_bucket"], "_v": t[value_col]})
            .group_by("_bucket")
            .aggregate([("_v", "sum")])
            .rename_columns(["_bucket", "_v"])
        )

    per_bucket = (
        pre_shuffle(with_bucket.map_batches(totals, batch_format="pyarrow"))
        .groupby("_bucket")
        .aggregate(Sum("_v", alias_name="_v"))
        .take_all()  # O(num_buckets) rows — bounded by construction
    )
    per_bucket.sort(key=lambda r: r["_bucket"])
    offsets, run = {}, 0
    for r in per_bucket:
        offsets[r["_bucket"]] = run
        run += r["_v"]
    off_ref = ray.put(offsets)

    def in_bucket(g: pd.DataFrame, _ref=off_ref) -> pa.Table:
        offs = ray.get(_ref) if hasattr(_ref, "hex") else _ref
        g = g.sort_values(order_col, kind="mergesort", ignore_index=True)
        base = offs[int(g["_bucket"].iloc[0])]
        vals = g[value_col].to_numpy()
        g = g.drop(columns=["_bucket"])
        g["prefix"] = base + np.cumsum(vals) - vals  # exclusive
        return arrow_block(g)

    return with_bucket.groupby("_bucket").map_groups(
        in_bucket, batch_format="pandas"
    )


def pack_sequences(docs_ds, window: int = 2048, num_buckets: int = 32):
    """Greedy stream packing: concatenate documents in doc_id order and
    chunk the token stream into fixed ``window``-token bins (documents
    may straddle a boundary — the GPT-style "concat then chunk" layout,
    not first-fit).  Input: (doc_id, text).  Output per doc: doc_id,
    n_tokens, prefix (exclusive global token offset), bin_id, and
    bin_offset of the doc's first token."""
    def count(t: pa.Table) -> pa.Table:
        n = [
            sum(1 for w in (s or "").split(" ") if w)
            for s in t["text"].to_pylist()
        ]
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": pa.array(n, pa.int64()),
            }
        )

    counted = docs_ds.map_batches(count, batch_format="pyarrow")
    scanned = ordered_prefix_sum(
        counted, order_col="doc_id", value_col="n_tokens",
        num_buckets=num_buckets,
    )

    def finish(t: pa.Table) -> pa.Table:
        prefix = t["prefix"].to_numpy(zero_copy_only=False)
        return (
            t.append_column(
                "bin_id", pa.array(prefix // window, pa.int64())
            ).append_column(
                "bin_offset", pa.array(prefix % window, pa.int64())
            )
        )

    return scanned.map_batches(finish, batch_format="pyarrow")
