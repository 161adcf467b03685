"""Similarity search over an embedding column (list<float>).

Baseline: brute-force cosine top-k — the query matrix is broadcast
once; every batch does ONE float64 matmul against it and emits its
local top-k per query (partial), then a single tiny groupby merges
partials into the global top-k.  No full-dataset materialization, no
O(n) rows through the shuffle — only k rows per (query, batch).

Scale path: IVF-style bucketing — k-means-ish centroid assignment
(deterministic hashed centroids here; plug a trained codebook in
production), shuffle only the probed buckets.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from rex_ray.functions.blocks import (
    arrow_block,
    default_concurrency,
    pre_shuffle,
)

_TOPK_PARTIAL_SCHEMA = pa.schema(
    [
        ("query_id", pa.int64()),
        ("neighbor_id", pa.int64()),
        ("sim", pa.float64()),
    ]
)


def _normalize(mat: np.ndarray) -> np.ndarray:
    return mat / np.linalg.norm(mat, axis=1, keepdims=True)


def _filter_ids(ds, id_col: str, ids: Sequence[int]):
    """Vectorized semi-filter: keep rows whose id is in the given set
    (pyarrow is_in kernel inside map_batches)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    value_set = pa.array(sorted(ids), type=pa.int64())
    return ds.map_batches(
        lambda t: t.filter(pc.is_in(t[id_col], value_set=value_set)),
        batch_format="pyarrow",
    )


def brute_force_topk(
    emb_ds,
    query_ids: Sequence[int],
    k: int = 5,
    id_col: str = "vec_id",
    query_ds=None,
):
    """Global top-k cosine neighbors for each query id.

    Output: (query_id, neighbor_id, rank) with rank 1..k, self
    excluded; ties broken by neighbor_id ascending (deterministic,
    matches the SQL oracle's ORDER BY sim DESC, neighbor_id ASC).
    ``query_ds`` defaults to ``emb_ds`` (query vectors looked up there).
    """
    qset = sorted(query_ids)
    qdf = (
        _filter_ids(query_ds if query_ds is not None else emb_ds, id_col, qset)
        .to_pandas()
        .sort_values(id_col)
    )
    Q = _normalize(np.stack(qdf["embedding"].to_numpy()).astype(np.float64))
    qids = qdf[id_col].to_numpy()
    ref = ray.put((qids, Q))

    class LocalTopK:
        def __init__(self):
            self.qids, self.Q = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            B = _normalize(
                np.stack(batch["embedding"].to_numpy()).astype(np.float64)
            )
            bids = batch[id_col].to_numpy()
            sims = self.Q @ B.T  # (q, b)
            rows = []
            for qi, qid in enumerate(self.qids):
                s = sims[qi]
                mask = bids != qid  # exclude self
                cand_ids = bids[mask]
                cand_s = s[mask]
                take = min(k, len(cand_ids))
                if take == 0:
                    continue
                # local top-k (ties -> smaller id), partial result
                order = np.lexsort((cand_ids, -cand_s))[:take]
                for j in order:
                    rows.append((int(qid), int(cand_ids[j]), float(cand_s[j])))
            return arrow_block(
                pd.DataFrame(
                    rows, columns=["query_id", "neighbor_id", "sim"]
                ),
                schema=_TOPK_PARTIAL_SCHEMA,
            )

    partial = emb_ds.map_batches(
        LocalTopK, batch_format="pandas", concurrency=default_concurrency()
    )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["sim", "neighbor_id"], ascending=[False, True]
        ).head(k)
        g = g.reset_index(drop=True)
        return arrow_block(
            pd.DataFrame(
                {
                    "query_id": g["query_id"],
                    "neighbor_id": g["neighbor_id"],
                    "rank": np.arange(1, len(g) + 1, dtype=np.int64),
                }
            )
        )

    return pre_shuffle(partial).groupby("query_id").map_groups(
        merge, batch_format="pandas"
    )


class IvfCentroidAssigner:
    """IVF bucketing: assign each vector to its nearest of C
    deterministic centroids (hashed unit vectors seeded by index).
    The bucket id becomes the shuffle key; queries probe only their
    nprobe nearest buckets.  This is the 100 TB path — search cost per
    query drops from O(n) to O(n * nprobe / C)."""

    def __init__(self, num_centroids: int = 64, dim: int = 64, seed: int = 13):
        rng = np.random.RandomState(seed)
        C = rng.standard_normal((num_centroids, dim))
        self.C = _normalize(C)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        B = _normalize(
            np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        )
        batch = batch.copy()
        batch["bucket"] = (B @ self.C.T).argmax(axis=1).astype("int64")
        return batch


def ivf_topk(
    emb_ds,
    query_ids: Sequence[int],
    k: int = 5,
    num_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
):
    """Approximate top-k: probe only the nprobe closest IVF buckets per
    query.  Recall < 1 by design; compared against brute force in
    tests, not against the SQL oracle."""
    assigner = IvfCentroidAssigner(num_centroids=num_centroids)
    bucketed = emb_ds.map_batches(
        IvfCentroidAssigner,
        fn_constructor_kwargs={"num_centroids": num_centroids},
        batch_format="pandas",
        concurrency=default_concurrency(),
    )
    qdf = (
        _filter_ids(emb_ds, id_col, sorted(query_ids))
        .to_pandas()
        .sort_values(id_col)
    )
    Q = _normalize(np.stack(qdf["embedding"].to_numpy()).astype(np.float64))
    probes = np.argsort(-(Q @ assigner.C.T), axis=1)[:, :nprobe]
    probe_buckets = sorted(set(probes.ravel().tolist()))
    pruned = _filter_ids(bucketed, "bucket", probe_buckets).drop_columns(
        ["bucket"]
    )
    return brute_force_topk(
        pruned, query_ids, k=k, id_col=id_col, query_ds=emb_ds
    )
