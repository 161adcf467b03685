"""Distributed EXACT per-group quantiles via histogram drill-down
selection — the multi-pass alternative to approximate sketches
(GK / t-digest) when the answer must be an actual data element.

Three bounded passes, no per-group gather of raw values:

1. per-group (count, min, max) — partial-agg, O(groups) result;
2. per-group fixed-width histogram (``n_bins`` bins over [min, max]) —
   partial per-batch ``np.bincount``, O(groups x n_bins) result; the
   cumulative histogram locates, for each requested quantile p, the
   single bin containing the k-th smallest value (k = ceil(p*n)) and
   the count of values below it;
3. one filtered pass keeps ONLY rows falling in a selected bin
   (expected n / n_bins rows per group) and picks the (k - below)-th
   smallest inside each bin with ``np.partition``.

The two driver-visible intermediates are bounded by construction
(O(groups) and O(groups x n_bins)) — unlike data-dependent hot-key
lists, they cannot grow with the input.  Pathological skew (one bin
holding far more than n / n_bins values, e.g. a constant column) only
inflates pass 3's per-group slice; recurse the drill-down inside the
bin if that ever matters.
"""

from __future__ import annotations

import math
from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

from rex_ray.functions.blocks import arrow_block, pre_shuffle


def grouped_exact_quantiles(
    ds,
    group_col: str,
    value_col: str,
    ps: Sequence[float] = (0.5, 0.9, 0.99),
    n_bins: int = 2048,
):
    """-> (group, p, q) with q = the exact ceil(p*n)-th smallest
    ``value_col`` of the group (an actual element, matching
    ``row_number() OVER (ORDER BY value) = ceil(p*n)`` in SQL)."""
    from ray.data.aggregate import Sum

    slim = ds.select_columns([group_col, value_col])

    # ---- pass 1: per-group count / min / max --------------------------
    def stats_partial(t: pa.Table) -> pa.Table:
        return (
            t.group_by(group_col)
            .aggregate(
                [(value_col, "count"), (value_col, "min"), (value_col, "max")]
            )
            .rename_columns([group_col, "n", "lo", "hi"])
        )

    from ray.data.aggregate import Max, Min

    stats = (
        pre_shuffle(slim.map_batches(stats_partial, batch_format="pyarrow"))
        .groupby(group_col)
        .aggregate(
            Sum("n", alias_name="n"),
            Min("lo", alias_name="lo"),
            Max("hi", alias_name="hi"),
        )
        .take_all()
    )  # O(groups) rows — bounded by construction
    info = {
        r[group_col]: (int(r["n"]), float(r["lo"]), float(r["hi"]))
        for r in stats
    }

    def bin_of(vals: np.ndarray, lo: float, hi: float) -> np.ndarray:
        if hi <= lo:
            return np.zeros(len(vals), dtype=np.int64)
        b = ((vals - lo) / (hi - lo) * n_bins).astype(np.int64)
        return np.clip(b, 0, n_bins - 1)

    # ---- pass 2: per-group histogram ---------------------------------
    def hist_partial(df: pd.DataFrame) -> pa.Table:
        parts = []
        for g, sub in df.groupby(group_col, sort=False):
            n, lo, hi = info[g]
            counts = np.bincount(
                bin_of(sub[value_col].to_numpy(), lo, hi), minlength=n_bins
            )
            nz = np.nonzero(counts)[0]
            parts.append(
                pd.DataFrame(
                    {group_col: g, "bin": nz, "cnt": counts[nz].astype("int64")}
                )
            )
        if not parts:
            return pa.schema(
                [(group_col, pa.string()), ("bin", pa.int64()), ("cnt", pa.int64())]
            ).empty_table()
        return arrow_block(pd.concat(parts, ignore_index=True))

    hist_rows = (
        pre_shuffle(slim.map_batches(hist_partial, batch_format="pandas"))
        .groupby([group_col, "bin"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .take_all()
    )  # O(groups x n_bins) rows — bounded by construction

    # locate, per (group, p): target bin + count below it + within-bin rank
    per_group_hist: dict = {}
    for r in hist_rows:
        per_group_hist.setdefault(r[group_col], []).append(
            (int(r["bin"]), int(r["cnt"]))
        )
    targets: dict = {}  # group -> {bin: [(p, rank_within_bin)]}
    for g, (n, lo, hi) in info.items():
        bins = sorted(per_group_hist.get(g, []))
        cum = 0
        ks = sorted(
            ((max(1, math.ceil(p * n)), p) for p in ps)
        )
        it = iter(bins)
        b, c = next(it)
        for k, p in ks:
            while cum + c < k:
                cum += c
                b, c = next(it)
            targets.setdefault(g, {}).setdefault(b, []).append((p, k - cum))

    # ---- pass 3: in-bin exact selection ------------------------------
    def keep_selected(df: pd.DataFrame) -> pa.Table:
        parts = []
        for g, sub in df.groupby(group_col, sort=False):
            sel = targets.get(g)
            if not sel:
                continue
            n, lo, hi = info[g]
            vals = sub[value_col].to_numpy()
            b = bin_of(vals, lo, hi)
            mask = np.isin(b, list(sel))
            if mask.any():
                parts.append(
                    pd.DataFrame(
                        {group_col: g, "bin": b[mask], "v": vals[mask]}
                    )
                )
        if not parts:
            return pa.schema(
                [(group_col, pa.string()), ("bin", pa.int64()), ("v", pa.float64())]
            ).empty_table()
        return arrow_block(pd.concat(parts, ignore_index=True))

    out_schema = pa.schema(
        [(group_col, pa.string()), ("p", pa.float64()), ("q", pa.float64())]
    )

    def pick(gdf: pd.DataFrame) -> pa.Table:
        g = gdf[group_col].iloc[0]
        b = int(gdf["bin"].iloc[0])
        wanted = targets[g][b]  # [(p, rank within bin, 1-indexed)]
        vals = np.sort(gdf["v"].to_numpy())
        return pa.table(
            {
                group_col: pa.array([g] * len(wanted), pa.string()),
                "p": pa.array([p for p, _ in wanted], pa.float64()),
                "q": pa.array([float(vals[r - 1]) for _, r in wanted]),
            },
            schema=out_schema,
        )

    inbin = pre_shuffle(
        slim.map_batches(keep_selected, batch_format="pandas")
    )
    return inbin.groupby([group_col, "bin"]).map_groups(
        pick, batch_format="pandas"
    )
