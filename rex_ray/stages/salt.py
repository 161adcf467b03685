"""Skew-aware salted aggregation (north_rule: "groupby-aggregate
shuffle on entity canonical keys ... with explicit skew-aware salting
of head entities").

Head entities ('join', 'hash' in the synthetic gazetteer; celebrity
entities at corpus scale) concentrate a large fraction of all rows on
one key — a plain groupby sends them all to ONE reduce partition.  The
salted plan:

    phase 0  sample-based hot-key detection (tiny driver-side sample)
    phase 1  map: hot keys get a salt suffix key -> (key, salt),
             salt = row_index % n_salts (uniform, deterministic per
             batch); cold keys keep salt 0
    phase 2  groupby (key, salt) with the ASSOCIATIVE partial aggs
             -> at most n_salts rows per hot key
    phase 3  groupby (key) merging the salt partials — input already
             tiny, no skew left

Correct for any associative aggregate (sum/count/min/max); exposed here
for the triple-store stats (max score, sum support).  The per-batch
combiners used across this engine already bound reduce-side skew by
#batches; explicit salting additionally bounds MAP-side partial size
per key, which matters when one key dominates single batches at
10^12-doc scale.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np
import pandas as pd

from rex_ray.functions.blocks import arrow_block, pre_shuffle

SALT_COL = "_salt"


def detect_hot_keys(
    ds, key: str, hot_fraction: float = 0.01, per_block_top: int = 16
) -> List:
    """Keys holding > hot_fraction of ALL rows, found with per-block
    heavy-hitter partials: every batch emits its top ``per_block_top``
    key counts plus its row count, one tiny aggregate sums them, and
    the (small) result is thresholded.

    Sees the whole dataset's key distribution — a prefix sample
    (``ds.limit``) misses hot keys clustered late in the corpus.  A key
    hot overall is in the per-block top of the blocks that make it hot,
    so truncating cold tails per block cannot hide it."""
    from ray.data.aggregate import Sum

    rows_sentinel = "\x00__rows__"

    def partials(b: pd.DataFrame):
        vc = b[key].value_counts().head(per_block_top)
        out = pd.DataFrame(
            {
                key: list(vc.index) + [rows_sentinel],
                "n": list(vc.to_numpy()) + [len(b)],
            }
        )
        out["n"] = out["n"].astype("int64")
        return arrow_block(out)

    counts = (
        pre_shuffle(ds.map_batches(partials, batch_format="pandas"))
        .groupby(key)
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    if len(counts) == 0:
        return []
    total = counts.loc[counts[key] == rows_sentinel, "n"].sum()
    keys = counts[counts[key] != rows_sentinel]
    return keys.loc[keys["n"] > hot_fraction * total, key].tolist()


def salted_groupby(
    ds,
    key: str,
    sums: Optional[Dict[str, str]] = None,
    maxes: Optional[Dict[str, str]] = None,
    hot_keys: Optional[Sequence] = None,
    n_salts: int = 8,
):
    """Two-phase skew-safe groupby for sum/max aggregates.

    ``sums`` / ``maxes``: {input_col: output_col}.  Returns one row per
    distinct ``key`` — identical to the unsalted groupby (asserted in
    tests), but no reduce partition ever receives more than
    ~1/n_salts of a hot key's rows.
    """
    from ray.data.aggregate import Max, Sum

    sums = sums or {}
    maxes = maxes or {}
    if hot_keys is None:
        hot_keys = detect_hot_keys(ds, key)
    hot = set(hot_keys)

    def add_salt(b: pd.DataFrame):
        is_hot = b[key].isin(hot).to_numpy()
        salt = np.zeros(len(b), dtype=np.int64)
        salt[is_hot] = np.arange(int(is_hot.sum())) % n_salts
        out = b.assign(**{SALT_COL: salt})
        # phase-2 combiner: partial agg per (key, salt) inside the batch
        g = out.groupby([key, SALT_COL], sort=False, observed=True)
        agg = pd.DataFrame(index=g.size().index)
        for col, out_col in sums.items():
            agg[out_col] = g[col].sum()
        for col, out_col in maxes.items():
            agg[out_col] = g[col].max()
        return arrow_block(agg.reset_index())

    partial = pre_shuffle(ds.map_batches(add_salt, batch_format="pandas"))
    aggs = [Sum(c, alias_name=c) for c in sums.values()]
    aggs += [Max(c, alias_name=c) for c in maxes.values()]
    salted = partial.groupby([key, SALT_COL]).aggregate(*aggs)

    # phase 3: fold the salts — tiny input (<= n_salts rows per hot key)
    def drop_salt(b: pd.DataFrame):
        g = b.groupby(key, sort=False, observed=True)
        agg = pd.DataFrame(index=g.size().index)
        for out_col in sums.values():
            agg[out_col] = g[out_col].sum()
        for out_col in maxes.values():
            agg[out_col] = g[out_col].max()
        return arrow_block(agg.reset_index())

    partial2 = pre_shuffle(
        salted.map_batches(drop_salt, batch_format="pandas")
    )
    final_aggs = [Sum(c, alias_name=c) for c in sums.values()]
    final_aggs += [Max(c, alias_name=c) for c in maxes.values()]
    return partial2.groupby(key).aggregate(*final_aggs)


def salted_entity_resolution(linked_triples_ds, n_salts: int = 8):
    """Cross-partition entity-resolution stats keyed by canonical
    entity id — the north_rule's salted shuffle: per canonical subject,
    mention support (count) and best score, hot heads salted."""
    counted = linked_triples_ds.map_batches(
        lambda b: b.assign(_one=np.int64(1)), batch_format="pandas"
    )
    return salted_groupby(
        counted,
        key="subj_id",
        sums={"_one": "n_mentions"},
        maxes={"score": "best_score"},
        n_salts=n_salts,
    )
