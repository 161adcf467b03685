"""Event-stream windowing beyond the tumbling aggregate: gap-based
SESSION windows — a custom operator Ray Data lacks (SURVEY.md 'custom
operators': composition of groupby().map_groups + in-group sort).

Partitioning assumption (documented per the custom-operator rule): all
events of one ``user_id`` are co-located by the groupby shuffle; the
per-group sort is by timestamp, so sessionization is exact regardless
of input order.  Skewed users bound the largest group — for a pathological
hot user, pre-split by day and merge sessions at the boundary.

Window semantics: a new session starts when the gap to the previous
event of the same user exceeds ``gap``; emitted per session:
(user_id, session_id (0-based per user in time order), n_events,
start_ts_us, end_ts_us, duration_us).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from rex_ray.functions.blocks import arrow_block, pre_shuffle

DEFAULT_GAP_US = 30 * 60 * 1_000_000  # 30 minutes


def sessionize(events_ds, gap_us: int = DEFAULT_GAP_US):
    """events (ts, user_id) -> session rows.

    The map_groups is the only per-group step; everything else is
    columnar.  The pre-projection keeps only (user_id, ts_us) so the
    shuffle moves 16 bytes/event, not the full event row.
    """

    def project(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # normalize any timestamp unit (us/ns/...) to epoch microseconds
        us = pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64())
        return pa.Table.from_arrays(
            [t["user_id"].combine_chunks(), us.combine_chunks()],
            names=["user_id", "ts_us"],
        )

    slim = pre_shuffle(events_ds.map_batches(project, batch_format="pyarrow"))

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        ts = np.sort(g["ts_us"].to_numpy())
        new_session = np.empty(len(ts), dtype=bool)
        new_session[0] = True
        new_session[1:] = np.diff(ts) > gap_us
        sid = np.cumsum(new_session) - 1
        df = pd.DataFrame({"sid": sid, "ts": ts})
        agg = df.groupby("sid")["ts"].agg(["size", "min", "max"])
        return pd.DataFrame(
            {
                "user_id": g["user_id"].iloc[0],
                "session_id": agg.index.to_numpy().astype("int64"),
                "n_events": agg["size"].to_numpy().astype("int64"),
                "start_ts_us": agg["min"].to_numpy(),
                "end_ts_us": agg["max"].to_numpy(),
                "duration_us": (agg["max"] - agg["min"]).to_numpy(),
            }
        )

    return slim.groupby("user_id").map_groups(
        lambda g: arrow_block(per_user(g)), batch_format="pandas"
    )


def sliding_window_counts(events_ds, width_us: int, slide_us: int):
    """Sliding windows over the whole stream: per (window_start) event
    count.  Each event lands in width/slide windows — emitted from a
    vectorized flat-map, then a partial-sum groupby (no ordering
    assumption; windows are derived keys, the same trick as the
    tumbling aggregate)."""
    from ray.data.aggregate import Sum

    k = int(np.ceil(width_us / slide_us))

    def expand(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ts = pc.cast(
            pc.cast(t["ts"], pa.timestamp("us")), pa.int64()
        ).to_numpy(zero_copy_only=False)
        base = (ts // slide_us) * slide_us
        starts = base[:, None] - np.arange(k)[None, :] * slide_us
        valid = ts[:, None] < starts + width_us
        flat = starts[valid]
        df = (
            pd.DataFrame({"window_start_us": flat})
            .groupby("window_start_us")
            .size()
            .rename("n_events")
            .reset_index()
        )
        df["n_events"] = df["n_events"].astype("int64")
        return arrow_block(df)

    partial = pre_shuffle(events_ds.map_batches(expand, batch_format="pyarrow"))
    return partial.groupby("window_start_us").aggregate(
        Sum("n_events", alias_name="n_events")
    )
