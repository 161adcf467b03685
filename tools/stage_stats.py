"""Per-stage throughput report for any registered query: runs the
pipeline, parses ``Dataset.stats()`` and prints one JSON line per
operator (name, wall_s, rows_out, rows_per_s, peak_heap_mib) plus a
dataset-level summary — the ds.stats()-driven feedback loop used to
size batch/concurrency per stage (SURVEY.md §4 throughput-metrics
row).

Usage:  python tools/stage_stats.py [query] [sf_dir] [num_cpus]
        (defaults: kg_triple_store_interleaved /root/testdata/sf0.1 32)
"""

from __future__ import annotations

import json
import os
import re
import sys


def parse_stats(stats: str):
    """Extract (operator, wall_s, rows_out, peak_heap_mib) rows from a
    Dataset.stats() dump."""
    ops = []
    cur = None
    for line in stats.splitlines():
        m = re.match(
            r"Operator (\d+) (\S+):.* in ([0-9.]+)s", line.strip()
        )
        if m:
            cur = {
                "operator": m.group(2),
                "wall_s": float(m.group(3)),
                "rows_out": None,
                "peak_heap_mib": None,
            }
            ops.append(cur)
            continue
        if cur is None:
            continue
        m = re.match(
            r"\* Output num rows per block:.* ([0-9]+) total",
            line.strip(),
        )
        if m:
            cur["rows_out"] = int(m.group(1))
        m = re.match(
            r"\* Peak heap memory usage \(MiB\): .* ([0-9.]+) max",
            line.strip(),
        )
        if m:
            cur["peak_heap_mib"] = float(m.group(1))
    for o in ops:
        if o["rows_out"] and o["wall_s"]:
            o["rows_per_s"] = round(o["rows_out"] / o["wall_s"], 1)
    return ops


def main() -> None:
    query = sys.argv[1] if len(sys.argv) > 1 else "kg_triple_store_interleaved"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    ncpu = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=ncpu, include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from rex_ray.pipelines.queries import queries

    import time

    t0 = time.perf_counter()
    res = queries()[query](sf_dir)
    if hasattr(res, "materialize"):
        res = res.materialize()
        stats = res.stats()
        rows = res.count()
    else:  # driver-side result (pandas/arrow)
        stats, rows = "", len(res)
    wall = time.perf_counter() - t0

    for op in parse_stats(stats):
        print(json.dumps({"query": query, **op}))
    print(
        json.dumps(
            {
                "query": query,
                "sf_dir": sf_dir,
                "num_cpus": ncpu,
                "rows": int(rows),
                "wall_s": round(wall, 3),
                "rows_per_s": round(rows / wall, 1) if wall else None,
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
