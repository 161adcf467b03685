"""Persisted bucket-partitioned ANN layout (round-3 verdict item #3,
round-4 items #1/#2):

* the layout round-trips (hive bucket=<b>/ dirs, one per non-empty
  LSH bucket) with a partition manifest + slim (id, bucket) index;
* lsh_topk_from_layout output is byte-identical to the full-scan
  lsh_topk (also driver-gate-checked as ann_lsh_topk_bucketed vs the
  same oracle);
* the candidate READ is pruned: only the query buckets' partitions
  are opened, and the pruned row count is strictly below the table's;
* the QUERY-VECTOR fetch is pruned too: located via the id index, it
  opens at most the probed partitions' files — never a full scan;
* discovery is manifest-driven (object-store-safe), and an external
  query_frame bypasses the fetch entirely.
"""

import os

import numpy as np
import pandas as pd

import ray.data as rd

SF = "/root/testdata/sf0.001"
N_PLANES = 4


def _emb():
    return rd.read_parquet(
        f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"]
    )


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), ignore_index=True)


def test_layout_write_and_pruned_topk_equals_full_scan(
    ray_session, tmp_path
):
    from rex_ray.stages.similarity import (
        lsh_buckets,
        lsh_planes,
        lsh_topk,
        lsh_topk_from_layout,
        write_lsh_bucket_layout,
    )

    layout_dir = str(tmp_path / "lsh_layout")
    n_written = write_lsh_bucket_layout(
        _emb(), layout_dir, n_planes=N_PLANES
    )
    dirs = sorted(
        (d for d in os.listdir(layout_dir) if d.startswith("bucket=")),
        key=lambda d: int(d.split("=")[1]),
    )
    assert n_written == len(dirs) > 1

    # layout partitions hold exactly the rows the bucket rule assigns
    full = _emb().to_pandas()
    S = lsh_planes(N_PLANES, len(full["embedding"].iloc[0]))
    expect_buckets = lsh_buckets(np.stack(full["embedding"]), S)
    assert sorted(set(int(b) for b in expect_buckets)) == [
        int(d.split("=")[1]) for d in dirs
    ]
    total_rows = 0
    for d in dirs:
        b = int(d.split("=")[1])
        part = rd.read_parquet(f"{layout_dir}/{d}").to_pandas()
        want = set(full["vec_id"][expect_buckets == b])
        assert set(part["vec_id"]) == want
        total_rows += len(part)
    assert total_rows == len(full)

    # pruned-read top-k == full-scan top-k, and the read WAS pruned
    qids = range(6)
    stats = {}
    pruned = lsh_topk_from_layout(
        layout_dir, query_ids=qids, k=5, n_planes=N_PLANES,
        stats_out=stats,
    ).to_pandas()
    fullscan = lsh_topk(
        _emb(), query_ids=qids, k=5, n_planes=N_PLANES
    ).to_pandas()
    pd.testing.assert_frame_equal(_norm(pruned), _norm(fullscan))
    assert 0 < stats["buckets_read"] < stats["buckets_total"]
    # fewer bytes off storage: the probed partitions hold strictly
    # fewer rows than the table (the prune is real, not cosmetic)
    qb = set(
        int(b)
        for b in lsh_buckets(
            np.stack(
                full.loc[full.vec_id.isin(list(qids)), "embedding"]
            ),
            S,
        )
    )
    probed_rows = int(np.isin(expect_buckets, sorted(qb)).sum())
    assert probed_rows < len(full)

    # the QUERY-VECTOR fetch is pruned: it opened at most the probed
    # partitions' files (an LSH query's home bucket IS its probe
    # bucket), never all partitions (round-4 verdict item #1)
    from rex_ray.functions import fsio

    man = fsio.read_json(f"{layout_dir}/manifest.json")
    probe_files = sum(len(man["partitions"][str(b)]) for b in sorted(qb))
    all_files = sum(len(v) for v in man["partitions"].values())
    assert 0 < stats["query_fetch_files"] <= probe_files < all_files
    # manifest + slim index sidecars exist and index covers every row
    assert man["kind"] == "lsh" and man["index"]
    idx = rd.read_parquet(
        [f"{layout_dir}/{r}" for r in man["index"]]
    ).to_pandas()
    assert len(idx) == len(full)
    assert sorted(idx.columns) == ["bucket", "vec_id"]

    # external query_frame bypasses the fetch and matches exactly
    qframe = full.loc[
        full.vec_id.isin(list(qids)), ["vec_id", "embedding"]
    ].reset_index(drop=True)
    stats2 = {}
    via_frame = lsh_topk_from_layout(
        layout_dir, query_ids=qids, k=5, n_planes=N_PLANES,
        stats_out=stats2, query_frame=qframe,
    ).to_pandas()
    pd.testing.assert_frame_equal(_norm(via_frame), _norm(fullscan))
    assert stats2["query_fetch_files"] == 0


def test_layout_roundtrip_through_fs_uri(ray_session, tmp_path):
    """Write + read the LSH layout addressed by a ``file://`` URI —
    the whole layout path (partitioned write, sidecars, manifest
    discovery, pruned candidate + query-vector reads) must run through
    the pyarrow.fs abstraction, not the POSIX API, so the same code
    serves object stores (round-4 verdict item #2).  Ray 2.49's
    partitioned write trips on URI strings, so the writer resolves the
    fs once and hands (fs-local path, filesystem=)."""
    from rex_ray.stages.similarity import (
        lsh_topk,
        lsh_topk_from_layout,
        write_lsh_bucket_layout,
    )

    uri = f"file://{tmp_path}/lsh_uri"
    n = write_lsh_bucket_layout(_emb(), uri, n_planes=N_PLANES)
    assert n > 1
    # plain-path and URI addressing read the SAME layout
    stats = {}
    via_uri = lsh_topk_from_layout(
        uri, query_ids=range(4), k=5, n_planes=N_PLANES, stats_out=stats
    ).to_pandas()
    via_path = lsh_topk_from_layout(
        f"{tmp_path}/lsh_uri", query_ids=range(4), k=5, n_planes=N_PLANES
    ).to_pandas()
    fullscan = lsh_topk(
        _emb(), query_ids=range(4), k=5, n_planes=N_PLANES
    ).to_pandas()
    pd.testing.assert_frame_equal(_norm(via_uri), _norm(fullscan))
    pd.testing.assert_frame_equal(_norm(via_path), _norm(fullscan))
    assert 0 < stats["buckets_read"] < stats["buckets_total"]
    assert stats["query_fetch_files"] > 0


def _emb_halves():
    """(even-id half, odd-id half) of the embeddings table."""
    import pyarrow.compute as pc

    def half(parity):
        def fn(t):
            return t.filter(
                pc.equal(pc.bit_wise_and(t["vec_id"], 1), parity)
            )
        return fn

    a = _emb().map_batches(half(0), batch_format="pyarrow")
    b = _emb().map_batches(half(1), batch_format="pyarrow")
    return a, b


def test_append_to_lsh_layout_equals_one_shot(ray_session, tmp_path):
    """append_to_bucket_layout extends a persisted LSH layout by
    O(new): base written from the even-id half, odd half appended —
    the reader's top-k must be byte-equal to a layout written in one
    shot over the full table (the LSH rule is row-local, so bucketing
    is identical either way), and no pre-append file may be touched."""
    from rex_ray.functions import fsio
    from rex_ray.stages.similarity import (
        append_to_bucket_layout,
        lsh_topk_from_layout,
        write_lsh_bucket_layout,
    )

    half_a, half_b = _emb_halves()
    inc_dir = str(tmp_path / "lsh_inc")
    one_dir = str(tmp_path / "lsh_one")
    write_lsh_bucket_layout(half_a, inc_dir, n_planes=N_PLANES)
    files_before = set(fsio.list_files(inc_dir, ".parquet"))
    man = append_to_bucket_layout(half_b, inc_dir)
    files_after = set(fsio.list_files(inc_dir, ".parquet"))
    assert files_before < files_after  # strictly additive
    # manifest covers every data file (old + new)
    man_files = {
        r for rels in man["partitions"].values() for r in rels
    } | set(man["index"])
    assert man_files == files_after

    write_lsh_bucket_layout(_emb(), one_dir, n_planes=N_PLANES)
    got = lsh_topk_from_layout(
        inc_dir, query_ids=range(6), k=5, n_planes=N_PLANES
    ).to_pandas()
    want = lsh_topk_from_layout(
        one_dir, query_ids=range(6), k=5, n_planes=N_PLANES
    ).to_pandas()
    pd.testing.assert_frame_equal(_norm(got), _norm(want))


def test_append_to_ivf_layout_frozen_codebook(ray_session, tmp_path):
    """IVF append NEVER retrains: rows appended to a base layout are
    assigned under the base's frozen centroids.json, and the reader's
    top-k equals ivf_topk_int over the full table with that same
    frozen codebook (new centroids=... serving path)."""
    import numpy as np

    from rex_ray.functions import fsio
    from rex_ray.stages.similarity import (
        append_to_bucket_layout,
        ivf_topk_int,
        ivf_topk_int_from_layout,
        write_ivf_bucket_layout,
    )

    half_a, half_b = _emb_halves()
    layout_dir = str(tmp_path / "ivf_inc")
    _, C = write_ivf_bucket_layout(
        half_a, layout_dir, num_centroids=8, iters=2
    )
    append_to_bucket_layout(half_b, layout_dir)
    # codebook unchanged by the append
    C_after = np.asarray(
        fsio.read_json(f"{layout_dir}/centroids.json"), dtype=np.int64
    )
    np.testing.assert_array_equal(C, C_after)

    got = ivf_topk_int_from_layout(
        layout_dir, query_ids=range(4), k=5, nprobe=2
    ).to_pandas()
    want = ivf_topk_int(
        _emb(), query_ids=range(4), k=5, nprobe=2, centroids=C
    ).to_pandas()
    pd.testing.assert_frame_equal(_norm(got), _norm(want))


def test_compact_layout_after_appends(ray_session, tmp_path):
    """compact_bucket_layout rewrites fragmented partitions into one
    file each: reader output unchanged, per-partition file count drops
    to <= 1, the manifest references exactly the on-disk survivors,
    and superseded files are gone."""
    from rex_ray.functions import fsio
    from rex_ray.stages.similarity import (
        append_to_bucket_layout,
        compact_bucket_layout,
        lsh_topk_from_layout,
        write_lsh_bucket_layout,
    )

    half_a, half_b = _emb_halves()
    layout_dir = str(tmp_path / "lsh_cmp")
    write_lsh_bucket_layout(half_a, layout_dir, n_planes=N_PLANES)
    append_to_bucket_layout(half_b, layout_dir)
    man0 = fsio.read_json(f"{layout_dir}/manifest.json")
    assert any(len(v) > 1 for v in man0["partitions"].values())
    before = lsh_topk_from_layout(
        layout_dir, query_ids=range(6), k=5, n_planes=N_PLANES
    ).to_pandas()

    man1 = compact_bucket_layout(layout_dir)
    assert all(len(v) == 1 for v in man1["partitions"].values())
    # manifest == exactly the surviving data files on disk
    on_disk = {
        r for r in fsio.list_files(layout_dir, ".parquet")
        if not r.startswith("_id_index/")
    }
    in_man = {r for v in man1["partitions"].values() for r in v}
    assert in_man == on_disk
    # index untouched, reader output identical
    assert man1["index"] == man0["index"]
    after = lsh_topk_from_layout(
        layout_dir, query_ids=range(6), k=5, n_planes=N_PLANES
    ).to_pandas()
    pd.testing.assert_frame_equal(_norm(before), _norm(after))


def test_append_rejects_unknown_layout(ray_session, tmp_path):
    from rex_ray.functions import fsio
    from rex_ray.stages.similarity import append_to_bucket_layout

    d = str(tmp_path / "bogus")
    fsio.makedirs(d)
    fsio.write_json(f"{d}/manifest.json", {"kind": "nope"})
    import pytest as _pytest

    with _pytest.raises(ValueError):
        append_to_bucket_layout(_emb(), d)


def test_sidecar_fallback_rebuilds_index_from_layout(ray_session, tmp_path):
    """_write_layout_sidecars(keyed_ds=None) rebuilds the slim id
    index by re-reading the written partitions — the recovery path for
    a layout whose source dataset is gone.  Must produce an index (and
    manifest) equivalent to the streaming-projection default: same
    (id, bucket) rows, and the pruned reader still works."""
    import shutil

    from rex_ray.functions import fsio
    from rex_ray.stages.similarity import (
        _write_layout_sidecars,
        lsh_topk,
        lsh_topk_from_layout,
        write_lsh_bucket_layout,
    )

    layout_dir = str(tmp_path / "lsh_fb")
    write_lsh_bucket_layout(_emb(), layout_dir, n_planes=N_PLANES)
    idx_default = rd.read_parquet(f"{layout_dir}/_id_index").to_pandas()

    shutil.rmtree(f"{layout_dir}/_id_index")
    man = _write_layout_sidecars(
        layout_dir, "bucket", "vec_id",
        {"kind": "lsh", "n_planes": N_PLANES},
    )
    assert man["index"]
    idx_rebuilt = rd.read_parquet(f"{layout_dir}/_id_index").to_pandas()
    pd.testing.assert_frame_equal(
        _norm(idx_default), _norm(idx_rebuilt)
    )
    stats = {}
    got = lsh_topk_from_layout(
        layout_dir, query_ids=range(4), k=5, n_planes=N_PLANES,
        stats_out=stats,
    ).to_pandas()
    want = lsh_topk(
        _emb(), query_ids=range(4), k=5, n_planes=N_PLANES
    ).to_pandas()
    pd.testing.assert_frame_equal(_norm(got), _norm(want))
    assert stats["query_fetch_files"] > 0


def test_ivf_layout_pruned_topk_equals_full_scan(ray_session, tmp_path):
    """IVF sibling of the LSH layout: cluster-partitioned Parquet +
    sidecar codebook; pruned-read top-k equals the full-scan
    ivf_topk_int, and with a small probe set the read is strictly
    pruned."""
    from rex_ray.stages.similarity import (
        ivf_topk_int,
        ivf_topk_int_from_layout,
        write_ivf_bucket_layout,
    )

    layout_dir = str(tmp_path / "ivf_layout")
    n_parts, C = write_ivf_bucket_layout(
        _emb(), layout_dir, num_centroids=8, iters=2
    )
    assert n_parts > 1
    assert os.path.exists(f"{layout_dir}/centroids.json")

    qids = range(2)
    stats = {}
    pruned = ivf_topk_int_from_layout(
        layout_dir, query_ids=qids, k=5, nprobe=2, stats_out=stats
    ).to_pandas()
    fullscan = ivf_topk_int(
        _emb(), query_ids=qids, k=5, num_centroids=8, iters=2, nprobe=2
    ).to_pandas()
    pd.testing.assert_frame_equal(_norm(pruned), _norm(fullscan))
    # 2 queries x 2 probes <= 4 clusters of 8: the read is pruned
    assert 0 < stats["clusters_read"] <= 4 < stats["clusters_total"]

    # query fetch pruned via the id index: it opens exactly the query
    # ids' HOME clusters' files (home = nearest centroid, always
    # inside the probe set) — strictly fewer than the layout's total
    from rex_ray.functions import fsio

    man = fsio.read_json(f"{layout_dir}/manifest.json")
    assert man["kind"] == "ivf" and man["index"]
    idx = rd.read_parquet(
        [f"{layout_dir}/{r}" for r in man["index"]]
    ).to_pandas()
    home = sorted(set(idx.loc[idx.vec_id.isin(list(qids)), "cluster"]))
    home_files = sum(len(man["partitions"][str(c)]) for c in home)
    all_files = sum(len(v) for v in man["partitions"].values())
    assert 0 < stats["query_fetch_files"] == home_files < all_files

    # external query_frame path: identical output, zero fetch files
    full = _emb().to_pandas()
    qframe = full.loc[
        full.vec_id.isin(list(qids)), ["vec_id", "embedding"]
    ].reset_index(drop=True)
    stats2 = {}
    via_frame = ivf_topk_int_from_layout(
        layout_dir, query_ids=qids, k=5, nprobe=2, stats_out=stats2,
        query_frame=qframe,
    ).to_pandas()
    pd.testing.assert_frame_equal(_norm(via_frame), _norm(fullscan))
    assert stats2["query_fetch_files"] == 0
