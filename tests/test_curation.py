"""Curation decision-table behavior at sf0.001."""

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def curated(ray_session):
    import ray.data as rd

    from rex_ray.pipelines.curation import curate_corpus

    docs = rd.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    return curate_corpus(docs).to_pandas().sort_values(
        "doc_id", ignore_index=True
    )


def test_keep_iff_no_reasons(curated):
    assert set(curated.columns) == {"doc_id", "keep", "reasons"}
    assert ((curated["keep"] == 1) == (curated["reasons"] == "")).all()
    assert curated["keep"].isin([0, 1]).all()


def test_reason_codes_ordered_and_known(curated):
    from rex_ray.pipelines.curation import REASONS

    order = {name: i for i, name in enumerate(REASONS)}
    for r in curated["reasons"]:
        if not r:
            continue
        parts = r.split(",")
        assert all(p in order for p in parts), r
        assert parts == sorted(parts, key=order.__getitem__), r


def test_benchmark_and_dup_flags_match_components(curated):
    import ray.data as rd

    from rex_ray.stages.dedup import exact_dedup_groups

    flagged_bench = set(
        curated.loc[
            curated["reasons"].str.contains("benchmark_heldout"), "doc_id"
        ]
    )
    assert flagged_bench == set(
        curated.loc[curated["doc_id"] % 10 == 0, "doc_id"]
    )

    docs = rd.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id", "text"]
    )
    g = exact_dedup_groups(docs).to_pandas()
    survivors = set(g["survivor_doc_id"].astype(int))
    flagged_dup = set(
        curated.loc[curated["reasons"].str.contains("exact_dup"), "doc_id"]
    )
    assert flagged_dup == set(curated["doc_id"]) - survivors
    # the planted duplicates guarantee at least one drop of each of
    # the structural reasons at this scale
    assert flagged_dup and flagged_bench
    assert (curated["keep"] == 1).any()
