"""MRC per-type fan-out + pointer decode + per-doc union (stages/mrc),
and the sampling/split family (SURVEY.md §2.6): seeded random_shuffle
determinism, proportional split."""

import pandas as pd


def test_mrc_fanout_and_decode():
    import ray.data as rd

    from rex_ray.stages import mrc

    docs = rd.from_items(
        [{"doc_id": 7, "text": "the join uses hash and table"}]
    )
    fan = docs.map_batches(
        mrc.fanout_queries_batch, batch_format="pandas"
    ).to_pandas()
    # one row per entity type, every row carries its NL query
    assert len(fan) == len(mrc.TYPE_QUERIES)
    algo = fan[fan["ent_type"] == "ALGO"].iloc[0]
    assert list(algo["starts"]) == [0, 1, 0, 1, 0, 0]
    assert algo["query"].startswith("find all algo")

    ents = mrc.mrc_entities(docs).to_pandas()
    got = set(zip(ents["ent_type"], ents["start_pos"], ents["end_pos"]))
    assert got == {("ALGO", 1, 1), ("ALGO", 3, 3), ("OBJ", 5, 5)}


def test_mrc_union_per_doc_dedupes():
    import ray.data as rd

    from rex_ray.stages import mrc

    rows = pd.DataFrame(
        [
            (1, "A", 0, 0),
            (1, "A", 0, 0),   # duplicate from a second query type pass
            (1, "B", 2, 2),
            (2, "A", 5, 5),
        ],
        columns=["doc_id", "ent_type", "start_pos", "end_pos"],
    )
    got = (
        mrc.union_per_doc(rd.from_pandas(rows))
        .to_pandas()
        .set_index("doc_id")["n_entities"]
    )
    assert got[1] == 2 and got[2] == 1


def test_random_shuffle_seed_deterministic():
    import ray.data as rd

    ds = rd.range(100)
    a = ds.random_shuffle(seed=7).take_all()
    b = rd.range(100).random_shuffle(seed=7).take_all()
    assert a == b
    c = rd.range(100).random_shuffle(seed=8).take_all()
    assert a != c


def test_split_proportionately_matches_ratio_kernel():
    import ray.data as rd

    from rex_ray.functions.segmentation import split_ratios

    n = 100
    ratios = [0.7, 0.2]
    parts = rd.range(n).split_proportionately(ratios)
    sizes = [p.count() for p in parts]
    # Ray rounds split boundaries slightly differently than the
    # reference kernel ([70,19,11] vs [70,20,10]); the contract that
    # matters: partition count, no loss, sizes within 1 of the ratios
    want = split_ratios(n, ratios)
    assert len(sizes) == len(want) and sum(sizes) == n
    assert all(abs(a - b) <= 1 for a, b in zip(sizes, want))
