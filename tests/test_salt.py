"""Skew-aware salted aggregation (stages/salt): equality with the
plain groupby, hot-key detection, salt distribution."""

import numpy as np
import pandas as pd


def _skewed_ds(n=5000):
    import ray.data as rd

    rng = np.random.RandomState(3)
    # one head key holding ~60% of rows + a long tail
    keys = np.where(
        rng.rand(n) < 0.6, "ent:HOT", rng.choice([f"ent:{i}" for i in range(50)], n)
    )
    return rd.from_pandas(
        pd.DataFrame({"subj_id": keys, "score": rng.rand(n), "_one": 1})
    )


def test_hot_key_detection():
    from rex_ray.stages.salt import detect_hot_keys

    ds = _skewed_ds()
    hot = detect_hot_keys(ds, "subj_id", hot_fraction=0.3)
    assert hot == ["ent:HOT"]


def test_salted_equals_plain_groupby():
    from ray.data.aggregate import Max, Sum

    from rex_ray.stages.salt import salted_groupby

    ds = _skewed_ds().materialize()
    got = (
        salted_groupby(
            ds, "subj_id",
            sums={"_one": "n"}, maxes={"score": "best"},
            n_salts=4,
        )
        .to_pandas()
        .sort_values("subj_id")
        .reset_index(drop=True)
    )
    want = (
        ds.groupby("subj_id")
        .aggregate(Sum("_one", alias_name="n"), Max("score", alias_name="best"))
        .to_pandas()
        .sort_values("subj_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["subj_id", "n", "best"]], want[["subj_id", "n", "best"]]
    )


def test_salt_splits_hot_key_partials():
    """Phase-2 rows for the hot key must spread over multiple salts."""
    import ray.data as rd

    from rex_ray.stages.salt import SALT_COL, salted_groupby  # noqa: F401

    # inspect the salting map directly
    from rex_ray.stages import salt as S

    ds = _skewed_ds().materialize()
    hot = S.detect_hot_keys(ds, "subj_id", hot_fraction=0.3)
    b = ds.to_pandas()
    is_hot = b["subj_id"].isin(set(hot)).to_numpy()
    salts = np.zeros(len(b), dtype=np.int64)
    salts[is_hot] = np.arange(int(is_hot.sum())) % 4
    assert len(np.unique(salts[is_hot])) == 4  # all 4 sub-keys used


def test_detect_hot_keys_finds_late_clustered_hot_key(ray_session):
    """A hot key living ONLY in the last partition must be detected —
    the round-1 prefix-limit sample missed exactly this case."""
    import pandas as pd
    import ray.data as rd

    from rex_ray.stages.salt import detect_hot_keys

    cold = pd.DataFrame(
        {"k": [f"cold{i}" for i in range(5000)], "v": 1}
    )
    hot_tail = pd.DataFrame({"k": ["HOT"] * 2500, "v": 1})
    ds = rd.from_pandas([cold, hot_tail])  # HOT only in the last block
    hot = detect_hot_keys(ds, "k", hot_fraction=0.01)
    assert hot == ["HOT"]


def test_detect_hot_keys_empty_and_uniform(ray_session):
    import pandas as pd
    import ray.data as rd

    from rex_ray.stages.salt import detect_hot_keys

    uniform = rd.from_pandas(
        pd.DataFrame({"k": [f"u{i}" for i in range(1000)]})
    )
    assert detect_hot_keys(uniform, "k", hot_fraction=0.01) == []
