"""GeneralCollate vs reference GeneralCollateFn semantics
(rex/data/collate_fn.py:12-103)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from rex_ray.functions.collate import DEFAULT_TYPE_MAP, GeneralCollate


def _batch():
    return {
        "ids": [[1, 2], [3, 4]],
        "score": [0.5, 1.5],
        "label": ["a", "b"],
        "extra": [object(), object()],
    }


def test_projection_drops_unlisted_keys():
    c = GeneralCollate({"ids": np.int64})
    out = c(_batch())
    assert set(out) == {"ids"}
    assert out["ids"].dtype == np.int64
    assert out["ids"].shape == (2, 2)


def test_guessing_infers_types_once():
    c = GeneralCollate(None, guessing=True)
    out = c(_batch())
    assert c.key2type["ids"] == np.int64          # list of ints
    assert c.key2type["score"] == np.float32      # float scalar
    assert c.key2type["label"] is None            # str kept as list
    assert isinstance(out["label"], list)
    assert out["score"].dtype == np.float32


def test_missing_key_as_null_keeps_everything():
    c = GeneralCollate({"ids": np.int64}, missing_key_as_null=True)
    out = c(_batch())
    assert set(out) == {"ids", "score", "label", "extra"}
    assert isinstance(out["score"], list)  # null-typed -> untouched


def test_none_values_block_tensorify():
    c = GeneralCollate({"score": np.float32})
    out = c({"score": [1.0, None]})
    assert out["score"] == [1.0, None]


def test_update_data_hook_row_wise():
    class Plus(GeneralCollate):
        def update_data(self, rows):
            for r in rows:
                r["score"] += 1.0
            return rows

    out = Plus({"score": np.float32})(_batch())
    assert out["score"].tolist() == [1.5, 2.5]


def test_update_before_tensorify_hook():
    class Pad(GeneralCollate):
        def update_before_tensorify(self, data):
            data["ids"] = [v + [0] for v in data["ids"]]
            return data

    out = Pad({"ids": np.int64})(_batch())
    assert out["ids"].shape == (2, 3)


def test_accepts_arrow_and_pandas():
    c = GeneralCollate({"x": np.int64})
    t = pa.table({"x": [1, 2, 3]})
    df = pd.DataFrame({"x": [1, 2, 3]})
    assert c(t)["x"].tolist() == [1, 2, 3]
    assert c(df)["x"].tolist() == [1, 2, 3]


def test_bad_batch_type_raises():
    with pytest.raises(TypeError, match="unsupported batch"):
        GeneralCollate({})([1, 2, 3])


def test_default_type_map_mirrors_reference():
    # collate_fn.py:27 with torch.long/torch.float -> np equivalents
    assert DEFAULT_TYPE_MAP[int] == np.int64
    assert DEFAULT_TYPE_MAP[float] == np.float32
    assert DEFAULT_TYPE_MAP[str] is None
