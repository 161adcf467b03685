"""IO surface (sources/io) — reference rex/utils/io.py semantics:
strict CSV, tensor-friendly JSON, regex file walk, jsonl round-trips,
and the NYT10-style ingest normalizer (first-occurrence anchoring,
drop-unanchorable)."""

import json
import os

import numpy as np
import pytest

from rex_ray.sources import io as rio


def test_json_tensor_friendly_roundtrip(tmp_path):
    p = str(tmp_path / "x.json")
    rio.dump_json(
        {"a": np.int64(3), "b": np.array([1.5, 2.5]), "c": {2, 1}}, p
    )
    assert rio.load_json(p) == {"a": 3, "b": [1.5, 2.5], "c": [1, 2]}


def test_jsonlines_roundtrip_skips_blank(tmp_path):
    p = str(tmp_path / "x.jsonl")
    rio.dump_jsonlines([{"i": 1}, {"i": 2}], p)
    with open(p, "a") as f:
        f.write("\n\n")
    assert rio.load_jsonlines(p) == [{"i": 1}, {"i": 2}]


def test_csv_strict_column_check(tmp_path):
    p = str(tmp_path / "t.csv")
    with open(p, "w") as f:
        f.write("a,b\n1,2\n3,4,5\n")
    with pytest.raises(ValueError, match="expected 2 columns"):
        rio.load_csv(p)
    with open(p, "w") as f:
        f.write("a,b\n1,2\n")
    assert rio.load_csv(p) == [{"a": "1", "b": "2"}]
    assert rio.load_csv(p, title_row=False, title_keys=["x", "y"])[0] == {
        "x": "a", "y": "b"
    }
    rio.dump_csv([{"a": 1, "b": 2}], p)
    assert rio.load_csv(p) == [{"a": "1", "b": "2"}]


def test_find_files_regex(tmp_path):
    (tmp_path / "sub").mkdir()
    for name in ("a.jsonl", "b.txt", "sub/c.jsonl"):
        (tmp_path / name).write_text("")
    found = rio.find_files(r"\.jsonl$", str(tmp_path))
    assert [os.path.basename(f) for f in found] == ["a.jsonl", "c.jsonl"]


def test_ingest_normalizer_anchors_and_drops():
    import ray.data as rd

    raw = rd.from_items(
        [
            {
                "doc_id": 1,
                "text": "the spark engine runs the fast join",
                "head": "spark engine",
                "tail": "join",
                "relation": "implements",
            },
            {  # tail never occurs -> dropped
                "doc_id": 2,
                "text": "nothing to see",
                "head": "nothing",
                "tail": "absent",
                "relation": "related_to",
            },
            {  # multi-occurrence: FIRST occurrence anchors
                "doc_id": 3,
                "text": "join the join now",
                "head": "join",
                "tail": "now",
                "relation": "related_to",
            },
        ]
    )
    docs = rio.ingest_raw_corpus(raw).to_pandas().set_index("doc_id")
    assert sorted(docs.index) == [1, 3]
    e1 = docs.loc[1, "entities"]
    assert (e1[0]["start"], e1[0]["end"]) == (1, 3)   # "spark engine"
    assert (e1[1]["start"], e1[1]["end"]) == (6, 7)   # "join"
    e3 = docs.loc[3, "entities"]
    assert (e3[0]["start"], e3[0]["end"]) == (0, 1)   # first "join"
    r1 = docs.loc[1, "relations"][0]
    assert r1["predicate"] == "implements" and r1["head"] == 0


def test_jsonlines_ds_roundtrip(tmp_path):
    import ray.data as rd

    ds = rd.from_items([{"k": i, "v": f"s{i}"} for i in range(10)])
    out = str(tmp_path / "jl")
    rio.write_jsonlines_ds(ds, out)
    back = rio.read_jsonlines_ds(out).to_pandas().sort_values("k")
    assert back["v"].tolist() == [f"s{i}" for i in range(10)]
