"""Per-dataset ingest normalizers (sources/ingest): IPRE join+anchor,
WebNLG id remap + entity dedup indexing, MSRA BMES line parsing."""

import pandas as pd

from rex_ray.sources import ingest


def test_ingest_ipre_anchor_and_drop(ray_session):
    """First-occurrence CHAR anchoring (may land inside another word),
    unanchorable records dropped, relation ids deduped as a set."""
    import ray.data as rd

    sent = rd.from_pandas(
        pd.DataFrame(
            {
                "id": [1, 2, 3],
                "head": ["row", "spark", "ghost"],
                "tail": ["line", "join", "join"],
                # 'row' first occurs INSIDE 'grown' (char pos 6)
                "text": ["it is grown row line", "spark join", "no match"],
            }
        )
    )
    labels = rd.from_pandas(
        pd.DataFrame({"id": [1, 2, 3], "relations": ["2 0 2", "1", "0"]})
    )
    out = (
        ingest.ingest_ipre(sent, labels, {0: "a", 1: "b", 2: "c"})
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    # doc 3: neither 'ghost' nor 'join' occurs -> dropped
    assert out["doc_id"].tolist() == ["1", "2"]
    d1 = out.iloc[0]
    assert list(d1["tokens"]) == list("it is grown row line")
    h, t = d1["entities"][0], d1["entities"][1]
    assert (h["start"], h["end"]) == (7, 10)     # inside 'grown'
    assert (t["start"], t["end"]) == (16, 20)    # 'line'
    assert [r["predicate"] for r in d1["relations"]] == ["a", "c"]  # set
    d2 = out.iloc[1]
    assert (d2["entities"][0]["start"], d2["entities"][0]["end"]) == (0, 5)
    assert [r["predicate"] for r in d2["relations"]] == ["b"]


def test_ingest_webnlg_dedup_indexing(ray_session):
    """Repeated endpoints dedup to one entity in FIRST-APPEARANCE
    order; relation rows carry entity-list indices."""
    import ray.data as rd

    raw = rd.from_pandas(
        pd.DataFrame(
            {
                "doc_id": [7],
                "sent": [[2, 0, 1]],
                # triples: (2,0,r1), (0,2,r0)  -> entities pos 2,0 only
                "spo": [[2, 0, 1, 0, 2, 0]],
            }
        )
    )
    out = ingest.ingest_webnlg(
        raw, {0: "wa", 1: "wb", 2: "wc"}, {0: "r0", 1: "r1"}
    ).to_pandas()
    d = out.iloc[0]
    assert list(d["tokens"]) == ["wc", "wa", "wb"]
    # first-appearance order: pos 2 (head of triple 0), then pos 0
    assert [(e["start"], e["end"]) for e in d["entities"]] == [(2, 3), (0, 1)]
    assert [(r["predicate"], r["head"], r["tail"]) for r in d["relations"]] \
        == [("r1", 0, 1), ("r0", 1, 0)]


def test_parse_bmes_lines_and_file_ingest(ray_session, tmp_path):
    """Line grouping on blank separators, trailing doc without a
    separator, and the one-file-per-task Dataset path."""
    lines = [
        "北 B-NS", "京 E-NS", "欢 O", "迎 O", "", "",
        "李 S-NR", "白 O",
    ]
    docs = ingest.parse_bmes_lines(lines, shard="t")
    assert [d["id"] for d in docs] == ["t.0", "t.1"]
    assert docs[0]["tokens"] == ["北", "京", "欢", "迎"]
    assert docs[0]["ner_tags"] == ["B-NS", "E-NS", "O", "O"]
    assert docs[1]["tokens"] == ["李", "白"]

    p = tmp_path / "mini.char.bmes"
    p.write_text("\n".join(lines) + "\n", encoding="utf-8")
    ds = ingest.ingest_bmes_files([str(p)]).to_pandas()
    assert ds["doc_id"].tolist() == ["mini.char.bmes.0", "mini.char.bmes.1"]
    assert list(ds["tokens"][1]) == ["李", "白"]


def test_cli_ingest_pipeline_ipre_and_bmes(ray_session, tmp_path):
    """The `ingest` CLI pipeline normalizes raw files end-to-end into
    canonical parquet (shape=ipre and shape=bmes)."""
    import json

    import pyarrow.parquet as pq

    import rex_ray.cli  # noqa: F401  (registers pipelines)
    from rex_ray.registry import get_registered

    ing = get_registered("pipeline", "ingest")

    sent = tmp_path / "sent.jsonl"
    sent.write_text(
        "\n".join(
            json.dumps(r)
            for r in [
                {"id": 1, "head": "ab", "tail": "cd", "text": "xx ab cd"},
                {"id": 2, "head": "zz", "tail": "cd", "text": "ab cd"},
            ]
        )
        + "\n"
    )
    labels = tmp_path / "labels.jsonl"
    labels.write_text(
        "\n".join(
            json.dumps(r)
            for r in [
                {"id": 1, "relations": "1 0 1"},
                {"id": 2, "relations": "0"},
            ]
        )
        + "\n"
    )
    rel2id = tmp_path / "rel2id.json"
    rel2id.write_text(json.dumps({"born_in": 0, "works_at": 1}))
    out = ing(
        {
            "shape": "ipre",
            "sent_path": str(sent),
            "label_path": str(labels),
            "rel2id_path": str(rel2id),
            "out_dir": str(tmp_path / "o1"),
        }
    )
    assert out["rows"] == 1  # id 2 dropped ('zz' unanchorable)
    t = pq.read_table(out["ingested"]).to_pandas()
    assert t["doc_id"].tolist() == ["1"]
    assert [r["predicate"] for r in t["relations"][0]] == [
        "born_in", "works_at"
    ]

    bmes = tmp_path / "raw.bmes"
    bmes.write_text("a B-X\nb E-X\n\nc S-Y\n")
    out2 = ing(
        {
            "shape": "bmes",
            "raw": str(bmes),
            "out_dir": str(tmp_path / "o2"),
        }
    )
    assert out2["rows"] == 2
    t2 = pq.read_table(out2["ingested"]).to_pandas()
    assert sorted(len(x) for x in t2["tokens"]) == [1, 2]


def test_render_bmes_tags_runs():
    toks = ["a", "b", "c", "d", "e"]
    types = ["X", "X", "", "Y", "X"]
    assert ingest.render_bmes_tags(toks, types) == [
        "B-X", "E-X", "O", "S-Y", "S-X"
    ]
    types3 = ["X", "X", "X", "", ""]
    assert ingest.render_bmes_tags(toks, types3) == [
        "B-X", "M-X", "E-X", "O", "O"
    ]
