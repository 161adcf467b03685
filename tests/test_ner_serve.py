"""NER tagging path (stages/ner) and serving API (pipelines/serve)."""

import pandas as pd


def test_bio_roundtrip_multi_token_entity():
    """Token-aware decode handles multi-token spans and trailing
    entities (the char-length quirk of the reference decoder is
    confined to its char contract)."""
    from rex_ray.functions.tagging import get_entities_from_tags

    tokens = ["the", "big", "data", "engine", "runs", "fast", "merge"]
    tags = ["O", "B-SYS", "I-SYS", "I-SYS", "O", "O", "B-ALGO"]
    ents = get_entities_from_tags(tokens, tags, join=" ")
    assert ents == [
        ("big data engine", "SYS", (1, 4)),
        ("merge", "ALGO", (6, 7)),   # trailing single token: end 7, not 6+5
    ]
    # reference char contract unchanged
    chars = list("abcde")
    ctags = ["B-x", "I-x", "O", "B-y", "I-y"]
    assert get_entities_from_tags(chars, ctags) == [
        ("ab", "x", (0, 2)),
        ("de", "y", (3, 5)),
    ]


def test_ner_stage_roundtrip_small():
    import ray.data as rd

    from rex_ray.stages import ner

    docs = rd.from_items(
        [{"doc_id": 1, "text": "the join uses hash and table"}]
    )
    got = ner.ner_roundtrip(docs).to_pandas().sort_values("start_pos")
    assert list(
        zip(got["surface"], got["ent_type"], got["start_pos"], got["end_pos"])
    ) == [("join", "ALGO", 1, 2), ("hash", "ALGO", 3, 4), ("table", "OBJ", 5, 6)]


def test_ner_type_prf_counts_errors():
    import ray.data as rd

    from rex_ray.stages.ner import ner_type_prf

    cols = ["doc_id", "surface", "ent_type", "start_pos", "end_pos"]
    gold = rd.from_pandas(pd.DataFrame(
        [(1, "a", "T1", 0, 1), (1, "b", "T1", 2, 3), (1, "c", "T2", 4, 5)],
        columns=cols,
    ))
    pred = rd.from_pandas(pd.DataFrame(
        [(1, "a", "T1", 0, 1), (1, "z", "T1", 7, 8)],  # 1 tp, 1 fp, 1 fn T1
        columns=cols,
    ))
    got = ner_type_prf(pred, gold).to_pandas().set_index("ent_type")
    assert got.loc["T1", "tp"] == 1 and got.loc["T1", "fp"] == 1
    assert got.loc["T1", "fn"] == 1 and got.loc["T1", "p"] == 0.5
    assert got.loc["T2", "fn"] == 1 and got.loc["T2", "tp"] == 0


def test_predict_texts_api():
    from rex_ray.pipelines import serve

    out = serve.predict_texts(["spark runs the join on the table", "no hits"])
    assert (out["text_id"] == 0).all()  # second text yields nothing
    rows = set(zip(out["subj"], out["pred"], out["obj"]))
    assert ("spark", "implements", "join") in rows
    assert ("join", "applies_to", "table") in rows


def test_predict_linked_triples_canonicalizes():
    from rex_ray.pipelines import serve

    # 'merge' and 'join' are variants -> same canonical subject id
    out = serve.predict_linked_triples(
        ["merge beats hash", "join beats hash"]
    )
    subj = set(out["subj_id"])
    assert subj == {"ent:join"}  # min-surface canonical of {merge, join}
    assert (out["support"] >= 1).all()


def test_pointer_matrix_entities():
    import ray.data as rd

    from rex_ray.stages import pointer

    docs = rd.from_items(
        [{"doc_id": 4, "text": "the join uses hash and table"}]
    )
    got = pointer.pointer_entities(docs).to_pandas().sort_values("start_pos")
    assert list(
        zip(got["ent_type"], got["start_pos"], got["end_pos"])
    ) == [("ALGO", 1, 2), ("ALGO", 3, 4), ("OBJ", 5, 6)]


def test_predict_pair_contract():
    import pytest

    from rex_ray.pipelines import serve

    out = serve.predict_pair("spark runs the join fast", "spark", "join")
    assert out["relation"] == "implements"
    assert out["head_span"] == [0, 1] and out["tail_span"] == [3, 4]
    with pytest.raises(ValueError, match="head 'absent' not found"):
        serve.predict_pair("spark runs", "absent", "spark")
    with pytest.raises(ValueError, match="tail"):
        serve.predict_pair("spark runs", "spark", "absent")
