"""Vocab / LabelEncoder / embedding-file loader (state/dictionaries),
re-deriving reference semantics (rex/data/vocab.py, label_encoder.py,
rex/utils/io.py:138-169, build_emb.py)."""

import numpy as np
import pytest

from rex_ray.state.dictionaries import (
    LabelEncoder,
    Vocab,
    build_filtered_embedding,
    load_embedding_file,
)


def test_vocab_encode_pad_truncate():
    v = Vocab(["alpha", "beta"])
    assert v.pad_id == 0 and v.unk_id == 1
    ids, mask = v.encode(["alpha", "zzz"], max_len=4)
    assert ids == [v.token2id["alpha"], v.unk_id, 0, 0]
    assert mask == [1, 1, 0, 0]
    ids, mask = v.encode(["alpha", "beta", "alpha"], max_len=2)  # truncate
    assert ids == [v.token2id["alpha"], v.token2id["beta"]]
    assert mask == [1, 1]


def test_vocab_batch_encode_matches_scalar():
    v = Vocab(["a", "b", "c"])
    lists = [["a", "b"], ["c", "zzz", "a", "b", "c"], []]
    ids, mask = v.encode_batch(lists, max_len=3)
    for r, toks in enumerate(lists):
        sid, smask = v.encode(toks, max_len=3)
        assert ids[r].tolist() == sid
        assert mask[r].tolist() == smask


def test_vocab_persistence_roundtrip(tmp_path):
    v = Vocab(["x", "y"])
    v.weights = np.arange(8, dtype=np.float64).reshape(4, 2)
    v.save_pretrained(str(tmp_path / "v"))
    v2 = Vocab.from_pretrained(str(tmp_path / "v"))
    assert v2.token2id == v.token2id
    assert np.array_equal(v2.weights, v.weights)


def test_label_encoder_hot_vectors_and_roundtrip(tmp_path):
    enc = LabelEncoder(["rel_a", "rel_b", "rel_c"])
    assert enc.encode(["rel_b", "rel_a"]) == [1, 0]
    assert enc.decode([2]) == ["rel_c"]
    assert enc.to_multi_hot(["rel_a", "rel_c"]).tolist() == [1, 0, 1]
    assert enc.to_one_hot("rel_b").tolist() == [0, 1, 0]
    path = str(tmp_path / "rel2id.json")
    enc.save_pretrained(path)
    enc2 = LabelEncoder.from_pretrained(path)
    assert enc2.label2id == enc.label2id
    with pytest.raises(KeyError):
        enc.encode(["nope"])


def test_load_embedding_file_header_and_dim_skip(tmp_path):
    p = tmp_path / "emb.txt"
    p.write_text(
        "3 2\n"
        "tok1 0.5 1.5\n"
        "bad 1.0\n"          # dim mismatch -> skipped
        "tok2 -1.0 2.0\n"
    )
    tokens, t2v = load_embedding_file(str(p))
    assert tokens == ["tok1", "tok2"]
    assert t2v["tok2"].tolist() == [-1.0, 2.0]
    # headerless variant: first row is data
    p2 = tmp_path / "emb2.txt"
    p2.write_text("tok1 1.0 2.0 3.0\ntok2 4.0 5.0 6.0\n")
    tokens2, t2v2 = load_embedding_file(str(p2))
    assert tokens2 == ["tok1", "tok2"]
    assert t2v2["tok1"].tolist() == [1.0, 2.0, 3.0]


def test_vocab_from_embedding():
    v = Vocab.from_embedding({"a": np.array([1.0, 0.0]), "b": np.array([0.0, 1.0])})
    assert len(v) == 4  # pad, unk, a, b
    assert v.weights.shape == (4, 2)
    assert v.weights[0].tolist() == [0.0, 0.0]          # pad row
    assert v.weights[1].tolist() == [0.5, 0.5]          # unk = mean


def test_filtered_embedding_semi_join():
    import ray.data as rd

    docs = rd.from_items(
        [
            {"doc_id": 1, "text": "alpha beta"},
            {"doc_id": 2, "text": "beta gamma"},
        ]
    )
    emb = {
        "alpha": np.array([1.0]),
        "gamma": np.array([2.0]),
        "unused": np.array([3.0]),
    }
    kept = build_filtered_embedding(docs, emb)
    assert sorted(kept) == ["alpha", "gamma"]
