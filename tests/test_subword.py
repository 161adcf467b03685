"""Subword tokenization + offset remap (stages/subword) — reference
semantics (entity_re.py:106-251) including its boundary quirks."""

import numpy as np
import pandas as pd

from rex_ray.state.dictionaries import Vocab
from rex_ray.stages.subword import (
    CLS,
    SEP,
    SubwordPairFeaturizer,
    encode_subwords,
    get_offset_position,
    subword_pieces,
)


def _vocab(words):
    pieces = sorted({p for w in words for p in subword_pieces(w)})
    return Vocab([CLS, SEP] + pieces)


def test_subword_pieces_fixed_width_rule():
    assert subword_pieces("join") == ["join"]
    assert subword_pieces("customer") == ["cust", "##omer"]
    assert subword_pieces("quickly") == ["quic", "##kly"]
    assert subword_pieces("abcdefghij") == ["abcd", "##efgh", "##ij"]
    assert subword_pieces("") == []
    # the oracle's invariant: n_pieces == ceil(len/4)
    for w in ["a", "ab", "abcd", "abcde", "abcdefgh", "abcdefghi"]:
        assert len(subword_pieces(w)) == -(-len(w) // 4)


def test_get_offset_position_reference_quirks():
    tl = [subword_pieces(w) for w in ["spark", "the", "customer"]]
    # pieces: [spar,##k], [the], [cust,##omer]
    assert get_offset_position(tl, 0) == 0   # first word -> 0 (no CLS offset)
    assert get_offset_position(tl, 1) == 2
    assert get_offset_position(tl, 2) == 3
    assert get_offset_position(tl, 3) == -1  # past the last word -> -1
    # the reference's `offset` arg is accepted but never applied
    assert get_offset_position(tl, 1, offset=1) == 2


def test_encode_cls_sep_assembly_and_truncation():
    words = ["spark", "customer"]
    v = _vocab(words)
    tl = [subword_pieces(w) for w in words]
    ids, mask = encode_subwords(v, tl, 8)
    # [CLS] spar ##k cust ##omer [SEP] pad pad
    toks = [v.id2token[i] for i in ids]
    assert toks[:6] == [CLS, "spar", "##k", "cust", "##omer", SEP]
    assert mask == [1] * 6 + [0] * 2
    # truncation: flat pieces cut to L-2 before SEP
    ids2, mask2 = encode_subwords(v, tl, 5)
    toks2 = [v.id2token[i] for i in ids2]
    assert toks2 == [CLS, "spar", "##k", "cust", SEP]
    assert mask2 == [1] * 5


def test_pair_featurizer_matches_reference_offsets_and_filter():
    # doc: positions 0..4; gazetteer mentions: spark(0) join(2) table(4)
    text = "spark then join customer table"
    batch = pd.DataFrame({"doc_id": [7], "text": [text]})
    words = text.split(" ")
    v = _vocab(words)
    out = SubwordPairFeaturizer(v)(batch).to_pandas()
    tl = [subword_pieces(w) for w in words]
    # reference filter 0 < p < L drops: pairs with subj at word 0
    # (start remaps to 0) and pairs with obj at the last word (end -1)
    assert (out["subj_pos"] > 0).all()
    assert (out["obj_pos"] < len(words) - 1).all()
    for _, r in out.iterrows():
        assert r["subj_sub_start"] == get_offset_position(tl, r["subj_pos"])
        assert r["subj_sub_end"] == get_offset_position(tl, r["subj_pos"] + 1)
        assert r["obj_sub_start"] == get_offset_position(tl, r["obj_pos"])
        assert r["obj_sub_end"] == get_offset_position(tl, r["obj_pos"] + 1)
    # mentions: spark(0) join(2) customer(3) table(4); of the window
    # pairs only join(2) -> customer(3) avoids both boundary quirks
    assert len(out) == 1
    assert out.iloc[0]["subj_pos"] == 2 and out.iloc[0]["obj_pos"] == 3


def test_pair_featurizer_emits_token_ids_and_counts():
    text = "zz spark join customer table zz"
    batch = pd.DataFrame({"doc_id": [1], "text": [text]})
    words = text.split(" ")
    v = _vocab(words)
    out = SubwordPairFeaturizer(v)(batch).to_pandas()
    # spark(1) -> join(2): subj start = off(1) = 1 > 0, ends inside
    assert len(out) > 0
    row = out.iloc[0]
    n_pieces = sum(len(subword_pieces(w)) for w in words)
    assert row["n_subwords"] == n_pieces + 2  # + CLS + SEP
    ids = np.asarray(row["token_ids"])
    mask = np.asarray(row["mask"])
    assert len(ids) == 64 and len(mask) == 64
    assert mask.sum() == row["n_subwords"]
    assert v.id2token[ids[0]] == CLS
    assert v.id2token[ids[mask.sum() - 1]] == SEP


def test_pair_featurizer_empty_batch_schema_stable():
    v = _vocab(["zz"])
    f = SubwordPairFeaturizer(v)
    out = f(pd.DataFrame({"doc_id": [1], "text": ["zz zz zz"]}))
    assert out.num_rows == 0
    assert "token_ids" in out.schema.names
