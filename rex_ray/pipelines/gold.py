"""Independent straight-line reimplementation of the extraction spec.

This is the PARITY GOLD: a deliberately naive per-doc Python
implementation of the same semantics the vectorized Ray stages
implement (mirroring how the reference computes them row-by-row in
rex/data/transforms/sent_re.py:31-63 + data/NYT10/convert.py).  It
shares NO code with ``stages/extract.py`` — only the literal spec in
``pipelines/spec.py`` — so agreement between the two is evidence, not
tautology.  Used by ``stages/parity.py`` consumers and the
``kg_parity_prf`` query (north_rule: triple P/R >= 0.95 vs reference
extractor semantics).
"""

from __future__ import annotations

from typing import List, Tuple

from rex_ray.pipelines import spec


def gold_triples_for_doc(doc_id, text: str) -> List[Tuple]:
    """(doc_id, subj, pred, obj) tuples for one document."""
    tokens = text.split(" ")
    mentions = [
        (pos, tok, spec.GAZETTEER[tok])
        for pos, tok in enumerate(tokens)
        if tok in spec.GAZETTEER
    ]
    out: List[Tuple] = []
    for i, (hp, hs, ht) in enumerate(mentions):
        for tp_, ts, tt in mentions[i + 1:]:
            d = tp_ - hp
            if d < 1:
                continue
            if d > spec.PAIR_WINDOW:
                break
            pred = spec.PRED_MAP.get((ht, tt), spec.PRED_FALLBACK)
            out.append((doc_id, hs, pred, ts))
    return out


def gold_triples_frame(documents):
    """pandas (doc_id, text) frame -> (doc_id, subj, pred, obj) frame."""
    import pandas as pd

    rows: List[Tuple] = []
    for doc_id, text in zip(documents["doc_id"], documents["text"]):
        rows.extend(gold_triples_for_doc(doc_id, text))
    return pd.DataFrame(rows, columns=["doc_id", "subj", "pred", "obj"])


def gold_triples_ds(sf_dir: str):
    """Gold triples as a Ray Dataset (driver-computed at test scale —
    the gold side of a parity check is small by design; at corpus
    scale the parity sample is a doc_id-range slice)."""
    import pyarrow.parquet as pq
    import ray.data as rd

    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas()
    return rd.from_pandas(gold_triples_frame(docs))
