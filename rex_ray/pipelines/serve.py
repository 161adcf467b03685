"""Serving / predict API — the reference's inference path
(rex/tasks/entity_relation_extraction.py:143-168 ``predict(texts)``,
rex/tasks/simple_task.py:115-121) over the Ray pipeline: texts in,
surface-level triples out, no training artifacts required.

Small-input path: the texts arrive as a Python list (an API request),
so the Dataset is built with ``from_items``; the SAME stage objects the
batch pipeline uses do the work, guaranteeing serve/batch parity.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import pandas as pd


def predict_texts(
    texts: List[str],
    min_score: float = 0.0,
    canonical: Optional[Dict[str, str]] = None,
) -> pd.DataFrame:
    """texts -> surface triples (text_id, subj, pred, obj, score),
    ordered by (text_id, subj_pos, obj_pos) for stable output."""
    import ray.data as rd

    from rex_ray.stages import extract

    ds = rd.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
    )
    triples = extract.extract_triples(
        ds, min_score=min_score, concurrency=(1, 2)
    ).to_pandas()
    out = triples.sort_values(
        ["doc_id", "subj_pos", "obj_pos"]
    ).reset_index(drop=True)
    out = out.rename(columns={"doc_id": "text_id"})
    return out[["text_id", "subj", "pred", "obj", "score"]]


def predict_linked_triples(
    texts: List[str],
    min_score: float = 0.0,
) -> pd.DataFrame:
    """texts -> canonicalized, deduped triple store rows (the full
    flagship semantics on an ad-hoc corpus)."""
    import ray.data as rd

    from rex_ray.pipelines import kg

    ds = rd.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
    )
    store = kg.triple_store_from_text_docs(ds, min_score=min_score)
    return (
        store.to_pandas()
        .sort_values(["subj_id", "pred", "obj_id"])
        .reset_index(drop=True)
    )
