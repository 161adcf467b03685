"""MRC-style NER: per-entity-type query fan-out + span decode + per-doc
union — the reference's pointer-NER shape
(rex/data/transforms/mrc_ner.py:39-126 one row PER ENTITY TYPE per doc,
rex/models/mrc_ner.py:77-84 start/end pointer decode,
rex/tasks/named_entity_recognition.py:112-117 per-doc union of the
per-type results).

The "model" here is the deterministic gazetteer (start/end indicator
vectors derived from mentions of the queried type), so the plumbing —
1->N type fan-out, per-row decode, doc_id regroup — is exercised
end-to-end and oracle-checkable; a trained pointer head drops into
``decode_rows_batch`` unchanged.
"""

from __future__ import annotations

from typing import Dict

import numpy as np
import pandas as pd
import pyarrow as pa

from rex_ray.functions.blocks import arrow_block, pre_shuffle
from rex_ray.functions.position import extract_spans_from_start_end
from rex_ray.pipelines import spec

# ent_type -> natural-language query (reference builds these from a
# type->query map, e.g. data/MSRAv2/convert.py:6-10)
TYPE_QUERIES: Dict[str, str] = {
    t: f"find all {t.lower()} entities"
    for t in sorted(set(spec.GAZETTEER.values()))
}


def fanout_queries_batch(batch: pd.DataFrame) -> pa.Table:
    """(doc_id, text) -> one row per (doc, ent_type): the MRC 1->N
    fan-out with start/end indicator vectors for the queried type."""
    gaz = spec.GAZETTEER
    rows = []
    for doc_id, text in zip(batch["doc_id"], batch["text"]):
        tokens = text.split(" ")
        n = len(tokens)
        for ent_type, query in TYPE_QUERIES.items():
            starts = np.zeros(n, dtype=np.int8)
            ends = np.zeros(n, dtype=np.int8)
            for pos, tok in enumerate(tokens):
                if gaz.get(tok) == ent_type:
                    starts[pos] = 1
                    ends[pos] = 1
            rows.append(
                (doc_id, ent_type, query, list(starts), list(ends), n)
            )
    return arrow_block(
        pd.DataFrame(
            rows,
            columns=["doc_id", "ent_type", "query", "starts", "ends", "n_tokens"],
        )
    )


def decode_rows_batch(batch: pd.DataFrame) -> pa.Table:
    """Pointer decode per row (reference span pairing
    rex/utils/position.py:72-86): start/end indicator vectors ->
    non-overlapping (start, end) spans."""
    rows = []
    for doc_id, ent_type, starts, ends in zip(
        batch["doc_id"], batch["ent_type"], batch["starts"], batch["ends"]
    ):
        for s, e in extract_spans_from_start_end(list(starts), list(ends)):
            rows.append((doc_id, ent_type, s, e))
    return arrow_block(
        pd.DataFrame(
            rows, columns=["doc_id", "ent_type", "start_pos", "end_pos"]
        ),
        schema=pa.schema(
            [
                ("doc_id", pa.int64()),
                ("ent_type", pa.string()),
                ("start_pos", pa.int64()),
                ("end_pos", pa.int64()),
            ]
        ),
    )


def mrc_entities(docs_ds):
    """docs -> fan-out -> decode: entity rows (still one source row per
    (doc, type) upstream; output row per decoded span)."""
    return docs_ds.map_batches(
        fanout_queries_batch, batch_format="pandas"
    ).map_batches(decode_rows_batch, batch_format="pandas")


def union_per_doc(entities_ds):
    """Per-doc union of per-type results (the metrics/mrc_ner.py:24-39
    id2ents merge): groupby(doc_id) -> sorted distinct entity list +
    count.  Partial per-batch dedupe keeps the shuffle small."""
    from ray.data.aggregate import Count, Sum

    def dedupe(b: pd.DataFrame) -> pa.Table:
        return arrow_block(b.drop_duplicates())

    partial = pre_shuffle(
        entities_ds.map_batches(dedupe, batch_format="pandas")
    )
    merged = partial.groupby(
        ["doc_id", "ent_type", "start_pos", "end_pos"]
    ).aggregate(Count(alias_name="_dup")).drop_columns(["_dup"])  # distinct

    def per_doc(b: pd.DataFrame) -> pa.Table:
        g = (
            b.groupby("doc_id", sort=False)
            .size()
            .rename("n_entities")
            .reset_index()
        )
        g["n_entities"] = g["n_entities"].astype("int64")
        return arrow_block(g)

    partial2 = pre_shuffle(merged.map_batches(per_doc, batch_format="pandas"))
    return partial2.groupby("doc_id").aggregate(
        Sum("n_entities", alias_name="n_entities")
    )
