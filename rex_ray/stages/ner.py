"""NER tagging path: BIO tag emission, tag-sequence decode, per-type
P/R/F1 — the reference's tagging pipeline (rex/utils/tagging.py decode,
rex/metrics/tagging.py per-type breakdown) as Ray stages.

Round-trip contract: mentions -> BIO tags -> decode == mentions,
asserted against the SQL oracle (gazetteer mentions are single-token,
so tags are B-TYPE surrounded by O; the decoder must reproduce exact
spans)."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from rex_ray.functions.blocks import arrow_block, pre_shuffle
from rex_ray.functions.metrics import prf1_from_counts
from rex_ray.functions.tagging import get_entities_from_tags
from rex_ray.pipelines import spec


def tag_docs_batch(batch: pd.DataFrame) -> pa.Table:
    """(doc_id, text) -> (doc_id, tokens: list<str>, tags: list<str>),
    BIO tags from the gazetteer (B-TYPE at each hit, O elsewhere).

    Vectorized like ``extract._explode_tokens``: split + explode, one
    C-level ``Series.map`` through the gazetteer for every token in the
    batch, then regroup to per-doc lists — no per-token Python."""
    gaz = pd.Series(spec.GAZETTEER)
    toks = batch["text"].str.split(" ")
    flat = toks.explode()
    hit = flat.map(gaz)
    tags_flat = pd.Series(
        ("B-" + hit).where(hit.notna(), "O"), index=flat.index
    )
    tags = tags_flat.groupby(level=0).agg(list)
    return arrow_block(
        pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy(),
                "tokens": toks.to_numpy(),
                "tags": tags.reindex(batch.index).to_numpy(),
            }
        )
    )


def decode_entities_batch(batch: pd.DataFrame) -> pa.Table:
    """Tagged docs -> one row per decoded entity
    (doc_id, surface, ent_type, start_pos, end_pos) via the reference
    BIO decoder — a flat-map."""
    rows = []
    for doc_id, tokens, tags in zip(
        batch["doc_id"], batch["tokens"], batch["tags"]
    ):
        for surface, ent_type, (s, e) in get_entities_from_tags(
            list(tokens), list(tags), join=" "
        ):
            rows.append((doc_id, surface, ent_type, s, e))
    return arrow_block(
        pd.DataFrame(
            rows,
            columns=["doc_id", "surface", "ent_type", "start_pos", "end_pos"],
        ),
        schema=pa.schema(
            [
                ("doc_id", pa.int64()),
                ("surface", pa.string()),
                ("ent_type", pa.string()),
                ("start_pos", pa.int64()),
                ("end_pos", pa.int64()),
            ]
        ),
    )


def ner_roundtrip(docs_ds):
    """docs -> BIO tags -> decoded entity rows."""
    return docs_ds.map_batches(
        tag_docs_batch, batch_format="pandas"
    ).map_batches(decode_entities_batch, batch_format="pandas")


def ner_type_prf(pred_ds, gold_ds):
    """Per-entity-type P/R/F1 (reference rex/metrics/tagging.py:52-93
    macro breakdown): span-set membership per (doc, span, type), then
    per-type tp/fp/fn sums — vectorized partials, one shuffle."""
    from ray.data.aggregate import Sum

    from rex_ray.stages.parity import membership

    keys = ["doc_id", "start_pos", "end_pos", "ent_type"]
    member = membership(pred_ds, gold_ds, keys)

    def count_batch(t: pa.Table) -> pa.Table:
        df = t.select(["ent_type", "in_pred", "in_gold"]).to_pandas()
        p = df["in_pred"].to_numpy()
        g = df["in_gold"].to_numpy()
        df["tp"] = ((p == 1) & (g == 1)).astype("int64")
        df["fp"] = ((p == 1) & (g == 0)).astype("int64")
        df["fn"] = ((p == 0) & (g == 1)).astype("int64")
        out = (
            df.groupby("ent_type", sort=False)[["tp", "fp", "fn"]]
            .sum()
            .reset_index()
        )
        return arrow_block(out)

    partial = pre_shuffle(member.map_batches(count_batch, batch_format="pyarrow"))
    merged = partial.groupby("ent_type").aggregate(
        Sum("tp", alias_name="tp"),
        Sum("fp", alias_name="fp"),
        Sum("fn", alias_name="fn"),
    )

    def finalize(t: pa.Table) -> pa.Table:
        rows = []
        for ent_type, tp, fp, fn in zip(
            t["ent_type"].to_pylist(), t["tp"].to_pylist(),
            t["fp"].to_pylist(), t["fn"].to_pylist(),
        ):
            m = prf1_from_counts(tp, fp, fn)
            rows.append(
                (ent_type, m["p"], m["r"], m["f1"], tp, fp, fn)
            )
        return arrow_block(
            pd.DataFrame(
                rows, columns=["ent_type", "p", "r", "f1", "tp", "fp", "fn"]
            )
        )

    return merged.map_batches(finalize, batch_format="pyarrow")
