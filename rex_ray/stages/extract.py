"""Mention detection and triple extraction stages.

Reference shape: gazetteer NER (mention flat-map, like the tag-decode
path of ``rex/utils/tagging.py`` feeding ``rex/data/transforms/
sent_re.py:31-63``'s entity-pair fan-out with a validity window), then a
deterministic relation rule + distance-based confidence standing in for
the PCNN scorer (the learned scorer lives in ``stages/scorer.py``).

Both stages are callable CLASSES: the gazetteer/regex state is compiled
once per actor in ``__init__`` (actor pool), per-batch work is
vectorized pandas/numpy.  Mention+pair extraction is FUSED into one
stage for the pipeline path: a document's mentions never cross a batch
boundary, so the pair fan-out needs no shuffle and no doc reassembly.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa

from rex_ray.functions.blocks import arrow_block, default_concurrency
from rex_ray.pipelines import spec


def _doc_id_type(series: pd.Series) -> pa.DataType:
    """documents.parquet carries int64 doc ids; the interleaved text
    view carries 'doc-XXXXXXXX' strings — the stages serve both."""
    return (
        pa.int64()
        if np.issubdtype(series.dtype, np.integer)
        else pa.string()
    )


def _mentions_schema(doc_id_t: pa.DataType) -> pa.Schema:
    return pa.schema(
        [
            ("doc_id", doc_id_t),
            ("pos", pa.int64()),
            ("surface", pa.string()),
            ("ent_type", pa.string()),
        ]
    )


def _triples_schema(doc_id_t: pa.DataType) -> pa.Schema:
    return pa.schema(
        [
            ("doc_id", doc_id_t),
            ("subj", pa.string()),
            ("subj_pos", pa.int64()),
            ("subj_type", pa.string()),
            ("pred", pa.string()),
            ("obj", pa.string()),
            ("obj_pos", pa.int64()),
            ("obj_type", pa.string()),
            ("pair_key", pa.string()),
            ("score", pa.float64()),
        ]
    )


def _explode_tokens(batch: pd.DataFrame) -> pd.DataFrame:
    """(doc_id, text) -> one row per token with its 0-based position.
    Vectorized: split + explode + cumcount."""
    toks = batch["text"].str.split(" ")
    ex = pd.DataFrame(
        {"doc_id": batch["doc_id"], "tok": toks}
    ).explode("tok", ignore_index=False)
    ex["pos"] = ex.groupby(level=0).cumcount()
    return ex.reset_index(drop=True)


class MentionExtractor:
    """Gazetteer mention detector: token == surface -> mention row
    (doc_id, pos, surface, ent_type), span = [pos, pos+1)."""

    def __init__(self, gazetteer: Optional[Dict[str, str]] = None):
        gaz = gazetteer if gazetteer is not None else spec.GAZETTEER
        self._gaz = pd.Series(gaz, name="ent_type")

    def __call__(self, batch: pd.DataFrame) -> pa.Table:
        return arrow_block(
            self.mentions_df(batch),
            schema=_mentions_schema(_doc_id_type(batch["doc_id"])),
        )

    def mentions_df(self, batch: pd.DataFrame) -> pd.DataFrame:
        ex = _explode_tokens(batch)
        hit = ex[ex["tok"].isin(self._gaz.index)].rename(
            columns={"tok": "surface"}
        )
        out = hit.assign(ent_type=hit["surface"].map(self._gaz))
        out["pos"] = out["pos"].astype("int64")
        return out[["doc_id", "pos", "surface", "ent_type"]].reset_index(
            drop=True
        )


class TripleExtractor:
    """Fused mention + windowed pair fan-out + relation rule + score.

    Emits one scored triple per ordered mention pair (h, t) in the same
    document with ``1 <= pos_t - pos_h <= window``:
        (doc_id, subj, subj_pos, subj_type, pred, obj, obj_pos,
         obj_type, pair_key, score)
    The pair merge is a per-distance hash join on (row-local doc index,
    pos) — vectorized, no Python loop over rows.
    """

    def __init__(
        self,
        gazetteer: Optional[Dict[str, str]] = None,
        window: int = spec.PAIR_WINDOW,
        pred_map: Optional[Dict[Tuple[str, str], str]] = None,
        min_score: float = 0.0,
    ):
        self._mentions = MentionExtractor(gazetteer)
        self.window = window
        pm = pred_map if pred_map is not None else spec.PRED_MAP
        self._pred = {f"{h}|{t}": p for (h, t), p in pm.items()}
        self.min_score = min_score

    def __call__(self, batch: pd.DataFrame) -> pa.Table:
        m = self._mentions.mentions_df(batch)
        return self.triples_from_mentions(m, _doc_id_type(batch["doc_id"]))

    def triples_from_mentions(
        self, m: pd.DataFrame, doc_id_t: Optional[pa.DataType] = None
    ) -> pa.Table:
        """Windowed pair fan-out over a mention frame.  Correct only
        when every mention of a doc is present in ``m`` (guaranteed
        when m comes from one extraction batch, or from a whole
        materialized mention block via ``batch_size=None``)."""
        if doc_id_t is None:
            doc_id_t = _doc_id_type(m["doc_id"])
        schema = _triples_schema(doc_id_t)
        parts = []
        for d in range(1, self.window + 1):
            right = m.rename(
                columns={
                    "pos": "obj_pos",
                    "surface": "obj",
                    "ent_type": "obj_type",
                }
            )
            right = right.assign(pos=right["obj_pos"] - d)
            j = m.merge(right, on=["doc_id", "pos"], how="inner")
            if len(j):
                j = j.rename(
                    columns={
                        "pos": "subj_pos",
                        "surface": "subj",
                        "ent_type": "subj_type",
                    }
                )
                j["score"] = 1.0 / d
                parts.append(j)
        if not parts:
            return schema.empty_table()
        out = pd.concat(parts, ignore_index=True)
        type_key = out["subj_type"] + "|" + out["obj_type"]
        out["pred"] = type_key.map(self._pred).fillna(spec.PRED_FALLBACK)
        out["pair_key"] = out["subj"] + spec.BAG_KEY_SEP + out["obj"]
        if self.min_score > 0.0:
            out = out[out["score"] >= self.min_score]
        out["subj_pos"] = out["subj_pos"].astype("int64")
        out["obj_pos"] = out["obj_pos"].astype("int64")
        cols = [f.name for f in schema]
        return arrow_block(out[cols].reset_index(drop=True), schema=schema)


from functools import lru_cache


@lru_cache(maxsize=8)
def _mention_singleton() -> "MentionExtractor":
    return MentionExtractor()


@lru_cache(maxsize=8)
def _triple_singleton(min_score: float) -> "TripleExtractor":
    return TripleExtractor(min_score=min_score)


def _mention_task(batch: pd.DataFrame) -> pa.Table:
    return _mention_singleton()(batch)


def extract_mentions(docs_ds, use_actors: bool = False, **kwargs):
    """documents Dataset (doc_id, text) -> mentions Dataset.

    Default is TASK-based: the gazetteer state is trivial, and the
    per-process lru_cache rebuilds it once per worker — an actor pool
    here only pays ~5 s of spin-up per pipeline (measured: the whole
    flagship dropped 7.7 s -> 2.2 s at sf0.1 when the light stages
    left actor pools).  ``use_actors=True`` restores the pool (the
    right choice once the stage holds real model weights)."""
    if use_actors:
        return docs_ds.map_batches(
            MentionExtractor,
            batch_format="pandas",
            concurrency=kwargs.pop("concurrency", None)
            or default_concurrency(),
            **kwargs,
        )
    kwargs.pop("concurrency", None)
    return docs_ds.map_batches(_mention_task, batch_format="pandas", **kwargs)


def extract_triples(docs_ds, min_score: float = 0.0,
                    use_actors: bool = False, **kwargs):
    """documents Dataset (doc_id, text) -> scored candidate triples
    (task-based by default; see :func:`extract_mentions`)."""
    if use_actors:
        return docs_ds.map_batches(
            TripleExtractor,
            fn_constructor_kwargs={"min_score": min_score},
            batch_format="pandas",
            concurrency=kwargs.pop("concurrency", None)
            or default_concurrency(),
            **kwargs,
        )
    kwargs.pop("concurrency", None)

    def fn(batch: pd.DataFrame, _ms=min_score) -> pa.Table:
        return _triple_singleton(_ms)(batch)

    return docs_ds.map_batches(fn, batch_format="pandas", **kwargs)


def _tagged_schema(doc_id_t: pa.DataType) -> pa.Schema:
    return _triples_schema(doc_id_t).append(
        pa.field("kind", pa.string())
    ).append(pa.field("surface", pa.string()))


_GAZ_EXTRACTOR_CACHE: Dict[str, "TripleExtractor"] = {}


def extract_triples_and_surfaces(
    docs_ds, min_score: float = 0.0, gazetteer: Optional[Dict[str, str]] = None,
    **kwargs
):
    """Single-doc-pass extraction: one streamed output carrying BOTH
    the scored triples (``kind='t'``) and the per-batch distinct
    mention surfaces (``kind='s'``, one tiny row per surface per
    batch) — so the canonical-map aggregation and the pair fan-out
    share ONE pass over the corpus without an intermediate mentions
    dataset.

    Boundary-safe by construction: the pair fan-out runs inside the
    same UDF call that detected the mentions, over input batches that
    respect document row boundaries — unlike fanning out over a
    materialized mentions dataset, where Ray Data's dynamic block
    splitting can cut a large mention block mid-document and silently
    drop cross-boundary pairs.
    """
    kwargs.pop("concurrency", None)

    # Non-default gazetteer (e.g. a learned-NER surface inventory, the
    # >DRIVER_CC_MAX_NODES scenario): broadcast once via ray.put, build
    # the extractor once per worker process keyed by the ref.
    gaz_ref = None
    if gazetteer is not None:
        import ray

        gaz_ref = ray.put(gazetteer)

    def fn(batch: pd.DataFrame, _ms=min_score, _gref=gaz_ref) -> pa.Table:
        if _gref is None:
            ex = _triple_singleton(_ms)
        else:
            key = _gref.hex() + f"|{_ms}"
            ex = _GAZ_EXTRACTOR_CACHE.get(key)
            if ex is None:
                import ray

                ex = TripleExtractor(
                    gazetteer=ray.get(_gref), min_score=_ms
                )
                _GAZ_EXTRACTOR_CACHE[key] = ex
                if len(_GAZ_EXTRACTOR_CACHE) > 8:
                    _GAZ_EXTRACTOR_CACHE.pop(
                        next(iter(_GAZ_EXTRACTOR_CACHE))
                    )
        doc_id_t = _doc_id_type(batch["doc_id"])
        m = ex._mentions.mentions_df(batch)
        triples = ex.triples_from_mentions(m, doc_id_t)
        n_t = triples.num_rows
        surfaces = m["surface"].unique()
        schema = _tagged_schema(doc_id_t)
        cols = []
        for f in schema:
            if f.name == "kind":
                cols.append(
                    pa.array(["t"] * n_t + ["s"] * len(surfaces), f.type)
                )
            elif f.name == "surface":
                cols.append(
                    pa.array([None] * n_t + list(surfaces), f.type)
                )
            else:
                col = triples[f.name].combine_chunks()
                cols.append(
                    pa.concat_arrays(
                        [col, pa.nulls(len(surfaces), f.type)]
                    )
                )
        return pa.Table.from_arrays(cols, schema=schema)

    return docs_ds.map_batches(fn, batch_format="pandas", **kwargs)
