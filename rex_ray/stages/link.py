"""Entity linking: alias-dictionary probe + embedding-similarity
disambiguation (SURVEY.md §2.4 'new-engine only' row).

The alias/canonical dictionary is SMALL-SIDE state: built once on the
driver (or from a distinct-surface aggregation), shipped via
``ray.put`` ONCE, and read per actor in ``__init__`` — never re-shipped
per batch.  NIL mentions (surface absent from the dictionary) keep a
``nil:<surface>`` id (the anti-join path).

Disambiguation: when a surface maps to MULTIPLE candidate canonical
ids, the candidate whose entity embedding is most cosine-similar to the
mention's context embedding wins.  Embeddings here are deterministic
hashed bag-of-words vectors (no model weights in the sandbox); the
plumbing — broadcast candidate matrix, per-batch numpy matmul — is the
real, scale-ready part.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np
import pandas as pd

import ray

from rex_ray.functions.blocks import default_concurrency


def hashed_embedding(tokens: List[str], dim: int = 32) -> np.ndarray:
    """Deterministic hashed-BoW unit vector (FNV bucket + sign)."""
    v = np.zeros(dim, dtype=np.float64)
    for t in tokens:
        h = 2166136261
        for b in t.encode("utf-8"):
            h = ((h ^ b) * 16777619) & 0xFFFFFFFF
        v[h % dim] += 1.0 if (h >> 16) & 1 else -1.0
    n = np.linalg.norm(v)
    return v / n if n > 0 else v


class CanonicalLinker:
    """mention/triple rows -> canonical entity ids via broadcast dict.

    ``canon_ref`` is a ``ray.ObjectRef`` to the surface->entity_id dict
    (ray.put once on the driver); resolved once per actor.
    """

    def __init__(self, canon_ref, nil_prefix: str = "nil:"):
        canon = ray.get(canon_ref) if isinstance(canon_ref, ray.ObjectRef) else canon_ref
        self._map = pd.Series(canon)
        self.nil_prefix = nil_prefix

    def _link(self, surfaces: pd.Series) -> pd.Series:
        linked = surfaces.map(self._map)
        nil = linked.isna()
        if nil.any():
            linked = linked.where(~nil, self.nil_prefix + surfaces)
        return linked

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        if "subj" in batch.columns:  # triple rows
            batch = batch.assign(
                subj_id=self._link(batch["subj"]),
                obj_id=self._link(batch["obj"]),
            )
        else:  # mention rows
            batch = batch.assign(entity_id=self._link(batch["surface"]))
        return batch


class EmbeddingDisambiguator:
    """Ambiguous-surface resolution by cosine similarity.

    ``candidates``: surface -> list of candidate entity ids.  The
    candidate embedding matrix is built once per actor; per batch, the
    context embedding (hashed BoW of a +-2-token window) is compared to
    all candidates of the surface with one vectorized dot product.
    """

    def __init__(
        self,
        candidates_ref,
        dim: int = 32,
        entity_vectors: Optional[Dict[str, np.ndarray]] = None,
    ):
        cands: Dict[str, List[str]] = (
            ray.get(candidates_ref)
            if isinstance(candidates_ref, ray.ObjectRef)
            else candidates_ref
        )
        self.dim = dim
        self._cands = cands
        ids = sorted({e for lst in cands.values() for e in lst})
        if entity_vectors is None:
            entity_vectors = {e: hashed_embedding([e], dim) for e in ids}
        self._emb = {e: entity_vectors[e] for e in ids}

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        # batch: mention rows with doc text context column 'context'
        # (list of window tokens, provided by the extractor)
        chosen = []
        for surface, context in zip(batch["surface"], batch["context"]):
            cands = self._cands.get(surface)
            if not cands:
                chosen.append(None)
                continue
            if len(cands) == 1:
                chosen.append(cands[0])
                continue
            ctx = hashed_embedding(list(context), self.dim)
            mat = np.stack([self._emb[c] for c in cands])
            sims = mat @ ctx
            # deterministic tie-break: highest sim, then id order
            best = int(np.lexsort((np.array(cands), -sims))[0])
            chosen.append(cands[best])
        out = batch.copy()
        out["entity_id"] = chosen
        return out


_LINKER_CACHE: Dict[str, "CanonicalLinker"] = {}


def link_triples(triples_ds, canonical: Dict[str, str],
                 use_actors: bool = False, **kwargs):
    """Scored triples -> triples with subj_id/obj_id columns.

    The canonical dict is broadcast once (``ray.put``); the default
    TASK path resolves it once per worker process via a ref-keyed
    cache (an actor pool pays seconds of spin-up per pipeline for the
    same once-per-process semantics).  ``use_actors=True`` restores
    the pool for heavyweight linker state (embedding indexes).
    """
    ref = ray.put(canonical)
    if use_actors:
        return triples_ds.map_batches(
            CanonicalLinker,
            fn_constructor_kwargs={"canon_ref": ref},
            batch_format="pandas",
            concurrency=kwargs.pop("concurrency", None)
            or default_concurrency(),
            **kwargs,
        )
    kwargs.pop("concurrency", None)

    def fn(batch, _ref=ref):
        key = _ref.hex()
        linker = _LINKER_CACHE.get(key)
        if linker is None:
            linker = CanonicalLinker(_ref)
            _LINKER_CACHE[key] = linker
            if len(_LINKER_CACHE) > 16:  # bound per-worker cache
                _LINKER_CACHE.pop(next(iter(_LINKER_CACHE)))
        return linker(batch)

    return triples_ds.map_batches(fn, batch_format="pandas", **kwargs)
