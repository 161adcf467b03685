"""Entity linking: alias-dictionary probe + embedding-similarity
disambiguation (SURVEY.md §2.4 'new-engine only' row).

The alias/canonical dictionary is SMALL-SIDE state: built once on the
driver (or from a distinct-surface aggregation), shipped via
``ray.put`` ONCE, and read per actor in ``__init__`` — never re-shipped
per batch.  NIL mentions (surface absent from the dictionary) keep a
``nil:<surface>`` id (the anti-join path).

Disambiguation: when a surface maps to MULTIPLE candidate canonical
ids, the candidate whose entity embedding is most cosine-similar to the
mention's context embedding wins.  Candidate embeddings are one-hot
marker vectors from the spec fixture (equal norms, so the cosine
argmax is closed-form for the oracle); the plumbing — broadcast
candidate matrix, ONE batch-level matmul — is the real, scale-ready
part, and a learned entity-embedding table drops into the same matrix.
"""

from __future__ import annotations

from typing import Dict, List

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
    """Ambiguous-surface resolution by embedding cosine similarity.

    ``candidates``: surface -> {entity id -> marker tokens} (the spec's
    ``AMBIG_ALIASES`` shape).  Each candidate's entity embedding is a
    one-hot vector over the marker vocabulary (equal marker counts per
    candidate, so cosine argmax reduces to the context marker-count
    argmax — the property the DuckDB oracle checks); the context
    embedding is the count vector of the mention's +-radius window
    tokens over that same vocabulary.

    Fully vectorized: the candidate matrix C is built once per actor;
    per batch, ONE ``X @ C.T`` scores every (mention, candidate) pair,
    a per-surface candidate mask restricts the argmax, and ties break
    to the lexicographically smaller entity id (candidate rows sorted
    by id, argmax takes the first maximum).
    """

    def __init__(self, candidates_ref, radius: int = 2):
        cands: Dict[str, Dict[str, List[str]]] = (
            ray.get(candidates_ref)
            if isinstance(candidates_ref, ray.ObjectRef)
            else candidates_ref
        )
        self.radius = radius
        self._window_cols = [
            f"w{o:+d}" for o in range(-radius, radius + 1) if o != 0
        ]
        markers = sorted(
            {m for c in cands.values() for ms in c.values() for m in ms}
        )
        self._marker_idx = {m: i for i, m in enumerate(markers)}
        # candidate rows sorted by entity id -> argmax tie = smaller id
        self.cand_ids = sorted(
            {e for c in cands.values() for e in c}
        )
        cid = {e: i for i, e in enumerate(self.cand_ids)}
        self.C = np.zeros((len(self.cand_ids), len(markers)))
        self._surfaces = sorted(cands)
        sidx = {s: i for i, s in enumerate(self._surfaces)}
        self._surface_idx = sidx
        self.mask = np.zeros(
            (len(self._surfaces), len(self.cand_ids)), dtype=bool
        )
        for s, cmap in cands.items():
            for e, ms in cmap.items():
                for m in ms:
                    self.C[cid[e], self._marker_idx[m]] = 1.0
                self.mask[sidx[s], cid[e]] = True

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        """mention rows (surface + window-token columns w-2..w+2) ->
        + entity_id column."""
        n = len(batch)
        X = np.zeros((n, len(self._marker_idx)))
        rows = np.arange(n)
        for col in self._window_cols:
            idx = batch[col].map(self._marker_idx)
            valid = idx.notna().to_numpy()
            np.add.at(
                X, (rows[valid], idx[valid].astype(np.int64)), 1.0
            )
        sims = X @ self.C.T  # (n, n_candidates)
        srow = batch["surface"].map(self._surface_idx).to_numpy(
            dtype=np.int64
        )
        sims = np.where(self.mask[srow], sims, -np.inf)
        best = sims.argmax(axis=1)
        out = batch.copy()
        out["entity_id"] = np.asarray(self.cand_ids, dtype=object)[best]
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


def link_triples_via_join(triples_ds, map_ds, nil_prefix: str = "nil:",
                          num_partitions: int = None,
                          est_left_rows: int = None):
    """Distributed-join twin of :func:`link_triples` for canonical maps
    too large to broadcast: ``map_ds`` is a (node, canonical) Dataset
    (e.g. :func:`canonical.canonical_labels_ds` output, canonical ids
    already prefixed), joined twice (subj side, obj side) with
    left_outer semantics; unmatched surfaces get ``nil:<surface>`` —
    byte-identical output to the broadcast linker (equality-asserted
    in tests).  Two hash-shuffle joins sized to the data volume; at
    10^12 docs this replaces an impossible multi-GB ``ray.put``.

    ``est_left_rows``: optional upper bound on the triple-side row
    count (any cheap estimate — e.g. a metadata ``count()`` of the
    materialized upstream).  The partition count is sized to the
    LARGER side, so a small canonical map never funnels a huge triple
    stream through two partitions (round-4 advice)."""
    import pyarrow as pa

    from rex_ray.functions.blocks import arrow_block, compact_blocks
    from rex_ray.stages.relational import default_join_partitions

    n_map = map_ds.count()
    # default partition count sized to the data (~50k rows per
    # partition on the BIGGER join side), clamped to the cluster
    # default — a fixed CPU-count fan-out spends more on aggregator
    # spin-up than the join itself on small inputs (measured
    # 6.3 s -> 3.1 s at sf0.1), while sizing only to the map side
    # would blow per-partition memory when a huge triple stream meets
    # a just-above-threshold map
    n_size = max(n_map, est_left_rows or 0)
    nparts = num_partitions or max(
        2, min(default_join_partitions(), 1 + n_size // 50_000)
    )

    # degenerate empty map: every surface is NIL; the left_outer join
    # below would lose the empty right side's schema (Ray 2.49) and
    # abort, so compute the exact answer map-side
    if n_map == 0:
        def all_nil(b: pd.DataFrame) -> pd.DataFrame:
            return b.assign(
                subj_id=nil_prefix + b["subj"].astype(str),
                obj_id=nil_prefix + b["obj"].astype(str),
            )

        return triples_ds.map_batches(all_nil, batch_format="pandas")

    def renamed(side: str, id_col: str):
        return map_ds.map_batches(
            lambda b, s=side, i=id_col: arrow_block(
                pd.DataFrame({s: b["node"], i: b["canonical"]})
            ),
            batch_format="pandas",
        )

    def fill_nil(col: str):
        def fn(b: pd.DataFrame) -> pd.DataFrame:
            v = b[col]
            key = "subj" if col == "subj_id" else "obj"
            b[col] = v.where(v.notna(), nil_prefix + b[key].astype(str))
            return b

        return fn

    out = compact_blocks(triples_ds).join(
        compact_blocks(renamed("subj", "subj_id")),
        join_type="left_outer", on=("subj",), num_partitions=nparts,
    ).map_batches(fill_nil("subj_id"), batch_format="pandas")
    out = compact_blocks(out).join(
        compact_blocks(renamed("obj", "obj_id")),
        join_type="left_outer", on=("obj",), num_partitions=nparts,
    ).map_batches(fill_nil("obj_id"), batch_format="pandas")
    return out


def ambiguous_mentions_with_context(docs_ds, radius: int = 2):
    """(doc_id, text) -> one row per AMBIG_ALIASES-surface mention with
    its +-radius window tokens as columns w-2..w+2 (None beyond the doc
    edge).  Vectorized: explode + isin + one hash merge per offset."""
    import pyarrow as pa

    from rex_ray.pipelines import spec
    from rex_ray.stages.extract import _doc_id_type, _explode_tokens

    surfaces = set(spec.AMBIG_ALIASES)

    def fn(batch: pd.DataFrame) -> "pa.Table":
        from rex_ray.functions.blocks import arrow_block

        ex = _explode_tokens(batch)
        m = ex[ex["tok"].isin(surfaces)].rename(
            columns={"tok": "surface"}
        )
        look = ex.rename(columns={"tok": "w"})
        for off in range(-radius, radius + 1):
            if off == 0:
                continue
            col = f"w{off:+d}"
            shifted = look.assign(pos=look["pos"] - off)
            m = m.merge(
                shifted.rename(columns={"w": col}),
                on=["doc_id", "pos"],
                how="left",
            )
        m["pos"] = m["pos"].astype("int64")
        cols = ["doc_id", "pos", "surface"] + [
            f"w{o:+d}" for o in range(-radius, radius + 1) if o != 0
        ]
        schema = pa.schema(
            [("doc_id", _doc_id_type(batch["doc_id"])),
             ("pos", pa.int64()), ("surface", pa.string())]
            + [(c, pa.string()) for c in cols[3:]]
        )
        return arrow_block(m[cols].reset_index(drop=True), schema=schema)

    return docs_ds.map_batches(fn, batch_format="pandas")


def disambiguate_mentions(docs_ds, radius: int = None, **kwargs):
    """documents -> disambiguated ambiguous-surface mentions
    (doc_id, pos, surface, entity_id) via the broadcast candidate
    matrix + one vectorized dot product per batch."""
    from rex_ray.pipelines import spec

    r = radius if radius is not None else spec.AMBIG_CONTEXT_RADIUS
    ctx = ambiguous_mentions_with_context(docs_ds, radius=r)
    ref = ray.put(spec.AMBIG_ALIASES)
    out = ctx.map_batches(
        EmbeddingDisambiguator,
        fn_constructor_kwargs={"candidates_ref": ref, "radius": r},
        batch_format="pandas",
        concurrency=kwargs.pop("concurrency", None) or default_concurrency(),
        **kwargs,
    )
    return out.select_columns(["doc_id", "pos", "surface", "entity_id"])
