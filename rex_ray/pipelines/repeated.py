"""Repeated-run (five-seed) evaluation harness.

Reference semantics: rex/templates/five_runs.py:11-41 — run the same
task once per seed in ``REF_SEEDS``, pull one scalar metric out of each
run's result dict (dotted ``best_metric_field`` path), and report the
per-seed values plus mean/std.

Ray-first shape: each run is a full Dataset pipeline that the caller
reduces to a (small) metrics dict — the per-seed loop is driver-side by
design (runs are sequential, each saturates the cluster), only the
scalar metrics ever cross back.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Sequence

import numpy as np

from rex_ray.functions.collections import get_dict_content

# the reference's fixed seed ladder (five_runs.py:14)
REF_SEEDS = (17, 127, 1227, 12227, 122227)


def repeated_runs(
    run_fn: Callable[[int], Dict[str, Any]],
    seeds: Sequence[int] = REF_SEEDS,
    metric_field: Optional[str] = None,
) -> Dict[str, Any]:
    """Run ``run_fn(seed)`` once per seed; each call returns a metrics
    dict.  ``metric_field`` is a dotted path into that dict (the
    reference's ``best_metric_field``); when None the dict must contain
    a single scalar under ``"metric"``.  Returns per-seed metrics and
    their mean/std (population std, as ``np.std`` in the reference)."""
    per_seed: Dict[int, Dict[str, Any]] = {}
    metrics: list = []
    for seed in seeds:
        out = run_fn(int(seed))
        per_seed[int(seed)] = out
        val = (
            get_dict_content(out, metric_field)
            if metric_field
            else out["metric"]
        )
        metrics.append(float(val))
    return {
        "seeds": [int(s) for s in seeds],
        "metrics": metrics,
        "mean": float(np.mean(metrics)),
        "std": float(np.std(metrics)),
        "runs": per_seed,
    }


def five_seed_scored_triples(
    sf_dir: str, seeds: Sequence[int] = REF_SEEDS
) -> Dict[str, Any]:
    """Concrete wiring: the scored-triples inference pipeline run once
    per seeded weight draw (the engine's stand-in for "train with seed
    s, evaluate"); the tracked metric is the corpus-mean top-relation
    score.  Vocab is built ONCE and shared across runs — only the
    model weights vary with the seed."""
    import ray

    from rex_ray.pipelines.queries import _docs
    from rex_ray.stages.features import build_corpus_vocab
    from rex_ray.stages.scorer import PcnnWeights
    from rex_ray.stages.scorer import relation_label_encoder
    from rex_ray.stages.scorer import score_docs

    docs = _docs(sf_dir)
    vocab = build_corpus_vocab(docs)
    n_rels = len(relation_label_encoder())

    def run(seed: int) -> Dict[str, Any]:
        weights = PcnnWeights(1 << 16, n_rels, seed=seed)
        scored = score_docs(docs, vocab=vocab, weights=weights)
        mean_score = scored.mean("pred_score")
        n = scored.count()
        return {"metric": float(mean_score), "rows": int(n)}

    return repeated_runs(run, seeds=seeds)
