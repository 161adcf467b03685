"""Job-level decorators (reference rex/utils/wrapper.py:20-140) and the
five-seed repeated-run harness (rex/templates/five_runs.py:11-41)."""

import json

import numpy as np
import pytest

from rex_ray.wrappers import (
    driver_only,
    file_notifier,
    memoize,
    notify_on_failure,
    retry,
    safe_try,
    timing,
)
from rex_ray.pipelines.repeated import REF_SEEDS, repeated_runs


def test_safe_try_swallows_and_returns_none():
    logs = []

    @safe_try(log=logs.append, start_msg="go", end_msg="done")
    def boom():
        raise ValueError("x")

    assert boom() is None
    assert logs[0] == "go"
    assert any("ValueError" in m for m in logs)
    assert logs[-2] == "done"
    assert "call time" in logs[-1]


def test_safe_try_passthrough_result():
    @safe_try(log=lambda m: None)
    def ok(a, b=1):
        return a + b

    assert ok(2, b=3) == 5


def test_retry_succeeds_after_failures():
    calls = {"n": 0}

    @retry(max_tries=3, delay_seconds=0)
    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("transient")
        return "ok"

    assert flaky() == "ok"
    assert calls["n"] == 3


def test_retry_raises_last_error():
    @retry(max_tries=2, delay_seconds=0)
    def always():
        raise RuntimeError("perm")

    with pytest.raises(RuntimeError, match="perm"):
        always()


def test_memoize_caches_positional():
    calls = []

    @memoize
    def f(x):
        calls.append(x)
        return x * 2

    assert f(2) == 4 and f(2) == 4 and f(3) == 6
    assert calls == [2, 3]


def test_timing_passthrough():
    logs = []
    wrapped = timing(lambda x: x + 1, log=logs.append)
    assert wrapped(1) == 2
    assert "took" in logs[0]


def test_driver_only_runs_on_driver(ray_session):
    # the pytest process IS the driver
    @driver_only
    def f():
        return 42

    assert f() == 42


def test_driver_only_noop_in_worker(ray_session):
    import ray

    from rex_ray.wrappers import driver_only as d_o

    @ray.remote
    def inside():
        @d_o
        def f():
            return 42

        return f()

    assert ray.get(inside.remote()) is None


def test_notify_on_failure_writes_event(tmp_path):
    path = str(tmp_path / "alerts.jsonl")

    @notify_on_failure(file_notifier(path), reraise=False)
    def boom():
        raise KeyError("missing")

    assert boom() is None
    ev = json.loads(open(path).read().splitlines()[0])
    assert ev["func"] == "boom" and "KeyError" in ev["error"]
    assert "traceback" in ev


def test_repeated_runs_mean_std_and_metric_field():
    out = repeated_runs(
        lambda seed: {"eval": {"f1": float(seed % 10)}},
        seeds=(1, 2, 3),
        metric_field="eval.f1",
    )
    assert out["metrics"] == [1.0, 2.0, 3.0]
    assert out["mean"] == pytest.approx(2.0)
    assert out["std"] == pytest.approx(np.std([1, 2, 3]))
    assert set(out["runs"]) == {1, 2, 3}


def test_ref_seed_ladder_matches_reference():
    # rex/templates/five_runs.py:14
    assert REF_SEEDS == (17, 127, 1227, 12227, 122227)


def test_five_seed_scored_triples_deterministic(ray_session):
    from rex_ray.pipelines.repeated import five_seed_scored_triples

    sf = "/root/testdata/sf0.001"
    a = five_seed_scored_triples(sf, seeds=(17, 127))
    b = five_seed_scored_triples(sf, seeds=(17,))
    assert a["metrics"][0] == b["metrics"][0]
    # different seeds -> different weight draws -> different metric
    assert a["metrics"][0] != a["metrics"][1]
    assert a["std"] >= 0.0
