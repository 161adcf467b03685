"""Job-level decorators: guarded execution, retries, notification.

Reference semantics: rex/utils/wrapper.py:20-140 (``safe_try``,
``retry``, ``memoize``, ``timing``, ``rank_zero_only``,
``email_on_failure``) and rex/utils/notification.py.  Re-expressed
for a Ray engine:

* per-task/actor retries inside a pipeline belong to Ray
  (``max_retries`` / ``max_restarts``) and to the dead-letter stage
  (:mod:`rex_ray.stages.errors`) — these decorators are the JOB level:
  wrap a whole pipeline run, a CLI command, a checkpoint writer.
* ``rank_zero_only`` becomes :func:`driver_only` — run only on the Ray
  driver process, a no-op inside workers (the Ray analogue of "local
  process index 0").
* ``email_on_failure`` becomes :func:`notify_on_failure` with a
  pluggable notifier callable — no SMTP in a cluster sandbox; the
  default notifier appends a JSON line to a local file so an external
  watcher (or a test) can tail it.
"""

from __future__ import annotations

import functools
import json
import time
import traceback
from datetime import datetime, timezone
from typing import Any, Callable, Dict, Optional

__all__ = [
    "safe_try",
    "retry",
    "memoize",
    "timing",
    "driver_only",
    "notify_on_failure",
    "file_notifier",
]


def safe_try(
    func: Optional[Callable] = None,
    *,
    start_msg: Optional[str] = None,
    end_msg: Optional[str] = None,
    log: Callable[[str], None] = print,
):
    """Run ``func``, log-and-swallow any exception (KeyboardInterrupt
    re-raised), always report the wall time.  Returns None on failure —
    the reference contract (wrapper.py:19-55)."""

    def wrap(f):
        @functools.wraps(f)
        def inner(*args, **kwargs):
            if start_msg is not None:
                log(str(start_msg))
            t0 = time.monotonic()
            try:
                return f(*args, **kwargs)
            except KeyboardInterrupt:
                raise
            except Exception:
                log(traceback.format_exc())
                return None
            finally:
                if end_msg is not None:
                    log(str(end_msg))
                log(
                    f"func `{f.__name__}` call time: "
                    f"{time.monotonic() - t0:.3f}s"
                )

        return inner

    return wrap if func is None else wrap(func)


def retry(max_tries: int = 3, delay_seconds: float = 1.0):
    """Retry with a fixed delay; the last failure propagates
    (wrapper.py:68-83).  For per-batch work inside a pipeline prefer
    Ray task retries; this is for driver-side I/O (a flaky filesystem,
    an object-store put race)."""

    def deco(f):
        @functools.wraps(f)
        def inner(*args, **kwargs):
            for attempt in range(1, max_tries + 1):
                try:
                    return f(*args, **kwargs)
                except Exception:
                    if attempt == max_tries:
                        raise
                    time.sleep(delay_seconds)

        return inner

    return deco


def memoize(f: Callable) -> Callable:
    """Positional-args memo cache (wrapper.py:86-97)."""
    cache: Dict[tuple, Any] = {}

    @functools.wraps(f)
    def inner(*args):
        if args not in cache:
            cache[args] = f(*args)
        return cache[args]

    return inner


def timing(f: Callable, log: Callable[[str], None] = print) -> Callable:
    """Print the call's wall time (wrapper.py:100-108)."""

    @functools.wraps(f)
    def inner(*args, **kwargs):
        t0 = time.monotonic()
        out = f(*args, **kwargs)
        log(f"func {f.__name__} took {time.monotonic() - t0:.3f}s")
        return out

    return inner


def _on_driver() -> bool:
    try:
        import ray

        if not ray.is_initialized():
            return True
        ctx = ray.get_runtime_context()
        return ctx.worker.mode != ray.WORKER_MODE
    except Exception:
        return True


def driver_only(f: Callable) -> Callable:
    """Run only on the Ray driver; None inside workers — the Ray
    analogue of the reference's ``rank_zero_only``
    (wrapper.py:58-65)."""

    @functools.wraps(f)
    def inner(*args, **kwargs):
        if _on_driver():
            return f(*args, **kwargs)
        return None

    return inner


def file_notifier(path: str) -> Callable[[Dict[str, Any]], None]:
    """Default notifier: append one JSON line per event to ``path``."""

    def notify(event: Dict[str, Any]) -> None:
        with open(path, "a", encoding="utf8") as fh:
            fh.write(json.dumps(event, default=str) + "\n")

    return notify


def notify_on_failure(
    notifier: Callable[[Dict[str, Any]], None],
    *,
    reraise: bool = True,
):
    """Call ``notifier`` with a structured event when the wrapped
    function raises (reference ``email_on_failure``,
    wrapper.py:111-140, with the SMTP transport swapped for a
    pluggable callable)."""

    def deco(f):
        @functools.wraps(f)
        def inner(*args, **kwargs):
            try:
                return f(*args, **kwargs)
            except Exception as err:
                notifier(
                    {
                        "func": f.__name__,
                        "error": repr(err),
                        "traceback": traceback.format_exc(),
                        "at": datetime.now(timezone.utc).isoformat(),
                    }
                )
                if reraise:
                    raise
                return None

        return inner

    return deco
