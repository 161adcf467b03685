"""Driver contract for the rex_ray engine.

The driver initialises Ray BEFORE importing this module; nothing here
(nor in the rex_ray library) calls ``ray.init``/``ray.shutdown``.

* ``entry()``       — flagship KG pipeline (interleaved docs -> triple
                      store) at sf0.001; returns a ray.data.Dataset.
* ``queries()``     — one callable per implemented operator/pipeline
                      (SURVEY.md §2 coverage), ``(sf_dir) -> Dataset``.
* ``oracle_sql()``  — DuckDB-equivalent SQL per query, rendered from the
                      same literal spec the Ray stages use
                      (rex_ray/pipelines/spec.py), guaranteeing no drift.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry() -> Any:
    from rex_ray.pipelines import kg

    return kg.run_flagship("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from rex_ray.pipelines.queries import queries as _queries

    return _queries()


def oracle_sql() -> dict[str, str]:
    from rex_ray.pipelines.queries import oracle_sql as _oracle

    return _oracle()
