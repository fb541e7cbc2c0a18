"""Query registry: every engine op exposed through the driver contract.

Each entry pairs a Spark callable ``(spark, sf_dir) -> DataFrame`` with
the equivalent ANSI SQL for the DuckDB oracle (or ``None`` for ops whose
semantics are not SQL-expressible — seeded Bernoulli sampling, ML model
training, custom stateful streaming — which the driver records as
rows-only checks).

Cross-engine reproducibility rules used throughout (see
``functions/numeric.py`` and ``functions/hashing.py``):
  * double SUM/AVG → exact DECIMAL accumulation, final cast to double;
  * anything hash-dependent → the portable md5-based hash;
  * query outputs never contain NaN/±Inf *values* (only counts of them) —
    cleaning ops exist precisely to strip those;
  * every computed column aliased identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QuerySpec = tuple[Callable[[SparkSession, str], DataFrame], "str | None"]

REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, sql: str | None):
    def deco(fn):
        REGISTRY[name] = (fn, sql)
        return fn

    return deco


from . import core  # noqa: E402,F401
from . import cleaning  # noqa: E402,F401
from . import sampling  # noqa: E402,F401
from . import text  # noqa: E402,F401
from . import dedup  # noqa: E402,F401
from . import relational_ext  # noqa: E402,F401
from . import multimodal  # noqa: E402,F401
from . import functions_ext  # noqa: E402,F401
from . import similarity  # noqa: E402,F401
from . import ml  # noqa: E402,F401
from . import streaming  # noqa: E402,F401


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in REGISTRY.items() if sql is not None}
