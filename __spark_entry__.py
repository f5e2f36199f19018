"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in the ``fastmorph_spark`` package; this file is a
thin adapter (see fastmorph_spark/registry.py for the operator registry).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from pyspark.sql import DataFrame, SparkSession  # noqa: E402

from fastmorph_spark import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: expression-BM25 top-10 for 'fast hash join' over
    /root/testdata/sf0.001/documents.parquet (SURVEY.md §7 M0)."""
    return registry.q_bm25_topk(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL for each key in ``queries()``."""
    return registry.oracle_sqls()
