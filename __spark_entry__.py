"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship ER pipeline over sf0.001 documents.
``queries()`` — every implemented operator family (SURVEY.md §2) as
(spark, sf_dir) → DataFrame.
``oracle_sql()`` — DuckDB-runnable SQL equivalent for each SQL-expressible query.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402

from entity_resolution_spark.queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: full entity-resolution pipeline
    (blocking → pairwise scoring → connected components) over the documents table."""
    return QUERIES["er_resolve_docs"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
