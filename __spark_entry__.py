"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check on sf0.001.
``queries()`` — every implemented operator from SURVEY.md §2.3.
``oracle_sql()`` — DuckDB-equivalent SQL for each oracled query.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import k_means_clustering_via_map_reduce_spark.queries as _Q

_Q.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the 5-way star join (Q4) on /root/testdata/sf0.001."""
    return _Q.QUERIES["q4_star_join"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_Q.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_Q.ORACLE_SQL)
