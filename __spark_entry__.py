"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship OHLCV resample on sf0.001;
``queries()``/``oracle_sql()`` expose the operator inventory from
SURVEY.md §2 with DuckDB oracles (see
binance_futures_data_lake_spark/plans/driver_queries.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from binance_futures_data_lake_spark.plans import driver_queries as DQ  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return DQ.QUERIES["ohlcv_5m"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(DQ.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(DQ.ORACLE)
