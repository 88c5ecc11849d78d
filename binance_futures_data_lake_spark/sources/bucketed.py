"""Bucketed-table layout: pre-shuffled storage for co-located joins.

At 100 TB the dominant cost of a fact-fact equi-join (lineitem ⋈ orders on
orderkey) is the shuffle: both sides are exchanged across the cluster every
time the join runs. Bucketing pays that shuffle ONCE at write time — rows
are hash-partitioned into a fixed number of buckets by the join key and
each bucket is sorted — after which every join/groupBy on the bucket key
reads co-located, pre-sorted data: the physical plan has ZERO Exchange
nodes (asserted in tests/test_bucketed.py, recorded in PLANS.md).

This is the Spark-native analogue of the reference lake's per-symbol
directory layout (reference src/bfdl/transforms/compact_staging.py:19-37,
collectors/klines_m1.py:35 — one symbol's data always lands under one
``symbol=XXX/`` root, so symbol-local work never crosses files): here the
"place" is a bucket id, the co-location guarantee is enforced by the table
catalog rather than by path convention, and it composes with every
relational operator instead of only per-symbol scans.

Bucket-count choice at scale: buckets are the unit of join parallelism and
must divide work evenly — pick ``n_buckets`` so one bucket of the LARGER
side fits an executor's memory (e.g. 100 TB fact / 4096 buckets ≈ 25 GB per
bucket per side of the shuffle-free sort-merge join), and use the same
count on every table that shares the key, since Spark only elides both
exchanges when bucket counts match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int,
    sort_cols: list[str] | None = None,
    path: str | None = None,
) -> None:
    """Persist ``df`` as a parquet table bucketed (and bucket-sorted) by key.

    Bucketed layout only exists through the catalog (``saveAsTable``) — a
    plain ``parquet(path)`` write drops the bucket metadata and with it the
    shuffle elision. ``path`` makes it an external table so the data
    outlives ``spark.sql('DROP TABLE ...')``.
    """
    w = df.write.format("parquet").mode("overwrite")
    w = w.bucketBy(n_buckets, bucket_col)
    w = w.sortBy(*(sort_cols or [bucket_col]))
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read back a bucketed table (bucket metadata rides on the catalog)."""
    return spark.table(table)


def exchange_count(df: DataFrame) -> int:
    """Number of Exchange (shuffle) operators in the executed plan.

    The whole point of bucketing is that this returns 0 for joins and
    aggregations on the bucket key; tests assert exactly that.
    """
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(
        1
        for line in plan.splitlines()
        if "Exchange" in line and "ReusedExchange" not in line
    )


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str] | str,
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed tables with the shuffle elided.

    Both tables must be bucketed on the join key with EQUAL bucket counts;
    Spark then plans a sort-merge join whose children read buckets in
    place (no Exchange, and no Sort either when the tables are bucket-
    sorted on the key). AQE is left on — with zero exchanges there is
    nothing for it to re-plan, so plans stay stable.
    """
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, on=on, how=how)
