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

import re

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str | list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    path: str | None = None,
) -> None:
    """Persist ``df`` as a parquet table bucketed (and bucket-sorted) by key.

    Bucketed layout only exists through the catalog (``saveAsTable``) — a
    plain ``parquet(path)`` write drops the bucket metadata and with it the
    shuffle elision. ``path`` makes it an external table so the data
    outlives ``spark.sql('DROP TABLE ...')``.

    ``bucket_col`` must be the FULL join-key set of the joins it is meant
    to de-shuffle, not a subset: Spark's co-partition check
    (``spark.sql.requireAllClusterKeysForCoPartition``, default true)
    only elides both exchanges when the bucket expressions equal the join
    keys exactly — bucketing two tables on ``ts`` and joining on
    ``(symbol, ts)`` still shuffles both sides (caught live by
    scale_check.py's ``shuffle_exchanges`` record).

    WINDOW recipe (r10): a ``partitionBy(bucket_col).orderBy(...)``
    window runs with ZERO exchanges over any bucketed table (bucket
    hash satisfies the clustered distribution; subset rule), and with
    ZERO Sort nodes when (a) ``sort_cols`` covers the window's REQUIRED
    ordering — partition keys ++ order keys, (b) each bucket holds
    exactly ONE file (``df.repartition(n_buckets, bucket_col)`` before
    the write; the bucketing hash is the repartition hash), and (c) the
    session sets ``spark.sql.legacy.bucketedTableScan.outputOrdering=
    true`` (runtime-settable; it only reports ordering for single-file
    buckets, so it can never claim an order the files lack). Measured
    at 100M bars: the window-feature pass drops from 136 s + 17.9 GB of
    sort spill (generic layout) to 76 s / zero spill — SCALE_PROBE_r10
    ``trading_100m_bucketed``, plan shape pinned by
    tests/test_bucketed.py::test_bucket_sorted_window_zero_exchange_zero_sort.

    DERIVED-ANCHOR corollary (r11): a window anchored on an expression
    of the sort key — ``partitionBy(key, to_date(ts)).orderBy(ts)`` —
    is satisfied by the ``(key, ts)`` file order but not PROVABLY so
    (Spark cannot know ``to_date(ts)`` is monotone in ``ts``), so it
    re-sorts every bucket (8.9 s at 100M, SCALE_PROBE_r10). Fix at the
    layout: MATERIALIZE the anchor as a stored column and put it in
    ``sort_cols`` (``sortBy(key, ds, ts)`` — the physical row order is
    unchanged because the anchor is monotone in the key it derives
    from), then reference the stored column in the window (anchored
    windows partition on it; plain per-key windows lead their orderBy
    with it so the required ordering stays a prefix of the file order).
    Both window families then run sort-free — pinned by
    tests/test_bucketed.py::test_materialized_anchor_windows_zero_sort.
    """
    cols = [bucket_col] if isinstance(bucket_col, str) else list(bucket_col)
    w = df.write.format("parquet").mode("overwrite")
    w = w.bucketBy(n_buckets, *cols)
    w = w.sortBy(*(sort_cols or cols))
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read back a bucketed table (bucket metadata rides on the catalog)."""
    return spark.table(table)


def exchange_count(df: DataFrame, execute: bool = True) -> int:
    """Number of SHUFFLE Exchange operators in the final physical plan.

    The whole point of bucketing is that this returns 0 for joins and
    aggregations on the bucket key; tests assert exactly that.

    Two sharp edges this helper handles explicitly:

    * With AQE on, ``executedPlan().toString()`` on an un-executed frame
      prints the *initial* ``AdaptiveSparkPlan (isFinalPlan=false)`` — the
      plan AQE may still rewrite. ``execute=True`` (default) materializes
      the plan first (``executedPlan().execute().count()`` runs the query
      JVM-side without copying rows to Python), so the string inspected is
      the final plan.
    * Only shuffle exchanges are counted (``Exchange hashpartitioning`` /
      ``rangepartitioning`` / ``SinglePartition``). ``BroadcastExchange``
      is not a shuffle — a broadcast join moving the small side is exactly
      what bucketing does NOT need to eliminate — and ``ReusedExchange``
      references don't re-shuffle. Neither matches ``\\bExchange (hash…``.

    Intended for tests and plan audits on bounded frames (``execute=True``
    runs the whole query); pass ``execute=False`` only to inspect a plan
    you have already executed through this exact DataFrame object.
    """
    jqe = df._jdf.queryExecution()
    if execute:
        jqe.executedPlan().execute().count()
    plan = jqe.executedPlan().toString()
    # an executed AdaptiveSparkPlan prints "== Final Plan ==" followed by
    # "== Initial Plan ==" — count only the plan that actually ran
    plan = plan.split("== Initial Plan ==")[0]
    # Count every Exchange form: hash/range/single for joins+aggs+sorts,
    # RoundRobinPartitioning for plain repartition(n)/rebalance, and
    # PartitioningCollection for composite requirements — a zero-shuffle
    # assertion must not pass just because the shuffle used an unlisted
    # partitioning scheme.
    return len(
        re.findall(
            r"\bExchange (?:hashpartitioning|rangepartitioning|SinglePartition"
            r"|RoundRobinPartitioning|PartitioningCollection)",
            plan,
        )
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
