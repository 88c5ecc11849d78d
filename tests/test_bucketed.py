"""Bucketed-table co-located join: the zero-shuffle claim, asserted.

Writes lineitem and orders (sf0.001 testdata) as same-count bucketed
tables on the orderkey and asserts the fact-fact join and the bucket-key
aggregation plan contain ZERO shuffle Exchange operators — the property
``sources/bucketed.py`` exists to provide.  Broadcast is disabled for the
join assertions so the test exercises the sort-merge path a 100 TB
fact-fact join would actually take (a broadcast join has no shuffle either,
which would make the assertion vacuous).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from binance_futures_data_lake_spark.sources.bucketed import (
    colocated_join,
    exchange_count,
    read_bucketed,
    write_bucketed,
)
from binance_futures_data_lake_spark.sources.testdata import load_table

SF = "/root/testdata/sf0.001"
N_BUCKETS = 8


@pytest.fixture(scope="module")
def bucketed_pair(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("bucketed")
    li = load_table(spark, "lineitem", SF).select(
        "l_orderkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    od = load_table(spark, "orders", SF).select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"
    )
    write_bucketed(
        li, "t_lineitem_b", "l_orderkey", N_BUCKETS,
        sort_cols=["l_orderkey"], path=str(root / "lineitem"),
    )
    write_bucketed(
        od, "t_orders_b", "o_orderkey", N_BUCKETS,
        sort_cols=["o_orderkey"], path=str(root / "orders"),
    )
    yield "t_lineitem_b", "t_orders_b"
    spark.sql("DROP TABLE IF EXISTS t_lineitem_b")
    spark.sql("DROP TABLE IF EXISTS t_orders_b")


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_colocated_join_has_zero_shuffles(spark, bucketed_pair, no_broadcast):
    lt, ot = bucketed_pair
    j = read_bucketed(spark, lt).join(
        read_bucketed(spark, ot),
        on=F.col("l_orderkey") == F.col("o_orderkey"),
        how="inner",
    )
    assert exchange_count(j) == 0


def test_colocated_join_helper_zero_shuffles_and_correct(
    spark, bucketed_pair, no_broadcast
):
    lt, ot = bucketed_pair
    left = read_bucketed(spark, lt).withColumnRenamed("l_orderkey", "orderkey")
    right = read_bucketed(spark, ot).withColumnRenamed("o_orderkey", "orderkey")
    left.createOrReplaceTempView("v_li_b")
    right.createOrReplaceTempView("v_od_b")
    j = colocated_join(spark, "v_li_b", "v_od_b", on="orderkey")
    assert exchange_count(j) == 0

    # same answer as the plain (shuffled) join over the raw parquet
    li = load_table(spark, "lineitem", SF)
    od = load_table(spark, "orders", SF)
    expected = li.join(od, li.l_orderkey == od.o_orderkey).count()
    assert j.count() == expected
    spark.catalog.dropTempView("v_li_b")
    spark.catalog.dropTempView("v_od_b")


def test_bucket_key_aggregation_has_zero_shuffles(spark, bucketed_pair):
    lt, _ = bucketed_pair
    agg = (
        read_bucketed(spark, lt)
        .groupBy("l_orderkey")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
        )
    )
    assert exchange_count(agg) == 0

    # parity with the shuffled aggregation on raw parquet
    raw = (
        load_table(spark, "lineitem", SF)
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
    )
    got = {r["l_orderkey"]: float(r["sum_qty"]) for r in agg.collect()}
    want = {r["l_orderkey"]: float(r["sum_qty"]) for r in raw.collect()}
    assert got == want


def test_plain_join_does_shuffle(spark, no_broadcast):
    """Control: the same join WITHOUT bucketing shuffles both sides."""
    li = load_table(spark, "lineitem", SF).select("l_orderkey", "l_quantity")
    od = load_table(spark, "orders", SF).select("o_orderkey", "o_totalprice")
    j = li.join(od, li.l_orderkey == od.o_orderkey)
    assert exchange_count(j) >= 2


def test_exchange_count_ignores_broadcast(spark):
    """BroadcastExchange must not be counted as a shuffle."""
    li = load_table(spark, "lineitem", SF).select("l_orderkey", "l_quantity")
    od = load_table(spark, "orders", SF).select("o_orderkey")
    j = li.join(F.broadcast(od), li.l_orderkey == od.o_orderkey)
    # one side may still pre-shuffle under AQE coalescing rules, but the
    # broadcast itself must contribute zero
    plan_shuffles = exchange_count(j)
    assert plan_shuffles <= 1


def test_composite_key_join_needs_full_key_bucketing(spark, tmp_path_factory, no_broadcast):
    """Spark's co-partition rule (requireAllClusterKeysForCoPartition,
    default true) only elides the join shuffle when the bucket columns
    equal the FULL join-key set. Bucketing on a subset still shuffles —
    the scale_check probe caught exactly that regression live."""
    root = tmp_path_factory.mktemp("bucketed_composite")
    li = load_table(spark, "lineitem", SF)
    left = li.select("l_orderkey", "l_linenumber", "l_quantity")
    right = li.select(
        F.col("l_orderkey").alias("r_orderkey"),
        F.col("l_linenumber").alias("r_linenumber"),
        "l_extendedprice",
    )
    on_full = ["l_orderkey", "l_linenumber"]

    write_bucketed(left, "t_comp_l", on_full, N_BUCKETS, path=str(root / "l"))
    write_bucketed(
        right, "t_comp_r", ["r_orderkey", "r_linenumber"], N_BUCKETS,
        path=str(root / "r"),
    )
    j = read_bucketed(spark, "t_comp_l").join(
        read_bucketed(spark, "t_comp_r"),
        on=(F.col("l_orderkey") == F.col("r_orderkey"))
        & (F.col("l_linenumber") == F.col("r_linenumber")),
    )
    try:
        assert exchange_count(j) == 0

        # control: bucket on a SUBSET of the join keys -> still shuffles
        write_bucketed(left, "t_sub_l", "l_orderkey", N_BUCKETS, path=str(root / "sl"))
        write_bucketed(right, "t_sub_r", "r_orderkey", N_BUCKETS, path=str(root / "sr"))
        js = read_bucketed(spark, "t_sub_l").join(
            read_bucketed(spark, "t_sub_r"),
            on=(F.col("l_orderkey") == F.col("r_orderkey"))
            & (F.col("l_linenumber") == F.col("r_linenumber")),
        )
        assert exchange_count(js) >= 2
    finally:
        for t in ("t_comp_l", "t_comp_r", "t_sub_l", "t_sub_r"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_exchange_count_sees_round_robin(spark):
    """A plain repartition(n) shuffles via RoundRobinPartitioning — the
    counter must see it, or a zero-shuffle assertion could pass falsely
    (r3 ADVICE)."""
    df = spark.range(1000).repartition(4)
    assert exchange_count(df) == 1


def test_bucket_sorted_window_zero_exchange_zero_sort(spark, tmp_path_factory):
    """The 100 TB answer to the window-sort spill the 100M trading probe
    measured (SCALE_PROBE_r10 trading_100m: 12.7 GB mem + 5.2 GB disk in
    window_features once symbol runs hit 1M rows): a table written
    bucketBy(symbol) + a sortBy covering the window's REQUIRED ordering
    (partition keys ++ order keys) with ONE file per bucket
    (repartition on the bucket key before the write — the bucketing hash
    IS the repartition hash) and read under
    spark.sql.legacy.bucketedTableScan.outputOrdering=true runs a
    partitionBy(symbol).orderBy(ts) window with ZERO exchanges AND ZERO
    sorts — the pass becomes a streaming map over pre-sorted runs, so
    the spill source does not exist. The conf is runtime-settable and
    only reports ordering when each bucket has exactly one file, so it
    can never claim an ordering the files do not have."""
    import re

    from pyspark.sql import Window

    root = tmp_path_factory.mktemp("bucketed_win")
    ev = load_table(spark, "events", SF).select("user_id", "ts", "value")
    write_bucketed(
        ev.repartition(N_BUCKETS, "user_id"),
        "bfdl_test_events_bsorted",
        "user_id",
        N_BUCKETS,
        sort_cols=["user_id", "ts", "value"],
        path=str(root / "events_bsorted"),
    )
    prev = spark.conf.get(
        "spark.sql.legacy.bucketedTableScan.outputOrdering", "false"
    )
    try:
        spark.conf.set(
            "spark.sql.legacy.bucketedTableScan.outputOrdering", "true"
        )
        t = read_bucketed(spark, "bfdl_test_events_bsorted")
        w = Window.partitionBy("user_id").orderBy("ts", "value")
        d = t.withColumn("prev_value", F.lag("value").over(w))
        assert exchange_count(d, execute=False) == 0
        plan = d._jdf.queryExecution().executedPlan().toString()
        assert not re.search(r"\bSort\b", plan), plan
        # and the elision changed nothing: same rows as the plain path
        base = (
            load_table(spark, "events", SF)
            .select("user_id", "ts", "value")
            .withColumn("prev_value", F.lag("value").over(w))
        )
        got = sorted(
            map(tuple, d.select("user_id", "ts", "prev_value").collect())
        )
        want = sorted(
            map(tuple, base.select("user_id", "ts", "prev_value").collect())
        )
        assert got == want
    finally:
        spark.conf.set(
            "spark.sql.legacy.bucketedTableScan.outputOrdering", prev
        )
        spark.sql("DROP TABLE IF EXISTS bfdl_test_events_bsorted")


def test_materialized_anchor_windows_zero_sort(spark, tmp_path_factory):
    """DERIVED-ANCHOR corollary (VERDICT r10 #7): a day-anchored window
    over a (key, ts)-sorted bucketed table re-sorts because Spark cannot
    prove to_date(ts) is monotone in ts. Materializing the anchor into
    the layout — sortBy(key, ds, ts), same physical row order — and
    referencing the STORED column makes BOTH window families provably
    ordered: the anchored window (partitionBy(key, ds).orderBy(ts)) and
    the plain per-key window with ds leading its orderBy. Zero
    exchanges, zero Sort nodes, and bit-identical results to the
    derived-anchor baseline."""
    import re

    from pyspark.sql import Window

    root = tmp_path_factory.mktemp("bucketed_anchor")
    ev = (
        load_table(spark, "events", SF)
        .select("user_id", "ts", "value")
        .withColumn("ds", F.to_date("ts"))
    )
    write_bucketed(
        ev.repartition(N_BUCKETS, "user_id"),
        "bfdl_test_events_anchor",
        "user_id",
        N_BUCKETS,
        sort_cols=["user_id", "ds", "ts"],
        path=str(root / "events_anchor"),
    )
    prev = spark.conf.get(
        "spark.sql.legacy.bucketedTableScan.outputOrdering", "false"
    )
    try:
        spark.conf.set(
            "spark.sql.legacy.bucketedTableScan.outputOrdering", "true"
        )
        t = read_bucketed(spark, "bfdl_test_events_anchor")
        # anchored window on the STORED ds: required ordering
        # (user_id, ds, ts) == file order
        w_anchor = Window.partitionBy("user_id", "ds").orderBy("ts").rowsBetween(
            Window.unboundedPreceding, 0
        )
        anchored = t.withColumn("cum_v", F.sum("value").over(w_anchor))
        assert exchange_count(anchored, execute=False) == 0
        plan = anchored._jdf.queryExecution().executedPlan().toString()
        assert not re.search(r"\bSort\b", plan), plan
        # plain per-key window leading its order with ds: still a prefix
        w_key = Window.partitionBy("user_id").orderBy("ds", "ts")
        lagged = t.withColumn("prev_value", F.lag("value").over(w_key))
        assert exchange_count(lagged, execute=False) == 0
        plan = lagged._jdf.queryExecution().executedPlan().toString()
        assert not re.search(r"\bSort\b", plan), plan
        # the DERIVED anchor on the same layout re-sorts (the negative
        # this recipe removes) ...
        w_derived = Window.partitionBy(
            "user_id", F.to_date("ts")
        ).orderBy("ts").rowsBetween(Window.unboundedPreceding, 0)
        derived = t.withColumn("cum_v", F.sum("value").over(w_derived))
        plan = derived._jdf.queryExecution().executedPlan().toString()
        assert re.search(r"\bSort\b", plan), plan
        # ... and results are identical either way
        got = sorted(
            map(tuple, anchored.select("user_id", "ts", "cum_v").collect())
        )
        want = sorted(
            map(tuple, derived.select("user_id", "ts", "cum_v").collect())
        )
        assert got == want
    finally:
        spark.conf.set(
            "spark.sql.legacy.bucketedTableScan.outputOrdering", prev
        )
        spark.sql("DROP TABLE IF EXISTS bfdl_test_events_anchor")
