"""consistent_sample: determinism, join preservation, fraction accuracy."""

import pytest
from pyspark.sql import functions as F

from binance_futures_data_lake_spark.operators.sampling import consistent_sample
from binance_futures_data_lake_spark.sources.testdata import load_table

SF = "/root/testdata/sf0.01"


def test_join_preserving_no_orphans(spark):
    cust = consistent_sample(load_table(spark, "customer", SF), "c_custkey", 0.2)
    orders = consistent_sample(load_table(spark, "orders", SF), "o_custkey", 0.2)
    # every sampled order's customer key must be in the sampled customers
    orphans = orders.join(
        cust, orders.o_custkey == cust.c_custkey, "left_anti"
    ).count()
    assert orphans == 0
    # and nothing from the sampled key universe is lost: sampled orders ==
    # all orders whose customer survived
    via_cust = load_table(spark, "orders", SF).join(
        cust.select("c_custkey"), F.col("o_custkey") == F.col("c_custkey"), "left_semi"
    )
    assert orders.count() == via_cust.count()


def test_deterministic_across_runs_and_partitioning(spark):
    t = load_table(spark, "customer", SF)
    a = {r.c_custkey for r in consistent_sample(t, "c_custkey", 0.3).collect()}
    b = {r.c_custkey for r in consistent_sample(t.repartition(13), "c_custkey", 0.3).collect()}
    assert a == b and a


def test_fraction_within_binomial_bounds(spark):
    t = load_table(spark, "customer", SF)
    n = t.count()
    k = consistent_sample(t, "c_custkey", 0.1).count()
    # 5-sigma binomial band around 10%
    sigma = (n * 0.1 * 0.9) ** 0.5
    assert abs(k - 0.1 * n) < 5 * sigma


def test_nested_fractions(spark):
    t = load_table(spark, "customer", SF)
    s05 = {r.c_custkey for r in consistent_sample(t, "c_custkey", 0.05).collect()}
    s20 = {r.c_custkey for r in consistent_sample(t, "c_custkey", 0.20).collect()}
    # hash-threshold samples nest: smaller fraction is a subset of larger
    assert s05 <= s20


def test_rejects_bad_fraction(spark):
    t = load_table(spark, "customer", SF)
    with pytest.raises(ValueError):
        consistent_sample(t, "c_custkey", 0.0)
