"""KMV sketch: determinism, degenerate exactness, and estimation error."""

import pytest
from pyspark.sql import functions as F

from binance_futures_data_lake_spark.operators.sketch import kmv_distinct


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(0, 5000).select(
        (F.col("id") % 10).alias("g"), F.concat(F.lit("u"), (F.col("id") % 1700)).alias("v")
    )


def test_degenerates_to_exact_below_k(spark):
    df = spark.range(0, 40).select(F.lit("g").alias("g"), F.col("id").cast("string").alias("v"))
    row = kmv_distinct(df, "v", by=["g"], k=64).collect()[0]
    assert row.n_exact == 40
    assert row.kmv_estimate == 40.0


def test_estimate_within_sampling_error(spark, ids):
    # 170 distinct per group at k=64: stderr ~ 1/sqrt(62) ~ 12.7%; 4 sigma bound
    rows = kmv_distinct(ids, "v", by=["g"], k=64).collect()
    assert len(rows) == 10
    for r in rows:
        assert abs(r.kmv_estimate - r.n_exact) / r.n_exact < 0.51


def test_deterministic_across_partitioning(spark, ids):
    a = {r.g: r.kmv_estimate for r in kmv_distinct(ids, "v", by=["g"], k=64).collect()}
    b = {
        r.g: r.kmv_estimate
        for r in kmv_distinct(ids.repartition(17), "v", by=["g"], k=64).collect()
    }
    assert a == b


def test_duplicates_do_not_shift_estimate(spark, ids):
    dup = ids.union(ids).union(ids)
    a = {r.g: (r.n_exact, r.kmv_estimate) for r in kmv_distinct(ids, "v", by=["g"]).collect()}
    b = {r.g: (r.n_exact, r.kmv_estimate) for r in kmv_distinct(dup, "v", by=["g"]).collect()}
    assert a == b
