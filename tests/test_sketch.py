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


def test_lean_path_drops_exact_pass_and_matches(spark, ids):
    # include_exact=False: same estimates, no n_exact column, and the
    # plan carries no full-width value exchange (hash is map-side; the
    # dedup shuffle moves only (by, hv)) and no count_distinct pass.
    dup = ids.union(ids).union(ids)
    lean = kmv_distinct(ids, "v", by=["g"], k=64, include_exact=False)
    assert lean.columns == ["g", "kmv_estimate"]
    full = {r.g: r.kmv_estimate for r in kmv_distinct(ids, "v", by=["g"], k=64).collect()}
    a = {r.g: r.kmv_estimate for r in lean.collect()}
    b = {
        r.g: r.kmv_estimate
        for r in kmv_distinct(dup, "v", by=["g"], k=64, include_exact=False).collect()
    }
    assert a == b == full
    plan = lean._jdf.queryExecution().executedPlan().toString()
    assert "__v" not in plan  # value column never survives to an exchange
    assert "count(distinct" not in plan.lower()


def test_kmv_quantiles_exact_for_small_groups_and_close_for_large(spark):
    from binance_futures_data_lake_spark.operators.sketch import kmv_quantiles

    # large group: 50k rows, value = uniform-ish deterministic ramp;
    # small group: 100 rows (<= k, so the sample IS the group → exact)
    df = spark.range(50_100).select(
        F.col("id").alias("key"),
        F.when(F.col("id") < 50_000, F.lit("big")).otherwise(F.lit("small")).alias("g"),
        F.when(F.col("id") < 50_000, (F.col("id") % 10_000).cast("double"))
         .otherwise((F.col("id") % 100).cast("double")).alias("v"),
    )
    got = {r.g: r for r in kmv_quantiles(df, "v", "key", by=("g",), k=256).collect()}
    exact = {
        r.g: r for r in df.groupBy("g").agg(
            F.expr("percentile(v, 0.5)").alias("p50"),
            F.expr("percentile(v, 0.95)").alias("p95"),
        ).collect()
    }
    assert got["small"].n == 100
    assert abs(got["small"].p50 - exact["small"].p50) < 1e-9   # <= k → exact
    assert abs(got["small"].p95 - exact["small"].p95) < 1e-9
    assert got["big"].n == 50_000
    # sampled estimate: within ~3 standard errors of a 256-row sample
    # (se(q) = sqrt(q(1-q)/k) quantile-units on a 0..9999 uniform ramp)
    assert abs(got["big"].p50 - exact["big"].p50) < 3 * (0.5 * 0.25 / 256) ** 0.5 * 4 * 10_000
    assert abs(got["big"].p95 - exact["big"].p95) < 3 * (0.05 * 0.95 / 256) ** 0.5 * 4 * 10_000


def test_kmv_quantiles_stable_across_partitioning(spark):
    from binance_futures_data_lake_spark.operators.sketch import kmv_quantiles

    df = spark.range(10_000).select(
        F.col("id").alias("key"), (F.col("id") % 777).cast("double").alias("v")
    )
    a = kmv_quantiles(df, "v", "key", k=128).collect()[0]
    b = kmv_quantiles(df.repartition(13), "v", "key", k=128).collect()[0]
    assert (a.n, a.p50, a.p95) == (b.n, b.p50, b.p95)


def test_two_phase_rank_partitioning_invariance(spark):
    """The r9 per-partition k-min prune (kmv_state, kmv_quantiles,
    weighted_sample_topk) must be exact for ANY input partitioning —
    the k-smallest-of-a-union-of-per-partition-k-smallest theorem."""
    from pyspark.sql import functions as F

    from binance_futures_data_lake_spark.operators.curation import (
        weighted_sample_topk,
    )
    from binance_futures_data_lake_spark.operators.sketch import (
        kmv_quantiles,
        kmv_state,
    )

    df = spark.range(5_000).select(
        F.concat(F.lit("t"), (F.col("id") % 3).cast("string")).alias("grp"),
        F.concat(F.lit("k"), F.col("id").cast("string")).alias("key"),
        (F.pmod(F.xxhash64("id"), F.lit(97)) + 1).cast("double").alias("w"),
        (F.col("id") % 1000).cast("double").alias("v"),
    )
    for fn in (
        lambda d: kmv_state(d, "key", ["grp"], k=16),
        lambda d: kmv_quantiles(d, "v", "key", ["grp"], k=32, qs=(0.5,)),
        lambda d: weighted_sample_topk(d, "key", "w", k=7, by=["grp"]),
    ):
        one = sorted(map(tuple, fn(df.repartition(1)).collect()))
        many = sorted(map(tuple, fn(df.repartition(16)).collect()))
        assert one == many and one
