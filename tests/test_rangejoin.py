"""interval_join vs the naive cross-join-filter ground truth.

The bucketized prefilter must be lossless: identical pair set to the
O(n²) containment scan, for any bucket width, with and without equi-keys,
for inner and left semantics.
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from binance_futures_data_lake_spark.operators.rangejoin import interval_join

T0 = dt.datetime(2024, 1, 1)


def _ts(minutes):
    return T0 + dt.timedelta(minutes=minutes)


@pytest.fixture(scope="module")
def frames(spark):
    points = spark.createDataFrame(
        [(i, k, _ts(m)) for i, (k, m) in enumerate(
            [("a", 5), ("a", 30), ("a", 61), ("a", 200), ("b", 5), ("b", 90),
             ("a", 0), ("b", 0), ("a", 59), ("b", 60), ("a", 1441)]
        )],
        "point_id long, key string, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [(100, "a", _ts(0), _ts(60)), (101, "a", _ts(45), _ts(100)),
         (102, "b", _ts(0), _ts(59)), (103, "b", _ts(60), _ts(1500)),
         (104, "a", _ts(300), _ts(400))],
        "iv_id long, key string, start timestamp, end timestamp",
    )
    return points, intervals


def _naive(points, intervals, by):
    cond = (F.col("ts") >= F.col("start")) & (F.col("ts") <= F.col("end"))
    joined = points.join(intervals.withColumnRenamed("key", "ikey"), cond)
    if by:
        joined = joined.filter(F.col("key") == F.col("ikey"))
    return {(r.point_id, r.iv_id) for r in joined.collect()}


@pytest.mark.parametrize("bucket", ["15 minutes", "1 hours", "30 days"])
@pytest.mark.parametrize("by", [[], ["key"]])
def test_matches_naive_cross_join(spark, frames, bucket, by):
    points, intervals = frames
    iv = intervals if by else intervals.drop("key")
    out = interval_join(points, iv, "ts", "start", "end", by=by, bucket=bucket)
    got = {(r.point_id, r.iv_id) for r in out.collect()}
    assert got == _naive(points, intervals, by)


def test_left_keeps_uncontained_points(spark, frames):
    points, intervals = frames
    out = interval_join(
        points, intervals.drop("key"), "ts", "start", "end", bucket="1 hours", how="left"
    )
    rows = out.collect()
    inner = _naive(points, intervals, by=[])
    matched_points = {p for p, _ in inner}
    assert {(r.point_id, r.iv_id) for r in rows if r.iv_id is not None} == inner
    unmatched = {r.point_id for r in rows if r.iv_id is None}
    assert unmatched == {r.point_id for r in points.collect()} - matched_points
    # every point appears at least once
    assert {r.point_id for r in rows} == {r.point_id for r in points.collect()}


def test_closed_ends_and_exact_bucket_boundaries(spark):
    points = spark.createDataFrame(
        [(1, _ts(0)), (2, _ts(60)), (3, _ts(61))], "point_id long, ts timestamp"
    )
    intervals = spark.createDataFrame(
        [(9, _ts(0), _ts(60))], "iv_id long, start timestamp, end timestamp"
    )
    out = interval_join(points, intervals, "ts", "start", "end", bucket="1 hours")
    assert {(r.point_id, r.iv_id) for r in out.collect()} == {(1, 9), (2, 9)}


def test_rejects_bad_how(spark, frames):
    points, intervals = frames
    with pytest.raises(ValueError):
        interval_join(points, intervals, "ts", "start", "end", how="full")
