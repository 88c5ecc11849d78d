"""Property-based parity for the scale operators added late in round 1:

- interval_join (bucketized prefilter) == naive cross-join containment,
  under randomized points/intervals/bucket widths — the prefilter must be
  lossless for ANY bucket width, including widths far from the interval
  lengths;
- rollup cascade == direct aggregation, under randomized tick sets —
  open/close/min/max/count must compose exactly through any cascade depth.
"""

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from binance_futures_data_lake_spark.operators.rangejoin import interval_join
from binance_futures_data_lake_spark.operators.resample import rollup_bars, tick_ohlcv

T0 = dt.datetime(2024, 1, 1)
SETTINGS = settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


@st.composite
def interval_case(draw):
    points = draw(
        st.lists(st.integers(min_value=0, max_value=3000), min_size=1, max_size=30)
    )
    n_iv = draw(st.integers(min_value=0, max_value=10))
    ivs = []
    for _ in range(n_iv):
        a = draw(st.integers(min_value=0, max_value=3000))
        ln = draw(st.integers(min_value=0, max_value=600))
        ivs.append((a, a + ln))
    bucket = draw(st.sampled_from(["15 minutes", "1 hours", "6 hours", "1 days"]))
    return points, ivs, bucket


@SETTINGS
@given(case=interval_case())
def test_interval_join_lossless_for_any_bucket(spark, case):
    points, ivs, bucket = case
    pdf = spark.createDataFrame(
        [(i, T0 + dt.timedelta(minutes=m)) for i, m in enumerate(points)],
        "pid long, ts timestamp",
    )
    idf = spark.createDataFrame(
        [(j, T0 + dt.timedelta(minutes=a), T0 + dt.timedelta(minutes=b))
         for j, (a, b) in enumerate(ivs)],
        "ivid long, start timestamp, end timestamp",
    )
    got = {
        (r.pid, r.ivid)
        for r in interval_join(pdf, idf, "ts", "start", "end", bucket=bucket).collect()
    }
    want = {
        (i, j)
        for i, m in enumerate(points)
        for j, (a, b) in enumerate(ivs)
        if a <= m <= b
    }
    assert got == want


@st.composite
def tick_case(draw):
    n = draw(st.integers(min_value=1, max_value=60))
    ticks = [
        (
            i,
            draw(st.integers(min_value=0, max_value=4 * 1440)),  # minutes over 4 days
            draw(st.integers(min_value=-1000, max_value=1000)),
        )
        for i in range(n)
    ]
    return ticks


@SETTINGS
@given(ticks=tick_case())
def test_cascade_equals_direct(spark, ticks):
    df = spark.createDataFrame(
        [(i, "k", T0 + dt.timedelta(minutes=m), float(v)) for i, m, v in ticks],
        "event_id long, key string, ts timestamp, value double",
    )
    m5 = tick_ohlcv(df, 5, ["key"], tiebreak_col="event_id")
    d_cascade = rollup_bars(rollup_bars(m5, 60, ["key"]), 1440, ["key"])
    d_direct = tick_ohlcv(df, 1440, ["key"], tiebreak_col="event_id")
    a = {r.bucket_ts: r for r in d_cascade.collect()}
    b = {r.bucket_ts: r for r in d_direct.collect()}
    assert a.keys() == b.keys()
    for k in a:
        for col in ("open", "high", "low", "close", "n_ticks", "first_ts", "last_ts"):
            assert getattr(a[k], col) == getattr(b[k], col), (k, col)
        # integer-valued doubles: sums are exact, so volume must match exactly
        assert a[k].volume == b[k].volume
