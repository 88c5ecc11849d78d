"""Property-based parity: asof_join_backward vs pandas merge_asof, and
resample invariants, under randomized inputs (hypothesis).

The reference's own test strategy has no property tests (SURVEY §5); this
goes beyond it because the as-of join and bucket completeness are the two
operators where off-by-one semantics (≤ vs <, exact-match ties, rows
before the first match) silently corrupt research results.
"""

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from binance_futures_data_lake_spark.operators.asof import asof_join_backward

TS0 = 1_700_000_000_000  # epoch ms


@st.composite
def asof_case(draw):
    left_ts = draw(
        st.lists(st.integers(min_value=0, max_value=500), min_size=1, max_size=40, unique=True)
    )
    right_ts = draw(
        st.lists(st.integers(min_value=0, max_value=500), min_size=0, max_size=20, unique=True)
    )
    return sorted(left_ts), sorted(right_ts)


@pytest.fixture(scope="module")
def sparkless_guard(spark):
    return spark


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(case=asof_case())
def test_asof_backward_matches_pandas(spark, case):
    left_ts, right_ts = case
    left = spark.createDataFrame(
        [("K", TS0 + t * 1000, float(t)) for t in left_ts],
        "sym string, ms long, lval double",
    ).withColumn("ts", F.timestamp_millis("ms")).drop("ms")
    right = spark.createDataFrame(
        [("K", TS0 + t * 1000, float(t) * 10) for t in right_ts],
        "sym string, ms long, rval double",
    ).withColumn("ts", F.timestamp_millis("ms")).drop("ms")
    if not right_ts:
        right = spark.createDataFrame([], "sym string, rval double, ts timestamp")

    got = {
        r.lval: r.rval
        for r in asof_join_backward(left, right, on="ts", by=["sym"]).collect()
    }

    lpd = pd.DataFrame(
        {"ts": pd.to_datetime([TS0 + t * 1000 for t in left_ts], unit="ms"),
         "lval": [float(t) for t in left_ts], "sym": "K"}
    )
    rpd = pd.DataFrame(
        {"ts": pd.to_datetime([TS0 + t * 1000 for t in right_ts], unit="ms"),
         "rval": [float(t) * 10 for t in right_ts], "sym": "K"}
    )
    exp_df = pd.merge_asof(lpd, rpd, on="ts", by="sym", allow_exact_matches=True)
    exp = {
        row.lval: (None if pd.isna(row.rval) else row.rval)
        for row in exp_df.itertuples()
    }
    assert got == exp


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    present=st.lists(st.integers(min_value=0, max_value=29), min_size=1, max_size=30, unique=True)
)
def test_resample_completeness_exact(spark, present):
    """A 5-minute bucket appears iff all 5 of its minutes are present —
    for every subset pattern of a 30-minute grid."""
    from binance_futures_data_lake_spark.operators.resample import resample_bars
    from binance_futures_data_lake_spark.sources.synthetic import synthetic_klines_m1

    base = synthetic_klines_m1(spark, symbols=("AAA",), n_minutes=30)
    keep = base.filter(
        F.floor((F.col("open_time_ms") / 60_000) % 30).isin([int(x) for x in present])
    )
    got = {
        int(r.open_time_ms // 60_000 % 30)
        for r in resample_bars(keep, 5, ["symbol"]).collect()
    }
    expected = {
        b * 5 for b in range(6) if all(b * 5 + i in present for i in range(5))
    }
    assert got == expected
