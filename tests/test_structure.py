"""Structure operators: W15 column algebra, and golden parity of the
sequential kernels (W19 case classifier, W21 box expansion) against direct
pandas reference implementations."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from binance_futures_data_lake_spark.operators.structure import (
    _case_for_row,
    assign_regime_cases,
    expand_boxes,
    structure_breaks,
)
from binance_futures_data_lake_spark.functions import windows as W


def test_structure_breaks_small_golden(spark):
    # hand-built series: rally → new high (HH), then crash → LL + CHoCH down
    rows = []
    prices = [10, 11, 12, 11, 12, 13, 14, 15, 14, 13, 12, 9, 8, 7, 16, 17]
    for i, p in enumerate(prices):
        rows.append(("A", i, float(p) - 0.5, float(p) + 0.5, float(p)))
    df = spark.createDataFrame(rows, ["sym", "i", "low", "high", "close"])
    out = structure_breaks(
        df.withColumn("atr", F.lit(1.0)), ["sym"], ["i"], swing=3, atr_col="atr"
    ).orderBy("i").collect()

    pdf = pd.DataFrame({"high": [r + 0.5 for r in prices], "low": [r - 0.5 for r in prices],
                        "close": [float(p) for p in prices]})
    prev_high = pdf["high"].shift(1).rolling(3, min_periods=3).max()
    prev_low = pdf["low"].shift(1).rolling(3, min_periods=3).min()
    import numpy as np
    is_hh = (pdf["high"] > prev_high).astype(int)
    is_ll = (pdf["low"] < prev_low).astype(int)
    state = np.where(is_hh == 1, 1, np.where(is_ll == 1, -1, 0))
    bos_up = (pdf["close"] > prev_high + 0.2).astype(int)
    bos_down = (pdf["close"] < prev_low - 0.2).astype(int)
    prior = (
        pd.Series(state).replace(0, np.nan).ffill().shift(1).fillna(0).astype(int)
    )
    for i, r in enumerate(out):
        assert r.is_hh == is_hh.iloc[i], i
        assert r.is_ll == is_ll.iloc[i], i
        assert r.hh_hl_state == state[i], i
        assert r.bos_up == bos_up.iloc[i], i
        assert r.bos_down == bos_down.iloc[i], i
        assert r.prior_state == prior.iloc[i], i
        assert r.choch_up == int(bos_up.iloc[i] == 1 and prior.iloc[i] < 0), i
        assert r.choch_down == int(bos_down.iloc[i] == 1 and prior.iloc[i] > 0), i


def test_regime_cases_golden_parity(spark):
    import itertools
    # exhaustive-ish input: all dir combos in {-1,0,1}^4 twice over, so
    # prev-case-dependent branches (BREAKOUT_*_FROM_RANGE, FAKE_*) trigger
    combos = list(itertools.product([-1, 0, 1], repeat=4))
    rows = [("K", i, *combos[i % len(combos)]) for i in range(2 * len(combos))]
    df = spark.createDataFrame(rows, ["sym", "i", "dir_w", "dir_d", "dir_h4", "dir_h1"])
    got = {
        r.i: (r.case, r.case_age)
        for r in assign_regime_cases(df, ["sym"], ["i"]).collect()
    }
    prev, age = "WARMUP_UNDEFINED", 0
    for i in range(2 * len(combos)):
        w, d, h4, h1 = combos[i % len(combos)]
        case = _case_for_row(w, d, h4, h1, prev, 4.0)
        age = age + 1 if case == prev else 0
        assert got[i] == (case, age), f"row {i}: {got[i]} != {(case, age)}"
        prev = case


def test_regime_cases_per_key_isolation(spark):
    # two keys with different histories must not leak prev_case across keys
    rows = [("A", 0, 0, 0, 0, 0), ("A", 1, 1, 1, 1, 1),
            ("B", 0, 1, 1, 1, 1)]
    df = spark.createDataFrame(rows, ["sym", "i", "dir_w", "dir_d", "dir_h4", "dir_h1"])
    got = {(r.sym, r.i): r.case for r in assign_regime_cases(df, ["sym"], ["i"]).collect()}
    assert got[("A", 0)] == "RANGE_NEUTRAL"
    assert got[("A", 1)] == "BREAKOUT_UP_FROM_RANGE"   # prev was RANGE_NEUTRAL
    assert got[("B", 0)] == "TREND_CONTINUATION_LONG"  # fresh key: prev=WARMUP


def _mk_bars(spark, prices, sym="A"):
    # NB: plain-tuple createDataFrame infers pd.Timestamp as an empty
    # struct — pass an explicit schema so bucket_ts is a real timestamp
    rows = [
        (sym, (pd.Timestamp("2024-01-01") + pd.Timedelta(hours=i)).to_pydatetime(),
         float(p), float(p) + 0.5, float(p) - 0.5, float(p))
        for i, p in enumerate(prices)
    ]
    return spark.createDataFrame(
        rows,
        "sym string, bucket_ts timestamp, open double, high double, low double, close double",
    )


def test_expand_boxes_golden(spark):
    # flat middle [10..11] with breaks on both sides
    prices = [20, 20, 10.5, 10.6, 10.4, 10.5, 10.6, 10.5, 20, 20, 20]
    bars = _mk_bars(spark, prices)
    t0 = pd.Timestamp("2024-01-01")
    cands = spark.createDataFrame(
        [("A", 1, (t0 + pd.Timedelta(hours=4)).to_pydatetime(),
          (t0 + pd.Timedelta(hours=5)).to_pydatetime(), 9.5, 11.5)],
        "sym string, cand_id long, start_ts timestamp, end_ts timestamp, range_low double, range_high double",
    )
    out = expand_boxes(
        bars, cands, ["sym"], max_expand_bars=10,
        contain_tol_frac=0.0, contain_mode="close", break_confirm_bars=2,
    ).collect()
    assert len(out) == 1
    r = out[0]
    # closes 10.4..10.6 at hours 2..7 are inside [9.5, 11.5]; 20s outside
    assert r.box_start == t0 + pd.Timedelta(hours=2)
    assert r.box_end == t0 + pd.Timedelta(hours=7)
    assert r.left_n == 2 and r.right_n == 2
    assert r.n_bars == 6


def test_expand_boxes_confirm_tolerance(spark):
    # a single outside bar inside the run does NOT stop expansion when
    # break_confirm_bars=2 (outside_run resets on the next inside bar)
    prices = [10.5, 25.0, 10.4, 10.5, 10.6, 25.0, 25.0, 10.5]
    bars = _mk_bars(spark, prices)
    t0 = pd.Timestamp("2024-01-01")
    cands = spark.createDataFrame(
        [("A", 1, (t0 + pd.Timedelta(hours=3)).to_pydatetime(),
          (t0 + pd.Timedelta(hours=4)).to_pydatetime(), 10.0, 11.0)],
        "sym string, cand_id long, start_ts timestamp, end_ts timestamp, range_low double, range_high double",
    )
    r = expand_boxes(
        bars, cands, ["sym"], max_expand_bars=10,
        contain_tol_frac=0.0, contain_mode="close", break_confirm_bars=2,
    ).collect()[0]
    # left: hour2 inside, hour1 outside(run=1), hour0 inside → extends to 0
    assert r.box_start == t0
    # right: hour5,6 outside consecutively (run=2) → stops at hour 4
    assert r.box_end == t0 + pd.Timedelta(hours=4)
