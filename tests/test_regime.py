"""Regime operator parity vs independent pandas implementations of the
reference semantics (build_m15_direction_regime.py, build_m5_vol_regime.py,
build_h1_regime_router_v2.py)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from binance_futures_data_lake_spark.operators.regime import (
    DirectionParams,
    RouterParams,
    VolRegimeParams,
    direction_scores,
    router_features_h1,
    sticky_state,
    vol_regime,
)
from binance_futures_data_lake_spark.operators.resample import resample_bars
from binance_futures_data_lake_spark.sources.synthetic import synthetic_klines_m1

BY, ORDER = ["symbol"], ["ts"]


@pytest.fixture(scope="module")
def m15(spark):
    m1 = synthetic_klines_m1(spark, symbols=("AAA", "BBB"), n_minutes=4 * 1440)
    return resample_bars(m1, 15).cache()


def pandas_dir_scores(g: pd.DataFrame, p: DirectionParams) -> pd.Series:
    close, high, low = g["close"], g["high"], g["low"]
    ret1 = np.log(close / close.shift(1))
    retL = np.log(close / close.shift(p.lookback))
    vol1 = ret1.rolling(p.lookback, min_periods=p.lookback).std(ddof=0)
    volL = vol1 * np.sqrt(p.lookback)
    impulse = retL / (volL + p.eps)
    prev_c = close.shift(1)
    tr = pd.concat(
        [(high - low).abs(), (high - prev_c).abs(), (low - prev_c).abs()], axis=1
    ).max(axis=1)
    atr = tr.ewm(alpha=1.0 / p.atr_len, adjust=False).mean()
    ema_f = close.ewm(span=p.ema_fast, adjust=False).mean()
    ema_s = close.ewm(span=p.ema_slow, adjust=False).mean()
    trend = (ema_f - ema_s) / (atr + p.eps)
    er = (close - close.shift(p.lookback)).abs() / (
        (close - close.shift(1)).abs().rolling(p.lookback, min_periods=p.lookback).sum()
        + p.eps
    )
    quality = 0.5 + 0.5 * er
    raw = (p.w_impulse * impulse + p.w_trend * trend) * quality
    smooth = raw.ewm(span=p.score_smooth_span, adjust=False).mean()
    return np.tanh(smooth)


def pandas_sticky(xs, p: DirectionParams):
    state, rid, age, hold = "NEUTRAL", 0, 0, 0
    be = se = bx = sx = br = sr = 0
    out = []
    for x in xs:
        if np.isnan(x):
            if state != "NEUTRAL":
                rid += 1
                state = "NEUTRAL"
            age = hold = be = se = bx = sx = br = sr = 0
            out.append((state, rid, age))
            continue
        be = be + 1 if x >= p.enter_th else 0
        se = se + 1 if x <= -p.enter_th else 0
        new = None
        if state == "NEUTRAL":
            if be >= p.enter_persist:
                new = "BULL"
            elif se >= p.enter_persist:
                new = "BEAR"
        elif state == "BULL":
            hold += 1
            bx = bx + 1 if x <= p.exit_th else 0
            sr = (sr + 1 if x <= -p.enter_th else 0) if p.allow_direct_flip else 0
            if hold >= max(p.min_hold_bars, 1):
                if p.allow_direct_flip and sr >= p.enter_persist:
                    new = "BEAR"
                elif bx >= p.exit_persist:
                    new = "NEUTRAL"
        else:
            hold += 1
            sx = sx + 1 if x >= -p.exit_th else 0
            br = (br + 1 if x >= p.enter_th else 0) if p.allow_direct_flip else 0
            if hold >= max(p.min_hold_bars, 1):
                if p.allow_direct_flip and br >= p.enter_persist:
                    new = "BULL"
                elif sx >= p.exit_persist:
                    new = "NEUTRAL"
        if new is not None and new != state:
            rid += 1
            state = new
            age = hold = be = se = bx = sx = br = sr = 0
        age += 1
        out.append((state, rid, age))
    return out


def test_direction_scores_match_pandas(spark, m15):
    p = DirectionParams()
    out = (
        direction_scores(m15, BY, ORDER, p)
        .filter(F.col("symbol") == "AAA")
        .select("ts", "dir_score")
        .toPandas()
        .sort_values("ts")
        .reset_index(drop=True)
    )
    g = (
        m15.filter(F.col("symbol") == "AAA")
        .select("ts", "open", "high", "low", "close")
        .toPandas()
        .sort_values("ts")
        .reset_index(drop=True)
    )
    want = pandas_dir_scores(g, p)
    a, b = out["dir_score"].to_numpy(), want.to_numpy()
    mask = np.isnan(a) | np.isnan(b)
    assert (np.isnan(a) == np.isnan(b)).all()
    assert np.max(np.where(mask, 0, np.abs(a - b)), initial=0) < 1e-9


@pytest.mark.parametrize("direct_flip", [False, True])
def test_sticky_state_matches_reference_semantics(spark, m15, direct_flip):
    # synthetic scores with clear regimes + NaN resets + threshold dithering
    rng = np.random.default_rng(7)
    xs = np.concatenate(
        [
            np.full(10, np.nan),
            np.full(20, 0.6),           # BULL entry
            np.full(10, 0.15),          # exit zone
            rng.uniform(-0.5, 0.5, 60),  # dither
            np.full(20, -0.7),          # BEAR / direct flip
            [np.nan, np.nan],
            np.full(15, 0.45),
        ]
    )
    p = DirectionParams(allow_direct_flip=direct_flip)
    pdf = pd.DataFrame(
        {
            "symbol": "AAA",
            "ts": pd.date_range("2024-01-01", periods=len(xs), freq="15min"),
            "dir_score": xs,
        }
    )
    sdf = spark.createDataFrame(pdf)
    out = (
        sticky_state(sdf, BY, ORDER, "dir_score", p)
        .toPandas()
        .sort_values("ts")
        .reset_index(drop=True)
    )
    want = pandas_sticky(xs, p)
    got = list(zip(out["dir_state"], out["dir_regime_id"], out["dir_state_age"]))
    assert got == want


def test_vol_regime_states_and_gate(spark, m15):
    p = VolRegimeParams(lookback=48, p_low=0.25, p_high=0.70)
    out = vol_regime(m15.withColumnRenamed("count_base", "n_m1"), BY, ORDER, p)
    pdf = (
        out.filter(F.col("symbol") == "AAA")
        .select("ts", "range", "range_pctl", "vol_state", "market_ready")
        .toPandas()
        .sort_values("ts")
        .reset_index(drop=True)
    )
    # warmup rows are NA and not market_ready
    assert (pdf["vol_state"][: 48 - 1] == "NA").all()
    assert not pdf["market_ready"][: 48 - 1].any()
    # states agree with thresholds
    m = pdf["range_pctl"].notna()
    assert ((pdf.loc[m, "range_pctl"] < 0.25) == (pdf.loc[m, "vol_state"] == "LOW")).all()
    assert ((pdf.loc[m, "range_pctl"] > 0.70) == (pdf.loc[m, "vol_state"] == "HIGH")).all()
    # LOW is never market_ready
    assert not pdf.loc[pdf["vol_state"] == "LOW", "market_ready"].any()


def test_router_modes_and_antilookahead(spark):
    m1 = synthetic_klines_m1(spark, symbols=("AAA",), n_minutes=30 * 1440)
    h1 = resample_bars(m1, 60)
    out = router_features_h1(h1, BY, ORDER, RouterParams())
    pdf = out.select("ts", "router_mode_h1", "er_h1", "regime_h1").toPandas().sort_values("ts")
    # decision cols are shifted: first row null
    assert pdf["router_mode_h1"].iloc[0] is None or pd.isna(pdf["router_mode_h1"].iloc[0])
    modes = set(pdf["router_mode_h1"].dropna().unique())
    assert modes <= {"TREND", "RANGE", "OFF"}
    assert len(modes) >= 1
    # unshifted variant must equal shifted variant lagged by one
    raw = router_features_h1(h1, BY, ORDER, RouterParams(), shift_decisions=False)
    rpdf = raw.select("ts", "router_mode_h1").toPandas().sort_values("ts")
    assert (
        rpdf["router_mode_h1"].shift(1).iloc[1:].values
        == pdf["router_mode_h1"].iloc[1:].values
    ).all()
