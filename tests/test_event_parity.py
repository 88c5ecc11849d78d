"""Direct parity: the reference event simulator itself vs the Spark port.

These tests IMPORT the reference script (read-only, skipped when absent)
and run its actual ``compute_regimes_and_signals`` + ``run_backtest`` on a
seeded synthetic frame, then run the Spark port
(``backtest.event_signals`` + ``run_event_backtest``) on the same rows and
compare trade-for-trade. This is stronger than golden cases: any semantic
drift from backtest_router_event_v1_1.py — signal gating, BE arming order,
exit precedence, cooldown bookkeeping — shows up as a concrete diff.
"""

from __future__ import annotations

import importlib.util
import os
import sys

import numpy as np
import pandas as pd
import pytest

REF = "/root/reference/scripts/backtest/backtest_router_event_v1_1.py"


def _load_reference():
    if not os.path.exists(REF):
        pytest.skip("reference tree not available")
    spec = importlib.util.spec_from_file_location("ref_event_bt", REF)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_event_bt"] = mod
    spec.loader.exec_module(mod)
    return mod


def _synthetic_frame(n: int = 2500, seed: int = 7) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    ts = pd.date_range("2026-01-01", periods=n, freq="1min")
    ret = rng.normal(0, 0.3, n)
    close = 100.0 + np.cumsum(ret)
    spread = np.abs(rng.normal(0.4, 0.2, n)) + 0.05
    high = np.maximum(close, close - ret) + spread
    low = np.minimum(close, close - ret) - spread
    router = np.where((np.arange(n) // 120) % 2 == 0, "TREND", "RANGE")
    vol = np.select(
        [rng.random(n) < 0.05, rng.random(n) < 0.6], ["NA", "MID"], default="HIGH"
    )
    mom = pd.Series(close).diff(24).to_numpy()
    dirs = np.where(np.isnan(mom), "NA", np.where(mom > 0, "BULL", "BEAR"))
    atr = pd.Series(high - low).rolling(14).mean().round(6).to_numpy()
    return pd.DataFrame(
        {
            "ts": ts,
            "open": close - ret,
            "high": high,
            "low": low,
            "close": close,
            "router_mode_h1": router,
            "tradable_final": rng.random(n) > 0.02,
            "dir_ready": ~pd.isna(mom),
            "dir_state": dirs,
            "vol_state": vol,
            "delta_norm": rng.normal(0, 0.35, n),
            "close_pos": rng.random(n),
            "range_rel": np.abs(rng.normal(0.9, 0.4, n)),
            "atr14": atr,
        }
    )


def test_event_simulator_trade_for_trade_parity(spark):
    ref = _load_reference()
    pdf = _synthetic_frame()

    # --- reference path: its own signals + its own loop ---
    ref_df = ref.compute_regimes_and_signals(pdf.copy())
    ref_trades, _equity, ref_metrics = ref.run_backtest(ref_df, ts_col="ts")

    # --- Spark port on the same rows ---
    from binance_futures_data_lake_spark.operators.backtest import (
        EventParams,
        run_event_backtest,
    )

    sdf = spark.createDataFrame(pdf.assign(symbol="X"))
    ours = (
        run_event_backtest(sdf, EventParams(), by=["symbol"], order=["ts"])
        .toPandas()
        .sort_values("entry_ts")
        .reset_index(drop=True)
    )

    assert len(ours) == len(ref_trades) > 0, (
        f"trade count mismatch: spark={len(ours)} reference={len(ref_trades)}"
    )
    for i, rt in enumerate(ref_trades):
        ot = ours.iloc[i]
        assert ot["engine"] == rt.engine and ot["side"] == rt.side, i
        assert pd.Timestamp(ot["entry_ts"]).isoformat() == rt.entry_ts, i
        assert pd.Timestamp(ot["exit_ts"]).isoformat() == rt.exit_ts, i
        assert ot["entry_price"] == rt.entry_price, i
        assert ot["exit_price"] == rt.exit_price, i
        assert ot["sl_price"] == rt.sl_price, i
        assert ot["tp_price"] == rt.tp_price, i
        assert ot["r_mult"] == rt.r_mult, i
        assert ot["exit_reason"] == rt.exit_reason, i
        assert int(ot["bars_in_trade"]) == rt.bars_in_trade, i
    # aggregate sanity against the reference's own metrics dict
    assert ref_metrics["n_trades"] == len(ours)
    assert ours["r_mult"].sum() == pytest.approx(ref_metrics["sum_r"])


def test_event_signal_columns_match_reference(spark):
    ref = _load_reference()
    pdf = _synthetic_frame(n=1500, seed=11)
    ref_df = ref.compute_regimes_and_signals(pdf.copy())

    from binance_futures_data_lake_spark.operators.backtest import (
        EventParams,
        event_signals,
    )

    sdf = spark.createDataFrame(pdf.assign(symbol="X"))
    ours = (
        event_signals(sdf, ["symbol"], ["ts"], EventParams())
        .orderBy("ts")
        .select(
            "ts", "trend_long_signal", "trend_short_signal",
            "mr_long_signal", "mr_short_signal",
        )
        .toPandas()
    )
    for col in (
        "trend_long_signal", "trend_short_signal", "mr_long_signal", "mr_short_signal"
    ):
        ref_vals = ref_df[col].fillna(False).astype(bool).to_numpy()
        got = ours[col].to_numpy()
        assert (got == ref_vals).all(), (
            f"{col}: {int((got != ref_vals).sum())} rows differ"
        )
