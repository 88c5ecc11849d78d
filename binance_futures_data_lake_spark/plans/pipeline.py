"""The research pipeline (SURVEY §3.3) as ONE lazy DataFrame DAG.

Reference runs this as a shell-chained sequence of processes with Parquet
hops between every stage:

    M1 → m1_features → M15 dir regime → M5 vol regime → joined(asof) →
    enrich gates → H1 router(asof) → sweep

Here each arrow is a DataFrame transformation; Catalyst sees the whole
plan, so column pruning flows end-to-end (the sweep only materializes the
~20 columns it reads), and the intermediate "files on disk" disappear
except where the caller explicitly caches.

Anti-lookahead discipline (SURVEY §1.4): every higher-timeframe decision
column is shifted one closed bar (lag 1 over the TF's own order) BEFORE the
backward as-of projection onto the base timeframe, so a base row only sees
the last fully-closed higher-TF bar (build_joined_m1_long_v1.py:65-107,
build_h1_regime_router_v2.py:137-169).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from binance_futures_data_lake_spark.functions import windows as W
from binance_futures_data_lake_spark.operators.asof import asof_join_backward
from binance_futures_data_lake_spark.operators.features import m1_features, tradability_gates
from binance_futures_data_lake_spark.operators.regime import (
    DirectionParams,
    RouterParams,
    VolRegimeParams,
    direction_scores,
    router_features_h1,
    sticky_state,
    vol_regime,
)
from binance_futures_data_lake_spark.operators.resample import resample_bars, with_availability


def _shift_cols(df: DataFrame, cols: Sequence[str], by: Sequence[str], order: Sequence[str]) -> DataFrame:
    w = W.w_ordered(list(by), list(order))
    for c in cols:
        df = df.withColumn(c, F.lag(c, 1).over(w))
    return df


def m15_direction_frame(
    m1: DataFrame,
    by: Sequence[str] = ("symbol",),
    p: DirectionParams = DirectionParams(),
    lag_minutes: int = 2,
) -> DataFrame:
    """M1 → closed M15 buckets → dir score → sticky state (+ dir_ready)."""
    m15 = with_availability(resample_bars(m1, 15), 15, lag_minutes)
    m15 = direction_scores(m15, by, ["ts"], p)
    m15 = sticky_state(m15, by, ["ts"], "dir_score", p)
    return m15.withColumn(
        "dir_ready",
        (F.col("count_base") == 15)
        & F.col("dir_score").isNotNull()
        & F.col("available_from").isNotNull()
        & F.col("bucket_end").isNotNull(),
    )


def m5_vol_frame(
    m1: DataFrame,
    by: Sequence[str] = ("symbol",),
    p: VolRegimeParams = VolRegimeParams(),
    lag_minutes: int = 2,
) -> DataFrame:
    m5 = with_availability(resample_bars(m1, 5), 5, lag_minutes)
    return vol_regime(m5, by, ["ts"], p)


def joined_research_frame(
    m1: DataFrame,
    by: Sequence[str] = ("symbol",),
    dir_params: DirectionParams = DirectionParams(),
    vol_params: VolRegimeParams = VolRegimeParams(),
    router_params: RouterParams = RouterParams(),
    atr_len: int = 14,
) -> DataFrame:
    """Full §3.3 chain → the F6 backtest-input frame (FIXTURES.md)."""
    by = list(by)
    feat = m1_features(m1, by, ["ts"], atr_len)

    m15_cols = ["dir_score", "dir_state", "dir_regime_id", "dir_state_age", "dir_ready"]
    m15 = m15_direction_frame(m1, by, dir_params)
    m15 = _shift_cols(m15, m15_cols, by, ["ts"]).select(*by, "ts", *m15_cols)

    m5_cols = ["range_pctl", "vol_state", "market_ready"]
    m5 = m5_vol_frame(m1, by, vol_params)
    m5 = _shift_cols(m5, m5_cols, by, ["ts"]).select(*by, "ts", *m5_cols)

    h1 = router_features_h1(resample_bars(m1, 60), by, ["ts"], router_params)
    h1_cols = [
        "router_mode_h1", "regime_h1", "trend_score_h1", "atr_pct_pctl_h1",
        "er_h1", "slope50_norm_h1", "ema20_h1", "ema50_h1", "ema200_h1",
    ]
    h1 = h1.select(*by, "ts", *h1_cols)

    out = asof_join_backward(feat, m15, on="ts", by=by)
    out = asof_join_backward(out, m5, on="ts", by=by)
    out = asof_join_backward(out, h1, on="ts", by=by)
    out = out.withColumn("dir_ready", F.coalesce(F.col("dir_ready"), F.lit(False)))
    out = out.withColumn("vol_state", F.coalesce(F.col("vol_state"), F.lit("NA")))
    out = tradability_gates(out)
    return out.withColumn("hour_utc", F.hour("ts")).withColumn(
        "minute_utc", F.minute("ts")
    )
