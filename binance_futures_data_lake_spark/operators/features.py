"""Per-bar feature builders (SURVEY §3.3 step 1; FIXTURES.md F3).

Reference: scripts/research/build_m1_features.py:70-138 — candle geometry,
taker-flow decomposition, ATR (SMA of true range), relative range. Pure
column algebra → single whole-stage-codegen pass, no shuffle beyond the
ATR window's per-key sort.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from binance_futures_data_lake_spark.functions import windows as W

EPS = 1e-12


def m1_features(
    df: DataFrame,
    by: Sequence[str] = ("symbol",),
    order: Sequence[str] = ("ts",),
    atr_len: int = 14,
) -> DataFrame:
    """Candle geometry + taker flow + ATR + range_rel
    (build_m1_features.py:70-138). Ratio columns are null when range≈0
    (the reference's ``where(rng > EPS, nan)`` guard)."""
    by, order = list(by), list(order)
    o, h, l, c = F.col("open"), F.col("high"), F.col("low"), F.col("close")
    rng = h - l
    body = F.abs(c - o)
    upper_wick = h - F.greatest(o, c)
    lower_wick = F.least(o, c) - l
    rng_safe = F.when(rng > EPS, rng)
    vol_safe = F.when(F.col("volume_base") > EPS, F.col("volume_base"))
    market_buys = F.col("taker_buy_base")
    market_sells = F.col("volume_base") - F.col("taker_buy_base")
    delta = market_buys - market_sells

    out = (
        df.withColumn("range", rng)
        .withColumn("body", body)
        .withColumn("upper_wick", upper_wick)
        .withColumn("lower_wick", lower_wick)
        .withColumn("body_pct", body / rng_safe)
        .withColumn("upper_wick_pct", upper_wick / rng_safe)
        .withColumn("lower_wick_pct", lower_wick / rng_safe)
        .withColumn("close_pos", (c - l) / rng_safe)
        .withColumn("market_buys", market_buys)
        .withColumn("market_sells", market_sells)
        .withColumn("delta", delta)
        .withColumn("delta_norm", delta / vol_safe)
        .withColumn("tr", W.true_range(by, order))
    )
    atr_col = f"atr{atr_len}"
    out = out.withColumn(atr_col, W.rolling_mean("tr", atr_len, by, order))
    return out.withColumn(
        "range_rel", F.col("range") / F.greatest(F.col(atr_col), F.lit(EPS))
    )


def tradability_gates(df: DataFrame) -> DataFrame:
    """Boolean tradability gates (enrich_joined_low_plus.py:22-60, P9).

    ``low_plus``: LOW-vol bar whose direction regime is readable;
    ``market_ready_base``: vol regime readable and not LOW;
    ``tradable_final``: base gate OR the low_plus override.
    """
    dir_ok = F.col("dir_ready") & F.upper(F.col("dir_state")).isin("BULL", "BEAR")
    low_plus = (F.col("vol_state") == "LOW") & dir_ok
    market_ready_base = F.col("vol_state").isin("MID", "HIGH")
    return (
        df.withColumn("dir_ok", dir_ok)
        .withColumn("low_plus", low_plus)
        .withColumn("market_ready_base", market_ready_base)
        .withColumn("tradable_base", market_ready_base & dir_ok)
        .withColumn("tradable_override", low_plus)
        .withColumn("tradable_final", (market_ready_base & dir_ok) | low_plus)
    )
