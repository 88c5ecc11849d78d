"""Deterministic synthetic kline generation — Spark-native, no driver loop.

Produces canonical 15-column M1 bars (schemas.KLINES_M1_SCHEMA) as a
seeded pseudo-random walk. Generation is ``spark.range`` + column
expressions, so a 100-symbol × 10-year frame (≈500M rows) generates
distributed, partitioned by symbol — this doubles as a scale-test source.

Used by tests (fixture variants of FIXTURES.md F1: clean grid, gaps,
duplicate staging rows, incomplete trailing bucket) and by the demo
pipeline plans.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def synthetic_klines_m1(
    spark: SparkSession,
    symbols: Sequence[str] = ("BTCUSDT", "ETHUSDT"),
    start: str = "2024-01-01 00:00:00",
    n_minutes: int = 3 * 24 * 60,
    seed: int = 42,
    base_price: float = 50_000.0,
    trend_amp: float = 0.0,
) -> DataFrame:
    """Seeded random-walk M1 bars on a dense minute grid.

    Pseudo-randomness is a pure hash of (symbol, minute index, seed) so the
    output is deterministic and independent of partitioning — safe for
    golden tests. OHLC invariants hold by construction:
    low <= min(open, close) <= max(open, close) <= high.
    """
    sym_df = spark.createDataFrame([(s, i) for i, s in enumerate(symbols)], "symbol string, sym_idx int")
    grid = spark.range(n_minutes).withColumnRenamed("id", "minute_idx")
    df = grid.crossJoin(F.broadcast(sym_df))

    def u(salt: int):
        """uniform [0,1) from a pure hash — deterministic, partition-independent"""
        h = F.hash(F.col("minute_idx"), F.col("sym_idx"), F.lit(seed), F.lit(salt))
        return (F.pmod(h.cast("long"), F.lit(1_000_003)) / F.lit(1_000_003.0))

    t0 = F.lit(start).cast("timestamp")
    open_ms = (F.unix_micros(t0) / 1000).cast("long") + F.col("minute_idx") * 60_000
    # price: base · (1 + small deterministic oscillation + drift by index)
    # optional slow trend (period ≈ 2 days) so regime/backtest consumers see
    # sustained BULL/BEAR phases; default 0 keeps historical golden outputs
    osc = (
        (u(1) - 0.5) * 0.02
        + F.sin(F.col("minute_idx") / 240.0) * 0.01
        + F.sin(F.col("minute_idx") / 1440.0) * trend_amp
    )
    o = F.lit(base_price) * (1 + osc) * (1 + F.col("sym_idx") * 0.5)
    c = o * (1 + (u(2) - 0.5) * 0.004)
    hi = F.greatest(o, c) * (1 + u(3) * 0.002)
    lo = F.least(o, c) * (1 - u(4) * 0.002)
    vol = u(5) * 100.0
    taker = vol * u(6)
    n_tr = (u(7) * 500).cast("long") + 1

    return df.select(
        F.timestamp_millis(open_ms).alias("ts"),
        o.alias("open"),
        hi.alias("high"),
        lo.alias("low"),
        c.alias("close"),
        vol.alias("volume_base"),
        (vol * (o + c) / 2).alias("volume_quote"),
        n_tr.alias("n_trades"),
        taker.alias("taker_buy_base"),
        (taker * (o + c) / 2).alias("taker_buy_quote"),
        open_ms.alias("open_time_ms"),
        (open_ms + 59_999).alias("close_time_ms"),
        F.lit("binance").alias("exchange"),
        F.lit("um_futures").alias("market"),
        F.col("symbol"),
    )
