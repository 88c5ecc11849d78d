"""S15 plot sink: weekly-candle SVG export (reference
plot_weekly_candles_v1.py rendered without plotting libraries)."""

from __future__ import annotations

import xml.etree.ElementTree as ET

from pyspark.sql import functions as F

from binance_futures_data_lake_spark.operators.plotsink import (
    plot_weekly_candles,
    render_candles_svg,
    weekly_candles_frame,
)
from binance_futures_data_lake_spark.sources.testdata import load_events

SF = "/root/testdata/sf0.001"


def test_weekly_frame_matches_direct_aggregation(spark):
    ev = load_events(spark, SF)
    frame = weekly_candles_frame(ev, ["event_type"], value_col="value")
    direct = (
        ev.withColumn("w", F.date_trunc("week", "ts"))
        .groupBy("event_type", "w")
        .agg(F.max("value").alias("high"), F.min("value").alias("low"))
    )
    a = {(r.event_type, r.week_ts): (r.high, r.low) for r in frame.collect()}
    b = {(r.event_type, r.w): (r.high, r.low) for r in direct.collect()}
    assert a == b and len(a) > 0


def test_max_weeks_caps_per_key_in_plan(spark):
    ev = load_events(spark, SF)
    capped = weekly_candles_frame(ev, ["event_type"], value_col="value", max_weeks=2)
    counts = capped.groupBy("event_type").count().collect()
    assert counts and all(r["count"] <= 2 for r in counts)
    # the kept weeks are the LATEST ones
    full = weekly_candles_frame(ev, ["event_type"], value_col="value")
    last = {
        r.event_type: r.week_ts
        for r in full.groupBy("event_type").agg(F.max("week_ts").alias("week_ts")).collect()
    }
    kept = {(r.event_type, r.week_ts) for r in capped.collect()}
    assert all((k, v) in kept for k, v in last.items())


def test_svg_render_marks_and_determinism(spark, tmp_path):
    ev = load_events(spark, SF)
    path = plot_weekly_candles(
        ev, ["event_type"], "click", str(tmp_path / "candles.svg"),
        value_col="value", max_weeks=50,
    )
    svg = open(path).read()
    root = ET.fromstring(svg)  # well-formed XML
    ns = "{http://www.w3.org/2000/svg}"
    rects = root.findall(f"{ns}rect")
    lines = root.findall(f"{ns}line")
    n_candles = len(lines)
    assert n_candles > 0
    # one wick line + one body rect per candle (+1 background rect)
    assert len(rects) == n_candles + 1
    # colors restricted to the reference palette
    fills = {r.get("fill") for r in rects} - {"white"}
    assert fills <= {"#1f9d55", "#d64545"}
    # deterministic: same input, byte-identical output
    path2 = plot_weekly_candles(
        ev, ["event_type"], "click", str(tmp_path / "candles2.svg"),
        value_col="value", max_weeks=50,
    )
    assert open(path2).read() == svg


def test_render_rejects_empty():
    import pytest as _pytest

    with _pytest.raises(ValueError):
        render_candles_svg([])


def test_ohlc_mode_uses_real_ohlc_columns(spark):
    """Klines-shaped input (open/high/low/close columns) must aggregate the
    REAL columns — weekly high = max(high), open = first bar's open — not
    candles-from-closes (r3 ADVICE: wicks/opens were understated)."""
    import datetime as dt

    rows = [
        # (ts, open, high, low, close) — one Monday-anchored week
        (dt.datetime(2026, 1, 5, 0, 0), 10.0, 99.0, 1.0, 12.0),
        (dt.datetime(2026, 1, 6, 0, 0), 12.0, 14.0, 11.0, 13.0),
        (dt.datetime(2026, 1, 7, 0, 0), 13.0, 15.0, 12.0, 14.0),
    ]
    df = spark.createDataFrame(
        [("BTC", *r) for r in rows],
        ["symbol", "ts", "open", "high", "low", "close"],
    )
    # auto-detect: OHLC columns present -> rollup mode
    out = weekly_candles_frame(df, ["symbol"]).collect()
    assert len(out) == 1
    r = out[0]
    assert r.open == 10.0   # first bar's OPEN, not its close
    assert r.high == 99.0   # max of HIGH, not max of closes (14.0)
    assert r.low == 1.0
    assert r.close == 14.0  # last bar's close
    # explicit single-value mode still builds candles from closes
    sv = weekly_candles_frame(df, ["symbol"], value_col="close", ohlc_cols=False).collect()[0]
    assert sv.high == 14.0 and sv.open == 12.0
