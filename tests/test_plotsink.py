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


def _range_bars(spark):
    """H1 bars: 6 warm-up bars, a tight 8-bar range at ~100, then a clean
    breakout up to 110 — one detectable box whose first post-box close is
    above range_high."""
    import datetime as dt

    rows = []
    t0 = dt.datetime(2026, 1, 5, 0, 0)
    prices = (
        [90.0, 91.0, 92.0, 93.0, 94.0, 95.0]       # ramp (wide rolling range)
        + [100.0, 100.4, 99.8, 100.2, 100.1, 99.9, 100.3, 100.0]  # flat box
        + [110.0, 111.0, 112.0]                     # breakout up
    )
    for i, p in enumerate(prices):
        rows.append(
            ("BTC", t0 + dt.timedelta(hours=i), p, p + 0.3, p - 0.3, p + 0.1)
        )
    return spark.createDataFrame(
        rows, ["symbol", "bucket_ts", "open", "high", "low", "close"]
    )


def test_range_overlay_status_and_marks(spark, tmp_path):
    """Detect → expand → status → render: the flat segment must produce a
    candidate box, the first post-box close (110.1 > range_high) must
    label it BREAKOUT_UP, and the SVG must carry the breakout-colored box
    rect under the candles (reference plot_detected_ranges_v1.py marks)."""
    from binance_futures_data_lake_spark.operators.plotsink import (
        BOX_BREAK_UP,
        plot_detected_ranges,
        range_overlay_frame,
    )
    from binance_futures_data_lake_spark.operators.structure import (
        expand_boxes,
        range_box_candidates,
    )

    bars = _range_bars(spark)
    cands = range_box_candidates(
        bars, ["symbol"], lookback=4, narrow_frac=0.02, min_bars=2
    )
    crows = cands.collect()
    assert len(crows) >= 1
    boxes = expand_boxes(bars, cands, ["symbol"]).join(
        cands.select("symbol", "cand_id", "range_low", "range_high"),
        ["symbol", "cand_id"],
    )
    framed = {r.cand_id: r for r in range_overlay_frame(bars, boxes, ["symbol"]).collect()}
    assert any(r.status == "BREAKOUT_UP" for r in framed.values())

    out = tmp_path / "ranges.svg"
    p = plot_detected_ranges(
        bars, ["symbol"], "BTC", str(out), lookback=4, narrow_frac=0.02
    )
    svg = open(p).read()
    assert svg.startswith("<svg") and svg.rstrip().endswith("</svg>")
    assert BOX_BREAK_UP[0] in svg            # breakout-up box fill present
    assert svg.count("<rect") > len(_range_bars(spark).collect())  # boxes + bodies
    # byte-determinism: identical input ⇒ identical bytes
    p2 = plot_detected_ranges(
        bars, ["symbol"], "BTC", str(tmp_path / "ranges2.svg"),
        lookback=4, narrow_frac=0.02,
    )
    assert open(p).read() == open(p2).read()


def test_range_overlay_active_when_no_breakout(spark, tmp_path):
    """A box whose post-box closes stay inside the range must stay ACTIVE
    (and a box with NO later bars must also be ACTIVE, not null)."""
    import datetime as dt

    from binance_futures_data_lake_spark.operators.plotsink import (
        range_overlay_frame,
    )
    from binance_futures_data_lake_spark.operators.structure import (
        expand_boxes,
        range_box_candidates,
    )

    t0 = dt.datetime(2026, 1, 5, 0, 0)
    prices = [90.0, 91.0, 92.0, 93.0] + [100.0, 100.2, 99.9, 100.1, 100.0, 99.8]
    bars = spark.createDataFrame(
        [
            ("BTC", t0 + dt.timedelta(hours=i), p, p + 0.3, p - 0.3, p + 0.1)
            for i, p in enumerate(prices)
        ],
        ["symbol", "bucket_ts", "open", "high", "low", "close"],
    )
    cands = range_box_candidates(
        bars, ["symbol"], lookback=4, narrow_frac=0.02, min_bars=2
    )
    boxes = expand_boxes(bars, cands, ["symbol"]).join(
        cands.select("symbol", "cand_id", "range_low", "range_high"),
        ["symbol", "cand_id"],
    )
    rows = range_overlay_frame(bars, boxes, ["symbol"]).collect()
    assert rows and all(r.status == "ACTIVE" for r in rows)
