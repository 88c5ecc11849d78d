"""Plot sink (SURVEY §2.1 S15): weekly-candle chart export.

Reference: scripts/research/plot_weekly_candles_v1.py:60-113 — resample to
W-MON weekly bars (label=left, closed=left), optional ``max_weeks`` tail,
then one green/red candle (vline wick + body rectangle) per week, saved to
a file.

Spark-first split of that script:

- the DATA side — weekly resample, time filtering, tail cap — is engine
  work and runs distributed (``weekly_candles_frame`` delegates to
  ``resample.calendar_ohlcv``, whose ``date_trunc('week', ·)`` is
  Monday-anchored exactly like pandas W-MON with left labels);
- the RENDER side is inherently driver-side and bounded (a chart has at
  most a few hundred visible candles — the reference caps with
  ``--max-weeks`` for the same reason), so the frame is collected and
  drawn locally. ``collect()`` here is legitimate: the tail cap bounds it
  BEFORE collection, in-plan, via a keyed window rank.

The renderer writes SVG by direct string construction — the same marks
the reference draws (wick vline + body rect, green ``#1f9d55`` / red
``#d64545``, rising candles green on close >= open) with ZERO plotting
dependencies, so the sink is functional and deterministic in this
environment rather than stubbed: byte-identical output for identical
input, which makes it testable like any other operator.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

GREEN = "#1f9d55"  # plot_weekly_candles_v1.py:94
RED = "#d64545"


def weekly_candles_frame(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str = "ts",
    value_col: str = "close",
    max_weeks: int = 0,
    ohlc_cols: bool | None = None,
) -> DataFrame:
    """Plot-ready weekly OHLC frame (the data half of the reference plot).

    ``ohlc_cols`` selects the aggregation mode. ``True`` rolls existing
    open/high/low/close columns (klines bars — weekly open = first bar's
    open, high = max of highs; plot_weekly_candles_v1.py:60-68).
    ``False`` builds candles from the single ``value_col`` (tick
    streams). ``None`` (default) auto-detects: OHLC mode iff the frame
    carries all four columns, so klines input gets true wicks without
    callers opting in.

    ``max_weeks > 0`` keeps only the LAST n weeks per key — applied
    in-plan (per-key rank over week desc), so the cap happens before any
    collection regardless of history length.
    """
    from binance_futures_data_lake_spark.operators.resample import (
        calendar_ohlcv,
        calendar_rollup_bars,
    )

    if ohlc_cols is None:
        ohlc_cols = {"open", "high", "low", "close"}.issubset(df.columns)
    if ohlc_cols:
        w = calendar_rollup_bars(df, "week", key_cols, ts_col=ts_col)
    else:
        w = calendar_ohlcv(df, "week", key_cols, ts_col=ts_col, value_col=value_col)
    w = w.withColumnRenamed("bucket_ts", "week_ts")
    if max_weeks > 0:
        rank = F.row_number().over(
            Window.partitionBy(*key_cols).orderBy(F.col("week_ts").desc())
        )
        w = w.withColumn("__rk", rank).filter(F.col("__rk") <= max_weeks).drop("__rk")
    return w.select(*key_cols, "week_ts", "open", "high", "low", "close")


def render_candles_svg(
    rows: list,
    title: str = "Weekly Candles",
    width: int = 1280,
    height: int = 640,
    pad: int = 40,
) -> str:
    """Render collected candle rows (objects with week_ts/open/high/low/
    close) to an SVG string — wick line + body rect per candle, green when
    close >= open (plot_weekly_candles_v1.py:93-99)."""
    rows = sorted(rows, key=lambda r: r["week_ts"])
    if not rows:
        raise ValueError("no candles to render")
    lo = min(r["low"] for r in rows)
    hi = max(r["high"] for r in rows)
    span = (hi - lo) or 1.0
    n = len(rows)
    plot_w, plot_h = width - 2 * pad, height - 2 * pad
    step = plot_w / n
    body_w = max(1.0, step * 0.7)

    def ypix(price: float) -> float:
        return pad + (hi - price) / span * plot_h

    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" height="{height}" '
        f'viewBox="0 0 {width} {height}">',
        f'<rect width="{width}" height="{height}" fill="white"/>',
        f'<text x="{pad}" y="{pad / 2 + 6}" font-family="sans-serif" font-size="16">'
        f"{title} ({n} bars)</text>",
    ]
    for i, r in enumerate(rows):
        color = GREEN if r["close"] >= r["open"] else RED
        cx = pad + (i + 0.5) * step
        top, bot = max(r["open"], r["close"]), min(r["open"], r["close"])
        body_h = max(abs(ypix(bot) - ypix(top)), 0.5)
        parts.append(
            f'<line x1="{cx:.2f}" y1="{ypix(r["high"]):.2f}" '
            f'x2="{cx:.2f}" y2="{ypix(r["low"]):.2f}" '
            f'stroke="{color}" stroke-width="1"/>'
        )
        parts.append(
            f'<rect x="{cx - body_w / 2:.2f}" y="{ypix(top):.2f}" '
            f'width="{body_w:.2f}" height="{body_h:.2f}" '
            f'fill="{color}" stroke="{color}"/>'
        )
    # y-axis min/max labels
    parts.append(
        f'<text x="4" y="{ypix(hi) + 5:.2f}" font-family="sans-serif" '
        f'font-size="12">{hi:g}</text>'
    )
    parts.append(
        f'<text x="4" y="{ypix(lo):.2f}" font-family="sans-serif" '
        f'font-size="12">{lo:g}</text>'
    )
    parts.append("</svg>")
    return "\n".join(parts)


def plot_weekly_candles(
    df: DataFrame,
    key_cols: Sequence[str],
    key_value,
    out_path: str,
    ts_col: str = "ts",
    value_col: str = "close",
    max_weeks: int = 200,
    title: str | None = None,
) -> str:
    """End-to-end S15 sink: weekly frame for one key → SVG file.

    Returns the path written. The per-key filter and week cap are pushed
    into the plan; only the ≤ ``max_weeks`` plotted candles are collected.
    """
    key_cols = list(key_cols)
    frame = weekly_candles_frame(df, key_cols, ts_col, value_col, max_weeks)
    one = frame.filter(F.col(key_cols[0]) == F.lit(key_value))
    rows = [r.asDict() for r in one.collect()]
    svg = render_candles_svg(
        rows, title=title or f"{key_value} Weekly Candles"
    )
    with open(out_path, "w") as f:
        f.write(svg)
    return out_path
