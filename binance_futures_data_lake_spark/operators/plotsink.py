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


# --- detected-ranges overlay (closes S15 fully) -----------------------------

BOX_ACTIVE = ("#AED6F1", "#2E86C1")       # plot_detected_ranges_v1.py:144-149
BOX_BREAK_UP = ("#7DCEA0", "#27AE60")
BOX_BREAK_DOWN = ("#F5B7B1", "#C0392B")
CANDLE_GREEN = "#1e8449"                  # plot_detected_ranges_v1.py:173
CANDLE_RED = "#c0392b"


def range_overlay_frame(
    bars: DataFrame,
    boxes: DataFrame,
    key_cols: Sequence[str],
    ts_col: str = "bucket_ts",
) -> DataFrame:
    """Boxes + breakout status, in-plan (the data half of the reference's
    detected-ranges chart, plot_detected_ranges_v1.py:129-151).

    ``boxes`` carries ``box_start/box_end/range_low/range_high`` (the
    :func:`~...structure.expand_boxes` output joined back to its
    candidates' levels). Status comes from the FIRST bar after
    ``box_end``: close above the range → BREAKOUT_UP, below →
    BREAKOUT_DOWN, else (inside, or no later bar) ACTIVE — one keyed
    join + min_by aggregate, no collection."""
    key_cols = list(key_cols)
    nxt = (
        boxes.join(
            bars.select(
                *key_cols,
                F.col(ts_col).alias("__ts"),
                F.col("close").alias("__close"),
            ),
            on=key_cols,
        )
        .filter(F.col("__ts") > F.col("box_end"))
        .groupBy(*key_cols, "cand_id")
        .agg(F.min_by("__close", "__ts").alias("__next_close"))
    )
    status = (
        F.when(F.col("__next_close") > F.col("range_high"), F.lit("BREAKOUT_UP"))
        .when(F.col("__next_close") < F.col("range_low"), F.lit("BREAKOUT_DOWN"))
        .otherwise(F.lit("ACTIVE"))
    )
    return (
        boxes.join(nxt, [*key_cols, "cand_id"], "left")
        .withColumn("status", F.coalesce(status, F.lit("ACTIVE")))
        .drop("__next_close")
    )


def render_ranges_svg(
    bar_rows: list,
    box_rows: list,
    title: str = "Detected Ranges",
    width: int = 1280,
    height: int = 640,
    pad: int = 40,
) -> str:
    """Render collected bars (bucket_ts/open/high/low/close) with range-box
    overlays (box_start/box_end/range_low/range_high/status) — the marks of
    plot_detected_ranges_v1.py:129-186: status-colored translucent box
    rects UNDER the candles, candles as wick + body, legend. Deterministic
    string construction: identical input ⇒ identical bytes."""
    bar_rows = sorted(bar_rows, key=lambda r: r["bucket_ts"])
    if not bar_rows:
        raise ValueError("no bars to render")
    ts_list = [r["bucket_ts"] for r in bar_rows]
    lo = min(min(r["low"] for r in bar_rows),
             min((b["range_low"] for b in box_rows), default=float("inf")))
    hi = max(max(r["high"] for r in bar_rows),
             max((b["range_high"] for b in box_rows), default=float("-inf")))
    span = (hi - lo) or 1.0
    n = len(bar_rows)
    plot_w, plot_h = width - 2 * pad, height - 2 * pad
    step = plot_w / n
    body_w = max(1.0, min(8.0, step * 0.55))

    def ypix(price: float) -> float:
        return pad + (hi - price) / span * plot_h

    def xpix(i: float) -> float:
        return pad + (i + 0.5) * step

    import bisect

    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" height="{height}" '
        f'viewBox="0 0 {width} {height}">',
        f'<rect width="{width}" height="{height}" fill="white"/>',
        f'<text x="{pad}" y="{pad / 2 + 6}" font-family="sans-serif" font-size="16">'
        f"{title} ({n} bars, {len(box_rows)} boxes)</text>",
    ]
    # boxes first: translucent rects UNDER the candles
    for b in sorted(box_rows, key=lambda r: (r["box_start"], r.get("cand_id", 0))):
        il = bisect.bisect_left(ts_list, b["box_start"])
        ir = bisect.bisect_right(ts_list, b["box_end"]) - 1
        if ir < 0 or il >= n:
            continue
        il, ir = max(il, 0), min(ir, n - 1)
        fill, stroke = {
            "BREAKOUT_UP": BOX_BREAK_UP,
            "BREAKOUT_DOWN": BOX_BREAK_DOWN,
        }.get(str(b.get("status", "ACTIVE")), BOX_ACTIVE)
        yt, yb = ypix(b["range_high"]), ypix(b["range_low"])
        parts.append(
            f'<rect x="{xpix(il) - body_w / 2:.2f}" y="{yt:.2f}" '
            f'width="{max(1.0, xpix(ir) - xpix(il) + body_w):.2f}" '
            f'height="{max(1.0, yb - yt):.2f}" '
            f'fill="{fill}" fill-opacity="0.25" stroke="{stroke}" stroke-width="1"/>'
        )
    for i, r in enumerate(bar_rows):
        color = CANDLE_GREEN if r["close"] >= r["open"] else CANDLE_RED
        cx = xpix(i)
        top, bot = max(r["open"], r["close"]), min(r["open"], r["close"])
        parts.append(
            f'<line x1="{cx:.2f}" y1="{ypix(r["high"]):.2f}" '
            f'x2="{cx:.2f}" y2="{ypix(r["low"]):.2f}" '
            f'stroke="{color}" stroke-width="1"/>'
        )
        parts.append(
            f'<rect x="{cx - body_w / 2:.2f}" y="{ypix(top):.2f}" '
            f'width="{body_w:.2f}" height="{max(abs(ypix(bot) - ypix(top)), 1.0):.2f}" '
            f'fill="{color}" fill-opacity="0.85" stroke="{color}"/>'
        )
    # legend (same three box states as the reference)
    lx, ly = pad + 8, pad + 16
    for label, (fill, stroke) in (
        ("Range ACTIVE", BOX_ACTIVE),
        ("Breakout UP", BOX_BREAK_UP),
        ("Breakout DOWN", BOX_BREAK_DOWN),
    ):
        parts.append(
            f'<rect x="{lx}" y="{ly - 8}" width="18" height="10" fill="{fill}" '
            f'fill-opacity="0.35" stroke="{stroke}"/>'
            f'<text x="{lx + 24}" y="{ly}" font-family="sans-serif" '
            f'font-size="11">{label}</text>'
        )
        ly += 16
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


def plot_range_overlay(
    bars: DataFrame,
    boxes: DataFrame,
    key_cols: Sequence[str],
    key_value,
    out_path: str,
    ts_col: str = "bucket_ts",
    max_bars: int = 400,
    title: str | None = None,
) -> str:
    """End-to-end ranges-overlay sink (reference
    plot_detected_ranges_v1.py:87-223 re-expressed Spark-first): status
    derivation and the bar tail cap run in-plan; only the ≤ ``max_bars``
    visible bars and their overlapping boxes are collected. Returns the
    path written."""
    key_cols = list(key_cols)
    framed = range_overlay_frame(bars, boxes, key_cols, ts_col)
    # key_value pins EVERY key column (a scalar pairs with a single key
    # col; composite keys take a tuple/list) — filtering on the first
    # column alone would interleave bars and boxes from every other key
    # combination sharing that value
    values = (
        list(key_value)
        if isinstance(key_value, (list, tuple))
        else [key_value]
    )
    if len(values) != len(key_cols):
        raise ValueError(
            f"key_value provides {len(values)} values for "
            f"{len(key_cols)} key columns {key_cols}"
        )
    one_key = F.lit(True)
    for c, v in zip(key_cols, values):
        one_key = one_key & (F.col(c) == F.lit(v))
    view = bars.filter(one_key)
    if max_bars > 0:
        rank = F.row_number().over(
            Window.partitionBy(*key_cols).orderBy(F.col(ts_col).desc())
        )
        view = view.withColumn("__rk", rank).filter(F.col("__rk") <= max_bars)
    bar_rows = [
        r.asDict()
        for r in view.select(
            F.col(ts_col).alias("bucket_ts"), "open", "high", "low", "close"
        ).collect()
    ]
    if not bar_rows:
        raise ValueError(f"no bars for key {key_value!r}")
    first_ts = min(r["bucket_ts"] for r in bar_rows)
    box_rows = [
        r.asDict()
        for r in framed.filter(one_key)
        .filter(F.col("box_end") >= F.lit(first_ts))
        .select(
            "cand_id", "box_start", "box_end", "range_low", "range_high", "status"
        )
        .collect()
    ]
    svg = render_ranges_svg(
        bar_rows, box_rows, title=title or f"{key_value} Detected Ranges"
    )
    with open(out_path, "w") as f:
        f.write(svg)
    return out_path


def plot_detected_ranges(
    bars: DataFrame,
    key_cols: Sequence[str],
    key_value,
    out_path: str,
    ts_col: str = "bucket_ts",
    lookback: int = 6,
    narrow_frac: float = 0.02,
    max_expand_bars: int = 100,
    max_bars: int = 400,
    title: str | None = None,
) -> str:
    """Detect → expand → render in one call (the full
    plot_detected_ranges_v1.py pipeline): narrow-range candidate islands
    (:func:`~...structure.range_box_candidates`), bidirectional
    containment expansion (:func:`~...structure.expand_boxes`), breakout
    status, SVG overlay. All detection/expansion runs in-plan; only the
    charted tail collects."""
    from binance_futures_data_lake_spark.operators.structure import (
        expand_boxes,
        range_box_candidates,
    )

    key_cols = list(key_cols)
    cands = range_box_candidates(
        bars, key_cols, ts_col=ts_col, lookback=lookback, narrow_frac=narrow_frac
    )
    boxes = expand_boxes(
        bars, cands, key_cols, ts_col=ts_col, max_expand_bars=max_expand_bars
    ).join(
        cands.select(*key_cols, "cand_id", "range_low", "range_high"),
        [*key_cols, "cand_id"],
    )
    return plot_range_overlay(
        bars, boxes, key_cols, key_value, out_path,
        ts_col=ts_col, max_bars=max_bars,
        title=title or f"{key_value} Detected Ranges",
    )
