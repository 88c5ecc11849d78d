"""Market-structure operators: swing breaks (W15), the stateful regime-case
classifier (W19), and range-box expansion from flat levels (W21).

W15 is pure column algebra (lag/rolling/ffill) — fully declarative, oracle-
checkable. W19 and W21 are the reference's two genuinely sequential
kernels: W19 recurses on its own previous OUTPUT (prev_case), W21 walks
outward from a candidate bar with a tolerance counter. Both become
per-group ``applyInPandas`` — one key's history in one group, parallel
across keys (and across candidates for W21).
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from binance_futures_data_lake_spark.functions import windows as W


def structure_breaks(
    df: DataFrame,
    by: Sequence[str],
    order: Sequence[str],
    swing: int = 10,
    atr_col: str = "atr",
    bos_atr_frac: float = 0.2,
) -> DataFrame:
    """SURVEY W15 (build_mtf_context_h4_v1.py:123-136): higher-high /
    lower-low flags vs the PRIOR swing window (shift(1).rolling — frame
    excludes the current row), break-of-structure vs swing ± 0.2·ATR, and
    change-of-character = break against the last non-neutral prior state.

    prior_state is `replace(0,nan).ffill().shift(1)`: the last non-zero
    hh/ll state strictly before this row — `lag` of a `last(ignoreNulls)`
    running window in Spark.
    """
    by, order = list(by), list(order)
    prev_high_max = W.rolling_max("high", swing, by, order, min_periods=swing, exclude_current=True)
    prev_low_min = W.rolling_min("low", swing, by, order, min_periods=swing, exclude_current=True)
    # pandas `.astype(int)` maps a NaN-comparison to 0 (warmup rows where the
    # swing window or ATR is incomplete) — coalesce to keep that contract
    flag = lambda c: F.coalesce(c.cast("int"), F.lit(0))  # noqa: E731
    out = (
        df.withColumn("prev_high_max", prev_high_max)
        .withColumn("prev_low_min", prev_low_min)
        .withColumn("is_hh", flag(F.col("high") > F.col("prev_high_max")))
        .withColumn("is_ll", flag(F.col("low") < F.col("prev_low_min")))
        .withColumn(
            "hh_hl_state",
            F.when(F.col("is_hh") == 1, 1).when(F.col("is_ll") == 1, -1).otherwise(0),
        )
        .withColumn(
            "bos_up",
            flag(F.col("close") > F.col("prev_high_max") + bos_atr_frac * F.col(atr_col)),
        )
        .withColumn(
            "bos_down",
            flag(F.col("close") < F.col("prev_low_min") - bos_atr_frac * F.col(atr_col)),
        )
    )
    nonzero = F.when(F.col("hh_hl_state") != 0, F.col("hh_hl_state"))
    prior_state = F.coalesce(
        W.lag_col(W.ffill(nonzero, by, order), 1, by, order), F.lit(0)
    )
    return (
        out.withColumn("prior_state", prior_state)
        .withColumn("choch_up", ((F.col("bos_up") == 1) & (F.col("prior_state") < 0)).cast("int"))
        .withColumn("choch_down", ((F.col("bos_down") == 1) & (F.col("prior_state") > 0)).cast("int"))
    )


# --- W19: stateful regime-case classifier ----------------------------------

REGIME_CASES = [
    "WARMUP_UNDEFINED", "DATA_GAP_OR_INVALID", "CHAOS_CONFLICT_TF",
    "MACRO_BULL_MICRO_BEAR", "MACRO_BEAR_MICRO_BULL",
    "BREAKOUT_UP_FROM_RANGE", "BREAKOUT_DOWN_FROM_RANGE",
    "TREND_CONTINUATION_LONG", "TREND_CONTINUATION_SHORT",
    "PULLBACK_LONG_IN_BULL_TREND", "PULLBACK_SHORT_IN_BEAR_TREND",
    "RANGE_BIASED_LONG", "RANGE_BIASED_SHORT", "RANGE_NEUTRAL",
    "FAKE_BREAKOUT_UP", "FAKE_BREAKOUT_DOWN",
    "EXHAUSTION_TOP", "EXHAUSTION_BOTTOM", "LOW_CONFIDENCE_NEUTRAL",
]


def _case_for_row(d_w, d_d, d_h4, d_h1, prev_case, neutral_thresh):
    """Single-row case decision given the PREVIOUS row's assigned case —
    the recursion of audit_regime_cases_v1.py:65-125 (4-TF form: the
    driver tables have no MN1/M30 analogue; weights follow the reference's
    3/3/2/2 for W1/D1/H4/H1)."""
    if pd.isna(d_w) or pd.isna(d_d) or pd.isna(d_h4) or pd.isna(d_h1):
        return "DATA_GAP_OR_INVALID"
    score = 3 * d_w + 3 * d_d + 2 * d_h4 + 2 * d_h1
    macro_bull = d_w == 1 and d_d == 1
    macro_bear = d_w == -1 and d_d == -1
    micro_bull = d_h4 == 1 and d_h1 == 1
    micro_bear = d_h4 == -1 and d_h1 == -1
    conflict = (d_w * d_d == -1) or (d_d * d_h4 == -1)
    if conflict:
        return "CHAOS_CONFLICT_TF"
    if macro_bull and micro_bear:
        return "MACRO_BULL_MICRO_BEAR"
    if macro_bear and micro_bull:
        return "MACRO_BEAR_MICRO_BULL"
    if macro_bull and micro_bull:
        if prev_case == "RANGE_NEUTRAL":
            return "BREAKOUT_UP_FROM_RANGE"
        return "TREND_CONTINUATION_LONG"
    if macro_bear and micro_bear:
        if prev_case == "RANGE_NEUTRAL":
            return "BREAKOUT_DOWN_FROM_RANGE"
        return "TREND_CONTINUATION_SHORT"
    if macro_bull and (d_h4 < 0 or d_h1 < 0):
        return "PULLBACK_LONG_IN_BULL_TREND"
    if macro_bear and (d_h4 > 0 or d_h1 > 0):
        return "PULLBACK_SHORT_IN_BEAR_TREND"
    if abs(score) < neutral_thresh:
        if d_w > 0:
            return "RANGE_BIASED_LONG"
        if d_w < 0:
            return "RANGE_BIASED_SHORT"
        return "RANGE_NEUTRAL"
    if prev_case == "BREAKOUT_UP_FROM_RANGE" and d_h1 <= 0:
        return "FAKE_BREAKOUT_UP"
    if prev_case == "BREAKOUT_DOWN_FROM_RANGE" and d_h1 >= 0:
        return "FAKE_BREAKOUT_DOWN"
    return "LOW_CONFIDENCE_NEUTRAL"


def assign_regime_cases(
    df: DataFrame,
    by: Sequence[str],
    order: Sequence[str],
    dir_cols: Sequence[str] = ("dir_w", "dir_d", "dir_h4", "dir_h1"),
    neutral_thresh: float = 4.0,
) -> DataFrame:
    """SURVEY W19: the classifier needs the previous row's OUTPUT, so it is
    a true sequential recursion per key — one ``applyInPandas`` group per
    key, embarrassingly parallel across keys. Emits `case` and
    `case_age` (bars since the case last changed)."""
    by, order = list(by), list(order)
    w, d, h4, h1 = dir_cols
    out_schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField("case", T.StringType()), T.StructField("case_age", T.LongType())]
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order, kind="mergesort").reset_index(drop=True)
        prev = "WARMUP_UNDEFINED"
        cases, ages = [], []
        age = 0
        for r in pdf.itertuples(index=False):
            case = _case_for_row(
                getattr(r, w), getattr(r, d), getattr(r, h4), getattr(r, h1),
                prev, neutral_thresh,
            )
            age = age + 1 if case == prev else 0
            cases.append(case)
            ages.append(age)
            prev = case
        pdf["case"] = cases
        pdf["case_age"] = ages
        return pdf

    return df.repartition(*by).groupBy(*by).applyInPandas(kernel, out_schema)


# --- router gate derivation --------------------------------------------------

TREND_CASES_LONG = (
    "TREND_CONTINUATION_LONG", "PULLBACK_LONG_IN_BULL_TREND",
    "BREAKOUT_UP_FROM_RANGE",
)
TREND_CASES_SHORT = (
    "TREND_CONTINUATION_SHORT", "PULLBACK_SHORT_IN_BEAR_TREND",
    "BREAKOUT_DOWN_FROM_RANGE",
)
_ZERO_SIZE_CASES = ("WARMUP_UNDEFINED", "DATA_GAP_OR_INVALID", "CHAOS_CONFLICT_TF")


def _dir_label(c) -> "F.Column":
    return (
        F.when(c == 1, "LONG")
        .when(c == -1, "SHORT")
        .when(c == 0, "NEUTRE")
        .otherwise("NA")
    )


def router_gate_from_cases(
    cases: DataFrame,
    dir_cols: Sequence[str] = ("dir_w", "dir_d", "dir_h4", "dir_h1"),
    case_col: str = "case",
    only_trend_cases: bool = False,
) -> DataFrame:
    """Derive the backtest router gate from the regime-case audit
    (build_router_gate_from_audit_v1.py:31-57,82-115): strict multi-TF
    alignment — every confirming timeframe agrees on the direction and the
    counter-TF (H4 here) is at least not opposed (a MISSING counter-TF
    passes the not-opposed check, like the reference's ``NaN != 'SHORT'``)
    — yields ``allow_long``/``allow_short``; ``size_mult_base`` ladders on
    the |confluence| score (≥10→1.0, ≥7→0.75, ≥4→0.5, else 0.25; hard 0 on
    warmup/gap/chaos cases, :52-63); per-side multipliers zero out the
    disallowed side (:103-104); plus ``gate_direction`` and the
    human-readable ``dir_stack``. 4-TF form (W/D/H4/H1) — the driver
    tables have no MN1/M30 analogue; weights follow the reference's
    3/3/2/2.

    Pure column algebra — one whole-stage-codegen pass, no shuffle, no
    UDF; at 100 TB the gate derivation is free next to the scan."""
    w, d, h4, h1 = (F.col(c) for c in dir_cols)
    case = F.col(case_col)
    allow_long = F.coalesce(
        (w == 1) & (d == 1) & (h1 == 1) & (h4.isNull() | (h4 != -1)), F.lit(False)
    )
    allow_short = F.coalesce(
        (w == -1) & (d == -1) & (h1 == -1) & (h4.isNull() | (h4 != 1)), F.lit(False)
    )
    if only_trend_cases:
        allow_long = allow_long & case.isin(*TREND_CASES_LONG)
        allow_short = allow_short & case.isin(*TREND_CASES_SHORT)
    # defensive both-direction neutralization (:90-94); strict alignment
    # makes this a no-op (w == 1 and w == -1 are disjoint) but the
    # reference keeps it against dirty input, so the port does too
    both = allow_long & allow_short
    allow_long = allow_long & ~both
    allow_short = allow_short & ~both

    score = 3 * w + 3 * d + 2 * h4 + 2 * h1
    size_base = (
        F.when(case.isin(*_ZERO_SIZE_CASES), 0.0)
        .when(F.abs(score) >= 10, 1.0)
        .when(F.abs(score) >= 7, 0.75)
        .when(F.abs(score) >= 4, 0.5)
        .otherwise(0.25)
    )
    out = (
        cases.withColumn("allow_long", allow_long.cast("int"))
        .withColumn("allow_short", allow_short.cast("int"))
        .withColumn("confluence_score", score.cast("int"))
        .withColumn("size_mult_base", size_base)
        .withColumn(
            "size_mult_long",
            F.when(F.col("allow_long") == 1, F.col("size_mult_base")).otherwise(0.0),
        )
        .withColumn(
            "size_mult_short",
            F.when(F.col("allow_short") == 1, F.col("size_mult_base")).otherwise(0.0),
        )
        .withColumn(
            "gate_direction",
            F.when(F.col("allow_long") == 1, "LONG")
            .when(F.col("allow_short") == 1, "SHORT")
            .otherwise("NONE"),
        )
        .withColumn(
            "dir_stack",
            F.concat_ws("|", _dir_label(w), _dir_label(d), _dir_label(h4), _dir_label(h1)),
        )
    )
    return out


# --- W21: range-box expansion -----------------------------------------------

def range_box_candidates(
    bars: DataFrame,
    by: Sequence[str],
    ts_col: str = "bucket_ts",
    lookback: int = 6,
    narrow_frac: float = 0.02,
    min_bars: int = 2,
) -> DataFrame:
    """Narrow-range islands → candidate boxes (the detection half of W21,
    build_range_boxes_from_flats_v2.py:40-103): a bar is *narrow* when its
    ``lookback``-bar rolling high−low range is below ``narrow_frac`` of the
    close; consecutive narrow bars consolidate into one candidate
    (island id), keeping islands of ≥ ``min_bars`` bars, with the island's
    min-low/max-high as the box levels and a deterministic dense-rank
    ``cand_id``. Everything is window algebra — no collection, no kernel;
    pairs with :func:`expand_boxes` for the containment expansion."""
    from pyspark.sql import Window

    by = list(by)
    order = [ts_col]
    rng = W.rolling_max("high", lookback, by, order, min_periods=lookback) - (
        W.rolling_min("low", lookback, by, order, min_periods=lookback)
    )
    med = bars.withColumn("__rng", rng).filter(F.col("__rng").isNotNull())
    narrow = med.withColumn(
        "__narrow", F.col("__rng") < F.col("close") * F.lit(float(narrow_frac))
    )
    isl = narrow.withColumn(
        "__island",
        W.island_id(
            F.coalesce(
                F.col("__narrow") != W.lag_col("__narrow", 1, by, order),
                F.lit(True),
            ),
            by, order,
        ),
    )
    return (
        isl.filter(F.col("__narrow"))
        .groupBy(*by, "__island")
        .agg(
            F.min(ts_col).alias("start_ts"),
            F.max(ts_col).alias("end_ts"),
            F.min("low").alias("range_low"),
            F.max("high").alias("range_high"),
            F.count(F.lit(1)).alias("n_src"),
        )
        .filter(F.col("n_src") >= int(min_bars))
        .withColumn(
            "cand_id",
            F.dense_rank().over(Window.orderBy(*by, "start_ts")).cast("long"),
        )
        .select(*by, "cand_id", "start_ts", "end_ts", "range_low", "range_high")
    )


BOX_SCHEMA_FIELDS = [
    T.StructField("cand_id", T.LongType()),
    T.StructField("box_start", T.TimestampType()),
    T.StructField("box_end", T.TimestampType()),
    T.StructField("left_n", T.IntegerType()),
    T.StructField("right_n", T.IntegerType()),
    T.StructField("n_bars", T.IntegerType()),
]


def expand_boxes(
    bars: DataFrame,
    candidates: DataFrame,
    by: Sequence[str],
    ts_col: str = "bucket_ts",
    max_expand_bars: int = 100,
    contain_tol_frac: float = 0.1,
    contain_mode: str = "close",
    break_confirm_bars: int = 2,
) -> DataFrame:
    """SURVEY W21 (build_range_boxes_from_flats_v2.py:104-186): expand each
    candidate [start, end] × [low, high] box bidirectionally while bars stay
    inside (± tolerance·width), stopping after `break_confirm_bars`
    consecutive outside bars.

    Distribution: candidates are cogrouped with their key's bars
    (``cogroup.applyInPandas``) — each key's full bar history meets its own
    candidates exactly once; no broadcast of the bar table, no per-candidate
    shuffle. Inside the kernel each candidate is an O(max_expand) walk.
    """
    by = list(by)
    out_schema = T.StructType(
        [f for f in candidates.schema.fields if f.name in by] + BOX_SCHEMA_FIELDS
    )

    def kernel(cand_pdf: pd.DataFrame, bars_pdf: pd.DataFrame) -> pd.DataFrame:
        if cand_pdf.empty or bars_pdf.empty:
            return pd.DataFrame({f.name: pd.Series(dtype="object") for f in out_schema.fields})
        bars_s = bars_pdf.sort_values(ts_col, kind="mergesort").reset_index(drop=True)
        ts = bars_s[ts_col]
        rows = []
        for c in cand_pdf.itertuples(index=False):
            lo, hi = float(c.range_low), float(c.range_high)
            tol = contain_tol_frac * max(0.0, hi - lo)
            if contain_mode == "close":
                inside = (bars_s["close"] >= lo - tol) & (bars_s["close"] <= hi + tol)
            elif contain_mode == "body":
                body_lo = bars_s[["open", "close"]].min(axis=1)
                body_hi = bars_s[["open", "close"]].max(axis=1)
                inside = (body_lo >= lo - tol) & (body_hi <= hi + tol)
            else:  # wick
                inside = (bars_s["low"] >= lo - tol) & (bars_s["high"] <= hi + tol)
            inside = inside.to_numpy()

            i0 = int(ts.searchsorted(c.start_ts, side="left"))
            i1 = int(ts.searchsorted(c.end_ts, side="right")) - 1
            i0 = max(0, min(i0, len(bars_s) - 1))
            i1 = max(i0, min(i1, len(bars_s) - 1))

            def walk(start_i, step):
                last_inside, outside_run, n_in, steps = start_i, 0, 0, 0
                j = start_i + step
                while 0 <= j < len(bars_s) and steps < max_expand_bars:
                    steps += 1
                    if inside[j]:
                        last_inside, outside_run = j, 0
                        n_in += 1
                    else:
                        outside_run += 1
                        if outside_run >= break_confirm_bars:
                            break
                    j += step
                return last_inside, n_in

            i0x, left_n = walk(i0, -1)
            i1x, right_n = walk(i1, +1)
            rows.append(
                tuple(getattr(c, k) for k in by)
                + (int(c.cand_id), ts.iloc[i0x], ts.iloc[i1x], left_n, right_n, i1x - i0x + 1)
            )
        return pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return (
        candidates.groupBy(*by)
        .cogroup(bars.groupBy(*by))
        .applyInPandas(kernel, out_schema)
    )
