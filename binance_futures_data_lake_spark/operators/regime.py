"""Regime operators (SURVEY §2.5 W17, §3.3 chain): direction score +
sticky state machine, M5 volatility regime, H1 trend/range/chaos router.

Reference semantics:
- direction score & sticky state: scripts/research/build_m15_direction_regime.py
  (_compute_scores :383-409, _sticky_state_v4 :274-380, params :38-53 with
  CLI defaults :455-468)
- vol regime: scripts/research/build_m5_vol_regime.py (add_vol_regime
  :148-187, defaults :51-54)
- H1 router: scripts/research/build_h1_regime_router_v2.py
  (compute_router_features :99-134, shift_h1_decision_cols :137-169,
  defaults :194-204)

Execution model: everything vectorizable stays in JVM columns (log returns,
rolling std, true range, efficiency ratio, threshold classification); the
EWM recursions run through the per-key ``ewm_apply`` pandas kernel; the one
genuinely sequential op — the sticky state machine, whose transition depends
on its own previous OUTPUT — is a per-key ``applyInPandas`` kernel,
embarrassingly parallel across symbols.
"""

from __future__ import annotations

from dataclasses import dataclass
from collections.abc import Sequence

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from binance_futures_data_lake_spark.functions import windows as W
from binance_futures_data_lake_spark.functions.ewm import ewm_apply, span_to_alpha


# --- M15 direction regime ---------------------------------------------------

@dataclass(frozen=True)
class DirectionParams:
    """Defaults = reference CLI defaults (build_m15_direction_regime.py:455-468)."""

    lookback: int = 16
    ema_fast: int = 8
    ema_slow: int = 21
    atr_len: int = 14
    score_smooth_span: int = 5
    w_impulse: float = 1.0
    w_trend: float = 0.8
    enter_th: float = 0.40
    exit_th: float = 0.22
    enter_persist: int = 3
    exit_persist: int = 2
    min_hold_bars: int = 4
    allow_direct_flip: bool = False
    eps: float = 1e-9


def direction_scores(
    df: DataFrame,
    by: Sequence[str],
    order: Sequence[str],
    p: DirectionParams = DirectionParams(),
) -> DataFrame:
    """tanh-bounded direction score (build_m15_direction_regime.py:383-409).

    impulse = log-return(L) / (vol·√L); trend = (ema_f − ema_s)/(ATR+eps);
    quality = 0.5 + 0.5·ER; score = tanh(ewm(w_i·impulse + w_t·trend)·quality).
    """
    by, order = list(by), list(order)
    c = F.col("close")
    ret1 = F.log(c / F.lag(c, 1).over(W.w_ordered(by, order)))
    retL = F.log(c / F.lag(c, p.lookback).over(W.w_ordered(by, order)))
    step = df.withColumn("__ret1", ret1).withColumn("__retL", retL)
    vol1 = W.rolling_std("__ret1", p.lookback, by, order, ddof=0)
    tr = W.true_range(by, order)
    # reference ER form uses +eps, not null-guard (build_m15_...py:268-271)
    net = F.abs(c - F.lag(c, p.lookback).over(W.w_ordered(by, order)))
    gross = F.sum(F.abs(c - F.lag(c, 1).over(W.w_ordered(by, order)))).over(
        W.w_ordered(by, order).rowsBetween(-p.lookback + 1, 0)
    )
    gross = F.when(
        F.count("__ret1").over(W.w_ordered(by, order).rowsBetween(-p.lookback + 1, 0))
        >= p.lookback,
        gross,
    )
    er = net / (gross + F.lit(p.eps))
    step = (
        step.withColumn("__vol1", vol1)
        .withColumn("__tr", tr)
        .withColumn("__er", er)
        .withColumn(
            "__impulse",
            F.col("__retL")
            / (F.col("__vol1") * F.lit(float(np.sqrt(p.lookback))) + F.lit(p.eps)),
        )
    )
    step = ewm_apply(
        step,
        {
            "__atr": ("__tr", 1.0 / p.atr_len),
            "__ema_fast": ("close", span_to_alpha(p.ema_fast)),
            "__ema_slow": ("close", span_to_alpha(p.ema_slow)),
        },
        by,
        order,
    )
    trend = (F.col("__ema_fast") - F.col("__ema_slow")) / (F.col("__atr") + F.lit(p.eps))
    quality = F.lit(0.5) + F.lit(0.5) * F.col("__er")
    score_mod = (
        F.lit(p.w_impulse) * F.col("__impulse") + F.lit(p.w_trend) * trend
    ) * quality
    step = step.withColumn("__score_mod", score_mod)
    step = ewm_apply(
        step, {"__score_smooth": ("__score_mod", span_to_alpha(p.score_smooth_span))}, by, order
    )
    out = step.withColumn("dir_score", F.tanh(F.col("__score_smooth")))
    return out.drop(*[x for x in out.columns if x.startswith("__")])


def sticky_state(
    df: DataFrame,
    by: Sequence[str],
    order: Sequence[str],
    score_col: str = "dir_score",
    p: DirectionParams = DirectionParams(),
    out_prefix: str = "dir",
) -> DataFrame:
    """Sticky BULL/BEAR/NEUTRAL hysteresis state machine — exact semantics of
    ``_sticky_state_v4`` (build_m15_direction_regime.py:274-380):

    - NEUTRAL → BULL/BEAR after ``enter_persist`` consecutive bars beyond
      ±enter_th;
    - BULL exits to NEUTRAL after ``exit_persist`` bars ≤ exit_th, only once
      ``min_hold_bars`` held; symmetric for BEAR;
    - optional direct flip on ``enter_persist`` bars beyond the opposite
      enter threshold;
    - NaN score hard-resets to NEUTRAL;
    - emits state, regime_id (increments on change), state_age (1-based).

    Transition depends on the machine's own previous output → per-key
    ``applyInPandas`` (each key's history in one group; parallel across keys).
    """
    by, order = list(by), list(order)
    s_col, id_col, age_col = (
        f"{out_prefix}_state",
        f"{out_prefix}_regime_id",
        f"{out_prefix}_state_age",
    )
    fields = list(df.schema.fields) + [
        T.StructField(s_col, T.StringType()),
        T.StructField(id_col, T.LongType()),
        T.StructField(age_col, T.LongType()),
    ]

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order, kind="mergesort").reset_index(drop=True)
        xs = pdf[score_col].to_numpy(dtype="float64", na_value=np.nan)
        n = len(xs)
        states = np.empty(n, dtype=object)
        rids = np.zeros(n, dtype="int64")
        ages = np.zeros(n, dtype="int64")

        state, rid, age, hold = "NEUTRAL", 0, 0, 0
        runs = {"be": 0, "se": 0, "bx": 0, "sx": 0, "br": 0, "sr": 0}

        def reset_to(new_state: str):
            nonlocal state, rid, age, hold
            if new_state != state:
                rid += 1
                state = new_state
                age = 0
                hold = 0
                for k in runs:
                    runs[k] = 0

        for i in range(n):
            x = xs[i]
            if np.isnan(x):
                reset_to("NEUTRAL")
                age = 0
                hold = 0
                states[i], rids[i], ages[i] = "NEUTRAL", rid, age
                continue
            runs["be"] = runs["be"] + 1 if x >= p.enter_th else 0
            runs["se"] = runs["se"] + 1 if x <= -p.enter_th else 0
            if state == "NEUTRAL":
                if runs["be"] >= p.enter_persist:
                    reset_to("BULL")
                elif runs["se"] >= p.enter_persist:
                    reset_to("BEAR")
            elif state == "BULL":
                hold += 1
                runs["bx"] = runs["bx"] + 1 if x <= p.exit_th else 0
                runs["sr"] = (runs["sr"] + 1 if x <= -p.enter_th else 0) if p.allow_direct_flip else 0
                if hold >= max(p.min_hold_bars, 1):
                    if p.allow_direct_flip and runs["sr"] >= p.enter_persist:
                        reset_to("BEAR")
                    elif runs["bx"] >= p.exit_persist:
                        reset_to("NEUTRAL")
            elif state == "BEAR":
                hold += 1
                runs["sx"] = runs["sx"] + 1 if x >= -p.exit_th else 0
                runs["br"] = (runs["br"] + 1 if x >= p.enter_th else 0) if p.allow_direct_flip else 0
                if hold >= max(p.min_hold_bars, 1):
                    if p.allow_direct_flip and runs["br"] >= p.enter_persist:
                        reset_to("BULL")
                    elif runs["sx"] >= p.exit_persist:
                        reset_to("NEUTRAL")
            age += 1
            states[i], rids[i], ages[i] = state, rid, age

        pdf[s_col] = states
        pdf[id_col] = rids
        pdf[age_col] = ages
        return pdf

    return df.groupBy(*by).applyInPandas(kernel, schema=T.StructType(fields))


# --- M5 volatility regime ---------------------------------------------------

@dataclass(frozen=True)
class VolRegimeParams:
    """Defaults from build_m5_vol_regime.py:51-54."""

    lookback: int = 288
    p_low: float = 0.25
    p_high: float = 0.70
    min_range: float = 0.0
    min_trades: int = 0


def vol_regime(
    df: DataFrame,
    by: Sequence[str],
    order: Sequence[str],
    p: VolRegimeParams = VolRegimeParams(),
) -> DataFrame:
    """range-percentile → LOW/MID/HIGH/NA + market_ready gate
    (build_m5_vol_regime.py:148-187). Input needs high/low (+ n_trades)."""
    by, order = list(by), list(order)
    out = df.withColumn("range", F.col("high") - F.col("low"))
    pctl = W.rolling_pctl_of_last("range", p.lookback, by, order)
    out = out.withColumn("range_pctl", pctl)
    out = out.withColumn(
        "vol_state",
        F.when(F.col("range_pctl").isNull(), "NA")
        .when(F.col("range_pctl") < p.p_low, "LOW")
        .when(F.col("range_pctl") > p.p_high, "HIGH")
        .otherwise("MID"),
    )
    trades = F.coalesce(
        F.col("n_trades").cast("double") if "n_trades" in out.columns else F.lit(None).cast("double"),
        F.lit(0.0),
    )
    return out.withColumn(
        "market_ready",
        F.col("range_pctl").isNotNull()
        & (F.col("vol_state") != "LOW")
        & (F.col("range") >= p.min_range)
        & (trades >= float(p.min_trades)),
    )


# --- H1 trend/range/chaos router --------------------------------------------

@dataclass(frozen=True)
class RouterParams:
    """Defaults from build_h1_regime_router_v2.py:194-204."""

    atr_len: int = 14
    ema20: int = 20
    ema50: int = 50
    ema200: int = 200
    er_lb: int = 24
    atrpctl_lb: int = 48
    p_hi: float = 80.0  # percentile is on the ×100 scale here
    er_low: float = 0.20
    er_high: float = 0.55
    slope_lb: int = 6
    slope_hi: float = 0.30


ROUTER_DECISION_COLS = [
    "regime_h1", "is_chaos_h1", "is_trend_h1", "router_mode_h1",
    "trend_score_h1", "atr_h1", "atr_pct_h1", "atr_pct_pctl_h1",
    "ema20_h1", "ema50_h1", "ema200_h1", "er_h1", "slope50_norm_h1",
    "aligned_bull_h1", "aligned_bear_h1",
]


def router_features_h1(
    h1: DataFrame,
    by: Sequence[str],
    order: Sequence[str],
    p: RouterParams = RouterParams(),
    shift_decisions: bool = True,
) -> DataFrame:
    """TREND/RANGE/CHAOS H1 router (build_h1_regime_router_v2.py:99-169).

    CHAOS: ATR%-percentile ≥ p_hi AND ER ≤ er_low. TREND: ER ≥ er_high AND
    (EMA stack aligned OR |slope50/ATR| ≥ slope_hi). Else RANGE. All
    decision columns are shift(1)'d so a consumer bar only sees the last
    CLOSED H1 bar (anti-lookahead, :137-169).
    """
    by, order = list(by), list(order)
    out = h1.withColumn("__tr", W.true_range(by, order))
    out = ewm_apply(
        out,
        {
            "atr_h1": ("__tr", 1.0 / p.atr_len),
            "ema20_h1": ("close", span_to_alpha(p.ema20)),
            "ema50_h1": ("close", span_to_alpha(p.ema50)),
            "ema200_h1": ("close", span_to_alpha(p.ema200)),
        },
        by,
        order,
    ).drop("__tr")
    out = out.withColumn(
        "atr_pct_h1", F.col("atr_h1") / F.nullif(F.col("close"), F.lit(0.0))
    )
    out = out.withColumn(
        "aligned_bull_h1",
        (F.col("ema20_h1") > F.col("ema50_h1")) & (F.col("ema50_h1") > F.col("ema200_h1")),
    ).withColumn(
        "aligned_bear_h1",
        (F.col("ema20_h1") < F.col("ema50_h1")) & (F.col("ema50_h1") < F.col("ema200_h1")),
    )
    out = out.withColumn("er_h1", W.efficiency_ratio("close", p.er_lb, by, order))
    slope = W.slope_per_bar("ema50_h1", p.slope_lb, by, order)
    out = out.withColumn(
        "slope50_norm_h1", slope / F.nullif(F.col("atr_h1"), F.lit(0.0))
    )
    out = out.withColumn(
        "atr_pct_pctl_h1",
        W.rolling_pctl_of_last("atr_pct_h1", p.atrpctl_lb, by, order) * 100.0,
    )
    clip01 = lambda c: F.least(F.greatest(c, F.lit(0.0)), F.lit(1.0))  # noqa: E731
    clip05 = lambda c: F.least(F.greatest(c, F.lit(0.0)), F.lit(5.0))  # noqa: E731
    out = out.withColumn(
        "trend_score_h1",
        0.50 * clip01(F.col("er_h1"))
        + 0.30 * (clip05(F.abs(F.col("slope50_norm_h1"))) / 5.0)
        + 0.20
        * (
            F.col("aligned_bull_h1").cast("double")
            + F.col("aligned_bear_h1").cast("double")
        ),
    )
    is_chaos = (F.col("atr_pct_pctl_h1") >= p.p_hi) & (F.col("er_h1") <= p.er_low)
    is_trend = (F.col("er_h1") >= p.er_high) & (
        F.col("aligned_bull_h1")
        | F.col("aligned_bear_h1")
        | (F.abs(F.col("slope50_norm_h1")) >= p.slope_hi)
    )
    out = (
        out.withColumn("is_chaos_h1", F.coalesce(is_chaos, F.lit(False)))
        .withColumn("is_trend_h1", F.coalesce(is_trend, F.lit(False)))
    )
    out = out.withColumn(
        "regime_h1",
        F.when(F.col("is_chaos_h1"), "CHAOS")
        .when(F.col("is_trend_h1"), "TREND")
        .otherwise("RANGE"),
    ).withColumn(
        "router_mode_h1",
        F.when(F.col("regime_h1") == "CHAOS", "OFF")
        .when(F.col("regime_h1") == "TREND", "TREND")
        .otherwise("RANGE"),
    )
    if shift_decisions:
        w = W.w_ordered(by, order)
        for c in ROUTER_DECISION_COLS:
            out = out.withColumn(c, F.lag(c, 1).over(w))
    return out
