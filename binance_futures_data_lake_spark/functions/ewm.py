"""Exponentially-weighted means — the most pervasive custom op (~20 call
sites in the reference, SURVEY §2.5 W6).

Reference semantics: pandas ``ewm(span=n, adjust=False)`` (EMAs,
build_mtf_context_h4_v1.py:85-117) and ``ewm(alpha=1/n, adjust=False)``
(Wilder RMA/ATR, build_h1_regime_router_v2.py:26-40). ``adjust=False`` is
the recursion ``y_t = (1-a)·y_{t-1} + a·x_t`` seeded with the first non-null
value.

The recursion is not a bounded-frame aggregate, so two implementations:

- ``ewm_apply`` (default): per-key ``applyInPandas`` calling pandas ``ewm``
  for bit-parity. Arrow-vectorized, embarrassingly parallel across keys —
  at 100 TB each symbol's history is one group; with thousands of symbols
  that is thousands-wide parallelism, and per-group state is O(1).
- ``ewm_closedform``: pure-SQL closed form, SEGMENTED so it is total —
  overflow-free for any series length (see its docstring). Used by
  oracle-checked queries, since DuckDB can express the same formula.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def span_to_alpha(span: float) -> float:
    return 2.0 / (span + 1.0)


def ewm_apply(
    df: DataFrame,
    cols: dict[str, tuple[str, float]],
    by: Sequence[str],
    order: Sequence[str],
    num_buckets: int | None = None,
) -> DataFrame:
    """Append EWM columns via bucketed pandas kernels.

    ``cols`` maps output name → (source column, alpha).

    Scale design: grouping Spark-side by the raw key would create one
    Python/Arrow round trip per key — with millions of small keys the
    per-group overhead dominates. Instead the shuffle key is a COARSE
    bucket ``hash(by) % num_buckets`` (default: session shuffle
    parallelism), and inside each kernel a cythonized pandas
    ``groupby(...).ewm(...)`` runs the recursion for every key in the
    bucket at once. Same semantics (a key maps to exactly one bucket, the
    kernel sorts by key+order), ~group-count-independent overhead.
    """
    by = list(by)
    order = list(order)
    fields = list(df.schema.fields) + [
        T.StructField(name, T.DoubleType()) for name in cols
    ]
    out_schema = T.StructType(fields)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(by + order, kind="mergesort")
        gb = pdf.groupby(by, sort=False)
        for name, (src, alpha) in cols.items():
            res = gb[src].ewm(alpha=alpha, adjust=False).mean()
            pdf[name] = res.reset_index(level=list(range(len(by))), drop=True)
        return pdf.drop(columns=["__ewm_bucket"])

    # kernel parallelism: cap at available slots, not shuffle width — with
    # shuffle_partitions=8 on a 32-core session the pandas kernels would
    # otherwise run 8-wide (measured 0.62 -> 0.51 s at 10x sf0.1 going 8 -> 32)
    nb = num_buckets or max(
        int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")),
        df.sparkSession.sparkContext.defaultParallelism,
    )
    bucketed = df.withColumn(
        "__ewm_bucket", F.pmod(F.xxhash64(*by), F.lit(nb))
    )
    out_schema_b = T.StructType(
        [f for f in out_schema.fields]
    )
    return bucketed.groupBy("__ewm_bucket").applyInPandas(kernel, schema=out_schema_b)


def segment_len(alpha: float) -> int:
    """Renormalization block length: (1-a)^W ≈ 1e-60, so a block's tail is
    ~44 decimal orders below double ulp, and every exponent the segmented
    form evaluates stays within ±2W·|log10(q)| = ±120 orders — comfortably
    inside double range for ANY series length."""
    import math

    q = 1.0 - alpha
    return max(2, math.ceil(60.0 / -math.log10(q)))


def ewm_closedform(
    df: DataFrame,
    cols: dict[str, tuple[str, float]],
    by: Sequence[str],
    order: Sequence[str],
) -> DataFrame:
    """Closed-form adjust=False EWM (assumes the source has no interior
    nulls, true for price series), with SEGMENTED renormalization:

        y_t = (1-a)^t·x_0 + a·Σ_{j=1..t} (1-a)^(t-j)·x_j

    The naive expansion — a running sum of ``x_j·(1-a)^(-j)`` scaled by
    ``(1-a)^t`` — overflows once ``(1-a)^(-rn)`` exceeds DBL_MAX
    (rn ≳ 700/|ln(1-a)|), silently poisoning long per-key series with
    inf/NaN. Here exponents are RELATIVE to the row's block of
    ``W = segment_len(alpha)`` rows:

        pos  = (rn-1) mod W,  block = (rn-1) div W
        u_j  = x_j·coef_j·(1-a)^(-pos_j)
        y_t  = (1-a)^(pos_t)·Σ_{j ≤ t, same block} u_j
             + (1-a)^(pos_t+W)·T_prev                (previous block's Σu)

    ``T_prev`` arrives via ``lag(T, W)`` — the row exactly W back sits at
    the same pos of the previous block. Blocks older than the previous
    one carry weight ≤ (1-a)^W ≈ 1e-60 relative — 44 orders below double
    ulp, so dropping them leaves the result bit-indistinguishable.
    Every exponent is bounded by 2W, so the form is TOTAL: no length
    cliff (property-tested on a 10k-row single-key series, which the
    naive form fails at rn ≈ 3.1k for span=10). DuckDB can express the
    identical staging, which is what keeps EWM queries oracle-checkable.

    Same ``cols`` contract as ``ewm_apply``: output name → (source col,
    alpha).
    """
    by, order = list(by), list(order)
    w_key = Window.partitionBy(*by).orderBy(*order)
    df = df.withColumn("__cf_rn", F.row_number().over(w_key))
    scratch = ["__cf_rn"]
    for name, (src, alpha) in cols.items():
        if not (0.0 < alpha < 1.0):
            raise ValueError(f"alpha must be in (0, 1), got {alpha}")
        q = 1.0 - alpha
        wlen = segment_len(alpha)
        pos_c, blk_c, u_c, s_c, t_c = (f"__cf_{p}_{name}" for p in ("pos", "blk", "u", "s", "t"))
        pos = (F.col("__cf_rn") - 1) % wlen
        blk = F.floor((F.col("__cf_rn") - 1) / wlen)
        # weight at position j (1-based rn): seed j=1 → coefficient 1, else alpha
        coef = F.when(F.col("__cf_rn") == 1, F.lit(1.0)).otherwise(F.lit(alpha))
        df = (
            df.withColumn(pos_c, pos)
            .withColumn(blk_c, blk)
            .withColumn(u_c, F.col(src) * coef * F.pow(F.lit(q), -F.col(pos_c)))
        )
        w_blk = Window.partitionBy(*by, blk_c)
        df = (
            df.withColumn(
                s_c,
                F.sum(u_c).over(w_blk.orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)),
            )
            .withColumn(t_c, F.sum(u_c).over(w_blk))
        )
        t_prev = F.lag(t_c, wlen).over(w_key)
        df = df.withColumn(
            name,
            F.pow(F.lit(q), F.col(pos_c)) * F.col(s_c)
            + F.coalesce(F.pow(F.lit(q), F.col(pos_c) + wlen) * t_prev, F.lit(0.0)),
        )
        scratch += [pos_c, blk_c, u_c, s_c, t_c]
    return df.drop(*scratch)
