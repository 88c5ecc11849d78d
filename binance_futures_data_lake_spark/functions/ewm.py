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
- ``ewm_closedform``: pure-SQL closed form over a running sum, usable where
  the per-key row count keeps ``(1-a)^(-rn)`` in double range (rn ≲ 500 for
  typical alphas). Used by oracle-checked queries, since DuckDB can express
  the same formula.
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

    nb = num_buckets or int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    bucketed = df.withColumn(
        "__ewm_bucket", F.pmod(F.xxhash64(*by), F.lit(nb))
    )
    out_schema_b = T.StructType(
        [f for f in out_schema.fields]
    )
    return bucketed.groupBy("__ewm_bucket").applyInPandas(kernel, schema=out_schema_b)


def ewm_closedform(
    col: str | Column,
    alpha: float,
    by: Sequence[str],
    order: Sequence[str | Column],
) -> Column:
    """Closed-form adjust=False EWM (assumes the source has no interior
    nulls, true for price series):

        y_t = (1-a)^t·x_0 + a·Σ_{j=1..t} (1-a)^(t-j)·x_j
            = (1-a)^rn · [ x_0·(1-a)^-1·? ... ]  — implemented as a running
              sum of ``x_j·(1-a)^(-j)`` scaled by ``(1-a)^t``.

    The first value enters with full weight (seed), later values with
    weight a. Numeric range: (1-a)^(-rn) ≤ DBL_MAX requires
    rn ≲ 700/|ln(1-a)|; callers must bound the per-key series length.
    """
    c = F.col(col) if isinstance(col, str) else col
    q = 1.0 - alpha
    w = Window.partitionBy(*by).orderBy(*order)
    rn = F.row_number().over(w)  # 1-based
    # weight at position j (1-based): seed j=1 → coefficient 1, else alpha
    coef = F.when(rn == 1, F.lit(1.0)).otherwise(F.lit(alpha))
    term = c * coef * F.pow(F.lit(q), -rn)
    running = F.sum(term).over(w.rowsBetween(Window.unboundedPreceding, 0))
    return running * F.pow(F.lit(q), rn)
