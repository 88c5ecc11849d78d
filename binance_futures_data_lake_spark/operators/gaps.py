"""Gap detection & consolidation on the time grid (SURVEY §2.4 J6/J7).

Reference: missing minutes via ``pd.date_range(min,max).difference(present)``
(integrity_checks.py:60-64, verify_all.py:291-298, backfill_gaps.py:104-122)
and consolidation of missing minutes into contiguous [start,end] ranges
(gaps_report.py:13-29).

Spark-first: the expected grid is GENERATED per key with
``sequence() + explode`` (never materialized as a stored table), missing
buckets fall out of a ``left_anti`` join, and range consolidation is the
classic gaps-and-islands trick — for a regular grid, ``bucket_index −
row_number`` is constant within a contiguous missing run, so one window +
one groupBy consolidates. Everything shuffles only on the key column.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def expected_grid(
    df: DataFrame,
    step_minutes: int | float,
    by: Sequence[str],
    ts_col: str = "ts",
) -> DataFrame:
    """Per-key dense grid from min(ts) to max(ts) at ``step_minutes``.

    Grid points are the observed min/max per key, stepped by the interval —
    identical to ``pd.date_range(tmin, tmax, freq=step)``.
    """
    step_us = int(step_minutes * 60_000_000)
    bounds = df.groupBy(*by).agg(
        F.min(ts_col).alias("__t0"), F.max(ts_col).alias("__t1")
    )
    return bounds.select(
        *by,
        F.explode(
            F.sequence(
                F.unix_micros("__t0"),
                F.unix_micros("__t1"),
                F.lit(step_us),
            )
        ).alias("__us"),
    ).select(*by, F.timestamp_micros(F.col("__us")).alias(ts_col))


def missing_buckets(
    df: DataFrame,
    step_minutes: int | float,
    by: Sequence[str],
    ts_col: str = "ts",
) -> DataFrame:
    """Grid points with no observed row — the anti-join gap list.

    The right side is deliberately NOT de-duplicated: left_anti semantics
    ignore right-side multiplicity, so a distinct() there is a pure extra
    shuffle. When the input is already (key, bucket)-unique, the grid
    bounds and the anti-join probe both reuse the same exchange."""
    grid = expected_grid(df, step_minutes, by, ts_col)
    return grid.join(df.select(*by, ts_col), on=[*by, ts_col], how="left_anti")


def missing_ranges(
    df: DataFrame,
    step_minutes: int | float,
    by: Sequence[str],
    ts_col: str = "ts",
) -> DataFrame:
    """Consolidate missing grid points into contiguous ranges
    (backfill_gaps.py:104-122 ``_missing_ranges``; gaps_report.py:13-29).

    Output: key cols + gap_start, gap_end, n_missing.

    A run of missing grid points is exactly the open interval between two
    CONSECUTIVE present buckets, so one ``lag`` over the present rows
    yields every range directly: gap = [prev+step, cur−step] wherever
    cur − prev > step. Identical output to the generate-grid + anti-join
    + islands construction (present min/max bound the grid, so there are
    no boundary gaps), but with ONE shuffle (the per-key window) and —
    decisive at 100 TB — no grid materialization: ``sequence()`` over a
    key's [min, max] span emits rows proportional to elapsed TIME
    (a years-sparse key explodes to 500k+ rows regardless of data volume),
    while this shape's cost is proportional to rows present. Timestamps
    snap to the grid first, so duplicate and off-grid inputs degrade to
    bucket semantics rather than breaking the recurrence (duplicate
    buckets produce diff = 0 pairs, which the filter drops).
    """
    step_us = int(step_minutes * 60_000_000)
    w = Window.partitionBy(*by).orderBy("__us")
    snapped = df.select(
        *by,
        (F.floor(F.unix_micros(F.col(ts_col)) / F.lit(step_us)) * F.lit(step_us)).alias("__us"),
    )
    diff = F.col("__us") - F.lag("__us").over(w)
    return (
        snapped.withColumn("__diff", diff)
        .filter(F.col("__diff") > F.lit(step_us))
        .select(
            *by,
            F.timestamp_micros(F.col("__us") - F.col("__diff") + F.lit(step_us)).alias(
                "gap_start"
            ),
            F.timestamp_micros(F.col("__us") - F.lit(step_us)).alias("gap_end"),
            ((F.col("__diff") / F.lit(step_us)).cast("long") - F.lit(1)).alias("n_missing"),
        )
    )
