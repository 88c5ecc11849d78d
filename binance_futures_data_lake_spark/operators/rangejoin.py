"""Range (interval-containment) join — the join family member Spark's
optimizer handles worst.

A predicate like ``p.ts BETWEEN i.start AND i.end`` with no equi-key
compiles to BroadcastNestedLoopJoin: every point row is tested against
every interval — O(|P|·|I|), catastrophic beyond toy sizes. The classic
fix (used by every warehouse that offers a RANGE JOIN hint) is bucketized
pre-filtering:

1. pick a bucket width ``W`` (≈ typical interval length);
2. each interval explodes to the buckets it overlaps —
   ``floor(start/W) .. floor(end/W)`` (≈ len/W + 1 rows);
3. each point maps to exactly ONE bucket — ``floor(ts/W)``;
4. equi-join on bucket (+ optional keys), then apply the exact
   containment predicate.

The equi-join shuffles ``|P| + Σ(len_i/W + 1)`` rows on the bucket key
instead of evaluating |P|·|I| predicates; Catalyst gets a plain
shuffled/broadcast hash join it knows how to plan, AQE handles bucket
skew. Every candidate pair shares the point's bucket, and an interval
covers every bucket it overlaps, so no containment pair is lost; the
exact filter removes false candidates — identical semantics to the naive
cross join (pytest-checked against it).

Reference parity: the reference has no native range join (its pandas
sites do boolean-mask scans per window); this generalizes those scans to
the lake scale.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Column
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    by: Sequence[str] = (),
    bucket: str = "30 days",
    how: str = "inner",
) -> DataFrame:
    """Join each point to every interval containing it (closed ends).

    ``by``: optional equi-keys required to match in addition to
    containment. ``bucket``: coarse prefilter width — an interval explodes
    into ``len/bucket + 1`` candidate rows, so choose it near the typical
    interval length. ``how``: ``inner`` or ``left`` (left keeps
    uncontained points with null interval columns).

    Output: all point columns + all interval columns (caller aliases any
    collisions beforehand).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    step_us = _interval_us(bucket)
    pb = points.withColumn("__bucket", _bucket_of(F.col(point_ts), step_us))
    ib = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                _bucket_of(F.col(start_col), step_us),
                _bucket_of(F.col(end_col), step_us),
            )
        ),
    )
    on = [*by, "__bucket"]
    contained = (F.col(point_ts) >= F.col(start_col)) & (F.col(point_ts) <= F.col(end_col))
    if how == "inner":
        return pb.join(ib, on, "inner").filter(contained).drop("__bucket")
    # left: semi-structure — candidates first, then restore unmatched points
    matched = pb.join(ib, on, "inner").filter(contained).drop("__bucket")
    unmatched = pb.drop("__bucket").join(
        matched.select(*points.columns), points.columns, "left_anti"
    )
    return matched.unionByName(unmatched, allowMissingColumns=True)


def _interval_us(spec: str) -> int:
    """'30 days' / '6 hours' / '15 minutes' / '90 seconds' → microseconds."""
    n, unit = spec.split()
    mult = {
        "second": 1_000_000,
        "seconds": 1_000_000,
        "minute": 60_000_000,
        "minutes": 60_000_000,
        "hour": 3_600_000_000,
        "hours": 3_600_000_000,
        "day": 86_400_000_000,
        "days": 86_400_000_000,
    }[unit]
    return int(n) * mult


def _bucket_of(ts: Column, step_us: int) -> Column:
    # cast: unix_micros rejects TIMESTAMP_NTZ (parquet date-ish columns);
    # the session is pinned UTC so NTZ -> LTZ is value-identity
    return F.floor(F.unix_micros(ts.cast("timestamp")) / F.lit(step_us))
