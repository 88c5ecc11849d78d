"""Integrity audits as Spark queries (SURVEY §5 port strategy).

The reference has no unit tests; correctness is enforced by data-quality
audit programs (src/bfdl/transforms/verify_all.py:247-338,
integrity_checks.py:26-85, audit_derived.py:98-162). Those invariants are
re-expressed here as ONE aggregation pass per table + the gap machinery:

- zero duplicate (symbol, open_time_ms) keys
- strict per-symbol time monotonicity
- zero missing grid steps; rows == expected grid rows
- ts == open_time_ms (the anti-lookahead re-derivation check,
  compact_staging.py:86-87)
- OHLC bar invariants (FIXTURES.md conventions): low <= min(o,c),
  high >= max(o,c), taker <= volume, volumes >= 0

Everything is a distributed aggregation: one shuffle on symbol, tiny
result to the driver. Exit-code semantics (verify_all.py:341-348) map to
``ok`` booleans per check.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from binance_futures_data_lake_spark.operators.gaps import missing_ranges


def audit_klines(
    df: DataFrame,
    step_ms: int = 60_000,
    by: Sequence[str] = ("symbol",),
) -> dict:
    """Full temporal + schema integrity audit; returns a report dict.

    ``step_ms`` is 60_000 for M1, n·60_000 for derived TFs
    (audit_derived.py grid: step = n_minutes * 60_000).
    """
    by = list(by)
    key = [*by, "open_time_ms"]

    dup_count = (
        df.groupBy(*key).count().filter(F.col("count") > 1).count()
    )

    w = Window.partitionBy(*by).orderBy("open_time_ms")
    with_prev = df.select(*key).withColumn("__prev", F.lag("open_time_ms").over(w))
    non_monotonic = with_prev.filter(
        F.col("__prev").isNotNull() & (F.col("open_time_ms") <= F.col("__prev"))
    ).count()
    off_grid_steps = with_prev.filter(
        F.col("__prev").isNotNull()
        & ((F.col("open_time_ms") - F.col("__prev")) % step_ms != 0)
    ).count()

    bounds = df.groupBy(*by).agg(
        F.min("open_time_ms").alias("t0"),
        F.max("open_time_ms").alias("t1"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    per_symbol = bounds.select(
        *by,
        "n_rows",
        ((F.col("t1") - F.col("t0")) / step_ms + 1).cast("long").alias("expected_rows"),
    )
    totals = per_symbol.agg(
        F.sum("n_rows").alias("n_rows"), F.sum("expected_rows").alias("expected_rows")
    ).first()

    ts_mismatch = df.filter(
        F.unix_millis("ts") != F.col("open_time_ms")
    ).count() if "ts" in df.columns else None

    bar_violations = df.filter(
        (F.col("low") > F.least("open", "close"))
        | (F.col("high") < F.greatest("open", "close"))
        | (F.col("taker_buy_base") > F.col("volume_base"))
        | (F.col("volume_base") < 0)
        | (F.col("n_trades") < 0)
    ).count() if "low" in df.columns else None

    gaps = missing_ranges(
        df.select(*by, "ts"), step_ms / 60_000.0, by
    )
    gap_rows = gaps.agg(F.sum("n_missing")).first()[0] or 0

    report = {
        "n_rows": int(totals["n_rows"] or 0),
        "expected_rows": int(totals["expected_rows"] or 0),
        "n_duplicate_keys": int(dup_count),
        "n_non_monotonic": int(non_monotonic),
        "n_off_grid_steps": int(off_grid_steps),
        "n_missing_grid_rows": int(gap_rows),
        "n_ts_mismatch": None if ts_mismatch is None else int(ts_mismatch),
        "n_bar_invariant_violations": None if bar_violations is None else int(bar_violations),
    }
    report["ok"] = (
        report["n_duplicate_keys"] == 0
        and report["n_non_monotonic"] == 0
        and report["n_missing_grid_rows"] == 0
        and not report["n_ts_mismatch"]
        and not report["n_bar_invariant_violations"]
        and report["n_rows"] == report["expected_rows"]
    )
    return report


def gaps_report(
    df: DataFrame,
    step_minutes: float,
    by: Sequence[str] = ("symbol",),
    top_n: int = 10,
) -> dict:
    """Gap summary (gaps_report.py:32-68): totals, largest, top-N ranges."""
    ranges = missing_ranges(df.select(*by, "ts"), step_minutes, by).cache()
    try:
        agg = ranges.agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.sum("n_missing").alias("total_missing"),
            F.max("n_missing").alias("largest_gap"),
            F.expr("percentile(n_missing, 0.5)").alias("median_gap"),
        ).first()
        top = [
            r.asDict()
            for r in ranges.orderBy(F.col("n_missing").desc(), "gap_start").limit(top_n).collect()
        ]
        return {
            "n_gaps": int(agg["n_gaps"] or 0),
            "total_missing": int(agg["total_missing"] or 0),
            "largest_gap": int(agg["largest_gap"] or 0) if agg["largest_gap"] is not None else 0,
            "median_gap": float(agg["median_gap"]) if agg["median_gap"] is not None else 0.0,
            "top_gaps": top,
        }
    finally:
        ranges.unpersist()


REQUIRED_META_KEYS = ("symbol", "exchange", "market", "interval")


def fix_meta(
    root: str,
    defaults: dict | None = None,
    required: Sequence[str] = REQUIRED_META_KEYS,
) -> dict:
    """Repair a lake root's ``_meta.json`` sidecar.

    Reference parity: ``src/bfdl/transforms/fix_meta.py:1-33`` (patch a
    sidecar missing ``created_at_utc``), generalized to the three failure
    modes a sidecar actually has: missing file, unparseable JSON, missing
    required keys. Repairs are non-destructive — parseable keys are kept,
    the corrupt original is preserved at ``_meta.json.bak``.

    ``defaults`` supplies values for absent required keys (others get
    ``None`` so the repair is visible, not invented). Returns
    ``{"ok", "repaired", "missing_before", "meta"}``.
    """
    import datetime
    import json as _json
    import os as _os

    from binance_futures_data_lake_spark.sources import lake

    path = _os.path.join(root, "_meta.json")
    meta: dict = {}
    corrupt = False
    if _os.path.exists(path):
        try:
            with open(path) as f:
                loaded = _json.load(f)
            if isinstance(loaded, dict):
                meta = loaded
            else:
                corrupt = True
        except (ValueError, OSError):
            corrupt = True
    if corrupt:
        _os.replace(path, path + ".bak")

    missing = [k for k in required if k not in meta]
    for k in missing:
        meta[k] = (defaults or {}).get(k)
    if "created_at_utc" not in meta:  # the reference's original repair
        meta["created_at_utc"] = datetime.datetime.now(datetime.timezone.utc).isoformat()
        if not missing:
            missing = ["created_at_utc"]
    repaired = bool(missing) or corrupt
    if repaired:
        lake.write_meta(root, meta)
    return {"ok": True, "repaired": repaired, "missing_before": missing, "meta": meta}


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str,
    content_cols: Sequence[str],
) -> DataFrame:
    """Release-to-release corpus diff — the lake-versioning audit between
    two snapshots of the same logical table (v_N parquet vs v_N+1 after a
    cleaning/dedup/redaction pass): which keys were ``added``,
    ``removed``, ``changed``, ``unchanged``?

    Comparison is by md5 content hash over ``content_cols`` (null-safe:
    each column is cast to string with a NULL sentinel and
    length-prefixed — ``concat_ws`` alone would collide ``('ab','c')``
    with ``('a','bc')`` and drop NULLs), so the shuffle carries ``key +
    one 32-char hash`` per row, never the payload — at 100 TB the diff
    moves ~50 bytes/row regardless of document size. One full outer join
    on the key (the only exchange on each side beyond the scan).

    Output: ``key_col, status`` — one row per key in either snapshot.
    """
    if not content_cols:
        raise ValueError("content_cols must be non-empty")

    def fingerprint(df: DataFrame, out: str) -> DataFrame:
        # Type tag OUTSIDE the value alphabet: NULL encodes as "N:" and a
        # value as "V<len>:<s>", so NULL can never collide with any string
        # (a bare "<NULL>" sentinel would hash a literal '<NULL>' value
        # and a true NULL identically).
        parts = []
        for c in content_cols:
            s = F.col(c).cast("string")
            parts.append(
                F.when(s.isNull(), F.lit("N:")).otherwise(
                    F.concat(F.lit("V"), F.length(s).cast("string"), F.lit(":"), s)
                )
            )
        return df.select(F.col(key_col), F.md5(F.concat(*parts)).alias(out))

    o = fingerprint(old, "__h_old")
    n = fingerprint(new, "__h_new")
    status = (
        F.when(F.col("__h_old").isNull(), F.lit("added"))
        .when(F.col("__h_new").isNull(), F.lit("removed"))
        .when(F.col("__h_old") == F.col("__h_new"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return o.join(n, key_col, "full_outer").select(
        F.col(key_col), status.alias("status")
    )
