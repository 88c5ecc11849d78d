"""Profile the sf0.1 SERIAL per-query floor (VERDICT r4 next-steps #7).

At sf0.1 the serial suite is floor-dominated (~45 ms/query x 30 queries);
this script decomposes that floor and A/Bs the runtime levers that could
plausibly shave it, so BASELINE.md can either record a win or declare the
floor closed with evidence.

Decomposition (bench session, sf0.1):
- ``range1_noop``       noop-write of spark.range(1): job submit + write
                        command + 1-task launch — the irreducible action floor
- ``range1_count``      same plan through .count() (no write command)
- ``scan_count``        lineitem parquet scan + count (adds IO + 2nd stage)
- ``cached_plan_rerun`` warm re-run of a cheap cached registry plan
                        (top_orders): the actual per-query serial cost

Conf A/B (fresh SparkContext per variant, same 30-query warm serial total
as bench.py): baseline bench confs vs locality.wait=0 vs shuffle
partitions 4 vs both. Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = "/root/testdata/sf0.1"

BENCH_OVERRIDES = {
    "spark.sql.adaptive.enabled": "false",
    "spark.sql.files.maxPartitionBytes": "1m",
    "spark.sql.files.openCostInBytes": "65536",
    "spark.sql.constraintPropagation.enabled": "false",
}


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def best_and_p50(fn, n=20):
    xs = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        xs.append(time.perf_counter() - t0)
    return round(min(xs) * 1000, 2), round(statistics.median(xs) * 1000, 2)


def main() -> int:
    from binance_futures_data_lake_spark.plans import driver_queries as DQ
    from binance_futures_data_lake_spark.session import get_spark

    out: dict = {}

    spark = get_spark("bfdl-floor", shuffle_partitions=8, overrides=BENCH_OVERRIDES)

    r1 = spark.range(1)
    force(r1)  # warm noop source + codegen
    out["range1_noop_ms"] = best_and_p50(lambda: force(r1))
    r1.count()
    out["range1_count_ms"] = best_and_p50(lambda: r1.count())
    li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    li.count()
    out["scan_count_ms"] = best_and_p50(lambda: li.count())
    q = DQ.QUERIES["top_orders"](spark, SF_DIR)
    force(q)
    out["cached_plan_rerun_ms"] = best_and_p50(lambda: force(q), n=10)

    spark.stop()

    # conf A/B over the serial warm suite
    names = [n for n in (
        "ohlcv_5m", "ohlcv_1h_right_closed", "true_range_atr", "rolling_stats",
        "cumsum_runmax", "vwap_daily", "ema_per_user", "lag_lead_returns",
        "asof_user_hourly", "gap_ranges_hourly", "dedup_keep_last",
        "pricing_summary", "revenue_by_nation", "top_orders", "brand_volume",
        "quantile_value_by_type", "doc_exact_dedup", "lang_stats",
        "user_sessions", "events_pivot_daily",
    )]
    variants = {
        "baseline": {},
        "locality0": {"spark.locality.wait": "0"},
        "shufpart4": {"__sp": 4},
        "locality0_shufpart4": {"spark.locality.wait": "0", "__sp": 4},
    }
    out["suite20_serial_ms"] = {}
    for label, extra in variants.items():
        sp = int(extra.pop("__sp", 8))
        spark = get_spark(
            f"bfdl-floor-{label}", shuffle_partitions=sp,
            overrides={**BENCH_OVERRIDES, **extra},
        )
        for n in names:  # warm pass: plan build + JIT
            force(DQ.QUERIES[n](spark, SF_DIR))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for n in names:
                force(DQ.QUERIES[n](spark, SF_DIR))
            best = min(best, time.perf_counter() - t0)
        out["suite20_serial_ms"][label] = round(best * 1000, 1)
        spark.stop()

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
