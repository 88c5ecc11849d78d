#!/usr/bin/env python
"""Headline benchmark: runs the engine's flagship queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with the noop sink (full execution, no
driver-side collect). The first query pays JVM/codegen warmup; a throwaway
warmup pass runs first so per-query numbers reflect steady state.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from binance_futures_data_lake_spark.plans import driver_queries as DQ  # noqa: E402
from binance_futures_data_lake_spark.session import get_spark  # noqa: E402

# Representative of the operator families; excludes the quadratic-pair
# research queries (word_jaccard_pairs) that are correctness-only surface.
HEADLINE = [
    "ohlcv_5m",
    "ohlcv_1h_right_closed",
    "true_range_atr",
    "rolling_stats",
    "rolling_pctl_of_last",
    "cumsum_runmax",
    "vwap_daily",
    "ema_per_user",
    "lag_lead_returns",
    "asof_user_hourly",
    "gap_ranges_hourly",
    "dedup_keep_last",
    "pricing_summary",
    "revenue_by_nation",
    "priority_ship_exists",
    "brand_volume",
    "top_orders",
    "quantile_value_by_type",
    "doc_token_stats",
    "doc_exact_dedup",
    "cosine_topk",
    "lang_stats",
]


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bfdl-bench")

    # warmup: JVM, codegen, parquet footers
    force(DQ.QUERIES["ohlcv_5m"](spark, sf_dir))

    timings: dict[str, float] = {}
    t_all = time.perf_counter()
    for name in HEADLINE:
        t0 = time.perf_counter()
        force(DQ.QUERIES[name](spark, sf_dir))
        timings[name] = round(time.perf_counter() - t0, 4)
    total = round(time.perf_counter() - t_all, 4)

    print(
        json.dumps(
            {
                "metric": "headline_suite_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
