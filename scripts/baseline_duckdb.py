"""Per-query DuckDB timings for the bench headline suite.

Runs each HEADLINE query's oracle SQL in DuckDB against the same parquet
tables bench.py reads, twice per query (second run = steady state, parquet
in page cache, catalog warm), and prints one JSON line with per-query
seconds. Feeds the BASELINE.md comparison table — the point is per-QUERY
ratios, not just suite totals, so fixed-cost-dominated gaps are separable
from real per-row gaps.

Usage: python scripts/baseline_duckdb.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb  # noqa: E402

from bench import HEADLINE  # noqa: E402
from binance_futures_data_lake_spark.plans import driver_queries as DQ  # noqa: E402
from tests.oracle_utils import TABLES  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    cold: dict[str, float] = {}
    warm: dict[str, float] = {}
    missing = [n for n in HEADLINE if n not in DQ.ORACLE]
    for name in HEADLINE:
        if name in missing:
            continue
        sql = DQ.ORACLE[name]
        t0 = time.perf_counter()
        con.sql(sql).fetchall()
        cold[name] = round(time.perf_counter() - t0, 4)
        t0 = time.perf_counter()
        con.sql(sql).fetchall()
        warm[name] = round(time.perf_counter() - t0, 4)

    print(
        json.dumps(
            {
                "metric": "duckdb_oracle_suite_steady_state",
                "value": round(sum(warm.values()), 4),
                "unit": "sec",
                "queries": warm,
                "cold_total": round(sum(cold.values()), 4),
                "no_oracle": missing,
                "sf_dir": sf_dir,
            }
        )
    )


if __name__ == "__main__":
    raise SystemExit(main())
