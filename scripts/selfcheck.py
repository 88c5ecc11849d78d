"""Full-registry correctness selfcheck — the driver gate without the cap.

Round 1's driver gate checked exactly the first 50 of 62 registered queries
(registration-order prefix), so six oracle-declared queries shipped
unverified by the hard signal. This script runs EVERY registered query
through the same comparison the driver performs (row count + schema +
order-insensitive values vs the DuckDB oracle, via tests/oracle_utils) at
sf0.01 and writes ``SELFCHECK.json`` at the repo root in the same shape as
``CORRECTNESS_r{N}.json``. Queries without an oracle record a rows-only
entry, mirroring the driver's weaker check.

Usage:  python scripts/selfcheck.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from pyspark.sql import SparkSession

    # Vanilla session on purpose: the driver builds its own (ANSI defaults,
    # none of our confs pre-set); every query wrapper must survive that.
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry
    from tests.oracle_utils import assert_frames_match, run_oracle

    queries, oracles = entry.queries(), entry.oracle_sql()
    out: dict[str, dict] = {}
    t_suite = time.time()
    for name, fn in queries.items():
        rec = {
            "rows_match": None, "schema_match": None, "hash_match": None,
            "spark_rows": None, "oracle_rows": None, "err": None,
        }
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
            rec["spark_rows"] = len(sdf)
            if name in oracles:
                odf = run_oracle(oracles[name], sf_dir)
                rec["oracle_rows"] = len(odf)
                rec["rows_match"] = len(sdf) == len(odf)
                try:
                    assert_frames_match(sdf, odf, name)
                    rec["schema_match"] = rec["hash_match"] = True
                except AssertionError as ex:
                    msg = str(ex)
                    rec["schema_match"] = "column mismatch" not in msg
                    rec["hash_match"] = False
                    rec["err"] = msg[:500]
            else:
                rec["err"] = "no_oracle"
        except Exception as ex:  # noqa: BLE001 — record, keep sweeping
            rec["err"] = f"{type(ex).__name__}: {ex}"[:500]
        rec["secs"] = round(time.time() - t0, 2)
        out[name] = rec
        status = "green" if rec["hash_match"] else (rec["err"] or "FAIL")[:60]
        print(f"{name:32s} {rec['secs']:6.2f}s  {status}", flush=True)

    green = sum(1 for r in out.values() if r["hash_match"])
    rows_only = sum(1 for r in out.values() if r["err"] == "no_oracle")
    summary = {
        "sf_dir": sf_dir, "queries": len(out), "green": green,
        "rows_only": rows_only, "failed": len(out) - green - rows_only,
        "total_secs": round(time.time() - t_suite, 1),
    }
    path = os.path.join(REPO, "SELFCHECK.json")
    with open(path, "w") as f:
        json.dump({"_summary": summary, **out}, f, indent=2)
    print(json.dumps(summary))
    return 0 if summary["failed"] == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
