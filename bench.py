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
    # scale-operator families added later in round 1. embed_near_dup_lsh is
    # deliberately absent: its driver query runs the LOW-threshold (0.3)
    # demo configuration — random-hyperplane banding cannot prune at low
    # cosine thresholds (the S-curve is flat there), so at sf0.1 it
    # approaches the n²/2 cross product by design. The high-threshold
    # regime it is built for is benchmarked in tests/test_similarity.py's
    # planted-duplicate suite instead.
    "ohlcv_daily_cascade",
    "range_join_ship_windows",
    "kmv_distinct_users",
    "simhash_near_pairs",
    "user_sessions",
    "events_pivot_daily",
    "funnel_click_purchase",
    "sampled_revenue_by_nation",
]

# LLM-pipeline family, benched separately so the headline total stays
# comparable across rounds (dedup_clusters alone is ~5 s: it re-runs the
# whole pair→label-propagation build per call by design, cache_plan=False).
LLM_PIPELINE = [
    "dedup_clusters",
    "benchmark_decontam",
    "domain_caps",
    "pack_sequences",
    "pack_sequences_nextfit",
    "scrub_cross_doc_spans",
    "media_audio_features",
    "bpe_token_stats",
    "incremental_corpus_dedup",
    "pii_redact_docs",
    "token_budget_plan",
    "perplexity_bucket_mix",
    "retrieval_eval_ivf",
    "media_image_near_dup",
    "media_audio_near_dup",
    "curation_planning_pipeline",
    # r6 additions: selection / retrieval / incremental-semantic family
    "semantic_dedup",
    "incremental_semantic_dedup",
    "dsir_select",
    "bloom_decontam",
    "bm25_topk",
    "hard_negative_mining",
    "c4_quality_flags",
    "temperature_mixture",
    # r7 additions: toxicity gate, CMS, hybrid fusion, mixture optimization,
    # PQ tiers, kNN-graph clustering, and the pretraining funnel capstone
    # (streaming_sessionization is excluded like every streaming query —
    # it runs a real stream + temp staging per call)
    "toxicity_lexicon_score",
    "cms_heavy_hitters",
    "hybrid_rrf_topk",
    "doremi_domain_weights",
    "pq_ann_topk",
    "pq_rerank_topk",
    "knn_graph_components",
    "pretrain_data_pipeline",
    # r7 batch 4: HLL sketch, ES weighted sampling, integer PageRank,
    # release diff
    "hll_distinct_users",
    "token_weighted_sample",
    "user_interaction_pagerank",
    "corpus_release_diff",
    # r8: in-engine BPE tokenizer training (eager per-step argmax builds)
    "bpe_learn_merges",
]


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


#: Canary floor resolution (r9, ADVICE r8 — no hardcoded host constant):
#: 1. BFDL_CANARY_FLOOR_SEC env var, if set (explicit pin wins);
#: 2. else the persisted floor file — the MINIMUM best-of-3 ever
#:    observed on this host, written/tightened by every bench run, so
#:    the floor self-calibrates to the hardware (first run on a fresh
#:    host calibrates rather than judges: it cannot stamp loaded=true,
#:    and later idle runs only tighten the floor downward).
CANARY_FLOOR_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 ".bfdl_canary_floor.json")


def _resolve_canary_floor(sf: str) -> float | None:
    env = os.environ.get("BFDL_CANARY_FLOOR_SEC")
    if env is not None:
        return float(env)
    try:
        with open(CANARY_FLOOR_FILE) as f:
            data = json.load(f)
    except (OSError, ValueError):
        return None
    # Floors key by SCALE FACTOR (r11): the canary query scans sf_dir's
    # lineitem, so its idle floor is a property of (host, sf) — a bench
    # run at sf0.01 once persisted its ~4x-faster floor into the shared
    # slot and every later sf0.1 run would have read as "loaded" and
    # stalled the full settle wait. Legacy single-floor files predate
    # the keying and were always measured at the headline sf0.1.
    try:
        if "floors" in data:
            v = data["floors"].get(sf)
            return float(v) if v is not None else None
        return float(data["floor_sec"]) if sf == "0.1" else None
    except (KeyError, TypeError, ValueError):
        # corrupt / hand-edited floor file (non-dict JSON, or a dict
        # missing both keys): calibrate fresh rather than crash the
        # canary (ADVICE r11)
        return None


def _persist_canary_floor(best: float, sf: str) -> None:
    prior = _resolve_canary_floor(sf)
    floor = best if prior is None else min(prior, best)
    floors: dict = {}
    try:
        with open(CANARY_FLOOR_FILE) as f:
            data = json.load(f)
        floors = dict(data.get("floors") or {})
        if "floor_sec" in data and "0.1" not in floors:
            floors["0.1"] = data["floor_sec"]  # migrate the legacy slot
    except (OSError, ValueError):
        pass
    floors[sf] = round(floor, 4)
    try:
        with open(CANARY_FLOOR_FILE, "w") as f:
            json.dump({"floors": floors}, f)
    except OSError:
        pass  # read-only checkout: floor just stays session-scoped


def load_canary(sf_dir: str, max_wait_sec: float = 300.0) -> dict:
    """Ambient-load canary (VERDICT r7 #3): the r7 bench session ran on a
    loaded machine — provable only because the DuckDB side of the same
    session inflated too (oracle ``dedup_keep_last`` 8× its r6 floor). So
    price the machine FIRST with a fixed DuckDB aggregation whose idle
    floor is pinned above: best-of-3; if above the threshold, wait and
    retry (bounded), then record the final state either way. The driver
    parses the last stdout line, so a loaded machine must surface as a
    field, never an abort.

    Threshold 1.2× floor (VERDICT r9 #4 tightened it from 1.5×: the r9
    bench ran on a ~30% slower boot that 1.5× let through, costing the
    round its wall-to-wall comparability), wait bounded at 5 min so a
    driver whose correctness gate just released its JVM gets time to
    settle without ever stalling the artifact."""
    import duckdb

    q = (
        "SELECT l_returnflag, count(*) AS n, "
        "sum(l_extendedprice * (1 - l_discount)) AS rev "
        f"FROM read_parquet('{os.path.join(sf_dir, 'lineitem.parquet')}') "
        "WHERE l_shipdate <= DATE '1998-09-02' GROUP BY 1 ORDER BY 1"
    )
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    floor = _resolve_canary_floor(sf)
    waited = 0.0
    while True:
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            con.sql(q).fetchall()
            best = min(best, time.perf_counter() - t0)
        calibrating = floor is None
        loaded = (not calibrating) and best > 1.2 * floor
        if not loaded or waited >= max_wait_sec:
            con.close()
            _persist_canary_floor(best, sf)
            return {
                "sec": round(best, 4),
                "floor_sec": round(best if calibrating else floor, 4),
                "calibrated_this_run": calibrating,
                "loaded": loaded,
                "waited_sec": round(waited, 1),
            }
        print(
            f"load_canary: {best:.4f}s > 1.2x floor {floor}s; waiting",
            file=sys.stderr,
        )
        time.sleep(15.0)
        waited += 15.0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    canary = load_canary(sf_dir)
    # Size the session to the benchmark SF, the same call an operator makes
    # on any deployment: at sf0.1 (~600k-row fact table, <100 MB inputs) a
    # shuffle needs single-digit partitions, and AQE's per-stage
    # re-optimization barrier costs more than the skew/coalescing it buys —
    # measured ~35% of suite wall. Cluster deployments and the verification
    # driver keep the scale-safe defaults (AQE on; see session.RUNTIME_CONFS).
    # files.maxPartitionBytes: the default 128 MB split is right when files
    # ARE 128 MB (the 100 TB deployment); at this bench's ~2-10 MB inputs it
    # makes every scan a 1-2 task stage while DuckDB parallelizes row groups
    # across all cores. 1 MB splits restore scan parallelism — the same
    # knob a cluster job tunes to its input:core ratio (measured ~10-20%
    # of suite wall here).
    # constraintPropagation: ~40 ms/query of optimizer constraint inference
    # that buys nothing on these plans (no inferred-filter wins; measured
    # ~6% of suite wall). FAIR scheduling only matters for the concurrent
    # suite-wall metric below — serial passes are unaffected.
    spark = get_spark(
        "bfdl-bench",
        shuffle_partitions=8,
        overrides={
            "spark.sql.adaptive.enabled": "false",
            "spark.sql.files.maxPartitionBytes": "1m",
            "spark.sql.files.openCostInBytes": "65536",
            "spark.sql.constraintPropagation.enabled": "false",
            "spark.scheduler.mode": "FAIR",
        },
    )

    # warmup: JVM, codegen, parquet footers — and the Python/Arrow worker
    # pool (first applyInPandas pays ~2 s one-time worker startup that would
    # otherwise be billed to the first pandas-kernel query)
    force(DQ.QUERIES["ohlcv_5m"](spark, sf_dir))
    force(DQ.QUERIES["ema_per_user"](spark, sf_dir))

    # Measured per-job scheduling floor (VERDICT r12 #2/#3): the minimal
    # Spark job this session can run — a count over a 1-row cached frame —
    # timed best-of-7 after warmup. Round-over-round absolute walls are
    # only comparable when the hosts' job floors match (r12's ten >10%
    # "regressions" were all floor drift, adjudicated by judge-side plan
    # diffing); this field makes the floor part of the artifact.
    floor_df = spark.range(0, 1, 1, 1).cache()  # ONE partition: the
    floor_df.count()                            # minimal 1-task job
    spark_job_floor = min(
        _timed(lambda: floor_df.count()) for _ in range(7)
    )
    floor_df.unpersist()

    # Two passes per query. The first pass pays one-time Catalyst planning +
    # whole-stage-codegen JIT (~0.7 s per unique plan shape in this JVM) —
    # a fixed cost that is irrelevant at production scale where a plan runs
    # over TBs. The steady-state (second) pass is the headline: it measures
    # the actual scan/shuffle/compute work at this SF. Both are reported.
    cold: dict[str, float] = {}
    warm: dict[str, float] = {}
    t_all = time.perf_counter()
    for name in HEADLINE:
        t0 = time.perf_counter()
        force(DQ.QUERIES[name](spark, sf_dir))
        cold[name] = round(time.perf_counter() - t0, 4)
    cold_total = round(time.perf_counter() - t_all, 4)
    # steady state is best-of-3 per query — single shots are swamped by
    # machine-load noise at these sub-second walls (same policy as
    # scripts/scale_ratio.py; the DuckDB baseline times the same way)
    for name in HEADLINE:
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            force(DQ.QUERIES[name](spark, sf_dir))
            best = min(best, time.perf_counter() - t0)
        warm[name] = round(best, 4)
    warm_total = round(sum(warm.values()), 4)

    # LLM-pipeline family (separate section; see LLM_PIPELINE comment)
    llm: dict[str, float] = {}
    for name in LLM_PIPELINE:
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            force(DQ.QUERIES[name](spark, sf_dir))
            best = min(best, time.perf_counter() - t0)
        llm[name] = round(best, 4)

    # Concurrent suite wall: all 30 headline plans submitted at once into
    # the shared session (FAIR pool). This is the throughput a deployment
    # actually gets — per-job scheduling floors overlap instead of
    # summing — and the per-query numbers above price each plan's latency.
    from concurrent.futures import ThreadPoolExecutor

    def suite_pass() -> float:
        t0 = time.perf_counter()
        with ThreadPoolExecutor(len(HEADLINE)) as ex:
            list(ex.map(lambda n: force(DQ.QUERIES[n](spark, sf_dir)), HEADLINE))
        return time.perf_counter() - t0

    suite_wall = round(min(suite_pass() for _ in range(3)), 4)

    # Serial 10x section — the data-dominated comparison. At sf0.1 the
    # per-query wall is floor-dominated (~45 ms job floor + stage
    # scheduling × 30 queries; profiled r4), which prices Spark's fixed
    # machinery, not its per-row work. At 10x the same serial methodology
    # (same queries, same best-of-N, both engines in this process, same
    # OS page cache) compares the slopes that predict cluster behavior.
    # Replica construction preserves selectivity (scripts/scale_ratio.py).
    serial_10x = None
    try:
        import importlib.util

        import duckdb

        spec = importlib.util.spec_from_file_location(
            "scale_ratio",
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "scripts", "scale_ratio.py"),
        )
        sr = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(sr)
        dst = f"/tmp/bfdl_sf{sf}_x10"
        if not os.path.exists(os.path.join(dst, "lineitem.parquet")):
            sr.build_scaled(sf_dir, dst)

        # The sf0.1 sections above tune the session for the per-job floor
        # (8 shuffle partitions — right when shuffles carry a few MB).
        # This section's entire purpose is the data-dominated slope that
        # predicts cluster behavior, so shuffle width scales with the
        # data: 10× rows → full machine width (a runtime conf, read at
        # physical planning, so cached plan objects pick it up on next
        # action). Measured per-process A/B at the replica: the 20M-row
        # band self-join of simhash_near_pairs is 8.0 s on 8 tasks,
        # 2.8 s on 32. AQE stays off here like the rest of the bench —
        # re-measured at 10×: its per-stage barrier still costs more than
        # coalescing buys (simhash 2.8→3.3 s, range_join 1.5→2.8 s with
        # AQE on; coalescing targets bytes, not the CPU of explode-heavy
        # stages). Cluster deployments keep AQE on for skew/stragglers —
        # effects a single-process bench cannot exhibit.
        spark.conf.set(
            "spark.sql.shuffle.partitions", str(min(32, os.cpu_count() or 8))
        )

        # best-of-3 with a median column (VERDICT r5 #4): the r4→r5
        # sub-second "regressions" needed a variance axis to separate
        # contention noise from structural change — best prices the
        # plan, best-vs-median prices the noise.
        sp10: dict[str, float] = {}
        sp10_med: dict[str, float] = {}
        for name in HEADLINE:
            force(DQ.QUERIES[name](spark, dst))  # warm (JIT shapes shared)
            runs = []
            for _ in range(3):
                t0 = time.perf_counter()
                force(DQ.QUERIES[name](spark, dst))
                runs.append(time.perf_counter() - t0)
            sp10[name] = round(min(runs), 4)
            sp10_med[name] = round(sorted(runs)[1], 4)

        from tests.oracle_utils import TABLES

        con = duckdb.connect()
        con.execute(f"SET threads TO {os.cpu_count()}")
        for t in TABLES:
            p = os.path.join(dst, f"{t}.parquet")
            if os.path.exists(p):
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
                )
        dk10: dict[str, float] = {}
        dk10_med: dict[str, float] = {}
        for name in HEADLINE:
            runs = []
            for _ in range(3):
                t0 = time.perf_counter()
                con.sql(DQ.ORACLE[name]).fetchall()
                runs.append(time.perf_counter() - t0)
            dk10[name] = round(min(runs), 4)
            dk10_med[name] = round(sorted(runs)[1], 4)
        con.close()

        sp_total = round(sum(sp10.values()), 4)
        dk_total = round(sum(dk10.values()), 4)
        serial_10x = {
            "sf": f"{sf}x10",
            "spark_serial_total": sp_total,
            "duckdb_serial_total": dk_total,
            "ratio_vs_duckdb": round(sp_total / dk_total, 4),
            "spark_serial_total_median": round(sum(sp10_med.values()), 4),
            "duckdb_serial_total_median": round(sum(dk10_med.values()), 4),
            "spark_queries": sp10,
            "duckdb_queries": dk10,
            "spark_queries_median": sp10_med,
            "duckdb_queries_median": dk10_med,
        }
    except Exception as ex:  # keep the one-JSON-line contract no matter what
        serial_10x = {"error": f"{type(ex).__name__}: {ex}"[:300]}

    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    full = {
        "metric": "headline_suite_wall_steady_state",
        "value": warm_total,
        "unit": "sec",
        "queries": warm,
        "cold_total_incl_plan_jit": cold_total,
        "queries_cold": cold,
        "llm_queries": llm,
        "llm_total": round(sum(llm.values()), 4),
        "suite_wall_concurrent": suite_wall,
        "serial_10x": serial_10x,
        "load_canary": canary,
        "spark_job_floor_sec": round(spark_job_floor, 4),
        "sf": sf_val,
    }
    # Full multi-section detail goes to a FILE and to early stdout. The
    # verification driver keeps only a bounded TAIL of stdout and parses the
    # last line as the round's headline — r4's single giant line outgrew the
    # capture and the round recorded "parsed": null (VERDICT r4 next-steps
    # #1). The LAST line is therefore a compact summary guaranteed to fit.
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_FULL.json"),
        "w",
    ) as fh:
        json.dump(full, fh, indent=1)
    print(json.dumps(full))
    # Additions to the compact line are contract-safe (the driver tolerates
    # extra keys; VERDICT r12 #2 asked for exactly these): the LLM_PIPELINE
    # section — where the r12/r13 optimization work lands — and the measured
    # Spark job floor for round-over-round drift adjudication.
    compact = {
        "metric": "headline_suite_wall_steady_state",
        "value": warm_total,
        "unit": "sec",
        "queries": warm,
        "llm_queries": llm,
        "llm_total": round(sum(llm.values()), 4),
        "suite_wall_concurrent": suite_wall,
        "load_canary": canary,
        "spark_job_floor_sec": round(spark_job_floor, 4),
        "sf": sf_val,
    }
    if isinstance(serial_10x, dict) and "ratio_vs_duckdb" in serial_10x:
        compact["serial_10x_ratio_vs_duckdb"] = serial_10x["ratio_vs_duckdb"]
        compact["serial_10x_spark_total"] = serial_10x["spark_serial_total"]
        compact["serial_10x_duckdb_total"] = serial_10x["duckdb_serial_total"]
    elif isinstance(serial_10x, dict) and "error" in serial_10x:
        # a failed 10x section must be visible in the ONLY line the driver
        # parses — otherwise the headline silently reads as a clean run
        # with the failure buried in BENCH_FULL.json
        compact["serial_10x_error"] = str(serial_10x["error"])[:200]
    compact["detail"] = "BENCH_FULL.json"
    print(json.dumps(compact))
    spark.stop()


if __name__ == "__main__":
    main()
