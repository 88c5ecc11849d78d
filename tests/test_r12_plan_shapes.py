"""r12 optimization-round plan-shape pins.

Each r12 rewrite eliminated a duplicated expensive subtree (guide §2.4:
a BroadcastHashJoin build side re-executes its subtree; column pruning
defeats ReuseExchange between sibling branches). These tests pin the
AFTER shape so a future refactor cannot silently reintroduce the double
execution, and assert value parity where the rewrite changed the
relational formulation (not just a join hint).
"""
from __future__ import annotations

import re

from pyspark.sql import functions as F


def _final_plan(df) -> str:
    """Executed physical plan text (final AQE plan when AQE is on)."""
    jqe = df._jdf.queryExecution()
    jqe.executedPlan().execute().count()
    return jqe.executedPlan().toString().split("== Initial Plan ==")[0]


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


TEXTS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy cat"),
    (3, "pack my box with five dozen liquor jugs"),
    (4, "pack my box with five dozen liquor jugs indeed"),
    (5, "sphinx of black quartz judge my vow"),
    (6, "the quick brown fox jumps over the lazy dog"),
]


def test_hamming_near_pairs_single_upstream_execution(spark):
    """The banded self-join must be sort-merge with a ReusedExchange —
    a broadcast build side would re-run the fingerprint upstream."""
    from binance_futures_data_lake_spark.operators.textdedup import (
        simhash, simhash_near_pairs,
    )

    sims = simhash(_docs(spark, TEXTS))
    plan = _final_plan(simhash_near_pairs(sims, max_hamming=3))
    assert "SortMergeJoin" in plan
    assert "ReusedExchange" in plan
    assert "BroadcastHashJoin" not in plan


def test_exact_jaccard_pairs_single_shingle_pass(spark):
    """One scan+shingle+explode total: the b side and the old sz branch
    must both resolve to ReusedExchange, and values must match the
    direct array-op computation (sizes carried through the explode)."""
    from binance_futures_data_lake_spark.operators.textdedup import (
        exact_jaccard_pairs, shingles_of_tokens, words,
    )

    docs = _docs(spark, TEXTS)
    out = exact_jaccard_pairs(docs, threshold=0.1)
    plan = _final_plan(out)
    # exactly ONE explode-of-shingles Generate in the executed plan
    assert len(re.findall(r"\bGenerate explode", plan)) == 1
    assert "ReusedExchange" in plan
    assert "BroadcastHashJoin" not in plan

    # value parity vs direct per-pair array ops
    sh = {
        r["doc_id"]: set(r["sh"])
        for r in docs.select(
            "doc_id", shingles_of_tokens(words(F.col("text")), 3).alias("sh")
        ).collect()
    }
    want = {}
    ids = sorted(sh)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(sh[a] & sh[b])
            if inter == 0:
                continue
            jac = inter / len(sh[a] | sh[b])
            if jac >= 0.1:
                want[(a, b)] = round(jac, 6)
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"] for r in out.collect()
    }
    assert got == want


def test_bm25_two_corpus_scans_no_term_window(spark, tmp_path_factory):
    """BM25 must touch the corpus exactly twice (query-pruned tokenize
    pass shared between the scoring and df branches via ReusedExchange,
    plus the full-corpus stats pass) — the old shape scanned it 5x —
    and df must NOT be a partition-by-term window (a stopword query
    term would put its entire posting list in one task). The df
    branch's pruning-defeating aggregate is what keeps the shared
    exchange canonical — this pin fails if it is simplified back to
    count(*)."""
    from binance_futures_data_lake_spark.operators.textquality import bm25_topk

    path = str(tmp_path_factory.mktemp("bm25") / "docs.parquet")
    _docs(spark, TEXTS).write.parquet(path)
    docs = spark.read.parquet(path)
    qs = spark.createDataFrame(
        [(0, "quick brown fox"), (1, "liquor jugs")], "q_id long, q_text string"
    )
    plan = _final_plan(bm25_topk(docs, qs, k=3))
    assert len(re.findall(r"(?:File)?Scan parquet\b", plan)) == 2
    assert "ReusedExchange" in plan
    # no windowspec partitioned by term anywhere in the plan
    assert not re.search(r"windowspecdefinition\(term", plan)


def test_knn_mutual_edges_no_self_join(spark):
    """The mutual filter must be ONE aggregation over the directed edge
    list — no join operator anywhere downstream of the GEMM kernel."""
    from binance_futures_data_lake_spark.operators.similarity import (
        fixed_point_cents, knn_graph_mutual_edges,
    )

    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0]), (2, [0.99, 0.14]), (3, [0.0, 1.0]),
            (4, [0.14, 0.99]), (5, [0.7, 0.7]),
        ],
        "vec_id long, embedding array<double>",
    )
    cents = fixed_point_cents([[1.0, 0.0], [0.0, 1.0]])
    edges = knn_graph_mutual_edges(emb, cents, kk=2, threshold=0.1)
    plan = _final_plan(edges)
    assert "Join" not in plan  # no SortMergeJoin/BroadcastHashJoin/...
    rows = edges.collect()
    # every returned edge is canonical u < v with a cosine
    assert all(r["u"] < r["v"] for r in rows)
    # mutual-kNN at kk=2 in the 2-vector cell {1,2} keeps (1,2)
    assert (1, 2) in {(r["u"], r["v"]) for r in rows}


def test_semantic_dedup_inner_pair_join_shares_subtree(spark):
    """semantic_dedup's pair join must be an INNER sort-merge join whose
    two sides share the normalize+cell-assign subtree via ReusedExchange
    (no BroadcastHashJoin — its build side would re-execute the
    subtree). The one-pass LEFT OUTER rewrite was tried and REVERTED:
    inner SMJ evaluates the pairwise-cosine join condition inside
    whole-stage codegen, LeftOuter does not — measured 2.6 s vs 7.2 s
    full-query at sf0.1 (OPTIMIZATION_r12.md closed negatives), so the
    matches-then-rejoin form with its one extra LINEAR subtree pass
    wins at every scale where the Σ|cell|² pairwise term dominates."""
    from binance_futures_data_lake_spark.operators.similarity import (
        fixed_point_cents, semantic_dedup,
    )

    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0]), (2, [0.999, 0.01]), (3, [0.0, 1.0]),
            (4, [0.01, 0.999]), (5, [0.7, 0.7]),
        ],
        "vec_id long, embedding array<double>",
    )
    cents = fixed_point_cents([[1.0, 0.0], [0.0, 1.0]])
    out = semantic_dedup(emb, cents, threshold=0.9)
    plan = _final_plan(out)
    assert "ReusedExchange" in plan
    # the ONLY LeftOuter join is the final cheap rejoin; the pair join
    # (the one whose condition carries the cosine fold) must be Inner
    assert re.search(r"SortMergeJoin\b.*\bInner\b", plan)
    # and no BroadcastHashJoin may carry the PAIR join: a BHJ build side
    # would re-execute the shared normalize+cell-assign subtree (ADVICE
    # r12 re-add, scoped to the pair join: the pair join is the only
    # INNER join in the plan — AQE may legitimately turn the final
    # LeftOuter rejoin into a BHJ, and does under the vanilla session)
    assert not re.search(r"BroadcastHashJoin\b[^\n]*\bInner\b", plan)
    rows = {r["vec_id"]: r for r in out.collect()}
    assert len(rows) == 5  # one row per vector, kept rows included
    assert rows[2]["status"] == "near_dup" and rows[2]["match_id"] == 1
    assert rows[1]["status"] == "kept" and rows[1]["match_id"] is None


def test_semantic_match_existing_inner_pair_join(spark):
    """semantic_match_existing keeps the matches-then-rejoin form: the
    cross-set pair join (cosine fold in its condition) must be INNER —
    the one-pass LeftOuter variant pays the same condition outside
    whole-stage codegen (see semantic_dedup pin above)."""
    from binance_futures_data_lake_spark.operators.similarity import (
        fixed_point_cents, semantic_match_existing,
    )

    existing = spark.createDataFrame(
        [(1, [1.0, 0.0]), (3, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    new = spark.createDataFrame(
        [(10, [0.999, 0.01]), (11, [0.6, 0.6])],
        "vec_id long, embedding array<double>",
    )
    cents = fixed_point_cents([[1.0, 0.0], [0.0, 1.0]])
    out = semantic_match_existing(existing, new, cents, threshold=0.9)
    plan = _final_plan(out)
    # pair join Inner (any strategy — the cross-set sides are distinct
    # subtrees, so a broadcast build does not duplicate work here)
    assert re.search(r"Join\b.*\bInner\b", plan)
    rows = {r["vec_id"]: r for r in out.collect()}
    assert len(rows) == 2
    assert rows[10]["status"] == "near_dup" and rows[10]["match_id"] == 1
    assert rows[11]["status"] == "kept" and rows[11]["match_id"] is None
