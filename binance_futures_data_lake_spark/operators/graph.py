"""Connected components over a pair list — the clustering step that turns
near-duplicate PAIRS into dedup CLUSTERS (one canonical doc kept per
component, the rest dropped).

Every dedup family in this repo (MinHash-LSH, SimHash, embedding-LSH)
emits pairs; a pipeline needs the transitive closure of those pairs: if
A~B and B~C, keeping "one of each pair" would keep two of {A,B,C}. The
standard fix is connected components with the min id as the cluster
label, then keep ``doc_id == cluster_id``.

Algorithm: min-label propagation as iterative DataFrame joins —
every node takes the min label among itself and its neighbors until no
label changes. Convergence is O(graph diameter) rounds; dedup graphs are
unions of small near-clique components (duplicates of one underlying
document), so the diameter is tiny (2-4) regardless of corpus size —
the iteration count does NOT grow with data volume. Each round is one
shuffle join on the edge list plus a min-aggregate; lineage is truncated
per round with ``localCheckpoint`` so the plan does not grow with the
iteration count (the classic iterative-Spark failure mode). For graphs
with genuinely large diameters (not dedup), the two-phase large-star/
small-star algorithm (Kiveris et al., "Connected Components in
MapReduce and Beyond") converges in O(log n) rounds with the same
join-per-round shape.

The result is deterministic — min id per component — regardless of
iteration schedule or partitioning, which is what makes it
DuckDB-oracle-checkable (recursive-CTE transitive closure).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iters: int = 25,
    check_every: int = 2,
) -> DataFrame:
    """Label every node reachable through ``edges`` with the min node id
    of its component. Output: ``id, comp`` — one row per node that
    appears in at least one edge (callers union in isolated nodes).

    Convergence is tested every ``check_every`` rounds (plus the last):
    the changed-count is a driver-synchronizing join + count job on top
    of the round's own checkpoint action, so on very large edge lists
    halving the checks matters more than the ≤ ``check_every − 1`` extra
    propagation rounds a late detection costs (propagation past the
    fixed point is a no-op on the labels). ``check_every=1`` restores
    the per-round check.
    """
    sym = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).union(
        edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
    )
    sym = sym.distinct().localCheckpoint(eager=False)
    labels = (
        sym.select(F.col("u").alias("id")).distinct().withColumn("comp", F.col("id"))
    )
    for it in range(max_iters):
        nb = sym.join(labels, sym.v == labels.id).select(
            F.col("u").alias("id"), F.col("comp")
        )
        new = (
            labels.union(nb).groupBy("id").agg(F.min("comp").alias("comp"))
        ).localCheckpoint(eager=True)
        if (it + 1) % max(1, check_every) == 0 or it == max_iters - 1:
            changed = (
                new.alias("n")
                .join(labels.alias("o"), "id")
                .filter(F.col("n.comp") != F.col("o.comp"))
                .count()
            )
            labels = new
            if changed == 0:
                break
        else:
            labels = new
    return labels


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "doc_a",
    dst: str = "doc_b",
) -> DataFrame:
    """Assign every document to a dedup cluster given near-dup ``pairs``.

    Output: ``doc_id, cluster_id, is_canonical, cluster_size`` — the
    min doc id of the component labels the cluster, the doc carrying
    that id is the canonical survivor, docs with no near-dup are their
    own singleton cluster. Downstream dedup is then
    ``filter(is_canonical = 1)``.
    """
    comp = connected_components(pairs, src=src, dst=dst)
    out = (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(comp.withColumnRenamed("id", "doc_id"), "doc_id", "left")
        .withColumn("cluster_id", F.coalesce(F.col("comp"), F.col("doc_id")))
        .drop("comp")
    )
    sizes = out.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (
        out.join(sizes, "cluster_id")
        .withColumn(
            "is_canonical", (F.col("doc_id") == F.col("cluster_id")).cast("int")
        )
        .select("doc_id", "cluster_id", "is_canonical", "cluster_size")
    )


def cluster_holdout_split(
    clustered: DataFrame,
    val_pct: int = 10,
    test_pct: int = 10,
) -> DataFrame:
    """Leakage-free train/val/test split: the WHOLE near-dup cluster goes
    to one side, so no document ever shares a near-duplicate across the
    train/eval boundary (the standard contamination failure of row-level
    random splits). Deterministic md5 bucket of cluster_id — engine-
    portable (same '0x'||substr(md5(..)) idiom as textdedup.token_hash)
    and stable across runs/partitionings.

    Input: dedup_clusters output (doc_id, cluster_id, ...). Output adds
    ``split_bucket`` (0-99) and ``split``.
    """
    if not (0 <= val_pct and 0 <= test_pct and val_pct + test_pct < 100):
        raise ValueError("val_pct/test_pct must be >= 0 and sum below 100")
    bucket = (
        F.conv(F.substring(F.md5(F.col("cluster_id").cast("string")), 1, 8), 16, 10)
        .cast("long") % 100
    )
    split = (
        F.when(bucket < test_pct, F.lit("test"))
        .when(bucket < test_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("train"))
    )
    return clustered.withColumn("split_bucket", bucket.cast("int")).withColumn("split", split)
