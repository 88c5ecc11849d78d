"""Distinct-count sketching (KMV) — approximate aggregation you can still
oracle-check.

Production Spark answers "how many distinct X per group over 100 TB" with
``approx_count_distinct`` (HyperLogLog++, constant memory, mergeable) —
that is the deployment path and nothing here replaces it. But HLL results
are implementation-defined (register layout, bias tables), so no
cross-engine oracle can verify them. The K-Minimum-Values estimator is
different: its estimate is a PURE FUNCTION of the data —

    h(v)  = uniform hash of v into [0, 1)
    KMV   = the k smallest distinct h values
    n̂     = (k−1) / h_(k)          (or exact n when fewer than k distinct)

so two engines that agree on h agree on the estimate to the bit. We use
an md5-derived 60-bit hash (portable, no RNG), which makes the driver's
DuckDB comparison exact — the correctness gate covers the SKETCH
SEMANTICS, not just a tolerance band.

Scale note: this DataFrame formulation (distinct → per-group rank ≤ k)
shuffles the distinct set, like exact count_distinct — fine for research
queries. The bounded-memory form keeps only k values per partition and
merges (KMV sets are trivially mergeable: union, keep k smallest); that
is what a custom TypedImperativeAggregate would do, and what
approx_count_distinct already does with HLL state. Standard error is
~1/√(k−2) (≈ 12.6% at k = 64).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from binance_futures_data_lake_spark.functions.scalars import round6

TWO_POW_60 = float(1 << 60)


def uniform_hash(col) -> F.Column:
    """md5-derived uniform double in [0, 1) — 60 bits, engine-portable
    (DuckDB: ('0x' || substring(md5(v), 1, 15))::BIGINT / 2^60)."""
    h = F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast("long")
    return h / F.lit(TWO_POW_60)


def kmv_distinct(
    df: DataFrame,
    value_col: str,
    by: Sequence[str] = (),
    k: int = 64,
    include_exact: bool = True,
) -> DataFrame:
    """Per-group KMV distinct-count estimate.

    Output: by-cols + ``n_exact`` (true distinct, for error inspection —
    ``include_exact=False`` drops the column AND its exact
    ``count_distinct`` pass, which would defeat the sketch at deploy
    scale; same deploy polish as :func:`hll_distinct`) +
    ``kmv_estimate`` (6-dp rounded). Exact when a group has < k distinct
    values (the sketch degenerates to the full set).

    Scale shape (r9): the estimate routes through :func:`kmv_state`'s
    k-min fold — values are hashed MAP-SIDE and the dedup exchange
    carries only (by, hv) doubles, never the full-width value column
    (the r8 form shuffled the distinct VALUE set before hashing). The
    lean path is therefore exactly the streaming tier's read shape
    (state build + :func:`kmv_estimate_from_state`).
    """
    by = list(by)
    # r12 CLOSED NEGATIVE: sharing one distinct-(by, value) subtree
    # between the estimate fold and the exact pass looks like a
    # one-scan win (guide §2.4), but Catalyst collapses
    # dedup(by,v) → project(hv) → dedup(by,hv) back into the single
    # direct dedup(by,hv), so the two branches' exchanges never match
    # and the executed plan is byte-equivalent to this form — the
    # two-scan shape IS canonical here. Both scans partial-aggregate
    # map-side, so each exchange is bounded by per-partition distincts.
    est = kmv_estimate_from_state(kmv_state(df, value_col, by, k), by, k)
    if not include_exact:
        return est
    exact = (
        df.select(*by, F.col(value_col).alias("__v"))
        .groupBy(*by)
        .agg(F.count_distinct(F.col("__v")).alias("n_exact"))
    )
    out = est.join(exact, by) if by else est.crossJoin(exact)
    return out.select(*by, "n_exact", "kmv_estimate")


def kmv_quantiles(
    df: DataFrame,
    value_col: str,
    key_col: str,
    by: Sequence[str] = (),
    k: int = 256,
    qs: Sequence[float] = (0.5, 0.95),
) -> DataFrame:
    """Deterministic sampled quantiles — the scale path for exact
    per-group percentiles (A11), built on the same KMV idea as
    :func:`kmv_distinct`: the k rows with the smallest md5-derived hash
    of their UNIQUE KEY form a uniform without-replacement sample that is
    a pure function of the data (no RNG), so the estimate is
    cross-engine oracle-checkable to the bit. Exact when a group has
    ≤ k rows (the sample is the group). Standard error of a sampled
    q-quantile is O(√(q(1−q)/k)).

    Hashing the KEY (not the value) keeps duplicate values at their true
    frequency — hashing values would dedup the distribution. Output:
    by-cols + ``n`` (true row count) + ``p<q>`` per requested quantile
    (6-dp, linear interpolation — Spark ``percentile`` ≡ DuckDB
    ``quantile_cont``).

    Scale shape (r9, the :func:`kmv_state` two-phase treatment): the r8
    form ran BOTH a window count and the sample rank over
    ``partitionBy(by)`` — each puts a group's ENTIRE row set in one
    task (the few-groups window scale-killer, twice). Now the true
    count is a partial-aggregated ``groupBy`` (broadcast-joined back),
    and the sample rank is two-phase — per-(input-partition, group)
    k-min prune, then the global rank on ≤ ``partitions·k·|groups|``
    survivors; exact for any partitioning because ``(__h, __key)`` is a
    total order over unique keys, so the union of per-partition k-min
    sets contains the global k-min. The bounded-memory endgame (k pairs
    per partition inside a TypedImperativeAggregate, the
    approx_percentile trade) remains the noted alternative; its GK
    sketch is not oracle-checkable across engines.
    """
    by = list(by)
    s0 = (
        df.select(*by, F.col(value_col).alias("__v"), F.col(key_col).alias("__key"))
        .withColumn("__h", uniform_hash(F.col("__key")))
    )
    cnt = s0.groupBy(*by).agg(F.count(F.lit(1)).alias("n"))
    pruned = (
        s0.withColumn("__pid", F.spark_partition_id())
        .withColumn(
            "__lrn",
            F.row_number().over(
                Window.partitionBy("__pid", *by).orderBy("__h", "__key")
            ),
        )
        .filter(F.col("__lrn") <= k)
    )
    s = (
        pruned.withColumn(
            "__rn",
            F.row_number().over(Window.partitionBy(*by).orderBy("__h", "__key")),
        )
        .filter(F.col("__rn") <= k)
    )
    aggs = []
    for q in qs:
        aggs.append(
            round6(F.expr(f"percentile(__v, {q})")).alias(f"p{int(round(q * 100))}")
        )
    out = s.groupBy(*by).agg(*aggs)
    joined = out.join(F.broadcast(cnt), by) if by else out.crossJoin(F.broadcast(cnt))
    names = [f"p{int(round(q * 100))}" for q in qs]
    return joined.select(*by, "n", *names)


def cms_build(
    df: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 64,
) -> DataFrame:
    """Count–Min sketch build: a ``depth × width`` counter table over the
    value stream, as one relational pass.

    Same design bargain as KMV above: production Spark would reach for a
    mergeable binary sketch state, but a CMS built from md5-derived row
    hashes is a PURE FUNCTION of the data — two engines that agree on
    ``bucket(seed, v) = md5-60bit(seed||':'||v) mod width`` agree on every
    counter, so the driver's DuckDB comparison checks the SKETCH
    SEMANTICS exactly (point estimates obey est ≥ true with
    P[est > true + εN] ≤ δ at ε = e/width, δ = exp(−depth)).

    Shape: each row explodes into ``depth`` (seed, bucket) pairs; the
    groupBy map-side-combines, so the only exchange carries at most
    ``depth·width`` rows PER PARTITION regardless of row count — the
    sketch property (constant memory) is also the shuffle property.
    Output: ``seed, bucket, cnt`` (``≤ depth·width`` rows total).
    """
    if depth < 1 or width < 1:
        raise ValueError(f"invalid CMS shape {depth}x{width}")
    v = F.col(value_col).cast("string")
    pairs = F.array(
        *[
            F.struct(
                F.lit(s).alias("seed"),
                F.pmod(
                    F.conv(
                        F.substring(F.md5(F.concat(F.lit(f"{s}:"), v)), 1, 15),
                        16,
                        10,
                    ).cast("long"),
                    F.lit(width),
                ).alias("bucket"),
            )
            for s in range(depth)
        ]
    )
    return (
        df.select(F.explode(pairs).alias("p"))
        .select("p.seed", "p.bucket")
        .groupBy("seed", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    items: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 64,
) -> DataFrame:
    """Point-query a CMS built by :func:`cms_build` for a (small) probe
    item set: estimate = min over the ``depth`` rows of the item's bucket
    counter. The probe side explodes to ``|items|·depth`` rows and joins
    the ≤ ``depth·width``-row sketch — both tiny; the sketch side
    broadcasts. Output: ``item, cms_estimate`` (LONG; ≥ the true count
    by construction, = 0 only for items the stream never hashed near).
    """
    v = F.col(item_col).cast("string")
    probes = items.select(
        F.col(item_col).alias("item"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("seed"),
                        F.pmod(
                            F.conv(
                                F.substring(
                                    F.md5(F.concat(F.lit(f"{s}:"), v)), 1, 15
                                ),
                                16,
                                10,
                            ).cast("long"),
                            F.lit(width),
                        ).alias("bucket"),
                    )
                    for s in range(depth)
                ]
            )
        ).alias("p"),
    ).select("item", "p.seed", "p.bucket")
    return (
        probes.join(F.broadcast(sketch), ["seed", "bucket"], "left")
        .fillna({"cnt": 0})
        .groupBy("item")
        .agg(F.min("cnt").cast("long").alias("cms_estimate"))
    )


def cms_heavy_hitters(
    df: DataFrame,
    value_col: str,
    items: DataFrame,
    depth: int = 4,
    width: int = 64,
) -> DataFrame:
    """CMS point estimates for a probe set next to the true counts —
    the heavy-hitter report form (est ≥ true always; the gap is the
    collision noise the width buys down). The exact side restricts to
    the probe items BEFORE its groupBy (a leftsemi against the broadcast
    probe list), so its shuffle carries probe-item rows only.
    Output: ``item, n_exact, cms_estimate``."""
    sk = cms_build(df, value_col, depth, width)
    est = cms_estimate(sk, items, items.columns[0], depth, width)
    exact = (
        df.select(F.col(value_col).alias("item"))
        .join(F.broadcast(items.select(F.col(items.columns[0]).alias("item"))),
              "item", "leftsemi")
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("n_exact"))
    )
    return (
        est.join(exact, "item", "left")
        .fillna({"n_exact": 0})
        .select("item", "n_exact", "cms_estimate")
    )

# ---------------------------------------------------------------------------
# HyperLogLog — the production distinct sketch, made oracle-replayable.
# ---------------------------------------------------------------------------

#: α_m constants from Flajolet et al. 2007 (the exact small-m table; the
#: asymptotic 0.7213/(1+1.079/m) applies at m ≥ 128).
HLL_ALPHA = {16: 0.673, 32: 0.697, 64: 0.709}


def hll_distinct(
    df: DataFrame,
    value_col: str,
    by: Sequence[str] = (),
    m: int = 64,
    include_exact: bool = True,
) -> DataFrame:
    """Per-group HyperLogLog distinct-count estimate whose every register
    is a PURE FUNCTION of the data — the same design bargain as
    :func:`kmv_distinct`, applied to the sketch Spark actually deploys
    (``approx_count_distinct`` is HLL++ but its registers/bias tables are
    implementation-defined, so no cross-engine oracle can check them).

    Construction (classic Flajolet HLL over the md5-derived 60-bit hash):

    - ``bucket = h60 mod m`` and ``w = h60 div m`` (a ``60 − log2(m)``-bit
      remainder), so ``rho = (maxbits + 1) − bitlength(w)`` (``w = 0`` →
      ``maxbits + 1``) is an exact integer both engines compute from
      string/integer ops only (``conv(w, 10, 2)`` / DuckDB ``bin(w)``).
    - register ``M[j] = max rho`` per bucket; empty buckets are M = 0,
      materialized via a ``group × m`` grid so the indicator sum counts
      them (the 2^0 = 1 terms dominate small cardinalities).
    - the harmonic indicator is kept EXACT-INTEGER: ``S = Σ_j
      2^(maxrho − M[j])`` with ``maxrho ≤ 55`` fits BIGINT
      (≤ m·2^55 < 2^63), so the only float op is the single final
      division ``α·m²·2^maxrho / S`` — same two operands in both engines,
      bit-identical IEEE, then round6.
    - small-range (linear-counting) correction ``m·ln(m/V)`` fires when
      ``raw ≤ 2.5m`` and ``V = #zero registers > 0``. V is an integer in
      [1, m], so the ln LOOKUP TABLE is precomputed here in Python and
      emitted as literals to BOTH engines — no runtime transcendental,
      no libm cross-engine exposure anywhere in the operator.

    Output: by-cols + ``n_exact`` (true distinct, for error inspection —
    ``include_exact=False`` drops the column AND its exact
    ``count_distinct`` pass, which would defeat the sketch at deploy
    scale) + ``hll_estimate`` (6-dp). Standard error ≈ 1.04/√m (13% at
    m=64).

    Scale shape: registers are duplicate-INSENSITIVE (``max rho``), so
    hashing feeds the per-bucket max directly — no pre-aggregation
    ``distinct`` exchange (r8; the r7 form paid one full-width shuffle
    for nothing). The per-bucket max map-side-combines to
    ≤ ``|groups|·m`` rows per partition — like CMS, the sketch's
    constant-memory property IS the shuffle property. (The deploy-path
    note from the module docstring applies: a TypedImperativeAggregate
    carrying the m-byte register vector would skip even that shuffle;
    this formulation keeps the driver-checkable relational form.)
    """
    by = list(by)
    # r12 CLOSED NEGATIVE — see kmv_distinct: the shared-distinct
    # rewrite is undone by Catalyst (redundant distinct under the
    # max-monoid register aggregate is eliminated), so this two-pass
    # form is already the canonical plan.
    reg = hll_registers(df, value_col, by, m)
    agg_est = hll_estimate_from_registers(reg, by, m)
    if not include_exact:
        return agg_est
    exact = (
        df.select(*by, F.col(value_col).alias("__v"))
        .groupBy(*by)
        .agg(F.count_distinct(F.col("__v")).alias("n_exact"))
    )
    out = agg_est.join(exact, by) if by else agg_est.crossJoin(exact)
    return out.select(*by, "n_exact", "hll_estimate")


def hll_registers(
    df: DataFrame,
    value_col: str,
    by: Sequence[str] = (),
    m: int = 64,
) -> DataFrame:
    """Sparse HLL registers — the MERGEABLE state of :func:`hll_distinct`
    (by-cols + ``bucket, mx``; absent buckets mean M = 0). Registers form
    a MAX MONOID: ``registers(A ∪ B) = max-merge(registers(A),
    registers(B))`` per (group, bucket), which is what makes the
    streaming twin's batch-addressed delta state exact
    (streaming/pipeline.py hll_delta_sink / read_hll_state — the CMS
    sum-monoid argument with max for sum). ≤ ``|groups|·m`` rows."""
    if m not in HLL_ALPHA:
        raise ValueError(f"m must be one of {sorted(HLL_ALPHA)}, got {m}")
    maxbits = 60 - m.bit_length() + 1  # 60 - log2(m)
    maxrho = maxbits + 1
    by = list(by)
    h60 = F.conv(
        F.substring(F.md5(F.col("__v").cast("string")), 1, 15), 16, 10
    ).cast("long")
    hashed = (
        df.select(*by, F.col(value_col).alias("__v"))
        .withColumn("__h", h60)
        .withColumn("__bucket", F.pmod(F.col("__h"), F.lit(m)))
        .withColumn("__w", F.expr(f"__h div {m}"))
        .withColumn(
            "__rho",
            F.when(F.col("__w") == 0, F.lit(maxrho)).otherwise(
                F.lit(maxrho) - F.length(F.conv(F.col("__w"), 10, 2))
            ),
        )
    )
    return (
        hashed.groupBy(*by, "__bucket")
        .agg(F.max("__rho").alias("mx"))
        .select(*by, F.col("__bucket").alias("bucket"), "mx")
    )


def hll_estimate_from_registers(
    reg: DataFrame,
    by: Sequence[str] = (),
    m: int = 64,
) -> DataFrame:
    """Estimate from sparse registers (:func:`hll_registers` output or a
    max-merge over deltas): grid-materialize empty buckets, exact-integer
    harmonic sum, literal ln lookup — see :func:`hll_distinct` for the
    numeric contract. Output: by-cols + ``hll_estimate``."""
    if m not in HLL_ALPHA:
        raise ValueError(f"m must be one of {sorted(HLL_ALPHA)}, got {m}")
    maxbits = 60 - m.bit_length() + 1
    maxrho = maxbits + 1
    num = HLL_ALPHA[m] * (m * m) * float(1 << maxrho)  # exact float literal
    by = list(by)
    spark = reg.sparkSession
    groups = (
        reg.select(*by).distinct()
        if by
        else spark.range(1).select(F.lit(1).alias("__one"))
    )
    grid = groups.crossJoin(spark.range(m).select(F.col("id").alias("bucket")))
    full = grid.join(reg, [*by, "bucket"] if by else ["bucket"], "left").select(
        *by, F.coalesce(F.col("mx"), F.lit(0)).alias("__m")
    )
    agg = full.groupBy(*by).agg(
        F.sum(
            F.expr(
                f"CAST(shiftleft(CAST(1 AS BIGINT), CAST({maxrho} - __m AS INT))"
                " AS BIGINT)"
            )
        ).cast("long").alias("__s"),
        F.sum(F.when(F.col("__m") == 0, 1).otherwise(0)).cast("long").alias("__v"),
    )
    # linear-counting lookup: V ∈ [1, m] → round(m·ln(m/V), 6), as literals
    import math

    lc = F.element_at(
        F.map_from_arrays(
            F.array(*[F.lit(v) for v in range(1, m + 1)]),
            F.array(
                *[F.lit(round(m * math.log(m / v), 6)) for v in range(1, m + 1)]
            ),
        ),
        F.col("__v").cast("int"),
    )
    raw = F.lit(num) / F.col("__s")
    est = F.when((raw <= F.lit(2.5 * m)) & (F.col("__v") > 0), lc).otherwise(
        round6(raw)
    )
    return agg.select(*by, est.alias("hll_estimate"))


def kmv_state(
    df: DataFrame,
    value_col: str,
    by: Sequence[str] = (),
    k: int = 64,
) -> DataFrame:
    """Bounded KMV state — the MERGEABLE form of :func:`kmv_distinct`:
    the ``k`` smallest distinct value hashes per group (by-cols +
    ``hv``). KMV sets are a monoid under "union, dedup, keep k
    smallest", so ``state(A ∪ B) = merge(state(A), state(B))`` — what
    makes the streaming twin's batch-addressed delta state exact
    (streaming/pipeline.py kmv_delta_sink / read_kmv_state; the CMS/HLL
    argument with k-smallest-union for sum/max). ≤ ``|groups|·k`` rows;
    duplicate-insensitive (same value → same hash → dedup collapses
    it).

    Two-phase rank (r9): a lone ``row_number`` over
    ``partitionBy(by)`` puts each group's ENTIRE distinct hash set in
    one task's sort — with few groups that is a single-task sort of
    everything, the classic few-groups window scale-killer. The same
    monoid that makes the state mergeable makes a local prune exact:
    the k smallest of a union of per-partition k-smallest sets ARE the
    k smallest of the union, so phase 1 ranks within
    ``(spark_partition_id, by)`` (parallelism = input partitions,
    whatever the pid assignment — the union above is a superset of the
    global k-min for ANY partitioning) and the global rank runs on
    ≤ ``partitions·k·|groups|`` survivors. Measured identical output
    and wall-parity at 10M×4-groups local; at cluster scale phase 1 is
    the difference between one task sorting a group's billions of
    hashes and every input partition sorting its own slice."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    by = list(by)
    hashed = (
        df.select(*by, uniform_hash(F.col(value_col)).alias("hv"))
        .distinct()
    )
    pruned = (
        hashed.withColumn("__pid", F.spark_partition_id())
        .withColumn(
            "__lrn",
            F.row_number().over(Window.partitionBy("__pid", *by).orderBy("hv")),
        )
        .filter(F.col("__lrn") <= k)
    )
    w = Window.partitionBy(*by).orderBy("hv")
    return (
        pruned.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select(*by, "hv")
    )


def kmv_estimate_from_state(
    state: DataFrame,
    by: Sequence[str] = (),
    k: int = 64,
) -> DataFrame:
    """Estimate from CAPPED KMV state — :func:`kmv_state` output or
    ``read_kmv_state``'s merge, both of which already hold ≤ k hashes
    per group (the input contract; re-ranking here would pay a redundant
    per-group sort exchange on by-construction-capped rows):
    ``n̂ = (k−1)/h_(k)``, exact count when the state holds fewer than k
    hashes (then it IS the full distinct set). Output: by-cols +
    ``kmv_estimate`` (6-dp).

    The divisor is floored at the hash grid's smallest positive value
    (1/2^60): state built by :func:`kmv_state` holds DISTINCT hashes, so
    with ``__cnt >= k >= 2`` at most one can be 0 and ``max >= 1/2^60``
    already — the floor only matters if a future hash swap can emit 0
    for common inputs, in which case it degrades to a (wildly high but
    finite) estimate instead of Infinity."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    by = list(by)
    return state.groupBy(*by).agg(
        F.count(F.lit(1)).alias("__cnt"),
        F.max("hv").alias("__kth"),
    ).select(
        *by,
        round6(
            F.when(F.col("__cnt") < k, F.col("__cnt").cast("double")).otherwise(
                F.lit(float(k - 1))
                / F.greatest(F.col("__kth"), F.lit(1.0 / TWO_POW_60))
            )
        ).alias("kmv_estimate"),
    )
