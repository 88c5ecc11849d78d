"""Deterministic, join-preserving sampling for 100 TB exploration.

``df.sample(fraction)`` draws independently per table and per run: joining
two sampled tables keeps ~frac² of pairs, and a re-run sees different
rows — useless for cross-table EDA or reproducible debugging. Hash-
threshold sampling fixes both at once:

    keep row ⟺ uniform_hash(key) < fraction

- **Deterministic**: md5-derived hash, no RNG state — the same sample on
  every run, every engine (the driver oracle-checks a sampled aggregate
  exactly, which is impossible with ``sample()``).
- **Join-preserving**: sample every table by the SAME key (e.g.
  customer id) and a key either survives everywhere or nowhere — joins
  on samples are complete joins of the sampled key universe (no frac²
  decimation, no orphans).
- **Scale-free**: a narrow filter, fully pushdown-friendly; no shuffle,
  no state. At 100 TB it is the difference between exploring on 1% and
  not exploring.

The same bottom-of-hash idea at fixed k instead of fixed fraction is the
KMV sketch (operators/sketch.py) — fraction-sampling and distinct-count
sketching are two readings of one primitive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from binance_futures_data_lake_spark.operators.sketch import uniform_hash


def consistent_sample(df: DataFrame, key_col: str, fraction: float) -> DataFrame:
    """Keep rows whose key hashes below ``fraction`` (0 < fraction ≤ 1).

    All rows of a key are kept or dropped together; the same call on
    another table with a shared key keeps the SAME key universe.
    """
    if not (0.0 < fraction <= 1.0):
        raise ValueError(f"fraction must be in (0, 1], got {fraction}")
    return df.filter(uniform_hash(df[key_col]) < fraction)


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic stratified sampling: per-stratum keep fractions on
    the same md5 hash-threshold primitive as :func:`consistent_sample`.

    Training-data curation constantly reweights a corpus (e.g. keep 50%
    of English, 25% of the mid-resource languages, 10% of the tail);
    drawing each stratum with ``sample()`` would be non-reproducible and
    non-join-preserving. Here the threshold is a CASE expression over the
    stratum column, so the whole operation stays ONE narrow pushdown-
    friendly filter — no shuffle, no per-stratum passes, and a key keeps
    the same fate in every table sampled with the same key.
    """
    for name, frac in rates.items():
        if not (0.0 <= frac <= 1.0):
            raise ValueError(f"rate for {name!r} must be in [0, 1], got {frac}")
    from pyspark.sql import functions as F

    thr = F.lit(default_rate)
    for name, frac in sorted(rates.items(), reverse=True):
        thr = F.when(F.col(strata_col) == name, F.lit(frac)).otherwise(thr)
    return df.filter(uniform_hash(df[key_col]) < thr)
