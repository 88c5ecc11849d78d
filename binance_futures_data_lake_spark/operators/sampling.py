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
