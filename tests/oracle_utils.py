"""Local mirror of the driver's DuckDB-oracle comparison.

Runs a Spark query and its oracle SQL on the same sf dir, normalizes both
frames (columns sorted by name, rows sorted by all columns, floats compared
to tolerance) and asserts equality. Catching a parity bug here at sf0.001
is the cheap version of failing CORRECTNESS_r{N}.json at sf0.01.
"""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con.sql(sql).df()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def assert_frames_match(spark_df: pd.DataFrame, oracle_df: pd.DataFrame, name: str, atol: float = 1e-9):
    s, o = _normalize(spark_df), _normalize(oracle_df)
    assert list(s.columns) == list(o.columns), (
        f"{name}: column mismatch spark={list(s.columns)} oracle={list(o.columns)}"
    )
    assert len(s) == len(o), f"{name}: row count spark={len(s)} oracle={len(o)}"
    for c in s.columns:
        sv, ov = s[c], o[c]
        if sv.dtype.kind == "f" or ov.dtype.kind == "f":
            sv = sv.astype(float)
            ov = ov.astype(float)
            bad = ~(
                (sv.isna() & ov.isna())
                | ((sv - ov).abs() <= atol)
                | (sv.apply(math.isinf) & ov.apply(math.isinf) & (sv == ov))
            )
        else:
            bad = ~((sv.isna() & ov.isna()) | (sv.astype(object) == ov.astype(object)))
        if bad.any():
            i = bad.idxmax()
            raise AssertionError(
                f"{name}: column {c!r} mismatch at row {i}: "
                f"spark={s[c][i]!r} oracle={o[c][i]!r} ({int(bad.sum())} rows differ)"
            )


def check_query(spark, name: str, sf_dir: str = "/root/testdata/sf0.001"):
    from binance_futures_data_lake_spark.plans import driver_queries as DQ

    sdf = DQ.QUERIES[name](spark, sf_dir).toPandas()
    odf = run_oracle(DQ.ORACLE[name], sf_dir)
    assert_frames_match(sdf, odf, name)
    return len(sdf)
