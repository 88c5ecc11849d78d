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
