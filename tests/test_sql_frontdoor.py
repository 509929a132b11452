"""SQL front door parity: every entry in sql.SQL_QUERIES must return
the SAME multiset of rows (and column names) as the DataFrame query
of the same name — the engine's third agreement surface next to the
DataFrame plan and the DuckDB oracle."""

from __future__ import annotations

import math

import pytest

from uie_pytorch_spark import sql as SQLFD
from uie_pytorch_spark.queries import QUERIES

SF_DIR = "/root/testdata/sf0.01"


def _norm(v):
    if isinstance(v, float):
        return "nan" if math.isnan(v) else round(v, 9)
    return v


def _rowset(df):
    cols = sorted(df.columns)
    out = {}
    for r in df.collect():
        key = tuple(_norm(r[c]) for c in cols)
        out[key] = out.get(key, 0) + 1
    return out


@pytest.mark.parametrize("name", sorted(SQLFD.SQL_QUERIES))
def test_sql_matches_dataframe_query(spark, name):
    via_sql = SQLFD.sql_query(spark, SF_DIR, name)
    via_df = QUERIES[name](spark, SF_DIR)
    assert sorted(via_sql.columns) == sorted(via_df.columns)
    assert _rowset(via_sql) == _rowset(via_df)


def test_sql_unknown_query_lists_available(spark):
    with pytest.raises(KeyError, match="agg_pricing_summary"):
        SQLFD.sql_query(spark, SF_DIR, "no_such_query")
