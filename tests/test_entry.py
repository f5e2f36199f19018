"""Local replica of the driver gate: every queries() entry vs its DuckDB
oracle_sql() at sf0.001 AND sf0.01 (driver runs sf0.01)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF001, SF0001, assert_frames_match, register_views


def _names():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    # every oracle key must have a query; queries without oracle are
    # allowed (weaker rows-only driver check) but should be rare
    assert set(o) <= set(q)
    return sorted(q)


@pytest.mark.parametrize("name", _names())
@pytest.mark.parametrize("sf_dir", [SF0001, SF001])
def test_query_vs_oracle(spark, duck, name, sf_dir):
    qfn = entrymod.queries()[name]
    sdf = qfn(spark, sf_dir)
    osql = entrymod.oracle_sql().get(name)
    if osql is None:
        assert sdf.count() >= 0  # rows-only check
        return
    register_views(duck, sf_dir)
    assert_frames_match(sdf, duck.sql(osql))


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert rows[0]["doc_id"] == 406
