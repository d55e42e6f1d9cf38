"""Run every queries() entry that has an oracle against DuckDB at sf0.001 --
the same check the driver runs at sf0.01 (CORRECTNESS_r{N}.json), so a
failure here predicts a driver failure."""

from __future__ import annotations

import pytest

from hive_ddl_extract_tool_spark.operators import all_oracles, all_queries

from .parity import compare

QUERIES = all_queries()
ORACLES = all_oracles()


def test_every_oracle_has_a_query():
    missing = set(ORACLES) - set(QUERIES)
    assert not missing, f"oracles without queries: {missing}"


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_parity(name, spark, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    compare(df, ORACLES[name], sf_dir)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(name, spark, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
