"""Runs every oracle-backed queries() entry against DuckDB at sf0.001
(and sf0.01 when RESIN_SPARK_FULL=1) — the same gate the driver runs."""

from __future__ import annotations

import importlib
import os
import sys

import pytest

sys.path.insert(0, "/root/repo")
entry_mod = importlib.import_module("__spark_entry__")

from tests.oracle_util import compare  # noqa: E402

SF = "/root/testdata/sf0.01" if os.environ.get("RESIN_SPARK_FULL") else "/root/testdata/sf0.001"

ORACLES = entry_mod.oracle_sql()
QUERIES = entry_mod.queries()


def test_every_query_has_callable():
    assert QUERIES, "queries() must not be empty"
    for name in ORACLES:
        assert name in QUERIES, f"oracle_sql has {name} but queries() doesn't"


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, name):
    df = QUERIES[name](spark, SF)
    compare(df, ORACLES[name], SF)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF)
    assert df.count() >= 0
    assert df.schema is not None


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
