"""KV-block edge parity (the test_edge_docs.py pattern for block B):
null keys, null insertion orders, and null values across crafted
orders/customer/lineitem/part tables — the cases where Spark's
null-safe set operators and SQL's null-hostile IN/NOT IN (plus window
null ordering) silently diverge unless the operators gate corrupt rows.
"""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

KV_QUERIES = ["kv_try_put", "kv_get_many", "kv_set_ops", "kv_key_join",
              "kv_paginate"]

ORDERS = [
    (1, 10, 100.0, "1-URGENT"),
    (2, 10, 50.0, "2-HIGH"),
    (3, None, 75.0, "1-URGENT"),      # null key (custkey)
    (4, 20, None, None),              # null value/priority
    (5, 30, 20.0, "3-MEDIUM"),
]
CUSTOMER = [(10, "alice"), (20, "bob"), (None, "ghost"), (40, "dana")]
LINEITEM = [
    (1, 1, 5, 3.0),
    (1, 2, 6, 4.0),
    (2, 1, None, 2.0),               # null value (partkey)
    (5, None, 5, None),              # null seq (linenumber)
    (None, 1, 7, 1.0),               # null key (orderkey)
]
PART = [(5, 41), (6, 45), (7, 50), (None, 60)]


@pytest.fixture(scope="module")
def edge_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("edge_kv_sf")
    frames = {
        "orders": (ORDERS, "o_orderkey long, o_custkey long,"
                   " o_totalprice double, o_orderpriority string"),
        "customer": (CUSTOMER, "c_custkey long, c_name string"),
        "lineitem": (LINEITEM, "l_orderkey long, l_linenumber long,"
                     " l_partkey long, l_quantity double"),
        "part": (PART, "p_partkey long, p_size long"),
    }
    for name, (rows, schema) in frames.items():
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite").parquet(str(d / f"{name}.parquet"))
    return str(d)


def _norm(v):
    if isinstance(v, float) and math.isnan(v):
        return "nan"
    return repr(v)


@pytest.mark.parametrize("name", KV_QUERIES)
def test_edge_kv_parity(spark, edge_dir, name):
    sql = entry_mod.oracle_sql()[name]
    con = duckdb.connect()
    try:
        for tbl in ("orders", "customer", "lineitem", "part"):
            con.execute(
                f"CREATE VIEW {tbl} AS SELECT * FROM "
                f"read_parquet('{edge_dir}/{tbl}.parquet/*.parquet')"
            )
        cur = con.execute(sql)
        ocols = [c[0] for c in cur.description]
        orows = cur.fetchall()
    finally:
        con.close()

    df = entry_mod.queries()[name](spark, edge_dir)
    srows = df.collect()
    assert sorted(df.columns) == sorted(ocols)
    assert len(srows) == len(orows), f"rowcount: {len(srows)} vs {len(orows)}"
    o_idx = [ocols.index(c) for c in sorted(ocols)]
    s_idx = [df.columns.index(c) for c in sorted(df.columns)]
    oset = sorted(tuple(_norm(r[i]) for i in o_idx) for r in orows)
    sset = sorted(tuple(_norm(r[i]) for i in s_idx) for r in srows)
    assert sset == oset, \
        f"first diff: {[p for p in zip(sset, oset) if p[0] != p[1]][:3]}"
