"""Events-table edge parity (the test_edge_docs.py pattern for block G):
boundary timestamps, tie rows, gap-threshold-exact spacing, malformed
JSON, funnel dead-ends — run through every events-based oracle-backed
query against DuckDB on the same crafted table.

The cases each row family pins:
- u1: a single-event user (singleton session, day-0-only cohort).
- u2: events EXACTLY 30 min apart (gap == threshold must NOT split; the
  rule is strictly-greater) then 30 min + 1 s (must split).
- u3: a click and a purchase at the IDENTICAL microsecond (as-of tie is
  inclusive; sessionize tie-breaks on event_id), plus malformed props.
- u4: a purchase with no prior click ever (as-of null arm), null props.
- u5: events at 04:59:59.999999 / 05:00:00.000000 (hour-window edge;
  unix_timestamp FLOORS on Spark, floor(epoch()) on DuckDB).
- u6: a full signup->click->purchase funnel plus a day-7 return
  (retention offset), and an 'error' type outside every step list.
"""

from __future__ import annotations

import datetime as dt
import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

EVENT_QUERIES = [
    "events_hourly_rollup", "events_sessionize", "events_props_json",
    "events_asof_join", "session_overlap", "events_gap_fill",
    "events_moving_agg", "events_funnel", "events_retention",
    "kmv_distinct", "hll_distinct",
]

B = dt.datetime(2024, 1, 1)


def _t(**kw):
    return B + dt.timedelta(**kw)


EDGE_EVENTS = [
    # (event_id, ts, user_id, event_type, value, props)
    (0, _t(), 1, "signup", 1.0, '{"k": 42}'),
    (1, _t(hours=1), 2, "click", 0.0, "{}"),
    (2, _t(hours=1, minutes=30), 2, "click", -3.21, '{"k": null}'),
    (3, _t(hours=2, seconds=1), 2, "click", 5.5, '{"j": 5}'),
    (4, _t(hours=3, minutes=15, seconds=30, microseconds=500000), 3,
     "click", 2.25, "{k:"),
    (5, _t(hours=3, minutes=15, seconds=30, microseconds=500000), 3,
     "purchase", 9.99, '{"k": 7}'),
    (6, _t(hours=4), 4, "purchase", 100.0, None),
    (7, _t(hours=4, minutes=59, seconds=59, microseconds=999999), 5,
     "view", 12.3456, '{"k": 1}'),
    (8, _t(hours=5), 5, "view", 0.0001, '{"k": 2}'),
    (9, _t(hours=6), 6, "signup", 1.0, '{"k": 3}'),
    (10, _t(hours=6, seconds=30), 6, "click", 1.0, '{"k": 4}'),
    (11, _t(hours=6, minutes=1), 6, "purchase", 50.0, '{"k": 5}'),
    (12, _t(days=7, hours=6), 6, "click", 1.0, '{"k": 6}'),
    (13, _t(hours=7), 7, "error", -1.0, '{"k": -9}'),
    # corrupt-ingest rows: the ts/user_id-keyed operators drop them
    # explicitly (engines disagree on null ordering/grouping); the
    # others must still agree with nulls present
    (14, None, 1, "click", 3.0, '{"k": 30}'),          # null ts
    (15, _t(hours=8), None, "purchase", 4.0, '{"k": 31}'),  # null user_id
    (16, _t(hours=8, minutes=5), 2, None, 5.0, '{"k": 32}'),  # null type
    (17, _t(hours=8, minutes=10), 2, "click", None, '{"k": 33}'),  # null value
]


@pytest.fixture(scope="module")
def edge_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("edge_events_sf")
    df = spark.createDataFrame(
        EDGE_EVENTS,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(d / "events.parquet"))
    return str(d)


def _norm(v):
    if isinstance(v, float) and math.isnan(v):
        return "nan"
    return repr(v)


@pytest.mark.parametrize("name", EVENT_QUERIES)
def test_edge_events_parity(spark, edge_dir, name):
    sql = entry_mod.oracle_sql()[name]
    con = duckdb.connect()
    try:
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{edge_dir}/events.parquet/*.parquet')"
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


def test_gap_threshold_is_strictly_greater(spark, edge_dir):
    """u2's 1800-second spacing must NOT split the session; the
    1801-second one must."""
    from resin_spark.io import load_tables
    from resin_spark.streaming import events as ev

    rows = {(r["user_id"], r["session_id"]): r["n_events"]
            for r in ev.sessionize(load_tables(spark, edge_dir)).collect()}
    assert rows[(2, 1)] == 2   # 01:00 + 01:30 together
    assert rows[(2, 2)] == 1   # 02:00:01 alone
