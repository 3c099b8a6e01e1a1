"""Edge-semantics tests for the as-of join and interval-overlap join
(timeseries.py) and the deterministic sketches (sketch.py) on crafted
frames — the oracle parity rows check corpus-level agreement; these pin
the boundary rules."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from resin_spark.operators import sketch, timeseries


def _events(spark, rows):
    # rows: (event_id, ts_seconds, user_id, event_type)
    data = [
        (eid, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s), uid, et, 0.0, "{}")
        for eid, s, uid, et in rows
    ]
    return {
        "events": spark.createDataFrame(
            data,
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        )
    }


def test_asof_join_tie_is_inclusive_and_no_future_match(spark):
    t = _events(spark, [
        (1, 100, 7, "click"),
        (2, 100, 7, "purchase"),   # same-instant click must match (<=)
        (3, 50, 8, "purchase"),    # click at 60 is in the future -> null
        (4, 60, 8, "click"),
        (5, 200, 8, "purchase"),   # now the 60s click is the latest prior
    ])
    out = {r["event_id"]: r for r in timeseries.asof_join(t).collect()}
    assert out[2]["right_ts"] == out[2]["left_ts"] and out[2]["gap_s"] == 0
    assert out[3]["right_ts"] is None and out[3]["gap_s"] is None
    assert out[5]["gap_s"] == 140
    assert set(out) == {2, 3, 5}   # only purchases emit rows


def test_asof_join_picks_latest_of_many(spark):
    t = _events(spark, [
        (1, 10, 1, "click"), (2, 20, 1, "click"), (3, 30, 1, "click"),
        (4, 25, 1, "purchase"),
    ])
    (row,) = timeseries.asof_join(t).collect()
    assert row["gap_s"] == 5   # the 20s click, not 10s


def test_session_overlap_boundaries(spark):
    # u1: one session [0, 60]; u2: session [60, 70] touches at the
    # closed boundary -> overlaps; u3: session starts 1h+31min later ->
    # no overlap (and also a separate later session)
    t = _events(spark, [
        (1, 0, 1, "view"), (2, 60, 1, "view"),
        (3, 60, 2, "view"), (4, 70, 2, "view"),
        (5, 60 + 91 * 60, 3, "view"),
    ])
    rows = {(r["user_id"], r["session_start"]): r["n_concurrent"]
            for r in timeseries.session_overlap(t).collect()}
    base = 1704067200  # 2024-01-01 epoch
    assert rows[(1, base + 0)] == 1
    assert rows[(2, base + 60)] == 1
    assert rows[(3, base + 60 + 91 * 60)] == 0


def test_kmv_exact_when_group_smaller_than_k(spark):
    t = _events(spark, [(i, i, i % 3, "click") for i in range(30)])
    (row,) = sketch.kmv_distinct(t).collect()
    assert row["n_exact"] == 3
    # fewer than k distinct hashes -> sketch degrades to the exact count
    assert row["kmv_estimate"] == 3.0


def test_price_quantiles_are_data_values(spark):
    li = spark.createDataFrame(
        [("A", float(v)) for v in [10, 20, 30, 40, 50]],
        "l_returnflag string, l_extendedprice double",
    )
    (row,) = sketch.price_quantiles({"lineitem": li}).collect()
    assert row["p50"] == 30.0 and row["p25"] == 20.0
    assert row["p95"] == 50.0
    assert row["n_rows"] == 5


def test_funnel_requires_strict_order(spark):
    # u1 completes in order; u2 has all three types but purchase BEFORE
    # click -> reaches step 2 only; u3 signup only
    t = _events(spark, [
        (1, 10, 1, "signup"), (2, 20, 1, "click"), (3, 30, 1, "purchase"),
        (4, 10, 2, "signup"), (5, 30, 2, "click"), (6, 20, 2, "purchase"),
        (7, 10, 3, "signup"),
    ])
    rows = {r["event_type"]: r["n_users"] for r in timeseries.funnel(t).collect()}
    assert rows == {"signup": 3, "click": 2, "purchase": 1}


def test_funnel_greedy_earliest_is_complete(spark):
    # signup@10, click@15, purchase@12: purchase before the click ->
    # step 3 NOT reached even though a purchase exists after signup
    t = _events(spark, [
        (1, 10, 1, "signup"), (2, 15, 1, "click"), (3, 12, 1, "purchase"),
    ])
    rows = {r["event_type"]: r["n_users"] for r in timeseries.funnel(t).collect()}
    assert rows == {"signup": 1, "click": 1, "purchase": 0}


def test_retention_offsets(spark):
    day = 86400
    t = _events(spark, [
        (1, 0, 1, "view"),            # u1 cohort day D
        (2, day + 5, 1, "view"),      # active D+1
        (3, 3 * day, 1, "view"),      # active D+3
        (4, day, 2, "view"),          # u2 cohort D+1, never returns
    ])
    rows = {(r["cohort_day"], r["offset_days"]): r["n_users"]
            for r in timeseries.retention(t).collect()}
    d0 = 1704067200 // 86400
    assert rows[(d0, 0)] == 1 and rows[(d0, 1)] == 1 and rows[(d0, 3)] == 1
    assert rows[(d0 + 1, 0)] == 1
    assert (d0 + 1, 1) not in rows


def test_funnel_rejects_repeated_steps(spark):
    """The pivoted single-scan funnel cannot represent a repeated event
    type; it must fail loudly, not emit ambiguous columns."""
    import pytest as _pytest

    with _pytest.raises(ValueError, match="distinct"):
        # validation fires before any table access
        timeseries.funnel({}, steps=("view", "click", "view"))


def test_session_overlap_adversarial_interval_mix(spark):
    """Mixed workload the adaptive p95 bucket width must survive: many
    2-minute web sessions interleaved with two 3-day-long sessions
    (dense 25-min-gap events). The bucketed equi-join + exact filter
    must equal a brute-force quadratic count over the session
    intervals, whatever width the p95 probe picks."""
    import datetime as dt

    from pyspark.sql import functions as F  # noqa: F811

    from resin_spark.operators import timeseries

    base = dt.datetime(2024, 1, 1)
    rows = []
    # 40 short users: 2-min sessions, paired starts 60 s apart so each
    # session overlaps its partner's
    for u in range(40):
        start = base + dt.timedelta(seconds=(u // 2) * 7200 + (u % 2) * 60)
        rows.append((u, start))
        rows.append((u, start + dt.timedelta(seconds=120)))
    # 2 long users: one 3-day session each (events every 25 min < the
    # 30-min gap, so gaps-and-islands keeps them whole)
    for u in (100, 101):
        for i in range(0, 3 * 24 * 60, 25):
            rows.append((u, base + dt.timedelta(minutes=i)))
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")

    got = {(r["user_id"], r["session_start"]): r["n_concurrent"]
           for r in timeseries.session_overlap({"events": ev}).collect()}

    sess = timeseries._sessions(ev).collect()
    want = {}
    for a in sess:
        n = sum(
            1 for b in sess
            if b["user_id"] != a["user_id"]
            and a["s_start"] <= b["s_end"] and b["s_start"] <= a["s_end"]
        )
        want[(a["user_id"], a["s_start"])] = n
    assert got == want
    # sanity on the adversarial shape itself: long sessions overlap
    # every short session (40) plus each other
    long_keys = [k for k in want if k[0] in (100, 101)]
    assert len(long_keys) == 2
    assert all(want[k] == 41 for k in long_keys)
