"""End-to-end corpus release gate — the pre-training QA sweep a data
team runs on a candidate snapshot before mixture weights and shards are
cut, composed from the library APIs exactly as a user would:

  candidate snapshot arrives
    → profile_drift vs the previous release       (schema/null drift?)
    → encoding_anomalies                          (damage per source)
    → cdc_chunk_stats                             (copied-passage mass)
    → source_overlap_matrix                       (independence check)
    → mixture_plan on the docs that survive the gates

Each operator is individually oracle/pytest-checked elsewhere; this
test pins that they COMPOSE — schemas, filters and the gate arithmetic
line up across the whole sweep."""

from __future__ import annotations

from pyspark.sql import functions as F

from resin_spark.io import load_tables
from resin_spark.operators import health, pipeline, traindata as td

SF = "/root/testdata/sf0.001"


def test_release_gate_sweep(spark):
    prev = load_tables(spark, SF)["documents"] \
        .filter(F.col("doc_id").isNotNull())
    # candidate = previous release + injected encoding damage (what a
    # broken transcoder upstream would deliver)
    cand = health.corrupt_demo_docs(prev).localCheckpoint()

    # 1) drift gate: same columns minus n_chars (corrupt_demo_docs
    #    drops it) — the drift report must flag exactly that and show
    #    no null-share movement on surviving columns
    drift = {r["col_name"]: r
             for r in health.profile_drift(prev, cand).collect()}
    assert drift["n_chars"]["n_rows_new"] is None
    for c in ("doc_id", "text", "lang", "source"):
        assert drift[c]["null_share_delta"] == 0.0

    # 2) anomaly gate: the injected damage is visible in every source
    #    (mods 7/11/13 hit each 25-doc source) and bounded (< half)
    anom = health.encoding_anomalies(cand).collect()
    assert all(0 < r["n_flagged"] <= r["n_docs"] // 2 for r in anom)
    flagged_sources = {r["source"] for r in anom
                       if r["flagged_share"] > 0.25}

    # 3) clean subset = drop flagged docs (the per-doc flags relation
    #    drives the filter, as a pipeline would)
    flags = health.encoding_anomaly_flags(cand)
    bad_ids = flags.filter(
        F.col("n_repl") + F.col("n_ctrl") + F.col("n_moji") > 0
    ).select("doc_id")
    clean = cand.join(bad_ids, "doc_id", "left_anti").localCheckpoint()
    n_clean = clean.count()
    assert 0 < n_clean < cand.count()
    assert health.encoding_anomalies(clean).agg(
        F.sum("n_flagged")).collect()[0][0] == 0

    # 4) chunk-dedup accounting runs on the clean subset and its totals
    #    are self-consistent
    chunks = td.cdc_chunk_stats({"documents": clean}).collect()
    assert len(chunks) == n_clean
    assert all(0 <= r["n_dup_chunks"] <= r["n_chunks"] for r in chunks)

    # 5) independence + mixture over the survivors: every source pair
    #    reported, every clean source planned within the budget
    n_sources = clean.select("source").distinct().count()
    overlap = health.source_overlap_matrix(clean).collect()
    assert len(overlap) == n_sources * (n_sources - 1) // 2
    plan = pipeline.mixture_plan(clean, budget=100_000).collect()
    assert len(plan) == n_sources
    assert sum(r["planned_tokens"] for r in plan) <= 100_000
    assert abs(sum(r["temp_share"] for r in plan) - 1.0) < 1e-9
    # the gate composes: sources the anomaly gate flagged hardest still
    # appear in the plan (dropping docs, not sources)
    assert flagged_sources <= {r["source"] for r in plan}
