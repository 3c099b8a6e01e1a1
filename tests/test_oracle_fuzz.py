"""Hypothesis-driven oracle fuzz for the staged closing-r6 ops.

The driver gate and the edge battery compare Spark vs DuckDB on FIXED
corpora; this fuzzes the comparison over generated corpora — random
doc sets with punctuation, repeated texts, unicode, empty and null
rows — so cross-engine semantics holes (NULL ordering, boundary ties,
integer-division edges) surface on inputs nobody hand-picked. The
length_histogram NULL-ordering bug this session was exactly this class
of hole, found by the fixed edge corpus; the fuzz widens the net.

Examples are few and small (Spark roundtrip per example costs
seconds); the properties do the work, not the volume.
"""

from __future__ import annotations

import math

import duckdb
import pytest
from hypothesis import given, settings, strategies as st

pytestmark = pytest.mark.full_suite  # the per-operator fuzz batteries: full tier only (VERDICT r11 item 1)



def _norm(v):
    if isinstance(v, float) and math.isnan(v):
        return "nan"
    return repr(v)


def _compare_on(spark, tmpdir, rows, fn, sql):
    """Driver-mirror comparison of a demo fn vs its oracle on a
    generated documents table (documents-only view set)."""
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string")
    path = f"{tmpdir}/documents.parquet"
    df.coalesce(1).write.mode("overwrite").parquet(path)

    con = duckdb.connect()
    try:
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{path}/*.parquet')")
        cur = con.execute(sql)
        ocols = [c[0] for c in cur.description]
        orows = cur.fetchall()
    finally:
        con.close()

    out = fn({"documents": spark.read.parquet(path)})
    srows = out.collect()
    assert sorted(out.columns) == sorted(ocols)
    assert len(srows) == len(orows)
    o_idx = [ocols.index(c) for c in sorted(ocols)]
    s_idx = [out.columns.index(c) for c in sorted(out.columns)]
    oset = sorted(tuple(_norm(r[i]) for i in o_idx) for r in orows)
    sset = sorted(tuple(_norm(r[i]) for i in s_idx) for r in srows)
    assert sset == oset, \
        f"first diff: {[p for p in zip(sset, oset) if p[0] != p[1]][:2]}"


_WORDS = ["alpha", "beta", "gamma", "the", "a", "x1", "７漢", "café",
          "...", "a.b.c", ""]

doc_corpus = st.lists(
    st.tuples(
        st.integers(0, 50),
        st.one_of(st.none(),
                  st.lists(st.sampled_from(_WORDS), max_size=20)
                  .map(" ".join)),
        st.sampled_from(["en", "de"]),
        st.sampled_from(["s0", "s1", "s2"]),
    ),
    min_size=1, max_size=15, unique_by=lambda r: r[0],
)


@given(doc_corpus)
@settings(max_examples=5, deadline=None)
def test_fuzz_length_histogram_oracle(spark, tmp_path_factory, rows):
    from resin_spark.operators import health

    _compare_on(spark, tmp_path_factory.mktemp("fz_hist"), rows,
                health.length_histogram_demo,
                health.length_histogram_demo_oracle())


@given(doc_corpus)
@settings(max_examples=5, deadline=None)
def test_fuzz_vocab_coverage_oracle(spark, tmp_path_factory, rows):
    from resin_spark.operators import health

    _compare_on(spark, tmp_path_factory.mktemp("fz_cov"), rows,
                health.vocab_coverage_demo,
                health.vocab_coverage_demo_oracle())


@given(doc_corpus)
@settings(max_examples=5, deadline=None)
def test_fuzz_chunk_documents_oracle(spark, tmp_path_factory, rows):
    from resin_spark.operators import pipeline

    _compare_on(spark, tmp_path_factory.mktemp("fz_chunk"), rows,
                pipeline.chunk_documents_demo,
                pipeline.chunk_documents_oracle())


@given(doc_corpus)
@settings(max_examples=4, deadline=None)
def test_fuzz_threshold_curve_oracle(spark, tmp_path_factory, rows):
    from resin_spark.operators import dedup

    _compare_on(spark, tmp_path_factory.mktemp("fz_curve"), rows,
                dedup.dedup_threshold_curve_demo,
                dedup.dedup_threshold_curve_oracle())


_VECS = st.one_of(
    st.none(),
    st.lists(st.sampled_from([0.0, 1.0, -1.0, 0.5, float("nan"), 2.5]),
             min_size=3, max_size=3),
)

emb_corpus = st.lists(
    st.tuples(st.integers(0, 50), _VECS, st.integers(0, 2)),
    min_size=1, max_size=12, unique_by=lambda r: r[0],
)


@given(doc_corpus, emb_corpus)
@settings(max_examples=5, deadline=None)
def test_fuzz_hybrid_search_oracle(spark, tmp_path_factory, rows, vecs):
    """RRF fusion over random corpora AND random embeddings including
    NaN / zero-norm / NULL vectors — the valid-vector gates and rank
    tie-breaks must agree cross-engine on inputs nobody hand-picked."""
    from resin_spark.operators import retrieval

    tmpdir = tmp_path_factory.mktemp("fz_hyb")
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string")
    emb = spark.createDataFrame(
        vecs, "vec_id long, embedding array<float>, label int")
    dpath, epath = f"{tmpdir}/documents.parquet", f"{tmpdir}/embeddings.parquet"
    docs.coalesce(1).write.mode("overwrite").parquet(dpath)
    emb.coalesce(1).write.mode("overwrite").parquet(epath)

    sql = retrieval.hybrid_search_oracle()
    con = duckdb.connect()
    try:
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{dpath}/*.parquet')")
        con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                    f"read_parquet('{epath}/*.parquet')")
        cur = con.execute(sql)
        ocols = [c[0] for c in cur.description]
        orows = cur.fetchall()
    finally:
        con.close()

    out = retrieval.hybrid_search_demo(
        {"documents": spark.read.parquet(dpath),
         "embeddings": spark.read.parquet(epath)})
    srows = out.collect()
    assert sorted(out.columns) == sorted(ocols)
    assert len(srows) == len(orows)
    o_idx = [ocols.index(c) for c in sorted(ocols)]
    s_idx = [out.columns.index(c) for c in sorted(out.columns)]
    oset = sorted(tuple(_norm(r[i]) for i in o_idx) for r in orows)
    sset = sorted(tuple(_norm(r[i]) for i in s_idx) for r in srows)
    assert sset == oset, \
        f"first diff: {[p for p in zip(sset, oset) if p[0] != p[1]][:2]}"


# --- fuzz the most intricate DRIVER entries (documents-only) ------------------
# The edge battery runs these on one fixed adversarial corpus; the fuzz
# runs them on generated ones. A hole found here (vs at the round gate)
# is a re-window with time to spare.

_DRIVER_FUZZ = ["pack_sequences", "epoch_shuffle",
                "term_cooccurrence", "filter_funnel", "lang_stats"]


@pytest.mark.parametrize("name", _DRIVER_FUZZ)
@given(rows=doc_corpus)
@settings(max_examples=4, deadline=None)
def test_fuzz_driver_entry_oracle(spark, tmp_path_factory, name, rows):
    import __spark_entry__ as entry_mod

    tmpdir = tmp_path_factory.mktemp(f"fz_{name}")
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string")
    df = df.withColumn("n_chars",
                       F_length_or_zero(df))
    path = f"{tmpdir}/documents.parquet"
    df.coalesce(1).write.mode("overwrite").parquet(path)

    # merged with the retired registries: retirement trades driver
    # slots, never fuzz coverage (filter_funnel/lang_stats retired r9)
    sql = {**entry_mod.oracle_sql(), **entry_mod.retired_oracle_sql()}[name]
    con = duckdb.connect()
    try:
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{path}/*.parquet')")
        cur = con.execute(sql)
        ocols = [c[0] for c in cur.description]
        orows = cur.fetchall()
    finally:
        con.close()

    out = {**entry_mod.queries(),
           **entry_mod.retired_queries()}[name](spark, str(tmpdir))
    srows = out.collect()
    assert sorted(out.columns) == sorted(ocols)
    assert len(srows) == len(orows)
    o_idx = [ocols.index(c) for c in sorted(ocols)]
    s_idx = [out.columns.index(c) for c in sorted(out.columns)]
    oset = sorted(tuple(_norm(r[i]) for i in o_idx) for r in orows)
    sset = sorted(tuple(_norm(r[i]) for i in s_idx) for r in srows)
    assert sset == oset, \
        f"{name} first diff: {[p for p in zip(sset, oset) if p[0] != p[1]][:2]}"


def F_length_or_zero(df):
    from pyspark.sql import functions as F

    return F.coalesce(F.length("text"), F.lit(0)).cast("long")


def test_corpus_stats_zero_token_corpus_survives(spark, tmp_path_factory):
    """Regression (r6 fuzz find, fixed r7): a corpus whose every doc
    tokenizes to nothing used to ABORT under ANSI in corpus_stats'
    bare type_token_ratio division; try_divide now reports NULL."""
    import __spark_entry__ as entry_mod

    tmpdir = tmp_path_factory.mktemp("fz_cs0")
    spark.createDataFrame(
        [(0, None, "en", "s0", 0)],
        "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(f"{tmpdir}/documents.parquet")
    entry_mod.retired_queries()["corpus_stats"](spark, str(tmpdir)).collect()


# --- degenerate full-dataset holes (all tail entries; fixes come due
# with their r7 window checks — each pin XPASSes when its fix lands) ----------

@pytest.fixture(scope="module")
def degen_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("degen_sf")
    spark.createDataFrame(
        [(0, None, None, None, None), (1, "", "en", "s0", 0)],
        "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(f"{d}/documents.parquet")
    spark.createDataFrame(
        [(0, None, None)], "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.parquet(f"{d}/embeddings.parquet")
    return str(d)


@pytest.mark.parametrize("name,reason", [
    ("domain_mix",
     "r6 hole, fixed r7: bare n_tokens/total_tokens aborted under "
     "ANSI on a zero-token corpus — now try_divide + NULLIF"),
    ("mm_binary_meta",
     "r6 hole, fixed r7: with_payload kept NULL text as NULL payload "
     "and the Arrow UDF md5(None) threw — now coalesced to b'', "
     "mirrored in the oracle"),
    ("dedup_incremental_indexed",
     "r6 hole, fixed r7: write_dedup_index over zero shingle-able "
     "docs wrote no part files and the read died in schema inference "
     "— the store now carries a stats row and round-trips typed-empty"),
])
def test_degenerate_dataset_survives(spark, degen_dir, name, reason):
    import __spark_entry__ as entry_mod

    # retirement (§6) moves an entry's registration, not its coverage:
    # regression subjects are looked up across BOTH registries
    reg = {**entry_mod.queries(), **entry_mod.retired_queries()}
    reg[name](spark, degen_dir).collect()


# --- overtime-r6 staged ops: split governance + quality curve ------------------


def _compare_on_chars(spark, tmpdir, rows, fn, sql):
    """_compare_on with the n_chars column the split cards read."""
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string")
    df = df.withColumn("n_chars", F_length_or_zero(df))
    path = f"{tmpdir}/documents.parquet"
    df.coalesce(1).write.mode("overwrite").parquet(path)

    con = duckdb.connect()
    try:
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{path}/*.parquet')")
        cur = con.execute(sql)
        ocols = [c[0] for c in cur.description]
        orows = cur.fetchall()
    finally:
        con.close()

    out = fn({"documents": spark.read.parquet(path)})
    srows = out.collect()
    assert sorted(out.columns) == sorted(ocols)
    assert len(srows) == len(orows)
    o_idx = [ocols.index(c) for c in sorted(ocols)]
    s_idx = [out.columns.index(c) for c in sorted(out.columns)]
    oset = sorted(tuple(_norm(r[i]) for i in o_idx) for r in orows)
    sset = sorted(tuple(_norm(r[i]) for i in s_idx) for r in srows)
    assert sset == oset, \
        f"first diff: {[p for p in zip(sset, oset) if p[0] != p[1]][:2]}"


@given(doc_corpus)
@settings(max_examples=4, deadline=None)
def test_fuzz_dataset_split_oracle(spark, tmp_path_factory, rows):
    from resin_spark.operators import pipeline

    _compare_on_chars(spark, tmp_path_factory.mktemp("fz_split"), rows,
                      pipeline.dataset_split_demo,
                      pipeline.dataset_split_demo_oracle())


@given(doc_corpus)
@settings(max_examples=4, deadline=None)
def test_fuzz_split_leakage_oracle(spark, tmp_path_factory, rows):
    from resin_spark.operators import pipeline

    _compare_on_chars(spark, tmp_path_factory.mktemp("fz_leak"), rows,
                      pipeline.split_leakage_demo,
                      pipeline.split_leakage_demo_oracle())


@given(doc_corpus)
@settings(max_examples=4, deadline=None)
def test_fuzz_cluster_split_oracle(spark, tmp_path_factory, rows):
    """Random corpora with repeated texts exercise the component loop
    AND the recursive-CTE closure on graphs nobody hand-picked."""
    from resin_spark.operators import pipeline

    _compare_on_chars(spark, tmp_path_factory.mktemp("fz_csplit"), rows,
                      pipeline.cluster_split_demo,
                      pipeline.cluster_split_demo_oracle())


@given(doc_corpus)
@settings(max_examples=4, deadline=None)
def test_fuzz_mixture_plan_oracle(spark, tmp_path_factory, rows):
    from resin_spark.operators import pipeline

    _compare_on(spark, tmp_path_factory.mktemp("fz_mixplan"), rows,
                pipeline.mixture_plan_demo,
                pipeline.mixture_plan_demo_oracle())


@given(doc_corpus)
@settings(max_examples=4, deadline=None)
def test_fuzz_apply_mixture_oracle(spark, tmp_path_factory, rows):
    from resin_spark.operators import pipeline

    _compare_on(spark, tmp_path_factory.mktemp("fz_mixapply"), rows,
                pipeline.apply_mixture_demo,
                pipeline.apply_mixture_demo_oracle())


def test_mixture_all_null_text_source_plans_zero(spark, tmp_path_factory):
    """Deep-fuzz seed 2007 regression: a source whose EVERY text is
    NULL has NULL token sums — the plan must say planned_tokens=0 (the
    engine's documented coalesce) on BOTH engines, not NULL on one."""
    from resin_spark.operators import pipeline

    rows = [
        (1, "alpha beta gamma delta", "en", "s0"),
        (2, None, "en", "s1"),          # the all-NULL source
        (3, "the quick brown fox", "de", "s2"),
        (4, None, "de", "s1"),
    ]
    _compare_on(spark, tmp_path_factory.mktemp("fz_mixnull"), rows,
                pipeline.mixture_plan_demo,
                pipeline.mixture_plan_demo_oracle())
    _compare_on(spark, tmp_path_factory.mktemp("fz_mixnull2"), rows,
                pipeline.apply_mixture_demo,
                pipeline.apply_mixture_demo_oracle())
    t = {"documents": spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string")}
    plan = {r["source"]: r for r in pipeline.mixture_plan_demo(t).collect()}
    assert plan["s1"]["planned_tokens"] == 0
    assert plan["s1"]["sampling_rate"] is None
    assert plan["s1"]["n_epochs"] is None


def test_funnel_all_null_lang_survivors(spark, tmp_path_factory):
    """Deep-fuzz seed 2604 regression (multi-line staged fuzz, first
    run): when EVERY doc reaching the langid stage has NULL lang, the
    s3 flag column is all-NULL — F.sum over it returned NULL where the
    oracle's CASE WHEN folds each row to 0, so docs_out/docs_dropped
    diverged (and dataset_card_typed, which nests the funnel, with
    them). filter_funnel now coalesces s3 to false: NULL lang is a
    langid FAIL, stated."""
    from resin_spark.operators import pipeline

    rows = [
        # survives length+repetition, lang NULL -> langid must DROP it
        (65, "... \t x1 &amp;  \t merge window delta café"
             "\nall rights reserved", None, "s0"),
    ]
    _compare_on(spark, tmp_path_factory.mktemp("fz_funnel_nl"), rows,
                lambda t: pipeline.filter_funnel(t),
                pipeline.filter_funnel_oracle())
    _compare_on_chars(spark, tmp_path_factory.mktemp("fz_card_nl"),
                      rows, pipeline.dataset_card_typed,
                      pipeline.dataset_card_typed_oracle())
    t = {"documents": spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string")}
    funnel = {r["stage_name"]: r for r in pipeline.filter_funnel(t).collect()}
    assert funnel["langid"]["docs_out"] == 0
    assert funnel["langid"]["docs_dropped"] == 1
    assert funnel["dedup"]["docs_in"] == 0 and funnel["dedup"]["docs_out"] == 0


@given(doc_corpus)
@settings(max_examples=4, deadline=None)
def test_fuzz_search_facets_oracle(spark, tmp_path_factory, rows):
    from resin_spark.operators import textops

    _compare_on(spark, tmp_path_factory.mktemp("fz_facets"), rows,
                textops.search_facets,
                textops.search_facets_oracle())


@given(doc_corpus)
@settings(max_examples=4, deadline=None)
def test_fuzz_shard_manifest_oracle(spark, tmp_path_factory, rows):
    from resin_spark.operators import traindata

    _compare_on_chars(spark, tmp_path_factory.mktemp("fz_manifest"), rows,
                      traindata.shard_manifest,
                      traindata.shard_manifest_oracle())


@given(doc_corpus)
@settings(max_examples=4, deadline=None)
def test_fuzz_perplexity_curve_oracle(spark, tmp_path_factory, rows):
    from resin_spark.operators import traindata

    _compare_on(spark, tmp_path_factory.mktemp("fz_ppl"), rows,
                traindata.perplexity_threshold_curve,
                traindata.perplexity_threshold_curve_oracle())


def _some_valid(vecs):
    return any(v is not None and not any(math.isnan(x) for x in v)
               for _, v, _ in vecs)


@given(emb_corpus)
@settings(max_examples=5, deadline=None)
def test_fuzz_semantic_split_leakage_oracle(spark, tmp_path_factory, vecs):
    """NaN / zero-norm / NULL vectors against the D5 valid-vector and
    zero-norm gates, then split labelling — both engines must agree on
    which pairs exist AND how they label. Includes corpora where EVERY
    vector is invalid — the class that used to crash
    broadcast_unit_matrix before the r7 empty-matrix guard."""
    from resin_spark.operators import pipeline

    tmpdir = tmp_path_factory.mktemp("fz_semleak")
    emb = spark.createDataFrame(
        vecs, "vec_id long, embedding array<float>, label int")
    epath = f"{tmpdir}/embeddings.parquet"
    emb.coalesce(1).write.mode("overwrite").parquet(epath)

    sql = pipeline.semantic_split_leakage_oracle()
    con = duckdb.connect()
    try:
        con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                    f"read_parquet('{epath}/*.parquet')")
        cur = con.execute(sql)
        ocols = [c[0] for c in cur.description]
        orows = cur.fetchall()
    finally:
        con.close()

    out = pipeline.semantic_split_leakage_demo(
        {"embeddings": spark.read.parquet(epath)})
    srows = out.collect()
    assert sorted(out.columns) == sorted(ocols)
    assert len(srows) == len(orows)
    o_idx = [ocols.index(c) for c in sorted(ocols)]
    s_idx = [out.columns.index(c) for c in sorted(out.columns)]
    oset = sorted(tuple(_norm(r[i]) for i in o_idx) for r in orows)
    sset = sorted(tuple(_norm(r[i]) for i in s_idx) for r in srows)
    assert sset == oset, \
        f"first diff: {[p for p in zip(sset, oset) if p[0] != p[1]][:2]}"


def test_all_invalid_embeddings_survive(spark):
    """Regression (r6 fuzz find, fixed r7): a corpus where EVERY
    embedding is NULL/NaN used to crash broadcast_unit_matrix with a
    numpy AxisError; the empty-matrix guard must yield empty pair
    relations instead."""
    from resin_spark.operators import dedup, pipeline

    emb = spark.createDataFrame(
        [(0, None, 0), (1, [float("nan"), 0.0, 0.0], 1)],
        "vec_id long, embedding array<float>, label int")
    assert dedup.embedding_dedup_pairs(emb).collect() == []
    assert pipeline.semantic_split_leakage(emb).collect() == []


# --- overtime-r6 relational shapes: q4 semi / q22 anti + scalar boundary --------

_BALS = [0.0, -1.5, 10.25, 10.26, 100.0, 3333.33, None]

rel_corpus = st.tuples(
    st.lists(st.tuples(st.integers(0, 30),          # c_custkey (unique)
                       st.integers(0, 4),           # c_nationkey
                       st.sampled_from(_BALS)),     # c_acctbal
             min_size=1, max_size=12, unique_by=lambda r: r[0]),
    st.lists(st.integers(0, 30), min_size=0, max_size=10),  # o_custkey refs
)


@given(rel_corpus)
@settings(max_examples=5, deadline=None)
def test_fuzz_q22_scalar_boundary_oracle(spark, tmp_path_factory, data):
    """The Q22 threshold is a float comparison against a computed mean —
    the exactness claim is that the decimal-exact-sum/count mean lands
    the SAME IEEE double on both engines, so boundary customers (balances
    engineered near plausible means) decide identically."""
    from resin_spark.plans import tpch

    cust_rows, order_refs = data
    tmpdir = tmp_path_factory.mktemp("fz_q22")
    cust = spark.createDataFrame(
        [(k, f"c{k}", n, b, "SEG") for k, n, b in cust_rows],
        "c_custkey long, c_name string, c_nationkey long, "
        "c_acctbal double, c_mktsegment string")
    orders = spark.createDataFrame(
        [(i, k, "O", 1.0, None, "1-URGENT") for i, k in enumerate(order_refs)],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string")
    cpath, opath = f"{tmpdir}/customer.parquet", f"{tmpdir}/orders.parquet"
    cust.coalesce(1).write.mode("overwrite").parquet(cpath)
    orders.coalesce(1).write.mode("overwrite").parquet(opath)

    sql = tpch.q22_oracle()
    con = duckdb.connect()
    try:
        con.execute(f"CREATE VIEW customer AS SELECT * FROM "
                    f"read_parquet('{cpath}/*.parquet')")
        con.execute(f"CREATE VIEW orders AS SELECT * FROM "
                    f"read_parquet('{opath}/*.parquet')")
        cur = con.execute(sql)
        ocols = [c[0] for c in cur.description]
        orows = cur.fetchall()
    finally:
        con.close()

    out = tpch.q22_idle_customers(
        {"customer": spark.read.parquet(cpath),
         "orders": spark.read.parquet(opath)})
    srows = out.collect()
    assert sorted(out.columns) == sorted(ocols)
    assert len(srows) == len(orows)
    o_idx = [ocols.index(c) for c in sorted(ocols)]
    s_idx = [out.columns.index(c) for c in sorted(out.columns)]
    oset = sorted(tuple(_norm(r[i]) for i in o_idx) for r in orows)
    sset = sorted(tuple(_norm(r[i]) for i in s_idx) for r in srows)
    assert sset == oset, \
        f"first diff: {[p for p in zip(sset, oset) if p[0] != p[1]][:2]}"


def test_quality_perplexity_decimal_tie_crossengine(spark, tmp_path_factory):
    """Regression (deep_fuzz_driver seed 7106, fixed r7): F.round(davg, s)
    diverged cross-engine on EXACT DECIMAL TIES — a 2-token doc whose
    6-dp bit costs sum to an odd multiple of 1e-6 means the mean is
    exactly between two 6-dp decimals; Java rounded the shortest-decimal
    rep half-up while DuckDB rounded the binary double, which sits just
    below the tie. exact.dravg/dravg_sql now decide the tie in integer
    arithmetic (half-away-from-zero) on both engines; this corpus must
    stay hash-identical."""
    import os
    import random
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    from deep_fuzz_driver import _corpus

    import __spark_entry__ as entry_mod

    rows = _corpus(random.Random(7106))
    tmpdir = tmp_path_factory.mktemp("fz_tie")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
        "n_chars long").coalesce(1).write.mode("overwrite").parquet(
        f"{tmpdir}/documents.parquet")
    con = duckdb.connect()
    try:
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{tmpdir}/documents.parquet/*.parquet')")
        orows = con.execute(
            entry_mod.oracle_sql()["quality_perplexity"]).fetchall()
    finally:
        con.close()
    srows = entry_mod.queries()["quality_perplexity"](
        spark, str(tmpdir)).collect()
    oset = sorted(tuple(_norm(v) for v in r) for r in orows)
    sset = sorted(tuple(_norm(v) for v in r) for r in srows)
    assert sset == oset, \
        [p for p in zip(sset, oset) if p[0] != p[1]][:3]


# --- r7 relational deep-fuzz finds (tools/deep_fuzz_rel.py) -------------------
# Three degenerate-input divergence classes in FROZEN r6-cohort tail
# entries; per the window contract each is strict-xfail-pinned here and
# fixed in r8 when that cohort's rotation check is due (zero slot
# cost). Driver data never triggers any of them (no NULL user_id/ts,
# props.k always an integer — 7 driver rounds green).


def _rel_corpus_dir(spark, tmpdir, seed):
    import os
    import random
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    from deep_fuzz_rel import gen_tables

    tables = gen_tables(random.Random(seed))
    for name, (rows, schema) in tables.items():
        spark.createDataFrame(rows, schema).coalesce(1) \
            .write.mode("overwrite").parquet(f"{tmpdir}/{name}.parquet")
    return str(tmpdir), sorted(tables)


def _rel_compare(spark, tmpdir, seed, name):
    import __spark_entry__ as entry_mod

    d, tbls = _rel_corpus_dir(spark, tmpdir, seed)
    con = duckdb.connect()
    try:
        for tbl in tbls:
            con.execute(f"CREATE VIEW {tbl} AS SELECT * FROM "
                        f"read_parquet('{d}/{tbl}.parquet/*.parquet')")
        cur = con.execute(entry_mod.oracle_sql()[name])
        ocols = [c[0] for c in cur.description]
        orows = cur.fetchall()
    finally:
        con.close()
    out = entry_mod.queries()[name](spark, d)
    srows = out.collect()
    assert sorted(out.columns) == sorted(ocols)
    o_idx = [ocols.index(c) for c in sorted(ocols)]
    s_idx = [out.columns.index(c) for c in sorted(out.columns)]
    oset = sorted(tuple(_norm(r[i]) for i in o_idx) for r in orows)
    sset = sorted(tuple(_norm(r[i]) for i in s_idx) for r in srows)
    assert sset == oset, \
        f"{name} first diff: {[p for p in zip(sset, oset) if p[0] != p[1]][:3]}"


@pytest.mark.parametrize("seed", [9000, 9106])
def test_price_quantiles_null_prices_match_percentile_disc(
        spark, tmp_path_factory, seed):
    """Regression (r7 rel-fuzz, fixed r7 — price_quantiles was in the
    r7 window): NULL l_extendedprice rows used to occupy window ranks
    (Spark ASC = NULLS FIRST), shifting every quantile position, while
    percentile_disc skips NULLs; the rank window now runs over the
    non-NULL subset and an all-NULL group reports NULL quantiles.

    r8 (ADVICE): _FLAGS now generates NULL l_returnflag, and the
    counts-to-quantiles join is NULL-SAFE — a plain equi-join dropped
    the NULL-flag group's quantiles where both engines' GROUP BY keeps
    the group. Seed 9000 = NULL-flag group with real prices; 9106 =
    NULL-flag group whose every price is NULL (scanned classes under
    the r8 generator)."""
    _rel_compare(spark, tmp_path_factory.mktemp("relq"), seed,
                 "price_quantiles")


@pytest.mark.parametrize("seed,name,reason", [
    (9000, "events_props_json",
     "props.k values that are JSON strings (or fractional numbers) used "
     "to diverge: Spark get_json_object+cast yielded NULL, DuckDB "
     "CAST(json_extract(...) AS BIGINT) THREW. Fixed r8: both sides "
     "gate on the integral ^-?digits$ shape and try_cast only that "
     "(native casts still disagree on '3.5' — Spark truncates, DuckDB "
     "TRY_CAST rounds — so the shared gate is the only exact mirror)."),
    (9001, "events_asof_join",
     "NULL user_id rows formed ONE window partition in the engine (NULL "
     "purchases matched NULL clicks) and NULL ts rows sorted NULLS-FIRST "
     "into the carry-forward, while the oracle's ASOF equi-join drops "
     "NULL keys. Fixed r8: the union-window runs over non-NULL "
     "(user_id, ts) only and the excluded left rows union back with "
     "matched=NULL (the _sessions adjudication applied to the as-of "
     "shape)."),
    (9201, "events_asof_join",
     "second r8 find, same day: DuckDB's ASOF sort machinery treats a "
     "NULL probe ts as +inf and matched a NULL-ts purchase to the "
     "user's LATEST click, violating the adjudicated 'NULL keys never "
     "match' semantic (and SQL's own b.ts <= NULL). Fixed by stating "
     "the adjudication explicitly in the ORACLE: NULL-keyed left rows "
     "are excluded from the ASOF and unioned back unmatched."),
    (9001, "events_funnel",
     "a NULL user_id survived the engine's groupBy/pivot chain as a "
     "countable 'user' at every step, but the oracle's step-k JOIN "
     "USING (user_id) dropped it after step 0. Fixed r8: NULL user_id "
     "filtered on BOTH sides (a NULL user is not a user — the "
     "_sessions adjudication)."),
    (9003, "agg_rollup",
     "Spark's rollup() over an EMPTY relation yields zero rows, while "
     "SQL-standard GROUP BY ROLLUP (DuckDB) emits the grand-total "
     "grouping-set row (COUNT=0) even on empty input. Fixed r8: the "
     "(a,b) and (a) levels run as grouping sets and an always-present "
     "global .agg() row supplies the () level (a global aggregate "
     "returns one row on empty input in both engines). Seed was 9106 "
     "pre-r8; the _FLAGS NULL addition shifted the rng streams and "
     "9003 is the first empty-lineitem seed under the r8 generator."),
    (9000, "agg_rollup",
     "r8 generator NULL l_returnflag coverage: real NULL group keys "
     "must conflate with rollup-subtotal NULLs identically in both "
     "engines (COALESCE 'ALL' multiset equality across the (a,b)/(a)/"
     "() levels)."),
])
def test_rel_degenerate_dataset_matches_oracle(spark, tmp_path_factory,
                                               seed, name, reason):
    """Regressions for the four r7 rel-fuzz pins — all four r8 fixes
    landed in their due rotation slots (window contract)."""
    _rel_compare(spark, tmp_path_factory.mktemp("relx"), seed, name)


def test_props_json_integral_gate_shapes(spark, tmp_path_factory):
    """Hand-built battery for the r8 events_props_json semantics (the
    fuzz-seed replays depend on the generator's rng streams; this
    corpus is generator-proof). The shared contract: k counts only
    INTEGRAL-shaped values after JSON extraction — everything else is
    NULL on both engines, because native casts disagree ('3.5': Spark
    string→bigint truncates to 3, DuckDB TRY_CAST rounds to 4; '"v"':
    DuckDB plain CAST throws; booleans/objects/malformed: assorted)."""
    import datetime as dt

    import __spark_entry__ as entry_mod

    ts = dt.datetime(2026, 1, 1)
    rows = [
        (1, ts, 1, "click", 1.0, '{"k": 1}'),          # integral number
        (2, ts, 1, "click", 1.0, '{"k": -7}'),         # negative integral
        (3, ts, 1, "click", 1.0, '{"k": 3.5}'),        # fractional: NULL
        (4, ts, 1, "click", 1.0, '{"k": "5"}'),        # quoted digits: 5
        (5, ts, 1, "click", 1.0, '{"k": "v"}'),        # string: NULL
        (6, ts, 1, "click", 1.0, '{"k": true}'),       # boolean: NULL
        (7, ts, 1, "click", 1.0, '{"k": null}'),       # JSON null
        (8, ts, 1, "click", 1.0, '{"k": {"n": 1}}'),   # object: NULL
        (9, ts, 1, "click", 1.0, '{"k": [1]}'),        # array: NULL
        (10, ts, 1, "view", 1.0, "not json"),          # malformed
        (11, ts, 1, "view", 1.0, ""),                  # empty string
        (12, ts, 1, "view", 1.0, None),                # NULL props
        (13, ts, 1, "view", 1.0, "{}"),                # k absent
        (14, ts, 1, "view", 1.0, '{"k": "007"}'),      # leading zeros: 7
    ]
    d = tmp_path_factory.mktemp("propsbat")
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    ).coalesce(1).write.mode("overwrite").parquet(f"{d}/events.parquet")

    out = entry_mod.queries()["events_props_json"](spark, str(d))
    got = {r["event_type"]: (r["n_with_k"], r["sum_k"], r["min_k"],
                             r["max_k"]) for r in out.collect()}
    # click: counted k = {1, -7, 5 (quoted digits)}; fractional/string/
    # boolean/null/object/array all gate to NULL
    assert got["click"] == (3, -1, -7, 5)
    # view: only the leading-zeros row parses ("007" -> 7); malformed/
    # empty/NULL/absent all gate to NULL
    assert got["view"] == (1, 7, 7, 7)

    # and the oracle agrees on the same corpus
    con = duckdb.connect()
    try:
        con.execute(f"CREATE VIEW events AS SELECT * FROM "
                    f"read_parquet('{d}/events.parquet/*.parquet')")
        orows = con.execute(entry_mod.oracle_sql()["events_props_json"]) \
            .fetchall()
    finally:
        con.close()
    o = {r[0]: tuple(r[1:]) for r in orows}
    assert o == got
