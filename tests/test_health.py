"""Corpus-health operators: encoding anomalies + cross-source overlap."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from resin_spark.operators import health
from tests.conftest import SF_SMALL
from tests.oracle_util import compare


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string")


# --- encoding_anomalies -------------------------------------------------------

def test_encoding_anomalies_counts_each_damage_class(spark):
    df = _docs(spark, [
        (1, "clean text here", "en", "web"),
        (2, "donâ€™t stop", "en", "web"),          # 1 'â€' + 1 'Â'? no: â,€,™
        (3, "cafÉ cafÃ©", "en", "web"),  # 1 'Ã'
        (4, "bad\x07byte and � twice �", "en", "books"),
        (5, "tab\tand\nnewline are fine", "en", "books"),
        (6, None, "en", "books"),
    ])
    out = {r["source"]: r for r in health.encoding_anomalies(df).collect()}
    web, books = out["web"], out["books"]
    assert (web["n_docs"], web["n_flagged"]) == (3, 2)
    assert web["moji_marks"] == 2          # 'â€' in doc 2, 'Ã' in doc 3
    assert web["repl_chars"] == 0 and web["ctrl_chars"] == 0
    assert (books["n_docs"], books["n_flagged"]) == (3, 1)
    assert books["repl_chars"] == 2 and books["ctrl_chars"] == 1
    assert books["moji_marks"] == 0        # \t \n never flag
    assert books["flagged_share"] == pytest.approx(1 / 3)


def test_encoding_anomalies_clean_corpus_all_zero(spark):
    df = _docs(spark, [(i, f"plain ascii doc {i}", "en", "s") for i in range(5)])
    row = health.encoding_anomalies(df).collect()[0]
    assert row["n_flagged"] == 0 and row["flagged_share"] == 0.0
    assert row["repl_chars"] == row["ctrl_chars"] == row["moji_marks"] == 0


def test_corrupt_demo_docs_is_deterministic_and_additive(spark):
    df = _docs(spark, [(i, "base", "en", "s")
                       for i in (1, 7, 11, 13, 7 * 11 * 13)])
    got = {r["doc_id"]: r["text"]
           for r in health.corrupt_demo_docs(df).collect()}
    assert got[1] == "base"
    assert got[7] == "base" + health.ANOM_MOJI_SUFFIX
    assert got[11] == "base" + health.REPLACEMENT_CHAR
    assert got[13] == "base" + health.ANOM_CTRL_CHAR
    # a doc divisible by several mods collects every suffix, in order
    assert got[7 * 11 * 13] == ("base" + health.ANOM_MOJI_SUFFIX
                                + health.REPLACEMENT_CHAR
                                + health.ANOM_CTRL_CHAR)


def test_encoding_anomalies_demo_matches_oracle(tables):
    compare(health.encoding_anomalies_demo(tables),
            health.encoding_anomalies_demo_oracle(), SF_SMALL)


# --- source_overlap_matrix ----------------------------------------------------

def test_source_overlap_exact_jaccard(spark):
    # a: {x y z, y z w}; b: {y z w, z w v}; c: {p q r} (disjoint)
    df = _docs(spark, [
        (1, "x y z w", "en", "a"),       # shingles: x y z, y z w
        (2, "y z w v", "en", "b"),       # shingles: y z w, z w v
        (3, "p q r", "en", "c"),         # shingle:  p q r
    ])
    rows = {(r["source_a"], r["source_b"]): r
            for r in health.source_overlap_matrix(df).collect()}
    assert set(rows) == {("a", "b"), ("a", "c"), ("b", "c")}
    ab = rows[("a", "b")]
    assert (ab["n_a"], ab["n_b"], ab["n_shared"]) == (2, 2, 1)
    assert ab["jaccard"] == pytest.approx(1 / 3)
    ac = rows[("a", "c")]
    assert ac["n_shared"] == 0 and ac["jaccard"] == 0.0


def test_source_overlap_dedups_within_source(spark):
    # same shingle from two docs of one source counts once
    df = _docs(spark, [
        (1, "x y z", "en", "a"),
        (2, "x y z", "en", "a"),
        (3, "x y z", "en", "b"),
    ])
    r = health.source_overlap_matrix(df).collect()[0]
    assert (r["n_a"], r["n_b"], r["n_shared"]) == (1, 1, 1)
    assert r["jaccard"] == 1.0


def test_source_overlap_demo_matches_oracle(tables):
    compare(health.source_overlap_demo(tables),
            health.source_overlap_demo_oracle(), SF_SMALL)


# --- table_profile ------------------------------------------------------------

def test_table_profile_metrics_exact(spark):
    df = _docs(spark, [
        (1, "aa", "en", "web"),
        (2, None, "en", "web"),
        (3, "cc", None, "books"),
        (3, "cc", "fr", "books"),
    ])
    rows = {r["col_name"]: r for r in health.table_profile(df).collect()}
    assert set(rows) == {"doc_id", "text", "lang", "source"}
    assert all(r["n_rows"] == 4 for r in rows.values())
    assert rows["doc_id"]["n_distinct"] == 3   # 1,2,3 (3 repeated)
    assert rows["text"]["n_null"] == 1 and rows["text"]["n_distinct"] == 2
    assert rows["lang"]["n_null"] == 1
    assert rows["doc_id"]["min_value"] == "1"
    assert rows["doc_id"]["max_value"] == "3"
    assert rows["source"]["min_value"] == "books"
    assert rows["source"]["dtype"] == "string"
    assert rows["doc_id"]["dtype"] == "bigint"


def test_table_profile_demo_matches_oracle(tables):
    compare(health.table_profile_demo(tables),
            health.table_profile_demo_oracle(), SF_SMALL)


def test_profile_drift_flags_null_jump_and_schema_drift(spark):
    old = _docs(spark, [(i, f"t{i}", "en", "s") for i in range(10)])
    new = spark.createDataFrame(
        [(i, (f"t{i}" if i < 5 else None), "en") for i in range(10)],
        "doc_id long, text string, lang string")   # source dropped
    rows = {r["col_name"]: r for r in health.profile_drift(old, new).collect()}
    assert set(rows) == {"doc_id", "text", "lang", "source"}
    t = rows["text"]
    assert t["n_null_old"] == 0 and t["n_null_new"] == 5
    assert abs(t["null_share_delta"] - 0.5) < 1e-12
    s = rows["source"]   # schema drift: loud NULLs, row kept
    assert s["n_rows_new"] is None and s["n_null_new"] is None
    assert s["null_share_delta"] is None


def test_profile_drift_demo_matches_oracle(tables):
    compare(health.profile_drift_demo(tables),
            health.profile_drift_demo_oracle(), SF_SMALL)


def test_table_profile_empty_frame_reports_zeros(spark):
    df = spark.createDataFrame([], "doc_id long, text string")
    rows = {r["col_name"]: r for r in health.table_profile(df).collect()}
    assert rows["text"]["n_rows"] == 0
    assert rows["text"]["n_null"] == 0 and rows["text"]["n_distinct"] == 0
    assert rows["text"]["min_value"] is None


def test_profile_drift_empty_snapshot_survives_ansi(spark):
    """Profiling against an EMPTY snapshot reports NULL deltas — not an
    ANSI DIVIDE_BY_ZERO job abort."""
    old = _docs(spark, [(1, "aa", "en", "web")])
    new = old.filter("doc_id < 0")   # empty, same schema
    rows = {r["col_name"]: r for r in health.profile_drift(old, new).collect()}
    assert rows["text"]["n_rows_new"] == 0
    assert rows["text"]["null_share_delta"] is None


# --- vocab_coverage -----------------------------------------------------------

def test_vocab_coverage_hand_computed(spark):
    # corpus counts: aa=4 (a:3, b:1), bb=2 (a:2), cc=1 (b:1) → top-2
    # vocab on (count desc, term asc) = {aa, bb}; cc is OOV.
    df = _docs(spark, [
        (1, "aa aa bb", "en", "a"),
        (2, "aa bb cc", "en", "a"),
        (3, "aa", "en", "b"),
        (4, "", "en", "empty"),          # tokenizes to nothing
    ])
    out = {r["source"]: r for r in health.vocab_coverage(df, v=2).collect()}
    a, b, e = out["a"], out["b"], out["empty"]
    assert (a["n_tokens"], a["covered_tokens"], a["oov_terms"]) == (6, 5, 1)
    assert a["coverage_share"] == 5 / 6
    assert a["distinct_terms"] == 3 and a["oov_share"] == 1 / 3
    assert a["mean_token_chars"] == 2.0
    assert (b["n_tokens"], b["covered_tokens"]) == (1, 1)
    assert b["coverage_share"] == 1.0 and b["oov_terms"] == 0
    # zero-token sources stay in the card: zero counts, NULL shares
    assert (e["n_tokens"], e["distinct_terms"]) == (0, 0)
    assert e["coverage_share"] is None and e["mean_token_chars"] is None


def test_vocab_coverage_boundary_cut_is_deterministic(spark):
    # three terms with EQUAL counts; v=2 must keep the lexicographically
    # smallest two (count desc, term asc total order)
    df = _docs(spark, [(1, "zz mm aa", "en", "s")])
    row = health.vocab_coverage(df, v=2).collect()[0]
    assert (row["covered_tokens"], row["oov_terms"]) == (2, 1)


def test_vocab_coverage_demo_matches_oracle(tables):
    compare(health.vocab_coverage_demo(tables),
            health.vocab_coverage_demo_oracle(), SF_SMALL)


def test_vocab_coverage_vocab_join_is_broadcast(tables):
    plan = health.vocab_coverage_demo(tables) \
        ._jdf.queryExecution().executedPlan().toString()
    # the v-row vocabulary must come back as a broadcast, and the
    # corpus relation must never cross-join anything
    assert "BroadcastHashJoin" in plan, plan[:2000]
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# --- length_histogram ----------------------------------------------------------

def test_length_histogram_buckets_and_cumshare(spark):
    # token counts: 0, 1, 8 (power-of-two boundary), 9, 130
    df = _docs(spark, [
        (1, "", "en", "s"),
        (2, "one", "en", "s"),
        (3, " ".join(["w"] * 8), "en", "s"),
        (4, " ".join(["w"] * 9), "en", "s"),
        (5, " ".join(["w"] * 130), "en", "s"),
    ])
    rows = {r["bucket"]: r for r in health.length_histogram(df).collect()}
    assert set(rows) == {0, 1, 4, 8}
    assert (rows[0]["bucket_lo"], rows[0]["bucket_hi"],
            rows[0]["n_docs"]) == (0, 0, 1)
    assert (rows[1]["bucket_lo"], rows[1]["bucket_hi"]) == (1, 1)
    # nt=8 and nt=9 share bucket 4 = [8, 15]
    assert (rows[4]["bucket_lo"], rows[4]["bucket_hi"],
            rows[4]["n_docs"], rows[4]["n_tokens"]) == (8, 15, 2, 17)
    assert (rows[8]["bucket_lo"], rows[8]["bucket_hi"]) == (128, 255)
    assert rows[8]["cum_doc_share"] == 1.0
    assert rows[0]["doc_share"] == 0.2 and rows[4]["doc_share"] == 0.4
    # cumulative is monotone in bucket order
    cums = [rows[b]["cum_doc_share"] for b in sorted(rows)]
    assert cums == sorted(cums)


def test_length_histogram_demo_matches_oracle(tables):
    compare(health.length_histogram_demo(tables),
            health.length_histogram_demo_oracle(), SF_SMALL)


# --- health_card_typed: the six-card melt ------------------------------------

@pytest.mark.full_suite
def test_health_card_typed_sections_pin_members(tables):
    """Every section of the melt IS the member card's relation: the
    melted cells reproduce each member operator's collected values
    (the C63 section-equality license — one driver slot transitively
    pins C43/C44/C48/C49/C52/C55)."""
    typed = health.health_card_typed(tables).collect()
    cells = {(r["section"], r["metric"]): r for r in typed}

    enc = health.encoding_anomalies_demo(tables).collect()[0]
    r = cells[("encoding", f"source={enc['source']}/repl_chars")]
    assert r["value_num"] == float(enc["repl_chars"])

    ov = health.source_overlap_demo(tables).collect()[0]
    r = cells[("overlap", f"source_a={ov['source_a']}/"
               f"source_b={ov['source_b']}/n_shared")]
    assert r["value_num"] == float(ov["n_shared"])

    prof = {p["col_name"]: p
            for p in health.table_profile_demo(tables).collect()}
    r = cells[("profile", "col_name=doc_id/n_distinct")]
    assert r["value_num"] == float(prof["doc_id"]["n_distinct"])
    r = cells[("profile", "col_name=lang/dtype")]
    assert r["value_str"] == prof["lang"]["dtype"] and r["value_num"] is None

    drift = {d["col_name"]: d
             for d in health.profile_drift_demo(tables).collect()}
    # the dropped n_chars column keeps its row with a loud NULL new side
    r = cells[("drift", "col_name=n_chars/n_rows_new")]
    assert r["value_num"] is None
    assert drift["n_chars"]["n_rows_new"] is None

    cov = health.vocab_coverage_demo(tables).collect()[0]
    r = cells[("coverage", f"source={cov['source']}/coverage_share")]
    assert r["value_num"] == cov["coverage_share"]

    lh = health.length_histogram_demo(tables).collect()[0]
    r = cells[("lengths", f"source={lh['source']}/bucket={lh['bucket']}"
               "/cum_doc_share")]
    assert r["value_num"] == lh["cum_doc_share"]

    # scalar driver-safe schema + one face per cell
    df = health.health_card_typed(tables)
    assert [f.dataType.simpleString() for f in df.schema.fields] \
        == ["string", "string", "double", "string"]
    for row in typed:
        assert (row["value_num"] is None) or (row["value_str"] is None)


@pytest.mark.full_suite
def test_health_card_typed_matches_oracle(tables):
    compare(health.health_card_typed(tables),
            health.health_card_typed_oracle(), SF_SMALL)
