"""boilerplate_card (staged, SURVEY H15's measurement half): the
per-source template/keyword line-mass card quantifying the documented
stdlib-extractor trade. Hand-computed battery + DuckDB-oracle parity at
sf0.001 and sf0.01 (the driver-identical comparison) + plan pin; the
edge-docs battery and tools/deep_fuzz_staged cover the degenerate
corpora."""

from __future__ import annotations

from pyspark.sql import functions as F

from resin_spark.operators import extract
from tests.conftest import SF_MED, SF_SMALL
from tests.oracle_util import compare


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string")


def test_boilerplate_card_hand_computed(spark):
    nav = "Home | About | Contact"
    docs = _docs(spark, [
        # nav line repeats in 3 distinct docs -> template at min_docs=3
        (1, nav + "\nreal content one", "en", "a"),
        (2, nav + "\nreal content two two", "en", "a"),
        (3, nav + "\n\n  \nAccept cookies to continue", "en", "b"),
        (4, "unique text only", "en", "b"),
        (5, None, "en", "a"),              # NULL text: excluded
    ])
    out = {r["source"]: r for r in
           extract.boilerplate_card(docs, min_docs=3).collect()}
    a, b = out["a"], out["b"]
    # source a: lines = nav, "real content one", nav, "real content two two"
    assert a["n_lines"] == 4
    assert a["template_lines"] == 2            # the two nav occurrences
    assert a["keyword_lines"] == 0
    assert a["n_chars"] == 2 * len(nav) + len("real content one") \
        + len("real content two two")
    assert a["template_char_share"] == 2 * len(nav) / a["n_chars"]
    # source b: blank/whitespace-only lines dropped; cookie line keyword
    assert b["n_lines"] == 3
    assert b["template_lines"] == 1            # nav occurrence in doc 3
    assert b["keyword_lines"] == 1             # "Accept cookies ..."
    assert b["keyword_char_share"] == \
        len("Accept cookies to continue") / b["n_chars"]


def test_boilerplate_card_distinct_doc_counting(spark):
    # the SAME line repeated 5x INSIDE one doc is not template mass —
    # doc-frequency counts DISTINCT docs, not occurrences
    docs = _docs(spark, [(1, "\n".join(["echo line"] * 5), "en", "s")])
    row = extract.boilerplate_card(docs, min_docs=3).collect()[0]
    assert row["n_lines"] == 5 and row["template_lines"] == 0


def test_boilerplate_card_keyword_lexicon(spark):
    docs = _docs(spark, [
        (1, "We use COOKIES on this site\nSign in\nplain line", "en", "s"),
        (2, "© 2026 SomeCorp. All rights reserved.", "en", "t"),
    ])
    out = {r["source"]: r for r in
           extract.boilerplate_card(docs).collect()}
    assert out["s"]["keyword_lines"] == 2      # case-insensitive match
    assert out["t"]["keyword_lines"] == 1


def test_boilerplate_card_matches_oracle_sf_small(tables):
    compare(extract.boilerplate_card_demo(tables),
            extract.boilerplate_card_oracle(), SF_SMALL)


def test_boilerplate_card_matches_oracle_sf_med(tables_med):
    compare(extract.boilerplate_card_demo(tables_med),
            extract.boilerplate_card_oracle(), SF_MED)


def test_boilerplate_card_plan_text_never_shuffles(tables):
    """The doc-frequency shuffle must move (xxhash64, doc_id) pairs —
    the line text itself stays out of every Exchange (the
    line_dedup_stats scale shape), and nothing cross-joins."""
    df = extract.boilerplate_card_demo(tables)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    import re
    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "line#" not in m.group(1), m.group(0)


def test_stream_boilerplate_keywords_matches_batch(spark, tmp_path):
    """Once the directory drains, the complete-mode keyword table must
    equal the batch card's keyword columns row-for-row (the shared
    boiler_line_rows frame makes drift structurally impossible; this
    pins the aggregate algebra)."""
    from resin_spark.io import load_tables
    from resin_spark.streaming import quality as q

    docs = load_tables(spark, "/root/testdata/sf0.001")["documents"] \
        .filter(F.col("doc_id").isNotNull())
    src_dir = tmp_path / "docs_in"
    docs.repartition(4).write.parquet(str(src_dir))   # several triggers

    batch = {
        (r["source"], r["n_lines"], r["n_chars"], r["keyword_lines"],
         None if r["keyword_char_share"] is None
         else round(r["keyword_char_share"], 12))
        for r in extract.boilerplate_card(
            spark.read.parquet(str(src_dir))).collect()
    }
    sq = (
        q.stream_boilerplate_keywords(spark, str(src_dir))
        .writeStream.format("memory")
        .queryName("boiler_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt_boiler"))
        .start()
    )
    assert sq.awaitTermination(120), "stream did not drain (overloaded machine?)"
    got = {
        (r["source"], r["n_lines"], r["n_chars"], r["keyword_lines"],
         None if r["keyword_char_share"] is None
         else round(r["keyword_char_share"], 12))
        for r in spark.sql("SELECT * FROM boiler_stream").collect()
    }
    assert got == batch
