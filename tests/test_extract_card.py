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
