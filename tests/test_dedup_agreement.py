"""dedup_method_agreement (D17 diagnostics, SURVEY D-block): pairwise
agreement of the D2/D3/D4 pair sets on one corpus. Subjects are the
checked ops called verbatim, so the pins here are set-algebra
properties and hand-built corpora (the E20/D14 convention — no SQL
oracle by design)."""

from __future__ import annotations

from resin_spark.operators import dedup

LONG_A = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
          "lambda mu nu xi omicron pi rho sigma tau upsilon")
# ~60% shingle overlap with LONG_A's tail changed
LONG_B = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
          "lambda mu nu xi omicron QQ RR SS TT UU")


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string")


def _card(spark, rows):
    return {(r["method_a"], r["method_b"]): r
            for r in dedup.dedup_method_agreement(_docs(spark, rows))
            .collect()}


def test_agreement_exact_dup_found_by_all_three(spark):
    rows = [
        (1, LONG_A, "en", "s"),
        (2, LONG_A, "en", "s"),       # exact duplicate of 1
        (3, LONG_B, "en", "s"),       # near-dup of 1/2 (J ~ 0.58)
        (4, "totally unrelated text about other things entirely and "
            "nothing shared with the rest", "en", "s"),
    ]
    card = _card(spark, rows)
    assert len(card) == 3
    # the exact-dup pair (1,2) is found by every method, so every
    # method-pair row has at least one shared pair
    for r in card.values():
        assert r["pairs_both"] >= 1
        # set algebra: both <= min(a, b), either = a + b - both
        assert r["pairs_both"] <= min(r["pairs_a"], r["pairs_b"])
        assert r["pairs_either"] == \
            r["pairs_a"] + r["pairs_b"] - r["pairs_both"]
        assert 0.0 < r["agreement"] <= 1.0


def test_agreement_minhash_contained_in_ngram(spark):
    """D3 verifies its banded candidates with exact Jaccard at the same
    tau, so its pair set is a SUBSET of D2's: on their agreement row,
    pairs_both == the minhash side, always."""
    rows = [
        (1, LONG_A, "en", "s"),
        (2, LONG_A, "en", "s"),
        (3, LONG_B, "en", "s"),
        (5, LONG_B + " extra tail words here", "en", "s"),
        (6, "merge sort window " * 8, "en", "s"),
        (7, "merge sort window " * 8 + "changed end", "en", "s"),
    ]
    card = _card(spark, rows)
    r = card[("ngram_jaccard", "minhash_lsh")]
    assert r["pairs_both"] == r["pairs_b"]      # minhash ⊆ ngram
    assert r["pairs_a"] >= r["pairs_b"]


def test_agreement_empty_and_pairless_corpus(spark):
    card = _card(spark, [(1, "only one doc here", "en", "s")])
    assert len(card) == 3
    for r in card.values():
        assert r["pairs_a"] == r["pairs_b"] == r["pairs_both"] == 0
        assert r["pairs_either"] == 0 and r["agreement"] is None


def test_agreement_card_plans_one_aggregate_subtree(spark):
    """ADVICE r8: the card must not rely on ReuseExchange to avoid
    running the D2/D3/D4 pair pipelines three times. With the F.inline
    construction the aggregate appears ONCE by construction: the
    executed plan holds exactly one Generate(inline), 2 parquet scans
    (docs for simhash + the roster; the PPJoin/minhash signature
    frames are the 7 checkpointed ExistingRDD scans) — the union form
    would triple every one of these."""
    from resin_spark.io import load_tables
    from resin_spark.operators import dedup

    docs = load_tables(spark, "/root/testdata/sf0.001")["documents"]
    df = dedup.dedup_method_agreement(docs)
    df.collect()
    final = df._jdf.queryExecution().executedPlan().toString() \
        .split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 2, final[:2000]
    assert final.count("Scan ExistingRDD") == 7, final[:2000]
    assert final.count("Generate inline") + final.count("Inline") == 1
