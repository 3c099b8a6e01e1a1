"""Text-analysis unit tests, modeled on StringAnalyzerTests.cs
(SplitWords punctuation rules, tokenize round-trips, hash behaviour)."""

from __future__ import annotations

from pyspark.sql import functions as F

from resin_spark.functions import hashing, text as T
from resin_spark.functions import vectors as V


def _one(spark, text, col):
    return spark.createDataFrame([(text,)], "text string").select(col.alias("v")).first()["v"]


def test_tokens_strip_punctuation(spark):
    # StringAnalyzerTests.SplitWords_RemovesStandalonePunctuation analog
    assert _one(spark, "Hello, world! 42", T.tokens("text")) == ["hello", "world", "42"]
    assert _one(spark, "a--b  c", T.tokens("text")) == ["a", "b", "c"]
    assert _one(spark, "...", T.tokens("text")) == []


def test_bpe_tokens_split_mixed(spark):
    assert _one(spark, "ab1 cd!", T.bpe_tokens("text")) == ["ab", "1", "cd", "!"]


def test_fingerprint_order_sensitive(spark):
    a = _one(spark, "alpha beta gamma", T.doc_fingerprint("text"))
    b = _one(spark, "beta alpha gamma", T.doc_fingerprint("text"))
    c = _one(spark, "alpha beta gamma", T.doc_fingerprint("text"))
    assert a == c and a != b


def test_knuth_hash_matches_reference_algorithm(spark):
    # HashOperations.CalculateKnuthHash computed by hand for "ab":
    h = 3074457345618258791
    for ch in "ab":
        h = ((h + ord(ch)) * 3074457345618258799) % (1 << 64)
    expected = h - (1 << 64) if h >= (1 << 63) else h
    got = (
        spark.createDataFrame([("ab",)], "s string")
        .select(hashing.knuth_hash(F.col("s")).alias("h"))
        .first()["h"]
    )
    assert got == expected


def test_embedding_similarity_ordering(spark):
    # Compare: similar strings score higher than dissimilar (StringAnalyzer.Compare)
    df = spark.createDataFrame(
        [("the quick brown fox", "the quick brown foxes", "completely different words here")],
        "a string, b string, c string",
    )
    embed = hashing.embed_text_udf(256)
    row = df.select(
        V.cosine(embed(F.col("a")), embed(F.col("b"))).alias("sim_close"),
        V.cosine(embed(F.col("a")), embed(F.col("c"))).alias("sim_far"),
    ).first()
    assert row["sim_close"] > row["sim_far"]
    assert 0.0 <= row["sim_far"] < row["sim_close"] <= 1.0000001


def test_vector_ops_basics(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0, 2.0], [2.0, 0.0, 4.0])], "a array<double>, b array<double>"
    )
    row = df.select(
        V.dot("a", "b").alias("dot"),
        V.cosine("a", "b").alias("cos"),
        V.l2_distance("a", "b").alias("l2"),
        V.l1_distance("a", "b").alias("l1"),
        V.nonzero_overlap("a", "b").alias("ov"),
        V.nonzero_jaccard("a", "b").alias("jc"),
    ).first()
    assert row["dot"] == 10.0
    assert abs(row["cos"] - 1.0) < 1e-12
    assert abs(row["l2"] - 5 ** 0.5) < 1e-12
    assert row["l1"] == 3.0
    assert row["ov"] == 2
    assert row["jc"] == 1.0


def test_split_words_reference_parity(spark):
    """Mirrors StringAnalyzerTests.cs SplitWords_* cases: math symbols
    standalone, internal/standalone punctuation removed, symbols and
    digits kept in words, case preserved."""
    from resin_spark.functions.text import split_words
    cases = {
        "children’s minds": ["children", "s", "minds"],
        "rock-n-roll": ["rock", "n", "roll"],
        "email@example.com": ["email", "example", "com"],
        "well...known": ["well", "known"],
        "C#/.NET": ["C", "NET"],
        "abc123": ["abc123"],
        "€money$": ["€money$"],
        "Math≈Science": ["Math", "≈", "Science"],
        "E=mc² √energy": ["E", "=", "mc²", "√", "energy"],
        "Δx≈0": ["Δx", "≈", "0"],
        "A_b_c": ["A", "b", "c"],
        "!!! ... —": [],
        "≈": ["≈"],
    }
    df = spark.createDataFrame([(s,) for s in cases], "s string")
    got = {r["s"]: r["toks"] for r in
           df.select("s", split_words("s").alias("toks")).collect()}
    for s, want in cases.items():
        assert got[s] == want, (s, got[s], want)


def test_term_cooccurrence_cap_bounds_megadoc(spark, tmp_path):
    """A doc with distinct tokens far above the cap must contribute at
    most C(cap, 2) pairs (the uncapped C(n, 2) explosion is the round-3
    scale flaw), the capped selection keeps the RAREST tokens, and the
    capped semantics stay in lockstep with the capped DuckDB oracle."""
    import duckdb

    from resin_spark.operators import textops

    mega = " ".join(f"zz{i:04d}" for i in range(200))  # 200 df=1 tokens
    docs = [
        (0, "alpha beta gamma", "en", "web", 1),
        (1, "alpha beta delta", "en", "web", 1),
        (2, "alpha gamma delta", "en", "web", 1),
        (3, mega + " alpha", "en", "web", 1),
    ]
    df = spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long")
    cap = 5
    out = textops.term_cooccurrence({"documents": df}, min_pairs=1,
                                    per_doc_cap=cap).collect()
    # the mega doc can emit at most C(5,2) pairs; with 3 small docs of 3
    # tokens each the total is tightly bounded
    mega_only = [r for r in out
                 if r["tok_a"].startswith("zz") and r["tok_b"].startswith("zz")]
    assert len(mega_only) <= cap * (cap - 1) // 2
    # rarest-first: every surviving mega token is among the 5 smallest
    # df=1 tokens of that doc (ties broken lexicographically)
    kept = {tok for r in out for tok in (r["tok_a"], r["tok_b"])
            if tok.startswith("zz")}
    assert kept <= {f"zz{i:04d}" for i in range(cap)}
    # engine lockstep at a binding cap
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    con = duckdb.connect()
    try:
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{tmp_path}/documents.parquet/*.parquet')")
        orows = con.execute(
            textops.term_cooccurrence_oracle(min_pairs=1, per_doc_cap=cap)
        ).fetchall()
    finally:
        con.close()
    assert sorted(tuple(r) for r in out) == sorted(tuple(r) for r in orows)
    # the cap report accounts for exactly the mega doc's overflow
    rep = textops.term_cooccurrence_cap_report(
        {"documents": df}, per_doc_cap=cap).collect()[0]
    assert rep["n_docs"] == 4 and rep["n_docs_capped"] == 1
    assert rep["n_tokens_dropped"] == 201 - cap


def test_bm25_search_ranks_by_relevance(spark):
    """BM25 sanity on a controlled corpus: a doc saturated with the
    query terms outranks a doc with one hit; docs with no query terms
    never appear; k bounds the output; rational-idf scores positive."""
    from resin_spark.operators import textops as tx
    docs = spark.createDataFrame(
        [(1, "merge sort window merge sort window merge"),
         (2, "merge of a long document " + "filler " * 50),
         (3, "nothing relevant here at all"),
         (4, "sort window sort")],
        "doc_id long, text string")
    out = tx.bm25_search({"documents": docs}).collect()
    ids = [r["doc_id"] for r in out]
    assert 3 not in ids
    assert ids[0] in (1, 4)  # term-dense short docs lead
    assert out[0]["score"] >= out[-1]["score"] > 0
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[1]["n_hits"] == 3 and by_id[2]["n_hits"] == 1
    # k bound
    top1 = tx.bm25_search({"documents": docs}, k=1).collect()
    assert len(top1) == 1 and top1[0]["rank"] == 1


def test_bm25_search_rejects_unbounded_k(spark):
    """TakeOrdered holds a k-sized buffer per partition — an absurd k
    must fail loudly instead of OOMing the JVM (found the hard way:
    k=1e9 allocated a billion-slot priority queue). Full ranked output
    is bm25_scores()."""
    import pytest as _pt
    from resin_spark.operators import textops as tx
    docs = spark.createDataFrame([(1, "merge sort")],
                                 "doc_id long, text string")
    with _pt.raises(ValueError, match="BM25_MAX_K"):
        tx.bm25_search({"documents": docs}, k=10**9)


def test_phrase_search_counts_and_edges(spark):
    """Occurrence counting: overlapping matches count individually,
    docs shorter than the phrase can't match (and must not trip the
    descending-sequence edge), zero-hit docs are absent, ties rank by
    doc_id."""
    from resin_spark.operators import textops as tx
    docs = spark.createDataFrame(
        [(1, "merge sort merge sort merge sort"),   # 3 occurrences
         (2, "merge merge merge"),                   # 0 (no 'sort')
         (3, "merge"),                               # shorter than phrase
         (4, "x merge sort y"),                      # 1
         (5, "merge sort"),                          # 1 — tie with 4
         (6, "")],
        "doc_id long, text string")
    out = tx.phrase_search({"documents": docs}).collect()
    got = [(r["rank"], r["doc_id"], r["n_occurrences"]) for r in out]
    assert got == [(1, 1, 3), (2, 4, 1), (3, 5, 1)]
    # single-term phrase degrades to term counting
    one = tx.phrase_search({"documents": docs}, phrase=("merge",)).collect()
    assert one[0]["doc_id"] == 1 or one[0]["n_occurrences"] >= 3


def test_search_snippets_window_boundaries(spark):
    from resin_spark.operators import textops

    docs = spark.createDataFrame(
        [(1, "merge a b c d e f", "en", "s"),        # hit at pos 1: left-clamped
         (2, "a b c d e f merge", "en", "s"),        # hit at the end: right-clamped
         (3, "a b c merge d e f", "en", "s"),        # centered window
         (4, "nothing relevant here", "en", "s")],   # no hit: not in top-k
        "doc_id long, text string, lang string, source string")
    out = {r["doc_id"]: r for r in textops.search_snippets(
        {"documents": docs}, query=("merge",), k=10, radius=2).collect()}
    assert set(out) == {1, 2, 3}
    assert (out[1]["pos"], out[1]["snippet"]) == (1, "merge a b")
    assert (out[2]["pos"], out[2]["snippet"]) == (7, "e f merge")
    assert (out[3]["pos"], out[3]["snippet"]) == (4, "b c merge d e")


def test_search_snippets_earliest_term_wins(spark):
    from resin_spark.operators import textops

    docs = spark.createDataFrame(
        [(1, "x sort y y y merge z", "en", "s")],
        "doc_id long, text string, lang string, source string")
    r = textops.search_snippets(
        {"documents": docs}, query=("merge", "sort"), k=5,
        radius=1).collect()[0]
    assert r["pos"] == 2 and r["snippet"] == "x sort y"


def test_search_snippets_demo_matches_oracle(spark):
    from resin_spark.io import load_tables
    from resin_spark.operators import textops
    from tests.oracle_util import compare

    t = load_tables(spark, "/root/testdata/sf0.001")
    compare(textops.search_snippets(t), textops.search_snippets_oracle(),
            "/root/testdata/sf0.001")


def test_search_facets_counts_the_page_only(spark):
    from resin_spark.operators import textops

    docs = spark.createDataFrame(
        [(1, "merge sort window", "en", "web"),
         (2, "merge merge", "en", "wiki"),
         (3, "sort", "de", "wiki"),
         (4, "nothing relevant at all", "fr", "books")],  # never hits
        "doc_id long, text string, lang string, source string")
    out = {(r["facet"], r["value"]): (r["n_hits"], r["hit_share"])
           for r in textops.search_facets(
               {"documents": docs}, query=("merge", "sort"), k=10).collect()}
    # the page is docs 1-3; doc 4 scores no query term and must not count
    assert out[("source", "wiki")] == (2, 2 / 3)
    assert out[("source", "web")] == (1, 1 / 3)
    assert ("source", "books") not in out
    assert out[("lang", "en")] == (2, 2 / 3)
    assert out[("lang", "de")] == (1, 1 / 3)
    # k truncation flows through: page of 1 -> single full-share facets
    one = {(r["facet"], r["value"]): r["hit_share"]
           for r in textops.search_facets(
               {"documents": docs}, query=("merge", "sort"), k=1).collect()}
    assert all(v == 1.0 for v in one.values()) and len(one) == 2


def test_search_facets_matches_oracle(spark):
    from resin_spark.io import load_tables
    from resin_spark.operators import textops
    from tests.oracle_util import compare

    t = load_tables(spark, "/root/testdata/sf0.001")
    compare(textops.search_facets(t), textops.search_facets_oracle(),
            "/root/testdata/sf0.001")
