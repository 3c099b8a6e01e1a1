"""Zero-token / empty-text edge parity (ADVICE r1: list_reduce on empty
lists + divide-by-zero must behave identically on Spark and DuckDB).

Builds a documents table of pathological rows and runs every
documents-based oracle-backed query against DuckDB on it — the same
comparison the driver gate does, but on inputs the generated testdata
never contains.
"""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

pytestmark = pytest.mark.full_suite  # edge-semantics battery: full tier only (VERDICT r11 item 1)


DOC_QUERIES = [
    "text_tokenize_stats", "term_frequencies", "lexicon_build",
    "text_quality_score", "lang_id_heuristic", "doc_fingerprint",
    "unicode_range", "token_count_bpe", "dedup_exact",
    # r4 widening: every remaining documents-only oracle-backed entry
    "split_words_stats", "term_cooccurrence", "tfidf_topterms",
    "sentence_vectors", "pipeline_curate", "stratified_sample",
    "quality_repetition", "pii_redact", "domain_mix",
    "dedup_ngram_jaccard", "dedup_minhash_lsh", "dedup_simhash",
    "dedup_components", "pack_sequences", "contamination_check",
    # r4 traindata block
    "quality_perplexity", "shard_export", "line_dedup_stats",
    "dedup_incremental", "bpe_merge_step", "quality_perplexity_bigram",
    "ngram_novelty", "dup_span_coverage",
    # late-r4 learned-curation block
    "nb_lang_classify", "importance_weights", "epoch_shuffle",
    "filter_funnel", "bloom_contamination", "cms_heavy_hitters",
    "corpus_stats", "lang_stats",
    # r5 search block (bm25_indexed shares bm25's oracle but writes a
    # scratch index — the edge corpus exercises its write+prune path too)
    "bm25_search", "bm25_indexed", "phrase_search",
    # r9 documents-only registrations: the two composite melts (their
    # metric-name melting over NULL key values is a cross-engine risk
    # class of its own), the boilerplate card, and the two governance
    # ops (split_governance_card needs embeddings, so it lives in the
    # staged battery instead). dataset_card_typed joins for the same
    # NULL-key-melt reason.
    "health_card_typed", "boilerplate_card", "cluster_split",
    "shard_manifest", "dataset_card_typed",
]

EDGE_DOCS = [
    (0, "the quick brown fox", "en", "web", 19),
    (1, "", "en", "web", 0),                       # empty text
    (2, "!!! ... ???", "en", "web", 11),           # zero tokens
    (3, "one", "en", "web", 3),                    # single token
    (4, "  spaced   out  ", "en", "web", 16),
    (5, "汉字 العربية ελληνικά", "zh", "web", 20),  # non-ASCII only
    (6, "the quick brown fox", "en", "web", 19),   # exact duplicate of 0
    (7, "1234 5678", "en", "web", 9),              # digits only
    # corrupt-ingest rows: all 24 doc queries agree with nulls present
    # (measured r4) — pinned here so that stays true
    (8, None, "en", "web", 0),                     # null text
    (9, "alpha beta", None, "web", 10),            # null lang
    (10, "gamma delta", "en", None, 11),           # null source
    # r5: rows containing the search block's query/phrase terms so the
    # bm25/phrase edge checks score real hits (not just empty-set parity)
    (11, "merge sort merge sort window merge", "en", "web", 34),
    (12, "merge", "en", "web", 5),                 # hit shorter than phrase
    (13, "sort merge", "en", "web", 10),           # reversed phrase: 0 hits
    # r8: MULTI-LINE rows — the generated testdata contains ZERO
    # newline-bearing docs (measured: 0 at sf0.01), so the line-level
    # ops (line_dedup, boilerplate_card, cdc) and every tokenizer were
    # never driver-gated on them; a repeated template line + a keyword
    # line + blank-only lines pin that whole class. Found-by: the
    # multi-line staged fuzz (seed 2512) caught source_divergence's
    # decimal-cast divergence on its first run.
    (14, "Home | About | Contact\nunique prose line fourteen", "en",
     "web", 49),
    (15, "Home | About | Contact\nanother unique body line", "en",
     "blog", 47),
    (16, "Home | About | Contact\nthird distinct body\nall rights reserved",
     "en", "blog", 62),
    (17, "\n \nonly blanks around\n\n", "en", "web", 23),
]


@pytest.fixture(scope="module")
def edge_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("edge_sf")
    df = spark.createDataFrame(
        EDGE_DOCS, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


def _norm(v):
    if isinstance(v, float) and math.isnan(v):
        return "nan"
    return repr(v)


@pytest.mark.parametrize("name", DOC_QUERIES)
def test_edge_docs_parity(spark, edge_dir, name):
    # retired entries keep their original oracles and stay in the edge
    # battery (retirement trades driver slots, never coverage)
    sql = {**entry_mod.oracle_sql(), **entry_mod.retired_oracle_sql()}[name]
    con = duckdb.connect()
    try:
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{edge_dir}/documents.parquet/*.parquet')"
        )
        cur = con.execute(sql)
        ocols = [c[0] for c in cur.description]
        orows = cur.fetchall()
    finally:
        con.close()

    df = {**entry_mod.queries(),
          **entry_mod.retired_queries()}[name](spark, edge_dir)
    srows = df.collect()
    assert sorted(df.columns) == sorted(ocols)
    assert len(srows) == len(orows), f"rowcount: {len(srows)} vs {len(orows)}"
    o_idx = [ocols.index(c) for c in sorted(ocols)]
    s_idx = [df.columns.index(c) for c in sorted(df.columns)]
    oset = sorted(tuple(_norm(r[i]) for i in o_idx) for r in orows)
    sset = sorted(tuple(_norm(r[i]) for i in s_idx) for r in srows)
    assert sset == oset, f"first diff: {[p for p in zip(sset, oset) if p[0] != p[1]][:3]}"


# --- closing-r6 staged ops: same edge corpus, demo/oracle pairs directly ------

EDGE_EMB = [
    (0, [1.0, 0.0, 0.0], 0),
    (1, [0.9, 0.1, 0.0], 0),
    (2, [0.0, 1.0, 0.0], 1),
    (3, None, 1),                 # null embedding: gated out
    (4, [0.0, 0.0, 0.0], 2),      # zero norm: cosine gate decides
    (5, [0.5, 0.5, 0.0], 2),
]


@pytest.fixture(scope="module")
def edge_dir_emb(spark, edge_dir):
    df = spark.createDataFrame(
        EDGE_EMB, "vec_id long, embedding array<float>, label int")
    df.coalesce(1).write.mode("overwrite").parquet(
        f"{edge_dir}/embeddings.parquet")
    return edge_dir


def _staged_pairs():
    from resin_spark.operators import (dedup, extract, health, pipeline,
                                        retrieval, textops, traindata)

    return [
        ("boilerplate_card", extract.boilerplate_card_demo,
         extract.boilerplate_card_oracle(), False),
        ("perplexity_threshold_curve", traindata.perplexity_threshold_curve,
         traindata.perplexity_threshold_curve_oracle(), False),
        ("shard_manifest", traindata.shard_manifest,
         traindata.shard_manifest_oracle(), False),
        ("vocab_coverage", health.vocab_coverage_demo,
         health.vocab_coverage_demo_oracle(), False),
        ("length_histogram", health.length_histogram_demo,
         health.length_histogram_demo_oracle(), False),
        ("dedup_threshold_curve", dedup.dedup_threshold_curve_demo,
         dedup.dedup_threshold_curve_oracle(), False),
        ("mixture_plan", pipeline.mixture_plan_demo,
         pipeline.mixture_plan_demo_oracle(), False),
        ("apply_mixture", pipeline.apply_mixture_demo,
         pipeline.apply_mixture_demo_oracle(), False),
        ("hybrid_search_rrf", retrieval.hybrid_search_demo,
         retrieval.hybrid_search_oracle(), True),
        ("search_snippets", textops.search_snippets,
         textops.search_snippets_oracle(), False),
        ("search_facets", textops.search_facets,
         textops.search_facets_oracle(), False),
        ("chunk_documents", pipeline.chunk_documents_demo,
         pipeline.chunk_documents_oracle(), False),
        ("dataset_split", pipeline.dataset_split_demo,
         pipeline.dataset_split_demo_oracle(), False),
        ("dataset_card_typed", pipeline.dataset_card_typed,
         pipeline.dataset_card_typed_oracle(), False),
        ("split_leakage", pipeline.split_leakage_demo,
         pipeline.split_leakage_demo_oracle(), False),
        ("cluster_split", pipeline.cluster_split_demo,
         pipeline.cluster_split_demo_oracle(), False),
        ("semantic_split_leakage", pipeline.semantic_split_leakage_demo,
         pipeline.semantic_split_leakage_oracle(), True),
        # r7 widening: the r6-staged health/traindata pairs previously
        # covered only by their own sf-corpus parity tests — adding
        # them here also puts them under tools/deep_fuzz_staged
        ("encoding_anomalies", health.encoding_anomalies_demo,
         health.encoding_anomalies_demo_oracle(), False),
        ("source_overlap", health.source_overlap_demo,
         health.source_overlap_demo_oracle(), False),
        ("table_profile", health.table_profile_demo,
         health.table_profile_demo_oracle(), False),
        ("profile_drift", health.profile_drift_demo,
         health.profile_drift_demo_oracle(), False),
        ("lang_confusion", traindata.lang_confusion,
         traindata.lang_confusion_oracle(), False),
        ("cdc_chunk_stats", traindata.cdc_chunk_stats,
         traindata.cdc_chunk_stats_oracle(), False),
        ("dup_cluster_histogram",
         lambda t: dedup.dup_cluster_histogram(t["documents"]),
         dedup.dup_cluster_histogram_oracle(), False),
        ("source_divergence",
         lambda t: pipeline.source_divergence(t["documents"]),
         pipeline.source_divergence_oracle(), False),
        # r9: the r10-slotted composite melt of the nine remaining
        # staged ops — its NULL-key metric melting is its own
        # cross-engine class, gated here and in deep_fuzz_staged
        ("curation_tuning_card", pipeline.curation_tuning_card,
         pipeline.curation_tuning_card_oracle(), False),
    ]


@pytest.mark.parametrize("name,fn,sql,needs_emb",
                         _staged_pairs(),
                         ids=[p[0] for p in _staged_pairs()])
@pytest.mark.full_suite
def test_edge_docs_staged_parity(spark, edge_dir_emb, name, fn, sql,
                                 needs_emb):
    con = duckdb.connect()
    try:
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{edge_dir_emb}/documents.parquet/*.parquet')")
        con.execute(
            f"CREATE VIEW embeddings AS SELECT * FROM "
            f"read_parquet('{edge_dir_emb}/embeddings.parquet/*.parquet')")
        cur = con.execute(sql)
        ocols = [c[0] for c in cur.description]
        orows = cur.fetchall()
    finally:
        con.close()

    t = {"documents": spark.read.parquet(
        f"{edge_dir_emb}/documents.parquet")}
    if needs_emb:
        t["embeddings"] = spark.read.parquet(
            f"{edge_dir_emb}/embeddings.parquet")
    df = fn(t)
    srows = df.collect()
    assert sorted(df.columns) == sorted(ocols)
    assert len(srows) == len(orows), f"rowcount: {len(srows)} vs {len(orows)}"
    o_idx = [ocols.index(c) for c in sorted(ocols)]
    s_idx = [df.columns.index(c) for c in sorted(df.columns)]
    oset = sorted(tuple(_norm(r[i]) for i in o_idx) for r in orows)
    sset = sorted(tuple(_norm(r[i]) for i in s_idx) for r in srows)
    assert sset == oset, \
        f"first diff: {[p for p in zip(sset, oset) if p[0] != p[1]][:3]}"
