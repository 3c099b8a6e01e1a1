"""Hybrid BM25+vector retrieval with reciprocal-rank fusion."""

from __future__ import annotations

import pytest

from resin_spark.operators import retrieval
from tests.conftest import SF_SMALL
from tests.oracle_util import compare


def _tiny(spark):
    """4 docs + 4 unit-ish vectors where the legs disagree on purpose.

    Lexical leg for query ('alpha',): docs 1, 2 mention alpha (doc 1
    twice — lex rank 1). Vector leg for query_vec_id=0: vec 1 is
    closest to vec 0, then 3, then 2.
    """
    docs = spark.createDataFrame(
        [
            (0, "the query vector row", "en", "s"),
            (1, "alpha alpha beats everything", "en", "s"),
            (2, "alpha appears once here in a much longer document body",
             "en", "s"),
            (3, "no relevant words at all", "en", "s"),
        ],
        "doc_id long, text string, lang string, source string",
    )
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0], 0),
            (1, [0.9, 0.1, 0.0], 0),
            (2, [0.0, 1.0, 0.0], 0),
            (3, [0.5, 0.5, 0.0], 0),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    return {"documents": docs, "embeddings": emb}


def test_rrf_hand_computed(spark):
    t = _tiny(spark)
    out = retrieval.hybrid_search_rrf(
        t, query=("alpha",), query_vec_id=0, k=4, k_each=4, rrf_k=60)
    rows = {r["doc_id"]: r for r in out.collect()}
    # lex ranks: doc1=1, doc2=2; vec ranks: vec1=1, vec3=2, vec2=3
    assert (rows[1]["lex_rank"], rows[1]["vec_rank"]) == (1, 1)
    assert rows[1]["rrf_score"] == pytest.approx(2 / 61, abs=0)
    assert (rows[2]["lex_rank"], rows[2]["vec_rank"]) == (2, 3)
    assert rows[2]["rrf_score"] == 1.0 / 62 + 1.0 / 63
    assert rows[3]["lex_rank"] is None and rows[3]["vec_rank"] == 2
    assert rows[3]["rrf_score"] == 1.0 / 62
    # both-legs doc fuses ahead of every single-leg doc here
    assert [r["doc_id"] for r in sorted(rows.values(), key=lambda r: r["rank"])][0] == 1
    # rank ordering = rrf desc with doc_id tiebreak
    scores = [r["rrf_score"] for r in sorted(rows.values(), key=lambda r: r["rank"])]
    assert scores == sorted(scores, reverse=True)


def test_rrf_single_leg_dropouts(spark):
    t = _tiny(spark)
    # no lexical hits: vector-only ranking survives
    vec_only = retrieval.hybrid_search_rrf(
        t, query=("zzznothing",), query_vec_id=0, k=3, k_each=4).collect()
    assert len(vec_only) == 3
    assert all(r["lex_rank"] is None for r in vec_only)
    # missing query vector: lexical-only ranking survives
    lex_only = retrieval.hybrid_search_rrf(
        t, query=("alpha",), query_vec_id=-1, k=3, k_each=4).collect()
    assert [r["doc_id"] for r in lex_only] == [1, 2]
    assert all(r["vec_rank"] is None for r in lex_only)


def test_rrf_empty_both_legs(spark):
    t = _tiny(spark)
    out = retrieval.hybrid_search_rrf(
        t, query=("zzznothing",), query_vec_id=-1, k=3)
    assert out.count() == 0
    assert out.columns == ["rank", "doc_id", "lex_rank", "vec_rank", "rrf_score"]


def test_hybrid_demo_matches_oracle(tables):
    compare(retrieval.hybrid_search_demo(tables),
            retrieval.hybrid_search_oracle(), SF_SMALL)


def test_hybrid_topk_is_take_ordered(tables):
    """Both legs and the fused top-k must be TakeOrdered (map-side k),
    never a global sort of an unbounded relation."""
    plan = retrieval.hybrid_search_demo(tables) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan[:2000]
    # the only unconditioned join is brute_topk's broadcast query-cross
    assert plan.count("CartesianProduct") == 0, plan[:3000]


@pytest.mark.full_suite
def test_hybrid_indexed_equals_direct_at_complete_probe(spark, tables,
                                                        tmp_path):
    """The persisted-store path (bm25_topk_indexed leg + complete-probe
    IVF leg + shared fusion) must reproduce hybrid_search_rrf row for
    row — the serving face equals the direct computation."""
    from resin_spark.operators import similarity, textindex as ti

    tpath, vpath = str(tmp_path / "text_idx"), str(tmp_path / "ivf_idx")
    ti.write_text_index(tables["documents"], tpath)
    similarity.write_ivf_index(tables["embeddings"], vpath, n_cells=16)

    direct = [tuple(r) for r in retrieval.hybrid_search_demo(tables).collect()]
    indexed = [tuple(r) for r in retrieval.hybrid_search_indexed(
        spark, tpath, vpath).collect()]
    assert indexed == direct and len(direct) == retrieval.HYBRID_TOPK


@pytest.mark.full_suite
def test_hybrid_indexed_lean_probe_runs_and_keeps_lex_leg(spark, tables,
                                                          tmp_path):
    """A lean n_probe changes only the vector leg's candidate set; the
    lexical ranks must be identical to the direct path's."""
    from resin_spark.operators import similarity, textindex as ti

    tpath, vpath = str(tmp_path / "t2"), str(tmp_path / "v2")
    ti.write_text_index(tables["documents"], tpath)
    similarity.write_ivf_index(tables["embeddings"], vpath, n_cells=16)

    lean = retrieval.hybrid_search_indexed(spark, tpath, vpath, n_probe=2)
    rows = lean.collect()
    assert rows
    direct_lex = {r["doc_id"]: r["lex_rank"]
                  for r in retrieval.hybrid_search_demo(tables).collect()
                  if r["lex_rank"] is not None}
    for r in rows:
        if r["lex_rank"] is not None and r["doc_id"] in direct_lex:
            assert r["lex_rank"] == direct_lex[r["doc_id"]]


def test_mmr_rerank_demotes_crowding_duplicates(spark):
    """Two near-identical top hits: MMR keeps the better one first and
    pushes the clone below a diverse lower-scored hit."""
    results = spark.createDataFrame(
        [(1, 10, 0.9), (2, 11, 0.85), (3, 12, 0.5)],
        "rank int, doc_id long, rrf_score double")
    emb = spark.createDataFrame(
        [(10, [1.0, 0.0, 0.0], 0),
         (11, [0.999, 0.01, 0.0], 0),    # clone of 10
         (12, [0.0, 1.0, 0.0], 0)],      # orthogonal
        "vec_id long, embedding array<float>, label int")
    out = [r["doc_id"] for r in retrieval.mmr_rerank(
        results, emb, lam=0.5).orderBy("mmr_rank").collect()]
    assert out == [10, 12, 11]
    # lam=1 ignores diversity: pure relevance order
    pure = [r["doc_id"] for r in retrieval.mmr_rerank(
        results, emb, lam=1.0).orderBy("mmr_rank").collect()]
    assert pure == [10, 11, 12]


def test_mmr_rerank_handles_missing_vectors_and_empty(spark):
    results = spark.createDataFrame(
        [(1, 10, 0.9), (2, 99, 0.8)],    # 99 has no stored embedding
        "rank int, doc_id long, rrf_score double")
    emb = spark.createDataFrame(
        [(10, [1.0, 0.0], 0)], "vec_id long, embedding array<float>, label int")
    out = retrieval.mmr_rerank(results, emb).collect()
    assert [r["doc_id"] for r in out] == [10, 99]
    assert out[1]["max_sim_selected"] == 0.0
    empty = retrieval.mmr_rerank(results.limit(0), emb)
    assert empty.count() == 0
    assert empty.columns == ["mmr_rank", "doc_id", "rrf_score",
                             "max_sim_selected"]


def test_mmr_rerank_refuses_corpus_sized_input(spark):
    import pytest as _pytest

    big = spark.range(retrieval.MMR_MAX_K + 1).selectExpr(
        "id AS doc_id", "CAST(id AS DOUBLE) AS rrf_score")
    emb = spark.createDataFrame(
        [(0, [1.0], 0)], "vec_id long, embedding array<float>, label int")
    with _pytest.raises(ValueError, match="page re-ranker"):
        retrieval.mmr_rerank(big, emb)
