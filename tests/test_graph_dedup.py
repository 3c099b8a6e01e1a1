"""graph_dedup behaviour tests mirroring the reference's GraphTests.cs
build semantics: inserting in id order, a vector merges into an earlier
one when cos ≥ IdenticalAngle (0.99), otherwise it is added
(GraphExtensions.cs:15 AddOrMerge; GraphOptions.cs:5)."""

from __future__ import annotations

import math

import pytest

from resin_spark.operators import graph


def _mk_emb(spark, vecs):
    rows = [(i, [float(x) for x in v], i % 3) for i, v in enumerate(vecs)]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")


def test_identical_vectors_merge_keep_first(spark):
    emb = _mk_emb(spark, [[1, 0, 0, 0], [1, 0, 0, 0], [0, 1, 0, 0]])
    kept = [r["vec_id"] for r in graph.graph_dedup(emb).collect()]
    # vec 1 is an exact duplicate of vec 0 → dropped; orthogonal vec 2 kept
    assert kept == [0, 2]


def test_near_identical_merges_above_threshold(spark):
    eps = 0.01  # cos ≈ 0.99995 → merges
    far = 1.0   # cos ≈ 0.7071 → kept
    emb = _mk_emb(spark, [
        [1, 0, 0, 0],
        [1, eps, 0, 0],
        [1, far, 0, 0],
    ])
    kept = [r["vec_id"] for r in graph.graph_dedup(emb).collect()]
    assert kept == [0, 2]


def test_chain_dedup_uses_earlier_survivors_and_victims(spark):
    """j is dropped when ANY i<j is within the angle — including i that
    were themselves dropped (the reference merges j into the index node
    it collided with, so collision with a merged node still merges)."""
    a = [1.0, 0.0, 0.0, 0.0]
    b = [1.0, 0.008, 0.0, 0.0]   # ≈ a → dropped via a
    c = [1.0, 0.016, 0.0, 0.0]   # ≈ b (and ≈ a) → dropped
    d = [0.0, 0.0, 1.0, 0.0]     # orthogonal → kept
    emb = _mk_emb(spark, [a, b, c, d])
    kept = [r["vec_id"] for r in graph.graph_dedup(emb).collect()]
    assert kept == [0, 3]


def test_threshold_boundary_is_inclusive(spark):
    # construct cos(v0, v1) exactly at the threshold: v1 at angle
    # acos(0.99) from v0 → cos == 0.99 up to float rounding; nudge inside
    theta = math.acos(0.99) * 0.999
    emb = _mk_emb(spark, [
        [1, 0, 0, 0],
        [math.cos(theta), math.sin(theta), 0, 0],
    ])
    kept = [r["vec_id"] for r in graph.graph_dedup(emb).collect()]
    assert kept == [0]


def test_lsh_path_agrees_with_exact_on_clustered_data(spark):
    vecs = []
    for base in ([1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 0]):
        for k in range(4):
            vecs.append([x + (0.001 * k if x else 0.0) for x in base])
    emb = _mk_emb(spark, vecs)
    exact = [r["vec_id"] for r in graph.graph_dedup(emb, dims=4).collect()]
    lsh = [r["vec_id"]
           for r in graph.graph_dedup(emb, dims=4, use_lsh=True).collect()]
    assert exact == lsh == [0, 4, 8]


def test_minhash_lsh_subset_of_exact_with_full_recall(spark):
    """dedup_minhash_lsh is rows-only in the driver gate, so pin its real
    contract here: every emitted pair is exact-verified (subset of the
    exact jaccard pairs at the same tau) and, on this corpus where all
    true pairs sit far above the banding S-curve knee, recall is 1.0."""
    from resin_spark.io import load_tables
    from resin_spark.operators import dedup
    docs = load_tables(spark, "/root/testdata/sf0.001")["documents"]
    exact = {(r["doc_a"], r["doc_b"])
             for r in dedup.ngram_jaccard_pairs(docs).collect()}
    mh = {(r["doc_a"], r["doc_b"])
          for r in dedup.minhash_lsh_pairs(docs).collect()}
    assert mh <= exact          # exact verification: no false positives
    assert mh == exact          # S-curve: full recall on this corpus
