"""Training-data export & curation ops (operators/traindata.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from resin_spark.io import load_tables
from resin_spark.operators import traindata as td
from tests.oracle_util import compare

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def tables(spark):
    return load_tables(spark, SF)


def test_quality_perplexity_oracle(spark, tables):
    assert compare(td.quality_perplexity(tables),
                   td.quality_perplexity_oracle(), SF) is None


def test_shard_export_oracle(spark, tables):
    assert compare(td.shard_export(tables),
                   td.shard_export_oracle(), SF) is None


def test_centroid_assign_oracle(spark, tables):
    assert compare(td.centroid_assign(tables["embeddings"]),
                   td.centroid_assign_oracle(), SF) is None


def test_perplexity_duplicate_docs_score_equal(spark):
    """Two docs with identical text must get identical bits/token, and a
    doc made of corpus-common tokens must score fewer bits than one made
    of corpus-rare tokens (the two-sided quality signal)."""
    rows = [
        (0, "the the the the the the the the"),   # common tokens
        (1, "zyxwv qqqzz plonk"),                 # rare tokens
        (2, "the the the the the the the the"),   # dup of 0
        (3, "the quick brown fox jumps"),
    ]
    t = {"documents": spark.createDataFrame(rows, "doc_id long, text string")}
    out = {r["doc_id"]: r["bits_per_token"]
           for r in td.quality_perplexity(t).collect()}
    assert out[0] == out[2]
    assert out[0] < out[1]


def test_perplexity_empty_doc_dropped(spark):
    t = {"documents": spark.createDataFrame(
        [(0, "hello world"), (1, "!!! ???"), (2, None)],
        "doc_id long, text string")}
    ids = [r["doc_id"] for r in td.quality_perplexity(t).collect()]
    assert ids == [0]


def test_shard_export_deterministic_and_uniform(spark, tables):
    a = td.shard_export(tables).collect()
    b = td.shard_export(tables).collect()
    assert a == b  # pure function of doc ids
    sizes = {}
    for r in a:
        sizes[r["shard"]] = sizes.get(r["shard"], 0) + 1
        assert 1 <= r["pos"] <= r["n_in_shard"]
    n = sum(sizes.values())
    # md5 sharding: no shard more than 2x the even share on 500 docs
    assert max(sizes.values()) <= 2 * (n // td.N_SHARDS + 1)
    # pos is a dense 1..n_in_shard sequence per shard
    per_shard = {}
    for r in a:
        per_shard.setdefault(r["shard"], []).append(r["pos"])
    for shard, ps in per_shard.items():
        assert sorted(ps) == list(range(1, len(ps) + 1))


def test_write_shards_reproducible(spark, tables, tmp_path):
    p1, p2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    td.write_shards(tables["documents"], p1)
    td.write_shards(tables["documents"], p2)
    d1 = spark.read.parquet(p1).orderBy("shard", "doc_id").collect()
    d2 = spark.read.parquet(p2).orderBy("shard", "doc_id").collect()
    assert d1 == d2
    # layout matches the shard_export plan: same doc -> same shard
    plan = {r["doc_id"]: r["shard"] for r in td.shard_export(tables).collect()}
    for r in d1:
        assert plan[r["doc_id"]] == r["shard"]


def test_centroid_assign_covers_all_vectors(spark, tables):
    emb = tables["embeddings"]
    out = td.centroid_assign(emb)
    n_emb = emb.filter(F.col("embedding").isNotNull()
                       & F.col("label").isNotNull()).count()
    assert out.count() == n_emb
    assert out.select("vec_id").distinct().count() == n_emb


def test_centroid_assign_perfect_on_separable_labels(spark):
    """Vectors exactly at two orthogonal corners must be assigned to
    their own label's centroid."""
    rows = [(i, [1.0, 0.0, 0.0, 0.0], 0) for i in range(5)]
    rows += [(i + 5, [0.0, 1.0, 0.0, 0.0], 1) for i in range(5)]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")
    out = td.centroid_assign(emb).collect()
    assert all(r["assigned_label"] == r["true_label"] for r in out)
    assert all(r["score"] == 1.0 for r in out)
