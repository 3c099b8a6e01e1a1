"""Persisted-index validators (operators/validate.py): round-trip
green on freshly written stores, and loud on corrupted ones — the
GraphIndexValidator.cs contract (re-search everything you indexed;
report what the store lost)."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from resin_spark.operators import dedup, similarity, traindata, validate

pytestmark = pytest.mark.usefixtures("spark")


def _ok(df) -> dict[str, tuple[int, bool]]:
    return {r["check"]: (r["n"], r["ok"]) for r in df.collect()}


def _all_ok(df) -> bool:
    return all(r["ok"] for r in df.collect())


@pytest.mark.full_suite
def test_dedup_index_roundtrip_and_corruption(spark, tables, tmp_path):
    path = str(tmp_path / "dedup_idx")
    docs = tables["documents"].limit(80)
    dedup.write_dedup_index(docs, path)
    assert _all_ok(validate.validate_dedup_index(spark, path))

    # corrupt: drop one band partition directory → that band's postings
    # vanish; every doc loses findability in that band
    shutil.rmtree(f"{path}/bands/band=3")
    res = _ok(validate.validate_dedup_index(spark, path))
    assert res["postings_missing"][0] > 0 and not res["postings_missing"][1]
    assert res["ids_unfindable_by_self_probe"][0] > 0
    assert res["ids_with_wrong_band_fanout"][0] > 0

    # wrong signature params also fail loudly (mass mismatch)
    dedup.write_dedup_index(docs, path)
    res = _ok(validate.validate_dedup_index(spark, path, seed=99))
    assert not res["postings_missing"][1]


def test_ann_index_roundtrip_and_corruption(spark, tables, tmp_path):
    path = str(tmp_path / "ann_idx")
    emb = tables["embeddings"].limit(120)
    similarity.write_ann_index(emb, path)
    assert _all_ok(validate.validate_ann_index(spark, path))

    shutil.rmtree(f"{path}/tbl=2")
    res = _ok(validate.validate_ann_index(spark, path))
    assert res["postings_missing"][0] > 0 and not res["postings_missing"][1]
    assert res["ids_unfindable_by_self_probe"][0] > 0
    assert res["ids_with_wrong_table_fanout"][0] > 0


def test_pq_index_roundtrip_reencode_and_corruption(spark, tables, tmp_path):
    path = str(tmp_path / "pq_idx")
    emb = tables["embeddings"].limit(150)
    similarity.write_pq_index(emb, path)
    assert _all_ok(validate.validate_pq_index(spark, path, emb=emb))

    # corrupt the codes relation: shift every code id out of range
    codes = spark.read.parquet(f"{path}/codes")
    bad = codes.select(
        "vec_id",
        F.transform("codes", lambda c: c + 1000).alias("codes"))
    bad.write.mode("overwrite").parquet(f"{path}/codes2")
    shutil.rmtree(f"{path}/codes")
    shutil.move(f"{path}/codes2", f"{path}/codes")
    res = _ok(validate.validate_pq_index(spark, path, emb=emb))
    assert res["codes_out_of_range"][0] > 0
    assert res["codes_mismatch_reencode"][0] > 0


def test_cell_index_roundtrip_and_corruption(spark, tables, tmp_path):
    table = "val_cell_idx"
    emb = tables["embeddings"].limit(150)
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    dedup.write_cell_index(emb, table, n_buckets=4)
    assert _all_ok(validate.validate_cell_index(spark, table, emb=emb))

    # corrupt: append a duplicate row with a wrong cell
    one = spark.table(table).limit(1) \
        .withColumn("cell", F.col("cell") + 999)
    one.write.insertInto(table)
    res = _ok(validate.validate_cell_index(spark, table, emb=emb))
    assert res["ids_duplicated"][0] > 0
    assert res["cells_mismatch_reassign"][0] > 0
    spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_nb_model_roundtrip_and_corruption(spark, tables, tmp_path):
    path = str(tmp_path / "nb_model")
    docs = tables["documents"].limit(200)
    traindata.write_nb_model(docs, path)
    assert _all_ok(validate.validate_nb_model(spark, path))

    # corrupt: drop one language's stats row → unmatched languages AND
    # the prior distribution no longer sums to 1
    cand = spark.read.parquet(f"{path}/lang_stats")
    first = cand.orderBy("cand").first()["cand"]
    cand.filter(F.col("cand") != first).write.mode("overwrite") \
        .parquet(f"{path}/lang_stats2")
    shutil.rmtree(f"{path}/lang_stats")
    shutil.move(f"{path}/lang_stats2", f"{path}/lang_stats")
    res = _ok(validate.validate_nb_model(spark, path))
    assert res["languages_missing_stats"][0] > 0
    assert not res["prior_mass_x1e9"][1]


def test_validate_index_dispatcher(spark, tables, tmp_path):
    path = str(tmp_path / "didx")
    dedup.write_dedup_index(tables["documents"].limit(40), path)
    df = validate.validate_index(spark, path, "dedup")
    assert df.columns == ["artifact", "check", "n", "ok"]
    assert _all_ok(df)
    with pytest.raises(ValueError, match="unknown index kind"):
        validate.validate_index(spark, path, "nope")


def test_ivf_validator_roundtrip_and_corruption(spark, tables, tmp_path):
    """r6: a fresh IVF store validates all-green; moving vectors to the
    wrong cell (unreachable by the pruned probe) fails loudly; the
    dispatcher knows the 'ivf' kind."""
    emb = tables["embeddings"].limit(200)
    path = str(tmp_path / "ivf")
    similarity.write_ivf_index(emb, path, n_cells=16)
    res = {r["check"]: r["ok"]
           for r in validate.validate_index(spark, path, "ivf").collect()}
    assert all(res.values()), res

    entries = spark.read.parquet(f"{path}/entries")
    bad = entries.withColumn(
        "cell", (F.col("cell") + 1) % 16)
    bad.write.mode("overwrite").parquet(f"{path}/entries2")
    shutil.rmtree(f"{path}/entries")
    shutil.move(f"{path}/entries2", f"{path}/entries")
    res = {r["check"]: (r["n"], r["ok"])
           for r in validate.validate_ivf_index(spark, path).collect()}
    assert res["ids_in_wrong_cell"][0] > 0
    assert not res["ids_in_wrong_cell"][1]
