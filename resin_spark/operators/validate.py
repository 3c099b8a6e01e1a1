"""Persisted-index validators — "re-search everything you indexed".

The reference ships GraphIndexValidator.cs / SeekableGraphIndexValidator.cs
(src/Resin.MachineLearning/GraphIndexValidator.cs:1-40): after building
an on-disk graph index, re-search every indexed vector and assert the
index finds it. These are the Spark-first analogs for every persisted
artifact this repo writes (write_ann_index, write_pq_index,
write_dedup_index, write_cell_index, write_nb_model): each validator
re-derives what the store claims from the store's own contents — with
the exact production kernels (minhash UDF, hyperplane hashing, PQ
encoder), so "found" means the real probe path would find it — and
reports one (artifact, check, n, ok) row per invariant. Point it at a
possibly-corrupt store and get found/missing/mismatch accounting
instead of silent wrong answers downstream.

Scale: every check is a distributed aggregate or anti-join over the
index relation itself (code/cell/vocab-sized, or corpus-row-sized at
worst — never corpus × corpus); a validator run costs about one index
build over the indexed rows. The scalar counts pulled to the driver are
one long per check — the convergence-probe pattern, not a data collect.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SUMMARY_SCHEMA = "artifact string, check string, n bigint, ok boolean"


def _summary(spark: SparkSession, artifact: str,
             checks: list[tuple[str, int, bool]]) -> DataFrame:
    return spark.createDataFrame(
        [(artifact, c, int(n), bool(ok)) for c, n, ok in checks],
        SUMMARY_SCHEMA,
    )


def validate_ann_index(spark: SparkSession, path: str,
                       dims: int | None = None, n_planes: int = 8,
                       n_tables: int = 4, seed0: int = 7,
                       id_col: str = "vec_id",
                       vec_col: str = "embedding") -> DataFrame:
    """Re-hash every stored vector with the index's own parameters and
    assert its (tbl, bucket) posting exists — a stored vector whose
    recomputed posting is missing would be unreachable by the very
    self-probe GraphIndexValidator runs. Params must match the write;
    a parameter mismatch shows up as mass posting mismatches, which is
    the desired loud failure."""
    from resin_spark.operators.similarity import (
        _probe_dims, hyperplane_buckets_udf, read_ann_index,
    )

    idx = read_ann_index(spark, path)
    entries = idx.select(id_col, vec_col).distinct().localCheckpoint()
    if dims is None:
        dims = _probe_dims(entries, vec_col)
    h = hyperplane_buckets_udf(dims, n_planes, n_tables, seed0)
    recomputed = entries.select(
        F.col(id_col),
        F.posexplode(h(F.col(vec_col))).alias("tbl", "bucket"),
    ).localCheckpoint()
    stored = idx.select(id_col, F.col("tbl").cast("int").alias("tbl"),
                        "bucket")
    keys = [id_col, "tbl", "bucket"]
    n_missing = recomputed.join(stored, keys, "left_anti").count()
    n_extra = stored.join(recomputed, keys, "left_anti").count()
    n_entries = entries.count()
    bad_fanout = (
        stored.groupBy(id_col).count()
        .filter(F.col("count") != n_tables).count()
    )
    multi_vec = (
        idx.groupBy(id_col)
        .agg(F.countDistinct(vec_col).alias("nv"))
        .filter(F.col("nv") != 1).count()
    )
    unfindable = (
        recomputed.join(stored, keys, "left_anti")
        .select(id_col).distinct().count()
    )
    return _summary(spark, "ann", [
        ("entries", n_entries, n_entries > 0),
        ("postings_missing", n_missing, n_missing == 0),
        ("postings_extra", n_extra, n_extra == 0),
        ("ids_unfindable_by_self_probe", unfindable, unfindable == 0),
        ("ids_with_wrong_table_fanout", bad_fanout, bad_fanout == 0),
        ("ids_with_inconsistent_vectors", multi_vec, multi_vec == 0),
    ])


def validate_pq_index(spark: SparkSession, path: str,
                      emb: DataFrame | None = None,
                      id_col: str = "vec_id",
                      vec_col: str = "embedding") -> DataFrame:
    """Codebook grid completeness + code validity; with the raw corpus
    supplied, re-encode every vector and assert the stored codes match
    (the full "the index would reconstruct what I indexed" check)."""
    from resin_spark.operators.similarity import (
        _pq_encode_udf, read_pq_index, valid_vectors,
    )

    codes, books = read_pq_index(spark, path)
    m_sub, n_codes, _ = books.shape
    grid_ok = bool((books == books).all())  # NaN-free
    n_rows = codes.count()
    dup_ids = (
        codes.groupBy(id_col).count().filter(F.col("count") > 1).count()
    )
    bad_len = codes.filter(
        F.col("codes").isNull() | (F.size("codes") != int(m_sub))
    ).count()
    bad_range = codes.filter(
        F.exists("codes", lambda c: c.isNull() | (c < 0)
                 | (c >= int(n_codes)))
    ).count()
    checks = [
        ("entries", n_rows, n_rows > 0),
        ("codebook_nan_free", int(m_sub * n_codes), grid_ok),
        ("ids_duplicated", dup_ids, dup_ids == 0),
        ("codes_wrong_length", bad_len, bad_len == 0),
        ("codes_out_of_range", bad_range, bad_range == 0),
    ]
    if emb is not None:
        emb = valid_vectors(emb, vec_col)
        reenc = emb.select(
            F.col(id_col),
            _pq_encode_udf(books)(F.col(vec_col)).alias("recodes"),
        )
        mismatch = (
            codes.join(reenc, id_col)
            .filter(F.col("codes") != F.col("recodes")).count()
        )
        missing = reenc.join(codes, id_col, "left_anti").count()
        orphan = codes.join(reenc, id_col, "left_anti").count()
        checks += [
            ("codes_mismatch_reencode", mismatch, mismatch == 0),
            ("corpus_ids_missing", missing, missing == 0),
            ("orphan_ids", orphan, orphan == 0),
        ]
    return _summary(spark, "pq", checks)


def validate_dedup_index(spark: SparkSession, path: str,
                         num_perm: int = 128, bands: int = 32,
                         seed: int = 42) -> DataFrame:
    """Re-sign every stored shingle-hash set and re-derive its band
    postings; a doc whose stored postings diverge would never surface
    as a candidate for its own content — the dedup-index form of "the
    index finds what it indexed". n (shingle width) is burned into the
    stored hash sets, so only the signature params need to match."""
    from resin_spark.operators.dedup import (
        _band_hash_array, _minhash_udf, read_dedup_index,
    )

    hashes, stored = read_dedup_index(spark, path)
    hashes = hashes.localCheckpoint()
    sig = _minhash_udf(num_perm, seed)
    recomputed = (
        hashes.select("doc_id", sig("hashes").alias("sig"))
        .select("doc_id",
                F.posexplode(_band_hash_array("sig", num_perm, bands))
                .alias("band", "band_hash"))
        .localCheckpoint()
    )
    stored = stored.select("doc_id", F.col("band").cast("int").alias("band"),
                           "band_hash")
    keys = ["doc_id", "band", "band_hash"]
    n_docs = hashes.count()
    dup_docs = hashes.groupBy("doc_id").count() \
        .filter(F.col("count") > 1).count()
    n_missing = recomputed.join(stored, keys, "left_anti").count()
    n_extra = stored.join(recomputed, keys, "left_anti").count()
    unfindable = (
        recomputed.join(stored, keys, "left_anti")
        .select("doc_id").distinct().count()
    )
    bad_fanout = stored.groupBy("doc_id").count() \
        .filter(F.col("count") != bands).count()
    return _summary(spark, "dedup", [
        ("entries", n_docs, n_docs > 0),
        ("ids_duplicated", dup_docs, dup_docs == 0),
        ("postings_missing", n_missing, n_missing == 0),
        ("postings_extra", n_extra, n_extra == 0),
        ("ids_unfindable_by_self_probe", unfindable, unfindable == 0),
        ("ids_with_wrong_band_fanout", bad_fanout, bad_fanout == 0),
    ])


def validate_cell_index(spark: SparkSession, table: str,
                        emb: DataFrame | None = None) -> DataFrame:
    """Integrity of the bucketed SemDeDup cell table; with the source
    corpus supplied, also re-derive the assignment (same centroids,
    same argmax) and assert every stored cell matches — the
    re-search-equivalent for a clustering index."""
    idx = spark.table(table)
    n_rows = idx.count()
    dup_ids = idx.groupBy("vec_id").count() \
        .filter(F.col("count") > 1).count()
    null_cells = idx.filter(F.col("cell").isNull()).count()
    bad_vecs = idx.filter(
        F.col("embedding").isNull()
        | F.exists("embedding", lambda x: F.isnan(x))
    ).count()
    checks = [
        ("entries", n_rows, n_rows > 0),
        ("ids_duplicated", dup_ids, dup_ids == 0),
        ("null_cells", null_cells, null_cells == 0),
        ("invalid_vectors", bad_vecs, bad_vecs == 0),
    ]
    if emb is not None:
        from resin_spark.operators.similarity import valid_vectors
        from resin_spark.operators.traindata import (
            _assign_cells, label_centroid_vectors,
        )
        base = valid_vectors(emb).filter(F.col("label").isNotNull())
        expected = _assign_cells(base, label_centroid_vectors(base))
        mismatch = (
            idx.select("vec_id", "cell")
            .join(expected.withColumnRenamed("cell", "recell"), "vec_id")
            .filter(F.col("cell") != F.col("recell")).count()
        )
        missing = expected.join(idx, "vec_id", "left_anti").count()
        orphan = idx.join(expected, "vec_id", "left_anti").count()
        checks += [
            ("cells_mismatch_reassign", mismatch, mismatch == 0),
            ("corpus_ids_missing", missing, missing == 0),
            ("orphan_ids", orphan, orphan == 0),
        ]
    return _summary(spark, "cell", checks)


def validate_nb_model(spark: SparkSession, path: str) -> DataFrame:
    """NB language-model store: the (cand, tok) relation must be keyed,
    every language must carry prior/oov stats and vice versa, all bits
    finite and non-negative, and the priors must still be a probability
    distribution (Σ 2^-prior_bits = 1) — a truncated lang_stats file
    fails loudly here instead of silently skewing every classification."""
    from resin_spark.operators.traindata import read_nb_model

    model, cand = (d.localCheckpoint() for d in read_nb_model(spark, path))
    n_toks = model.count()
    n_langs = cand.count()
    dup_keys = model.groupBy("cand", "tok").count() \
        .filter(F.col("count") > 1).count()
    bad_bits = model.filter(
        F.col("bits").isNull() | F.isnan("bits") | (F.col("bits") < 0)
    ).count()
    langs_wo_stats = model.select("cand").distinct() \
        .join(cand, "cand", "left_anti").count()
    stats_wo_tokens = cand.join(
        model.select("cand").distinct(), "cand", "left_anti").count()
    prior_mass = cand.agg(
        F.sum(F.pow(F.lit(2.0), -F.col("prior_bits"))).alias("m")
    ).first()["m"]
    # prior_bits are stored rounded to 1e-6 bits, so each 2^-bits term
    # carries up to ~ln2·5e-7 relative error; tolerate that, nothing more
    # (a missing language is off by its whole prior share — loud).
    priors_ok = prior_mass is not None \
        and math.isclose(prior_mass, 1.0, abs_tol=1e-6 * max(1, n_langs))
    return _summary(spark, "nb_model", [
        ("token_rows", n_toks, n_toks > 0),
        ("languages", n_langs, n_langs > 0),
        ("duplicate_token_keys", dup_keys, dup_keys == 0),
        ("invalid_bits", bad_bits, bad_bits == 0),
        ("languages_missing_stats", langs_wo_stats, langs_wo_stats == 0),
        ("stats_without_tokens", stats_wo_tokens, stats_wo_tokens == 0),
        ("prior_mass_x1e9", int(round((prior_mass or 0.0) * 1e9)),
         priors_ok),
    ])


VALIDATORS = {
    "ann": validate_ann_index,
    "pq": validate_pq_index,
    "dedup": validate_dedup_index,
    "cell": validate_cell_index,
    "nb_model": validate_nb_model,
}


def validate_index(spark: SparkSession, path: str, kind: str,
                   **kwargs) -> DataFrame:
    """Dispatch to the validator for a persisted artifact kind
    (ann | pq | dedup | cell | nb_model). Returns the uniform
    (artifact, check, n, ok) summary; ``ok`` false on any row means
    the store failed validation."""
    try:
        fn = VALIDATORS[kind]
    except KeyError:
        raise ValueError(
            f"unknown index kind {kind!r}; one of {sorted(VALIDATORS)}")
    return fn(spark, path, **kwargs)
