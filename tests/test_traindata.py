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


def test_line_dedup_oracle(spark, tables):
    assert compare(td.line_dedup_stats(tables),
                   td.line_dedup_stats_oracle(), SF) is None


def test_line_dedup_boilerplate_multiline(spark, tmp_path):
    """Multi-line corpus with repeated boilerplate: the repeated lines
    (and ONLY those) are dropped from clean_text, order preserved, and
    the Spark output matches the DuckDB oracle on the same parquet."""
    import duckdb

    rows = [
        (0, "COOKIE BANNER\nunique alpha text\nfooter licence"),
        (1, "COOKIE BANNER\nanother body line\nfooter licence"),
        (2, "totally unique doc\nno repeats here"),
        (3, "COOKIE BANNER"),
        (4, ""),          # single empty line (unique at count 1 here)
        (5, "\n\n"),      # three empty lines -> corpus-dup with doc 4's
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    d = str(tmp_path / "documents.parquet")
    docs.coalesce(1).write.parquet(d)

    out = {r["doc_id"]: r for r in
           td.line_dedup_stats({"documents": spark.read.parquet(d)}).collect()}
    assert out[0]["n_dup_lines"] == 2          # banner + footer
    assert out[0]["clean_text"] == "unique alpha text"
    assert out[1]["clean_text"] == "another body line"
    assert out[2]["n_dup_lines"] == 0
    assert out[2]["clean_text"] == "totally unique doc\nno repeats here"
    assert out[3]["clean_text"] == ""          # all-boilerplate doc
    # empty lines occur 4x across docs 4+5 -> all duplicated
    assert out[4]["n_dup_lines"] == 1 and out[5]["n_dup_lines"] == 3

    con = duckdb.connect()
    try:
        con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/*.parquet')")
        orows = con.execute(td.line_dedup_stats_oracle()).fetchall()
    finally:
        con.close()
    got = sorted((r["doc_id"], r["n_lines"], r["n_dup_lines"], r["clean_text"])
                 for r in out.values())
    assert got == sorted(orows)


def test_embedding_quantize_oracle(spark, tables):
    compare(td.embedding_quantize(tables["embeddings"]),
            td.embedding_quantize_oracle(), SF)


def test_embedding_quantize_bounds(spark, tables):
    """int8 reconstruction error is bounded by the quantization grid:
    per-component error <= scale/2, so L2 error <= scale/2 * sqrt(d);
    and quantization must keep cosine geometry nearly intact."""
    rows = td.embedding_quantize(tables["embeddings"]).collect()
    assert rows
    for r in rows:
        d = 64
        assert r["recon_err_l2"] <= r["scale"] / 2 * (d ** 0.5) + 1e-9
        assert r["cos_keep"] > 0.99 or r["scale"] == 0.0


def test_embedding_quantize_zero_vector(spark):
    emb = spark.createDataFrame(
        [(0, [0.0, 0.0, 0.0, 0.0]), (1, [1.0, -2.0, 0.5, 0.25])],
        "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r for r in td.embedding_quantize(emb).collect()}
    assert out[0]["scale"] == 0.0
    assert out[0]["n_nonzero"] == 0
    assert out[0]["recon_err_l2"] == 0.0
    assert out[0]["cos_keep"] == 0.0   # gated cosine on the zero vector
    # max-abs component maps to exactly +/-127 -> reconstructs exactly
    assert out[1]["scale"] == round(2.0 / 127.0, 9)
    assert out[1]["n_nonzero"] == 4


def test_quality_perplexity_bigram_oracle(spark, tables):
    compare(td.quality_perplexity_bigram(tables),
            td.quality_perplexity_bigram_oracle(), SF)


def test_bigram_perplexity_separates_template_from_noise(spark):
    """The signal the filter exists for: a doc made of corpus-frequent
    bigrams must score fewer bits/token than a doc of one-off word
    salad on the same corpus."""
    rows = [(i, "the quick brown fox jumps over the lazy dog") for i in range(10)]
    rows.append((10, "zxq plomb vrenk daft quolling snerp walv"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["bits_total"] / r["n_tokens"]
           for r in td.quality_perplexity_bigram({"documents": docs}).collect()}
    assert out[0] < out[10]


def test_bigram_perplexity_single_token_docs(spark):
    """A one-token doc is scored entirely by the unigram backoff; a
    zero-token doc vanishes — in both engines (edge harness covers the
    oracle side)."""
    docs = spark.createDataFrame(
        [(0, "hello"), (1, ""), (2, "hello world")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           td.quality_perplexity_bigram({"documents": docs}).collect()}
    assert set(out) == {0, 2}
    assert out[0]["n_tokens"] == 1
    assert out[2]["n_tokens"] == 2


def test_ngram_novelty_oracle(spark, tables):
    compare(td.ngram_novelty(tables), td.ngram_novelty_oracle(), SF)


def test_ngram_novelty_duplicates_score_zero(spark):
    """Exact duplicates share every shingle (df 2) -> novelty 0; a
    unique doc scores 1; short docs (< n tokens) vanish."""
    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta"),
            (1, "alpha beta gamma delta"),     # exact dup of 0
            (2, "utterly novel text right here"),
            (3, "too short"),                  # < 3 tokens: no shingles
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in
           td.ngram_novelty({"documents": docs}).collect()}
    assert set(out) == {0, 1, 2}
    assert out[0]["novelty"] == 0.0 and out[1]["novelty"] == 0.0
    assert out[2]["novelty"] == 1.0


def test_dup_span_coverage_oracle(spark, tables):
    compare(td.dup_span_coverage(tables), td.dup_span_coverage_oracle(), SF)


def test_dup_span_coverage_islands(spark):
    """Overlapping duplicated k-grams merge into one island; fresh docs
    score 0; within-doc repeats count toward df; short docs (< k
    tokens) report coverage 0 but still appear."""
    dup_text = " ".join(f"w{i}" for i in range(12))      # 12 tokens
    docs = spark.createDataFrame(
        [
            (0, dup_text),                                # dup of 1
            (1, dup_text),
            (2, " ".join(f"x{i}" for i in range(15))),    # fresh
            (3, "short doc"),                             # < k tokens
            # within-doc repeat: the same 10-gram twice in one doc
            (4, " ".join(f"y{i % 10}" for i in range(20))),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in
           td.dup_span_coverage({"documents": docs}, k=10).collect()}
    # docs 0/1: three overlapping dup 10-grams -> one island covering all 12
    assert out[0]["covered_tokens"] == 12 and out[0]["dup_fraction"] == 1.0
    assert out[1]["covered_tokens"] == 12
    assert out[2]["covered_tokens"] == 0 and out[2]["dup_fraction"] == 0.0
    assert out[3]["covered_tokens"] == 0 and out[3]["n_tokens"] == 2
    assert out[4]["covered_tokens"] == 20   # periodic text: all covered


def test_nb_lang_classify_oracle(spark, tables):
    compare(td.nb_lang_classify(tables), td.nb_lang_classify_oracle(), SF)


def test_nb_lang_classify_beats_chance(spark, tables):
    """Self-scored NB must beat the majority-class rate on its own
    training corpus — a classifier that can't fit its train set is
    wired wrong (joins dropping rows, smoothing swamping signal)."""
    out = td.nb_lang_classify(tables)
    agg = out.agg(
        F.avg(F.col("correct").cast("double")).alias("acc"),
        F.count(F.lit(1)).alias("n"),
    ).first()
    langs = (
        tables["documents"].filter("lang IS NOT NULL")
        .groupBy("lang").count().agg(F.max("count"), F.sum("count")).first()
    )
    majority_rate = langs[0] / langs[1]
    assert agg["acc"] > majority_rate, (agg["acc"], majority_rate)


def test_nb_lang_classify_separable_synthetic(spark):
    """Fully separable two-language corpus must classify perfectly."""
    docs = spark.createDataFrame(
        [(i, "aaa bbb ccc ddd", "xx") for i in range(6)]
        + [(10 + i, "eee fff ggg hhh", "yy") for i in range(6)],
        "doc_id long, text string, lang string",
    )
    out = td.nb_lang_classify({"documents": docs})
    assert all(r["correct"] for r in out.collect())


def test_importance_weights_oracle(spark, tables):
    compare(td.importance_weights(tables), td.importance_weights_oracle(), SF)


def test_importance_weights_prefers_target(spark, tables):
    """Mean log-weight of target-language docs must exceed that of
    non-target docs — the defining DSIR property (target-like text
    scores high under p_target/p_raw)."""
    out = td.importance_weights(tables, target_lang="en")
    rows = out.groupBy(F.col("lang") == "en").agg(
        F.avg("log_weight_per_feat")).collect()
    means = {r[0]: r[1] for r in rows}
    assert means[True] > means[False], means


def test_epoch_shuffle_oracle(spark, tables):
    compare(td.epoch_shuffle(tables), td.epoch_shuffle_oracle(), SF)


def test_epoch_shuffle_is_permutation_and_epoch_varying(spark, tables):
    out = td.epoch_shuffle(tables, n_epochs=2, n_shards=4)
    n_docs = tables["documents"].filter("doc_id IS NOT NULL").count()
    # every epoch is a complete permutation of the corpus
    per_epoch = out.groupBy("epoch").agg(
        F.countDistinct("doc_id").alias("d"), F.count(F.lit(1)).alias("n"))
    for r in per_epoch.collect():
        assert r["d"] == n_docs and r["n"] == n_docs
    # (shard, pos) is contiguous 1..n within each shard
    bad = out.groupBy("epoch", "shard").agg(
        F.max("pos").alias("mx"), F.count(F.lit(1)).alias("n")
    ).filter("mx <> n").count()
    assert bad == 0
    # different epochs produce different orders (deterministic reshuffle)
    e0 = out.filter("epoch = 0").select("doc_id", "shard", "pos")
    e1 = out.filter("epoch = 1").select(
        "doc_id", F.col("shard").alias("s1"), F.col("pos").alias("p1"))
    same = e0.join(e1, "doc_id") \
        .filter("shard = s1 AND pos = p1").count()
    assert same < n_docs


def test_kmeans_refine_oracle(spark, tables):
    compare(td.kmeans_refine(tables["embeddings"]),
            td.kmeans_refine_oracle(), SF)


def test_kmeans_refine_tightens_or_holds_cohesion(spark, tables):
    """Lloyd iterations must not lose members and the size-weighted mean
    cohesion after 2 iterations must be >= the 1-iteration value (each
    assign step is optimal for its centroids; each update step is the
    mean — cosine cohesion against the own-cell centroid can only
    improve in aggregate on this data)."""
    emb = tables["embeddings"]
    def weighted(df):
        r = df.agg(F.sum(F.col("n_members") * F.col("mean_cos")).alias("s"),
                   F.sum("n_members").alias("n")).first()
        return r["s"] / r["n"], r["n"]
    c1, n1 = weighted(td.kmeans_refine(emb, iters=1))
    c2, n2 = weighted(td.kmeans_refine(emb, iters=2))
    assert n1 == n2
    assert c2 >= c1 - 1e-9, (c1, c2)


def test_kmeans_refine_separable_clusters_converge(spark):
    """Two tight orthogonal clusters with adversarial label seeding
    (one straggler mislabeled): after 2 iterations every vector sits in
    the cell of its true cluster with cohesion ~1."""
    rows = []
    for i in range(6):
        rows.append((i, [1.0, 0.02 * i, 0.0, 0.0], 0 if i != 5 else 1))
    for i in range(6, 12):
        rows.append((i, [0.0, 0.02 * (i - 6), 1.0, 0.0], 1))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")
    out = td.kmeans_refine(emb, iters=2).collect()
    sizes = sorted(r["n_members"] for r in out)
    assert sizes == [6, 6]
    assert all(r["mean_cos"] > 0.99 for r in out)


def test_nb_model_roundtrip_classifies_identically(spark, tables, tmp_path):
    """Persisted-model classification must equal the in-memory
    self-scored output row-for-row (train once / classify forever)."""
    docs = tables["documents"]
    td.write_nb_model(docs, str(tmp_path / "nb"))
    model, cand = td.read_nb_model(spark, str(tmp_path / "nb"))
    direct = sorted(map(tuple, td.nb_lang_classify(tables).collect()))
    indexed = sorted(map(tuple,
                         td.nb_classify_with_model(docs, model, cand)
                         .collect()))
    assert direct == indexed and direct


def test_nb_stored_model_classifies_new_batch(spark, tables, tmp_path):
    """A new batch with tokens unseen at train time scores through the
    stored model's OOV prior — no crash, all rows emitted."""
    td.write_nb_model(tables["documents"], str(tmp_path / "nb2"))
    model, cand = td.read_nb_model(spark, str(tmp_path / "nb2"))
    new = spark.createDataFrame(
        [(1000, "the cat zzzqqq unseen", "en"),
         (1001, "der hund xxyyzz", "de")],
        "doc_id long, text string, lang string")
    out = td.nb_classify_with_model(new, model, cand).collect()
    assert len(out) == 2
    assert all(r["pred_lang"] is not None for r in out)


def test_embedding_drift_semantics(spark):
    """Hand-built snapshots: unchanged labels report zero shift, a
    scaled label reports positive shift and a larger mean norm, a
    label present on one side only reports the other count 0 with
    null metrics."""
    from resin_spark.operators import traindata as td
    from pyspark.sql import functions as F
    old = spark.createDataFrame(
        [(1, [1.0, 0.0], 0), (2, [0.0, 1.0], 0),
         (3, [3.0, 4.0], 1),
         (4, [1.0, 1.0], 2)],
        "vec_id long, embedding array<float>, label int")
    new = (
        old.filter(F.col("label") != 2)
        .withColumn("embedding",
                    F.when(F.col("label") == 1,
                           F.transform("embedding", lambda x: x * 2))
                    .otherwise(F.col("embedding")))
        .unionByName(spark.createDataFrame(
            [(9, [0.5, 0.5], 3)],
            "vec_id long, embedding array<float>, label int"))
    )
    rows = {r["label"]: r for r in td.embedding_drift(old, new).collect()}
    assert rows[0]["centroid_shift_l2"] == 0.0
    assert rows[0]["mean_norm_old"] == rows[0]["mean_norm_new"]
    assert rows[1]["centroid_shift_l2"] == 5.0   # (3,4) -> (6,8)
    assert rows[1]["mean_norm_new"] == 2 * rows[1]["mean_norm_old"]
    assert rows[2]["n_new"] == 0 and rows[2]["centroid_shift_l2"] is None
    assert rows[3]["n_old"] == 0 and rows[3]["mean_norm_old"] is None


def test_embedding_drift_demo_oracle_parity(spark):
    from resin_spark.io import load_tables
    from resin_spark.operators import traindata as td
    from tests.oracle_util import compare
    t = load_tables(spark, "/root/testdata/sf0.001")
    compare(td.embedding_drift_demo(t), td.embedding_drift_demo_oracle(),
            "/root/testdata/sf0.001")


def test_lang_confusion_matches_oracle_and_sums_to_one(spark):
    from tests.oracle_util import compare
    from resin_spark.io import load_tables
    from resin_spark.operators import traindata as td

    t = load_tables(spark, "/root/testdata/sf0.001")
    df = td.lang_confusion(t)
    compare(df, td.lang_confusion_oracle(), "/root/testdata/sf0.001")
    rows = df.collect()
    per_true: dict = {}
    for r in rows:
        per_true.setdefault(r["true_lang"], 0.0)
        per_true[r["true_lang"]] += r["share_of_true"]
    for lang, s in per_true.items():
        assert abs(s - 1.0) < 1e-9, (lang, s)


def _cdc_python(texts, k=4, mask=15, min_count=2):
    """Scalar reference: tokenize, content-defined boundaries, chunk,
    count corpus-wide duplicates."""
    import hashlib
    import re

    d = mask + 1
    per_doc = []
    all_chunks = []
    for doc_id, text in texts:
        toks = [w for w in re.split(r"[^a-z0-9]+", text.lower()) if w]
        if not toks:
            continue
        n = len(toks)
        bpos = [i for i in range(k, n)
                if int(hashlib.md5(
                    " ".join(toks[i - k:i]).encode()).hexdigest()[:15],
                    16) % d == 0]
        starts = [1] + [b + 1 for b in bpos]
        ends = bpos + [n]
        chunks = [" ".join(toks[s - 1:e]) for s, e in zip(starts, ends)]
        per_doc.append((doc_id, n, chunks))
        all_chunks.extend(chunks)
    from collections import Counter
    cnt = Counter(all_chunks)
    out = {}
    for doc_id, n, chunks in per_doc:
        nd = sum(1 for c in chunks if cnt[c] >= min_count)
        out[doc_id] = (n, len(chunks), nd)
    return out


def test_cdc_chunk_stats_matches_python_reference(spark):
    from resin_spark.operators import traindata as td

    shared = " ".join(f"w{i}" for i in range(80))
    texts = [
        (1, shared),
        (2, "totally different prefix here " + shared),
        (3, "short doc"),
        (4, "alpha beta gamma delta"),
        (5, "alpha beta gamma delta"),
    ]
    df = spark.createDataFrame(
        [(i, t, "en", "s") for i, t in texts],
        "doc_id long, text string, lang string, source string")
    got = {r["doc_id"]: (r["n_tokens"], r["n_chunks"], r["n_dup_chunks"])
           for r in td.cdc_chunk_stats({"documents": df}).collect()}
    assert got == _cdc_python(texts)
    # the CDC property: the shifted shared passage chunks identically in
    # both docs — most chunks flag as duplicates despite the prefix
    # (line/fixed-window dedup would miss this alignment)
    assert got[1][2] >= got[1][1] - 1 >= 1
    assert got[2][2] >= got[1][1] - 1
    # exact short duplicates are caught (docs 4/5 are byte-identical)
    assert got[4][2] >= 1 and got[5][2] >= 1


def test_cdc_chunk_stats_matches_oracle(spark):
    from tests.oracle_util import compare
    from resin_spark.io import load_tables
    from resin_spark.operators import traindata as td

    t = load_tables(spark, "/root/testdata/sf0.001")
    compare(td.cdc_chunk_stats(t), td.cdc_chunk_stats_oracle(),
            "/root/testdata/sf0.001")


# --- perplexity_threshold_curve -------------------------------------------------


def test_perplexity_threshold_curve_hand_computed(spark):
    # unigram LM over "a a a a" + "b c d e": tf(a)=4, tf(b..e)=1,
    # total=8 -> bits(a) = -log2(4/8) = 1.0 exactly, bits(b..e) = 3.0
    # exactly; doc 0 scores 1.0 bits/token, doc 1 scores 3.0 - every
    # value an exact IEEE double, so the cuts are unambiguous
    df = spark.createDataFrame(
        [(0, "a a a a", "en", "s"), (1, "b c d e", "en", "s")],
        "doc_id long, text string, lang string, source string")
    rows = {r["threshold"]: r for r in td.perplexity_threshold_curve(
        {"documents": df}, thresholds=(0.5, 1.0, 3.0)).collect()}
    assert rows[0.5]["n_docs_kept"] == 0 and rows[0.5]["n_tokens_kept"] == 0
    assert rows[0.5]["doc_share"] == 0.0 and rows[0.5]["token_share"] == 0.0
    assert rows[1.0]["n_docs_kept"] == 1 and rows[1.0]["n_tokens_kept"] == 4
    assert rows[1.0]["doc_share"] == 0.5 and rows[1.0]["token_share"] == 0.5
    assert rows[3.0]["n_docs_kept"] == 2 and rows[3.0]["n_tokens_kept"] == 8
    assert rows[3.0]["doc_share"] == 1.0 and rows[3.0]["token_share"] == 1.0


def test_perplexity_threshold_curve_empty_and_monotone(spark):
    # zero-token corpus: every doc vanishes at the explode; counts are
    # 0 and shares NULL (0/0) on a grid that must still emit all rows
    empty = spark.createDataFrame(
        [(0, "", "en", "s"), (1, "!!!", "en", "s")],
        "doc_id long, text string, lang string, source string")
    rows = td.perplexity_threshold_curve({"documents": empty},
                                         thresholds=(1.0, 2.0)).collect()
    assert [r["threshold"] for r in rows] == [1.0, 2.0]
    assert all(r["n_docs_kept"] == 0 and r["n_tokens_kept"] == 0 for r in rows)
    assert all(r["doc_share"] is None and r["token_share"] is None
               for r in rows)
    # monotonicity on real data: kept mass never decreases with the cut
    t = load_tables(spark, "/root/testdata/sf0.001")
    card = td.perplexity_threshold_curve(t).collect()
    docs = [r["n_docs_kept"] for r in card]
    toks = [r["n_tokens_kept"] for r in card]
    assert docs == sorted(docs) and toks == sorted(toks)
    assert card[-1]["doc_share"] == 1.0


def test_perplexity_threshold_curve_matches_oracle(spark):
    t = load_tables(spark, "/root/testdata/sf0.001")
    compare(td.perplexity_threshold_curve(t),
            td.perplexity_threshold_curve_oracle(), "/root/testdata/sf0.001")


def test_perplexity_threshold_curve_grid_is_broadcast(spark):
    """The only nested-loop join allowed is scored x the |grid|-row
    broadcast threshold dim; the scored relation reads from the
    checkpoint, so the corpus is tokenised once, not per grid row."""
    t = load_tables(spark, "/root/testdata/sf0.001")
    plan = td.perplexity_threshold_curve(t) \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("CartesianProduct") == 0, plan[:3000]
    assert 1 <= plan.count("BroadcastNestedLoopJoin") <= 2, plan[:3000]


# --- shard_manifest --------------------------------------------------------------


def test_shard_manifest_detects_exactly_the_changed_shard(spark):
    def mk(rows):
        return {"documents": spark.createDataFrame(
            rows,
            "doc_id long, text string, lang string, source string, n_chars long")}

    rows = [(i, f"doc body {i}", "en", "s", 10) for i in range(40)]
    base = {r["shard"]: (r["n_docs"], r["n_chars"], r["content_sig"])
            for r in td.shard_manifest(mk(rows)).collect()}

    # identical corpus -> identical manifest (the replica-equality contract)
    again = {r["shard"]: (r["n_docs"], r["n_chars"], r["content_sig"])
             for r in td.shard_manifest(mk(list(rows))).collect()}
    assert again == base

    # flip ONE doc's text: only that doc's shard may change, and only
    # its signature (counts and chars unchanged)
    mutated = list(rows)
    mutated[7] = (7, "tampered body", "en", "s", 10)
    changed = {r["shard"]: (r["n_docs"], r["n_chars"], r["content_sig"])
               for r in td.shard_manifest(mk(mutated)).collect()}
    diff = {s for s in base if base[s] != changed[s]}
    assert len(diff) == 1
    s = diff.pop()
    assert base[s][0] == changed[s][0] and base[s][1] == changed[s][1]
    assert base[s][2] != changed[s][2]

    # drop one doc: its shard loses a row and re-signs; others untouched
    dropped = {r["shard"]: (r["n_docs"], r["n_chars"], r["content_sig"])
               for r in td.shard_manifest(mk(rows[:-1])).collect()}
    gone = [s for s in base if s not in dropped or base[s] != dropped[s]]
    assert len(gone) == 1


def test_shard_manifest_matches_oracle(spark):
    t = load_tables(spark, "/root/testdata/sf0.001")
    compare(td.shard_manifest(t), td.shard_manifest_oracle(),
            "/root/testdata/sf0.001")


def test_shard_manifest_is_one_exchange_no_window(spark):
    """The manifest must stay a pure map-side partial aggregate: one
    shuffle onto n_shards groups, no window, no sort before the agg —
    the O(n_shards)-state claim that makes it honest at 100 TB."""
    t = load_tables(spark, "/root/testdata/sf0.001")
    plan = td.shard_manifest(t) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan[:2000]
    # exactly one HASH shuffle (the n_shards groupBy); the only other
    # exchange is the bounded presentation sort's range partitioning
    assert plan.count("Exchange hashpartitioning") == 1, plan[:2000]
    assert "partial_bit_xor" in plan or "partial" in plan.lower(), \
        plan[:2000]


def test_merge_manifests_equals_full_rebuild_and_flags_double_count(spark):
    def mk(rows):
        return {"documents": spark.createDataFrame(
            rows,
            "doc_id long, text string, lang string, source string, n_chars long")}

    a = [(i, f"standing doc {i}", "en", "s", 12) for i in range(0, 30)]
    b = [(i, f"batch doc {i}", "en", "s", 9) for i in range(30, 45)]

    merged = {r["shard"]: tuple(r)
              for r in td.merge_manifests(
                  td.shard_manifest(mk(a)), td.shard_manifest(mk(b))
              ).collect()}
    full = {r["shard"]: tuple(r)
            for r in td.shard_manifest(mk(a + b)).collect()}
    assert merged == full  # the append-family contract

    # double-counting a batch makes the signature LOUDLY diverge from
    # a fresh full manifest (XOR cancels the duplicated docs out)
    twice = {r["shard"]: r["content_sig"]
             for r in td.merge_manifests(
                 td.shard_manifest(mk(a)), td.shard_manifest(mk(b)),
                 td.shard_manifest(mk(b))).collect()}
    assert any(twice[s] != full[s][3] for s in twice)
