"""Streaming document-quality scoring (ingestion-time twin of
operators/traindata.quality_perplexity).

A continuous ingestion pipeline can't rebuild the corpus LM per
micro-batch — the model is a frozen ARTIFACT built from the already-
ingested corpus and shipped to executors, exactly how a production
quality gate deploys a KenLM/CCNet scorer. Here the artifact is the
unigram bits table (token → −log2 tf/total, the same values the batch
operator computes), capped to a top-``vocab_cap`` vocabulary with an
out-of-vocabulary fallback, broadcast once, and applied per micro-batch
with an Arrow-batched mapInPandas — no stream-side shuffle, no
stateful aggregation, so the scoring cost is exactly one pass over each
arriving batch at any cluster size.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from resin_spark.functions import text as T

VOCAB_CAP = 1 << 16


def build_unigram_lm(docs: DataFrame, vocab_cap: int = VOCAB_CAP,
                     min_tf: int = 1):
    """(bits_by_token, oov_bits): the frozen scorer artifact.

    bits values are computed with the batch operator's exact recipe
    (tf/total as an IEEE division, −log2, rounded to 6 once per
    DISTINCT token), so streaming scores over in-vocabulary text equal
    the batch ``quality_perplexity`` output bit-for-bit. The vocabulary
    keeps the ``vocab_cap`` highest-tf tokens (ties: token asc); any
    other token scores ``oov_bits`` — the information content of a
    singleton (−log2 1/total), the standard pessimistic OOV prior.

    The collect is vocab-sized (≤ vocab_cap rows), never corpus-sized.
    The top-cap's TakeOrdered merge ships at most partitions × cap
    rows to the driver; a web-scale vocabulary (garbage tokens make it
    ~|corpus tokens| in the limit) should first drop the hapax tail
    with ``min_tf >= 2`` — the filter runs before the ordered take, so
    the merge only ever sees the surviving vocabulary. min_tf stays 1
    by default because the exact batch-parity contract needs every
    corpus token in vocabulary.
    """
    toks = (
        docs.filter(F.col("doc_id").isNotNull())
        .select(F.explode(T.tokens("text")).alias("tok"))
    )
    lm = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("tf"))
    rows = (
        lm.filter(F.col("tf") >= min_tf)
        .join(F.broadcast(lm.agg(F.sum("tf").alias("total"))))
        .orderBy(F.col("tf").desc(), "tok")
        .limit(vocab_cap)
        .select("tok", "tf", "total")
        .collect()
    )
    total = rows[0]["total"] if rows else 1
    bits_by_token = {
        r["tok"]: round(-math.log2(r["tf"] / total), 6) for r in rows
    }
    oov_bits = round(-math.log2(1.0 / total), 6)
    return bits_by_token, oov_bits


def stream_quality_score(spark: SparkSession, docs_parquet_dir: str,
                         lm_docs: DataFrame,
                         vocab_cap: int = VOCAB_CAP) -> DataFrame:
    """Score a document stream with a static unigram LM built from
    ``lm_docs``: (doc_id, n_tokens, bits_per_token), append mode.

    Per-row scoring only — tokenise, look each token up in the
    broadcast bits table, HALF_UP-round the exact micro-bits mean — so
    there is no watermark, no state store, and no shuffle on the stream
    side; docs with zero tokens are dropped (the batch twin's explode
    semantics). On a shared-vocabulary corpus the emitted rows equal
    the batch ``quality_perplexity`` output exactly (pinned in
    tests/test_streaming_io.py); unseen tokens score the OOV prior.
    """
    import pandas as pd

    bits_by_token, oov_bits = build_unigram_lm(lm_docs, vocab_cap)
    bc = spark.sparkContext.broadcast((bits_by_token, oov_bits))
    tokenize_re = T.TOKEN_SPLIT_RE

    def score(batches):
        import re
        table, oov = bc.value
        splitter = re.compile(tokenize_re)
        for pdf in batches:
            out = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                if doc_id is None or text is None:
                    continue
                toks = [t for t in splitter.split(text.lower()) if t]
                if not toks:
                    continue
                # exact integer micro-bits sum, then one HALF_UP round.
                # The mean must round in INTEGER micro-bits —
                # floor((2·micro+n)/(2n)) is exact HALF_UP of micro/n
                # (bits are non-negative) — because the batch side
                # (exact.dravg) half-up-rounds the exact DECIMAL
                # quotient: a float mean is off by an ulp on exact
                # .5-at-the-7th-digit ties (r7 stream-fuzz, seed 13002:
                # 4.041214 vs 4.041215)
                micro = sum(int(round(table.get(t, oov) * 1e6)) for t in toks)
                n = len(toks)
                out.append((doc_id, n, ((2 * micro + n) // (2 * n)) / 1e6))
            yield pd.DataFrame(
                out, columns=["doc_id", "n_tokens", "bits_per_token"])

    schema = spark.read.parquet(docs_parquet_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(docs_parquet_dir)
    )
    # NULL doc_ids reach pandas as NaN (not None) through Arrow — gate
    # them JVM-side so the batch twin's doc_id IS NOT NULL filter holds
    return (
        stream.select("doc_id", "text")
        .filter(F.col("doc_id").isNotNull() & F.col("text").isNotNull())
        .mapInPandas(
            score, "doc_id long, n_tokens long, bits_per_token double")
    )


BIGRAM_CAP = 1 << 18


def build_bigram_lm(docs: DataFrame, bigram_cap: int = BIGRAM_CAP,
                    vocab_cap: int = VOCAB_CAP):
    """(bits_by_bigram, bits_by_token, oov_bits): the frozen KN-bigram
    scorer artifact (streaming twin of traindata.quality_perplexity_bigram).

    Bigram and unigram bits come from the SAME DataFrame expressions the
    batch operator scores with (traindata.bigram_bits_frames), so
    streaming scores over fully-covered text equal the batch output
    bit-for-bit. The bigram table keeps the ``bigram_cap`` highest-c12
    types (ties: (w1, w2) asc), the unigram table the ``vocab_cap``
    highest-tf tokens; both collects are vocabulary-sized, never
    corpus-sized. Backoff at score time: an unseen bigram falls back to
    the unigram bits of its RIGHT word (stupid backoff, α = 1), an
    unseen word to the singleton OOV prior — same spirit as the unigram
    twin's prior, and irrelevant to the batch-parity pin, which covers
    the full vocabulary.
    """
    import math as _math

    from pyspark.sql import functions as FF

    from resin_spark.operators import traindata as td

    base = td._doc_token_arrays(docs)
    bits_bi, bits_uni = td.bigram_bits_frames(base)
    bi_rows = (
        bits_bi.orderBy(FF.col("c12").desc(), "w1", "w2")
        .limit(bigram_cap).select("w1", "w2", "bits").collect()
    )
    uni_rows = (
        bits_uni.orderBy(FF.col("cw").desc(), "w")
        .limit(vocab_cap).select("w", "bits", "total").collect()
    )
    bits_by_bigram = {(r["w1"], r["w2"]): r["bits"] for r in bi_rows}
    bits_by_token = {r["w"]: r["bits"] for r in uni_rows}
    total = uni_rows[0]["total"] if uni_rows else 1
    oov_bits = round(-_math.log2(1.0 / total), 6)
    return bits_by_bigram, bits_by_token, oov_bits


def stream_quality_score_bigram(spark: SparkSession, docs_parquet_dir: str,
                                lm_docs: DataFrame,
                                bigram_cap: int = BIGRAM_CAP,
                                vocab_cap: int = VOCAB_CAP) -> DataFrame:
    """Score a document stream with the frozen bigram LM:
    (doc_id, n_tokens, bits_total), append mode.

    Per-row scoring only (tokenise → first-token unigram lookup +
    adjacent-bigram lookups → exact integer micro-bits sum) — no
    watermark, no state, no stream-side shuffle. bits_total is an
    integer number of micro-bits divided by 1e6 — exactly the batch
    operator's decimal(18,6) sum — so on a shared-vocabulary corpus the
    emitted rows equal the batch quality_perplexity_bigram output
    row-for-row (pinned in tests/test_streaming_io.py).
    """
    import pandas as pd

    bits_bi, bits_uni, oov = build_bigram_lm(lm_docs, bigram_cap, vocab_cap)
    bc = spark.sparkContext.broadcast((bits_bi, bits_uni, oov))
    tokenize_re = T.TOKEN_SPLIT_RE

    def score(batches):
        import re
        table_bi, table_uni, oov_bits = bc.value
        splitter = re.compile(tokenize_re)
        for pdf in batches:
            out = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                if doc_id is None or text is None:
                    continue
                toks = [t for t in splitter.split(text.lower()) if t]
                if not toks:
                    continue
                micro = int(round(
                    table_uni.get(toks[0], oov_bits) * 1e6))
                for w1, w2 in zip(toks, toks[1:]):
                    b = table_bi.get((w1, w2))
                    if b is None:
                        b = table_uni.get(w2, oov_bits)
                    micro += int(round(b * 1e6))
                out.append((doc_id, len(toks), float(micro) / 1e6))
            yield pd.DataFrame(
                out, columns=["doc_id", "n_tokens", "bits_total"])

    schema = spark.read.parquet(docs_parquet_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(docs_parquet_dir)
    )
    return (
        stream.select("doc_id", "text")
        .filter(F.col("doc_id").isNotNull() & F.col("text").isNotNull())
        .mapInPandas(
            score, "doc_id long, n_tokens long, bits_total double")
    )


def build_nb_model(docs: DataFrame, vocab_cap: int = VOCAB_CAP):
    """(bits_by_lang_tok, per_lang): the frozen Naive-Bayes language
    classifier artifact (streaming twin of traindata.nb_lang_classify).

    The relations come STRAIGHT from traindata.nb_model_frames — the
    same frames the batch operator scores with and write_nb_model
    persists — filtered to the ``vocab_cap`` highest-global-tf tokens
    (ties: token asc), so streaming scores over in-vocabulary text
    equal the batch output bit-for-bit by construction (no duplicated
    smoothing/rounding recipe to drift). A (lang, tok) pair absent
    from the table scores that language's oov_bits, which IS the batch
    value for a zero-count pair ((0+1)/(n_lang+V)). Both collects are
    vocabulary-sized, never corpus-sized.
    """
    from resin_spark.operators.traindata import nb_model_frames

    model, cand, cnt = nb_model_frames(docs, with_counts=True)
    # global tf from the already-checkpointed (lang, tok, c) counts —
    # no third corpus scan for the vocab cap
    kept = (
        cnt.groupBy("tok").agg(F.sum("c").alias("gtf"))
        .orderBy(F.col("gtf").desc(), "tok").limit(vocab_cap)
        .select("tok")
    )
    model_rows = model.join(F.broadcast(kept), "tok").collect()
    lang_rows = cand.collect()
    bits_by_lang_tok = {(r["cand"], r["tok"]): r["bits"] for r in model_rows}
    per_lang = {r["cand"]: (r["prior_bits"], r["oov_bits"])
                for r in lang_rows}
    return bits_by_lang_tok, per_lang


def stream_lang_classify(spark: SparkSession, docs_parquet_dir: str,
                         model_docs: DataFrame,
                         vocab_cap: int = VOCAB_CAP) -> DataFrame:
    """Classify a document stream with the frozen NB language model:
    (doc_id, true_lang, pred_lang, best_bits, correct), append mode.

    Per-row scoring only — tokenise once, fold integer micro-bits per
    candidate language, argmin with language-ascending tie-break — no
    watermark, no state store, no stream-side shuffle. On a
    shared-vocabulary corpus the emitted rows equal the batch
    ``nb_lang_classify`` output exactly (pinned in
    tests/test_streaming_io.py); tokens outside the model score each
    language's OOV prior, which is also the batch zero-count value.
    """
    import pandas as pd

    table, per_lang = build_nb_model(model_docs, vocab_cap)
    bc = spark.sparkContext.broadcast((table, per_lang))
    tokenize_re = T.TOKEN_SPLIT_RE

    def score(batches):
        import re
        tbl, pl = bc.value
        langs = sorted(pl)
        splitter = re.compile(tokenize_re)
        for pdf in batches:
            out = []
            for doc_id, true_lang, text in zip(
                    pdf["doc_id"], pdf["lang"], pdf["text"]):
                if doc_id is None or true_lang is None or text is None:
                    continue
                toks = [t for t in splitter.split(text.lower()) if t]
                if not toks:
                    continue
                best_lang, best_micro = None, None
                for lang in langs:
                    prior_bits, oov_bits = pl[lang]
                    oov_micro = int(round(oov_bits * 1e6))
                    micro = int(round(prior_bits * 1e6))
                    for t in toks:
                        b = tbl.get((lang, t))
                        micro += int(round(b * 1e6)) if b is not None \
                            else oov_micro
                    if best_micro is None or micro < best_micro:
                        best_lang, best_micro = lang, micro
                out.append((doc_id, true_lang, best_lang,
                            float(best_micro) / 1e6,
                            best_lang == true_lang))
            yield pd.DataFrame(out, columns=[
                "doc_id", "true_lang", "pred_lang", "best_bits", "correct"])

    schema = spark.read.parquet(docs_parquet_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(docs_parquet_dir)
    )
    return (
        stream.select("doc_id", "lang", "text")
        .filter(F.col("doc_id").isNotNull() & F.col("lang").isNotNull()
                & F.col("text").isNotNull())
        .mapInPandas(
            score,
            "doc_id long, true_lang string, pred_lang string, "
            "best_bits double, correct boolean")
    )


# --- streaming BM25 (ingestion-time twin of textops.bm25_search) -------------

def build_bm25_model(docs: DataFrame, query=None):
    """(df_by_term, n_docs, avgdl): the frozen ranked-retrieval scorer
    artifact — query-term document frequencies plus the corpus length
    statistics, computed with textops.bm25_search's exact recipe so
    streaming scores over the same corpus equal the batch per-doc rows
    bit-for-bit. |query|+2 scalars: trivially broadcastable at any
    corpus size."""
    from resin_spark.operators.textops import BM25_QUERY

    query = tuple(query or BM25_QUERY)
    toks = (
        docs.filter(F.col("doc_id").isNotNull())
        .select("doc_id", F.explode(T.tokens("text")).alias("term"))
    )
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(F.count(F.lit(1)).alias("n"),
                   F.sum("dl").alias("tot")).first()
    n_docs = stats["n"] or 0
    avgdl = (stats["tot"] / stats["n"]) if n_docs else 1.0
    df_rows = (
        toks.filter(F.col("term").isin(list(query)))
        .groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
        .groupBy("term").agg(F.count(F.lit(1)).alias("df"))
        .collect()
    )
    return {r["term"]: r["df"] for r in df_rows}, n_docs, avgdl


def stream_bm25_score(spark: SparkSession, docs_parquet_dir: str,
                      model_docs: DataFrame, query=None,
                      k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """Score a document stream against a frozen BM25 model:
    (doc_id, n_hits, score), append mode — the ingestion-time ranked
    filter ("does this new doc match the standing query profile").

    Per-row scoring only: tokenize, count query-term hits, apply the
    SAME IEEE float expression chain as the batch operator (Python
    floats are IEEE doubles; identical literals, identical op order)
    and the same string→decimal(28,15) HALF_UP exact sum — so on a
    shared corpus the emitted rows equal batch per-doc scores
    bit-for-bit (pinned in tests). No watermark, no state store, no
    stream-side shuffle. Query terms unseen in the model corpus
    (df=0) are skipped — no idf is defined for them; docs with zero
    query-term hits emit nothing (the batch inner join's semantics).
    """
    import pandas as pd

    from resin_spark.operators.textops import BM25_QUERY

    query = tuple(query or BM25_QUERY)
    df_by_term, n_docs, avgdl = build_bm25_model(model_docs, query)
    bc = spark.sparkContext.broadcast((df_by_term, n_docs, avgdl))
    tokenize_re = T.TOKEN_SPLIT_RE
    k11, one_minus_b = k1 + 1.0, 1.0 - b

    def score(batches):
        import re
        from decimal import ROUND_HALF_UP, Decimal

        q15 = Decimal("1e-15")
        dft, n, ad = bc.value
        splitter = re.compile(tokenize_re)
        for pdf in batches:
            out = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                if doc_id is None or text is None:
                    continue
                toks = [t for t in splitter.split(text.lower()) if t]
                if not toks:
                    continue
                dl = len(toks)
                total, hits = Decimal(0), 0
                for term in query:
                    tf = toks.count(term)
                    df = dft.get(term, 0)
                    if tf == 0 or df == 0:
                        continue
                    hits += 1
                    idf = (float(n - df) + 0.5) / (float(df) + 0.5)
                    denom = float(tf) + k1 * (one_minus_b
                                              + b * (float(dl) / ad))
                    score_t = idf * ((float(tf) * k11) / denom)
                    total += Decimal(repr(score_t)).quantize(
                        q15, rounding=ROUND_HALF_UP)
                if hits:
                    out.append((doc_id, hits, float(total)))
            yield pd.DataFrame(out, columns=["doc_id", "n_hits", "score"])

    schema = spark.read.parquet(docs_parquet_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(docs_parquet_dir)
    )
    return (
        stream.select("doc_id", "text")
        .filter(F.col("doc_id").isNotNull() & F.col("text").isNotNull())
        .mapInPandas(score, "doc_id long, n_hits long, score double")
    )


def stream_phrase_match(spark: SparkSession, docs_parquet_dir: str,
                        phrase=None) -> DataFrame:
    """Streaming exact-phrase matcher: (doc_id, n_occurrences,
    n_tokens) for arriving docs containing the phrase — the
    ingestion-time routing face of textops.phrase_search (occurrence
    counting is already row-local there, so the stream twin is the
    same stateless expression chain: no watermark, no state, no
    shuffle). Emitted rows equal the batch operator's pre-top-k scored
    relation bit-for-bit (integer counts; pinned in tests)."""
    from resin_spark.operators.textops import PHRASE_QUERY

    phrase = tuple(phrase or PHRASE_QUERY)
    if not phrase:
        raise ValueError("phrase must contain at least one term")
    n = len(phrase)
    tk = T.tokens("text")
    starts = F.when(
        F.size(tk) >= n,
        F.sequence(F.lit(1), F.size(tk) - (n - 1)),
    ).otherwise(F.array().cast("array<int>"))

    def match_at(i):
        cond = F.element_at(tk, i.cast("int")) == phrase[0]
        for j in range(1, n):
            cond = cond & (F.element_at(tk, (i + j).cast("int")) == phrase[j])
        return cond

    schema = spark.read.parquet(docs_parquet_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(docs_parquet_dir)
    )
    return (
        stream.filter(F.col("doc_id").isNotNull())
        .select(
            "doc_id",
            F.size(F.filter(starts, match_at)).alias("n_occurrences"),
            F.size(tk).alias("n_tokens"),
        )
        .filter(F.col("n_occurrences") > 0)
    )


def stream_corpus_delta(spark: SparkSession, docs_parquet_dir: str,
                        old_snapshot: DataFrame) -> DataFrame:
    """Classify a document stream against a FROZEN snapshot fingerprint
    relation: each arriving doc emits (doc_id, status, old_md5,
    new_md5) with status ∈ added | modified | unchanged — the
    ingestion-time face of pipeline.corpus_delta (batch compares two
    complete snapshots; the stream classifies docs as they arrive, so
    'removed' is definitionally out of scope — absence never arrives).

    The old snapshot collapses to its (doc_id, md5) projection once
    and joins stream-static per micro-batch (broadcastable when it
    fits; Spark re-plans the static side per batch otherwise); the
    stream side computes md5 row-locally. Emitted rows equal the batch
    corpus_delta rows for every streamed doc_id (pinned in tests).
    """
    old = old_snapshot.filter(F.col("doc_id").isNotNull()).select(
        "doc_id", F.md5("text").alias("old_md5")
    ).withColumn("_o", F.lit(1))
    schema = spark.read.parquet(docs_parquet_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(docs_parquet_dir)
    )
    return (
        stream.filter(F.col("doc_id").isNotNull())
        .select("doc_id", F.md5("text").alias("new_md5"))
        .join(old, "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("_o").isNull(), F.lit("added"))
            .when(F.col("old_md5").eqNullSafe(F.col("new_md5")),
                  F.lit("unchanged"))
            .otherwise(F.lit("modified")).alias("status"),
            "old_md5", "new_md5",
        )
    )


def stream_embedding_drift(spark: SparkSession, emb_parquet_dir: str,
                           old_snapshot: DataFrame) -> DataFrame:
    """Classify an embedding stream against a FROZEN old-snapshot
    centroid relation: each arriving vector emits (vec_id, label,
    label_known, dist_to_old_centroid, norm_new) — the ingestion-time
    face of traindata.embedding_drift (batch compares two complete
    snapshots; the stream scores vectors as a re-embedding run lands
    them, so per-label rollups and 'labels that vanished' are
    definitionally batch-side). A vector arriving with a label the old
    snapshot never saw reports label_known=false — the new-class
    signal a monitoring sink alerts on.

    The old snapshot collapses once to its per-label decimal-exact
    centroids (label_centroid_vectors — one row per label, broadcast-
    safe at any corpus size) and joins stream-static per micro-batch;
    the stream side is a row-local distance/norm fold, JVM-side
    (zip_with/aggregate), no Python, no stream-side shuffle, no state.
    norm_new is emitted UNROUNDED so the batch pin can rebuild
    embedding_drift's decimal-exact per-label mean_norm_new from the
    streamed rows bit-for-bit (tests/test_streaming_io.py).
    """
    from resin_spark.functions import vectors as V
    from resin_spark.operators.similarity import valid_vectors
    from resin_spark.operators.traindata import label_centroid_vectors

    cents = (
        label_centroid_vectors(old_snapshot)
        .select(F.col("c_label").alias("label"),
                F.col("centroid").alias("centroid_old"))
        .withColumn("_o", F.lit(1))
    )
    schema = spark.read.parquet(emb_parquet_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(emb_parquet_dir)
    )
    new = valid_vectors(stream).filter(F.col("label").isNotNull())
    # norm_new folds over the RAW float array — the exact expression
    # the batch operator sums, so the decimal pin holds bit-for-bit;
    # the distance fold runs on the double-cast copy to match the
    # double-typed stored centroids
    emb_d = F.transform("embedding", lambda x: x.cast("double"))
    return (
        new.select("vec_id", "label", emb_d.alias("e"),
                   V.norm("embedding").alias("norm_new"))
        .join(cents, "label", "left")
        .select(
            "vec_id", "label",
            F.col("_o").isNotNull().alias("label_known"),
            F.when(
                F.col("_o").isNotNull(),
                F.round(V.l2_distance("e", "centroid_old"), 9),
            ).alias("dist_to_old_centroid"),
            "norm_new",
        )
    )


def stream_encoding_anomalies(spark: SparkSession,
                              docs_parquet_dir: str) -> DataFrame:
    """Streaming encoding-damage detector: (doc_id, source, n_repl,
    n_ctrl, n_moji) for arriving docs with any damage — the
    ingestion-time face of health.encoding_anomalies (the per-source
    card is a batch rollup; the stream flags broken docs the moment a
    crawl shard lands, before they pollute downstream stats).

    Counting is row-local (length/replace/regexp_count — the exact
    expression chain of health.encoding_anomaly_flags), so the twin is
    stateless: no watermark, no shuffle. Emitted rows equal the batch
    flags relation's flagged subset bit-for-bit (pinned in tests).
    """
    from resin_spark.operators.health import encoding_anomaly_flags

    schema = spark.read.parquet(docs_parquet_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(docs_parquet_dir)
    )
    return (
        encoding_anomaly_flags(stream.filter(F.col("doc_id").isNotNull()))
        .filter(F.col("n_repl") + F.col("n_ctrl") + F.col("n_moji") > 0)
    )


def stream_cdc_flags(spark: SparkSession, docs_parquet_dir: str,
                     standing: DataFrame) -> DataFrame:
    """Streaming content-defined-chunk classifier: each arriving doc's
    chunks emit (doc_id, chunk_no, ch, is_known) where is_known means
    the chunk's exact text already exists in a FROZEN standing corpus —
    the ingestion-time face of traindata.cdc_chunk_stats (the batch op
    counts corpus-wide; the stream flags copied passages the moment a
    crawl shard lands, shift-proof because boundaries are content-
    defined).

    The standing corpus collapses once to its distinct chunk-hash
    relation (16-byte keys; broadcastable when it fits, stream-static
    hash join otherwise); the stream side is the row-local HOF
    chunking + explode — no watermark, no state, no stream-side
    shuffle before the join. Streamed rows equal the batch chunk
    relation joined against the same standing set (pinned in tests).
    """
    from resin_spark.operators.traindata import cdc_chunks

    known = (
        cdc_chunks(standing)
        .select("ch").distinct()
        .withColumn("_k", F.lit(1))
    )
    schema = spark.read.parquet(docs_parquet_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(docs_parquet_dir)
    )
    return (
        cdc_chunks(stream)
        .join(known, "ch", "left")
        .select("doc_id", "chunk_no", "ch",
                F.col("_k").isNotNull().alias("is_known"))
    )


def stream_apply_mixture(spark: SparkSession, docs_parquet_dir: str,
                         plan: DataFrame) -> DataFrame:
    """Assign epoch-copy counts to a document stream against a FROZEN
    mixture plan: each arriving doc emits (doc_id, source, n_copies)
    using pipeline.mixture_copy_count — the ingestion-time face of
    pipeline.apply_mixture (batch plans AND executes over one corpus;
    the stream executes a standing plan as crawl shards land, the shape
    a production loader actually runs).

    ``plan`` is the (source, sampling_rate) projection of
    pipeline.mixture_plan over the standing corpus, frozen before the
    stream starts; it broadcasts per micro-batch. The coin is
    row-local (salted md5 of doc_id), so rows agree bit-for-bit with
    batch apply_mixture at the same plan (pinned in tests). Zero
    state, zero shuffle on the stream side.
    """
    from resin_spark.operators.pipeline import mixture_copy_count

    frozen = plan.select("source", "sampling_rate")
    schema = spark.read.parquet(docs_parquet_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(docs_parquet_dir)
    )
    return (
        stream.filter(F.col("doc_id").isNotNull())
        .join(F.broadcast(frozen), "source", "left")
        .select("doc_id", "source",
                mixture_copy_count(F.col("sampling_rate")).alias("n_copies"))
    )


def stream_split_assign(spark: SparkSession,
                        docs_parquet_dir: str) -> DataFrame:
    """Streaming train/val/test assignment: each arriving doc emits
    (doc_id, source, split) via pipeline.split_of — the ingestion-time
    face of pipeline.dataset_split (the batch card audits realised
    shares; the stream routes each doc to its split the moment a crawl
    shard lands, the shape an export loader tags output paths with).

    The label is a pure row-local expression of doc_id (salted md5
    coin vs Python-inlined hex boundaries): zero state, zero
    watermark, zero shuffle — and the assignment agrees bit-for-bit
    with the batch label at ANY arrival order or shard split, because
    nothing but the id feeds the coin (pinned in tests).
    """
    from resin_spark.operators.pipeline import split_of

    schema = spark.read.parquet(docs_parquet_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(docs_parquet_dir)
    )
    return (
        stream.filter(F.col("doc_id").isNotNull())
        .select("doc_id", "source",
                split_of(F.col("doc_id")).alias("split"))
    )


def stream_mm_meta(spark: SparkSession, docs_parquet_dir: str) -> DataFrame:
    """Streaming F1 twin: typed metadata (size, container format,
    fake-decoded dimensions, checksum) for media payloads the moment a
    crawl shard lands — the ingestion-time face of
    multimodal.binary_meta, completing the block-has-a-streaming-face
    coverage for the multimodal suite.

    One stateless Arrow mapInPandas pass per micro-batch: no state, no
    watermark, no shuffle. Rows equal the batch relation bit-for-bit
    (pinned in tests and fuzzed over random corpora); NULL text takes
    the adjudicated coalesce-to-b'' semantics (n_bytes 0, md5 of
    empty) on BOTH faces since the r7 with_payload fix. A real decoder
    drops into the shared frame unchanged — schema, batching and the
    stream plumbing here stay identical.
    """
    from resin_spark.operators.multimodal import payload_meta_frame

    schema = spark.read.parquet(docs_parquet_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(docs_parquet_dir)
    )
    return payload_meta_frame(stream.filter(F.col("doc_id").isNotNull()))


def stream_shard_manifest(spark: SparkSession, docs_parquet_dir: str,
                          n_shards: int | None = None) -> DataFrame:
    """Manifest-as-streaming-state: per-shard running (n_docs, n_chars,
    content_sig) over arriving docs — the release signature accumulates
    AS the export lands instead of in a post-hoc pass.

    The same algebra that makes the batch manifest one map-side
    partial aggregate (bit_xor is associative + commutative with 8
    bytes of state) makes it a bounded-state streaming aggregate: this
    is the HLL/CMS sketch-as-streaming-state family with XOR as the
    merge. The pre-aggregate frame is traindata.manifest_rows — shared
    VERBATIM with the batch card, so once the directory drains, the
    complete-mode table equals batch shard_manifest row-for-row at any
    shard/file arrival order (pinned in tests). State: n_shards rows
    of three 8-byte counters, forever.
    """
    from resin_spark.operators.traindata import N_SHARDS, manifest_rows

    n = N_SHARDS if n_shards is None else n_shards
    schema = spark.read.parquet(docs_parquet_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(docs_parquet_dir)
    )
    return (
        manifest_rows(stream, n)
        .groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum("nc").alias("n_chars"),
             F.bit_xor("sig").alias("content_sig"))
    )


def stream_warc_ingest(spark: SparkSession, warc_dir: str,
                       warc_types: tuple[str, ...] | None = ("response",)
                       ) -> DataFrame:
    """Crawl shards land → extracted documents stream: readStream over
    WARC segments (binaryFile source, one segment per trigger), the
    H14 record parser applied VERBATIM (io.warc_record_batches), then
    H15 extraction — the production ingest head that feeds every other
    streaming twin (split routing, quality scoring, manifest
    accumulation, encoding flags) a documents-shaped stream.

    All stages are row-local (parse, HTTP split, HTMLParser text,
    deterministic ids): zero state, zero watermark, zero stream-side
    shuffle. Rows equal the batch read_warc → warc_extract_text
    composition file-for-file (pinned in tests).
    """
    from resin_spark.io import WARC_SCHEMA, warc_record_batches
    from resin_spark.operators.extract import warc_extract_text

    keep = tuple(warc_types) if warc_types is not None else None
    stream = (
        spark.readStream.format("binaryFile")
        .schema("path string, modificationTime timestamp, "
                "length long, content binary")
        .option("maxFilesPerTrigger", 1)
        .load(warc_dir)
        .select("path", "content")
        .mapInPandas(warc_record_batches(keep), WARC_SCHEMA)
    )
    return warc_extract_text(stream)


def stream_boilerplate_keywords(spark: SparkSession,
                                docs_parquet_dir: str) -> DataFrame:
    """Ingestion-time face of the H15 boilerplate card's KEYWORD half:
    per-source running (n_lines, n_chars, keyword_lines,
    keyword_char_share) over arriving docs — a crawl build watches
    template keyword mass accumulate as shards land, before a batch
    card ever runs.

    The line-classification frame is extract.boiler_line_rows, shared
    VERBATIM with the batch card; the running totals are one bounded
    streaming aggregate (|sources| rows of three counters, forever).
    The TEMPLATE half (repeated-line doc frequency) is deliberately
    NOT streamed: it needs a corpus-global distinct-doc count per line
    plus a join back to the line stream — two stateful operators whose
    composition Structured Streaming cannot run in one query, and a
    running doc-frequency verdict would flip lines from unique to
    template mid-stream anyway (retrospective by nature). Once the
    directory drains, the complete-mode table equals the batch card's
    keyword columns row-for-row (pinned in tests)."""
    from resin_spark.operators.extract import boiler_line_rows

    schema = spark.read.parquet(docs_parquet_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(docs_parquet_dir)
    )
    kw_chars = F.sum(F.when(F.col("is_keyword"),
                            F.col("n_chars")).otherwise(F.lit(0)))
    total_chars = F.sum("n_chars")
    return (
        boiler_line_rows(stream)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            total_chars.cast("long").alias("n_chars"),
            F.sum(F.col("is_keyword").cast("long")).alias("keyword_lines"),
            F.try_divide(kw_chars.cast("double"),
                         total_chars).alias("keyword_char_share"),
        )
    )
