"""Corpus-curation pipeline operators (SURVEY.md §2 block C extras).

The operators a pretraining-data pipeline runs AROUND the per-document
analyses: benchmark-contamination checking, deterministic stratified
sampling, and token-budget sequence packing. All three are single-scan
shapes whose only shuffles are equi-joins / low-cardinality groupBys,
so they hold unchanged at 100 TB (scale notes per operator).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from resin_spark.functions import text as T
from resin_spark.operators.dedup import _shingles_sql, shingles

Tables = dict[str, DataFrame]

# Benchmark membership for contamination_check: a deterministic ~1%
# slice stands in for the held-out eval set a real pipeline would load.
_BENCH_MOD = 97

# stratified_sample: per-language keep rates. Thresholds are exact
# 16-bit hex bounds (rate * 0x10000) compared lexicographically against
# the first 4 hex chars of md5(doc_id) — uniform, deterministic, and
# engine-agnostic (plain string compare, no float math in the gate).
SAMPLE_RATES: dict[str, float] = {
    "en": 0.5, "de": 0.25, "fr": 0.25, "es": 0.125, "zh": 0.0625,
}
_DEFAULT_RATE = 0.05


def _rate_threshold(rate: float) -> str:
    return format(int(rate * 0x10000), "04x")


def contamination_check(t: Tables, n: int = 4, tau: float = 0.5) -> DataFrame:
    """Benchmark-contamination scan: for every candidate document, the
    fraction of its distinct word-``n``-gram shingles that also appear in
    the benchmark set (docs with ``doc_id % 97 == 0`` here; a real run
    swaps in the eval-suite shingle table). The GPT-3-style n-gram
    overlap decontamination test, as one relational pass.

    Scale: one shingle pass over the corpus, one equi-join on shingle
    against the (small) benchmark shingle set — AQE broadcasts it when
    it fits, which a real benchmark set always does — then a groupBy on
    doc_id. No cartesian anywhere; cost is linear in corpus shingles.
    """
    docs = t["documents"]
    sh = shingles(docs, n)
    is_bench = F.col("doc_id") % _BENCH_MOD == 0
    bench_sh = sh.filter(is_bench).select("shingle").distinct()
    cand_sh = sh.filter(~is_bench)
    totals = cand_sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    hits = (
        cand_sh.join(bench_sh, "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    ratio = F.col("n_hits") / F.col("n_shingles")
    return (
        docs.filter(~is_bench)
        .select("doc_id")
        .join(totals, "doc_id", "left")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_shingles", F.lit(0)).cast("long").alias("n_shingles"),
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            F.when(F.coalesce("n_shingles", F.lit(0)) > 0, ratio)
            .alias("contam_ratio"),
            F.coalesce(ratio >= tau, F.lit(False)).alias("contaminated"),
        )
        .orderBy("doc_id")
    )


def contamination_check_oracle(n: int = 4, tau: float = 0.5) -> str:
    return f"""
    WITH sh AS ({_shingles_sql(n)}),
    bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % {_BENCH_MOD} = 0),
    cand AS (SELECT * FROM sh WHERE doc_id % {_BENCH_MOD} <> 0),
    tot AS (SELECT doc_id, COUNT(*) AS n_shingles FROM cand GROUP BY doc_id),
    hit AS (SELECT cand.doc_id, COUNT(*) AS n_hits
            FROM cand JOIN bench USING (shingle) GROUP BY cand.doc_id)
    SELECT d.doc_id,
           COALESCE(n_shingles, 0) AS n_shingles,
           COALESCE(n_hits, 0) AS n_hits,
           CASE WHEN COALESCE(n_shingles, 0) > 0
                THEN n_hits / n_shingles END AS contam_ratio,
           COALESCE(n_hits / n_shingles >= {tau}, FALSE) AS contaminated
    FROM documents d
    LEFT JOIN tot USING (doc_id) LEFT JOIN hit USING (doc_id)
    WHERE d.doc_id % {_BENCH_MOD} <> 0
    ORDER BY doc_id
    """


def stratified_sample(t: Tables) -> DataFrame:
    """Deterministic stratified sampling rollup: per (lang, source)
    stratum, how many documents the per-language rate keeps and how many
    characters survive — the domain-mixing budget sheet.

    The keep decision is ``substr(md5(doc_id), 1, 4) < rate_threshold``:
    reproducible across engines and runs, uniform over docs, and
    rate-exact in 1/65536 steps. Scale: one scan, map-side partial agg
    onto |langs|×|sources| groups — no other shuffle, no RNG state.
    """
    docs = t["documents"]
    h = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4)
    thr = F.lit(_rate_threshold(_DEFAULT_RATE))
    for lang, rate in sorted(SAMPLE_RATES.items()):
        thr = F.when(F.col("lang") == lang, F.lit(_rate_threshold(rate))).otherwise(thr)
    keep = h < thr
    return (
        docs.groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(keep, 1).otherwise(0)).alias("n_sampled"),
            F.coalesce(F.sum(F.when(keep, F.col("n_chars"))), F.lit(0))
            .alias("sampled_chars"),
        )
        .orderBy("lang", "source")
    )


def stratified_sample_oracle() -> str:
    case = "CASE lang " + " ".join(
        f"WHEN '{lang}' THEN '{_rate_threshold(rate)}'"
        for lang, rate in sorted(SAMPLE_RATES.items())
    ) + f" ELSE '{_rate_threshold(_DEFAULT_RATE)}' END"
    return f"""
    SELECT lang, source,
           COUNT(*) AS n_docs,
           SUM(CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < {case}
                    THEN 1 ELSE 0 END) AS n_sampled,
           COALESCE(SUM(CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < {case}
                    THEN n_chars END), 0) AS sampled_chars
    FROM documents
    GROUP BY lang, source
    ORDER BY lang, source
    """


# pack_sequences: docs per cumsum bucket. Contiguous doc_id ranges, so
# per-bucket token totals prefix-sum into exact global offsets; widen at
# scale (e.g. 2^20 docs/bucket) to keep the collected offset table tiny.
_PACK_BUCKET = 1024


def pack_sequences(t: Tables, budget: int = 256) -> DataFrame:
    """Concat-and-chunk sequence packing: documents in doc_id order are
    laid end-to-end on one token tape and cut every ``budget`` tokens;
    each doc is assigned to the sequence its first token lands in. The
    rollup reports per-sequence doc count, id span, and token mass (may
    exceed ``budget`` where a doc straddles a cut — the standard
    pretraining concat-packing semantic).

    Scale: the exclusive global cumsum is NOT a single-partition window —
    docs bucket by ``doc_id div 1024`` (contiguous ranges), pass one
    collects per-bucket token totals (tiny) and prefix-sums them into
    bucket offsets, pass two runs the running sum within each bucket in
    parallel and adds the offset. Identical output to
    ``SUM(...) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)`` with
    every window partition distributed; same two-pass shape as
    textops.lexicon_build's rank.
    """
    d = (
        t["documents"]
        .select(
            "doc_id",
            F.size(T.tokens("text")).cast("long").alias("n_tokens"),
            (F.col("doc_id") - F.col("doc_id") % _PACK_BUCKET).alias("bucket"),
        )
    )
    per_bucket = (
        d.groupBy("bucket").agg(F.sum("n_tokens").alias("bt"))
        .orderBy("bucket")
        .collect()
    )
    offsets, acc = [], 0
    for r in per_bucket:
        offsets.append((r["bucket"], acc))
        acc += r["bt"]
    spark = t["documents"].sparkSession
    off = spark.createDataFrame(offsets or [(0, 0)], "bucket long, offset long")
    w = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        d.join(F.broadcast(off), "bucket")
        .withColumn(
            "cum_excl",
            F.col("offset") + F.coalesce(F.sum("n_tokens").over(w), F.lit(0)),
        )
        .withColumn("seq_id", F.expr(f"cum_excl div {budget}"))
        .groupBy("seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("first_doc_id"),
            F.max("doc_id").alias("last_doc_id"),
            F.sum("n_tokens").alias("n_tokens"),
        )
        .orderBy("seq_id")
    )


def pack_sequences_oracle(budget: int = 256) -> str:
    toks = T.tokens_sql("text")
    return f"""
    WITH d AS (SELECT doc_id, len({toks}) AS n_tokens FROM documents),
    c AS (
        SELECT doc_id, n_tokens,
               COALESCE(SUM(n_tokens) OVER (
                   ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               // {budget} AS seq_id
        FROM d
    )
    SELECT seq_id,
           COUNT(*) AS n_docs,
           MIN(doc_id) AS first_doc_id,
           MAX(doc_id) AS last_doc_id,
           SUM(n_tokens) AS n_tokens
    FROM c GROUP BY seq_id ORDER BY seq_id
    """
