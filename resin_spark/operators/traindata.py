"""Training-data export & model-based curation ops (SURVEY.md §2 block C/E
extensions — operators a 100 TB pretraining pipeline needs beyond the
reference's own surface).

Each operator has a bit-exact DuckDB oracle twin:

- quality_perplexity — CCNet-style unigram-LM cross-entropy scoring.
  The corpus IS the language model (token unigram frequencies), and each
  doc is scored by its mean per-token information content in bits. Low
  bits/token ≈ repetitive/templated text, high ≈ rare-token noise — the
  standard two-sided quality signal for pretraining filtering.
- shard_export — deterministic hash-sharding for training export:
  every doc gets a (shard, position) that is a pure function of its id,
  so a re-run of the pipeline (or a resumed job) produces byte-identical
  shards. The physical analog is repartition(n, shard) +
  sortWithinPartitions(pos) + partitionBy("shard") parquet write
  (see write_shards).
- centroid_assign — nearest-class-centroid assignment over the
  embeddings table (Rocchio classifier): per-label mean vectors built
  with order-independent decimal sums, every vector assigned to its
  max-cosine centroid. The batch "label new data with the model you
  just built" step of a curation loop; also the assignment kernel an
  IVF/k-means clustering pass reuses.
- line_dedup_stats — C4/RefinedWeb corpus-wide line-level dedup.
- embedding_quantize — symmetric int8 quantization accounting (the 4×
  ANN-index storage cut), a zero-shuffle narrow projection.
- quality_perplexity_bigram — interpolated absolute-discount bigram LM
  with Kneser-Ney continuation smoothing, self-scored; the stronger
  two-sided quality signal beside the unigram scorer.

Reference ties: cosine assignment mirrors the reference's best-hit
search semantics (src/Resin.MachineLearning/GraphExtensions.cs:46-73
ClosestMatch) applied to class centroids; the unigram scoring reuses
the SplitWords tokenisation contract (StringAnalyzer.cs SplitWords →
functions/text.py tokens).

Scale notes are per-function; none of these collect to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from resin_spark.functions.ckpt import opt_checkpoint
from resin_spark.functions import exact, text as T
from resin_spark.functions import vectors as V
from resin_spark.operators.dedup import _token_hash60, _token_hash60_sql
from resin_spark.operators.similarity import VALID_VECTORS_SQL, valid_vectors

Tables = dict[str, DataFrame]

N_SHARDS = 16


# --- unigram-LM perplexity scoring -------------------------------------------

def quality_perplexity(t: Tables) -> DataFrame:
    """Per-doc mean negative log2 unigram probability (bits/token).

    Plan shape: one token explode → one groupBy(tok) for the LM (maps
    side partial, one shuffle on tok), a single-row total joined back
    by broadcast, then tokens ⋈ LM on tok and a final groupBy(doc_id).
    The LM join key is Zipf-skewed (stopwords); AQE's skew-join split
    handles it, and when the vocabulary fits the broadcast threshold
    Catalyst broadcasts the LM side outright. No driver collect.

    Cross-engine exactness: each DISTINCT token's bit value is rounded
    to 6 decimals once (identical doubles in both engines — tf/total is
    an exact IEEE division and log2 agrees to well under the rounding
    grain), then per-doc aggregation is an order-independent decimal
    sum (functions/exact.py). Docs with zero tokens vanish at the
    explode in both engines.
    """
    toks = (
        t["documents"]
        .filter(F.col("doc_id").isNotNull())
        .select("doc_id", F.explode(T.tokens("text")).alias("tok"))
    )
    # localCheckpoint the vocabulary-sized LM: both the total and the
    # per-token bits read it, which without the checkpoint re-runs the
    # full tokenise+aggregate lineage (3 corpus scans instead of the
    # inherent 2 — build the LM, then score with it). The checkpointed
    # frame is |vocab| rows, safe to pin at any corpus size.
    lm = (
        toks.groupBy("tok").agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=False)
    )
    total = lm.agg(F.sum("tf").alias("total"))
    bits = lm.join(broadcast(total)).select(
        "tok",
        F.round(-F.log2(F.col("tf").cast("double")
                        / F.col("total").cast("double")), 6).alias("bits"),
    )
    return (
        toks.join(bits, "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            exact.dravg("bits", scale=6, precision=18)
            .alias("bits_per_token"),
        )
        .orderBy("doc_id")
    )


def quality_perplexity_oracle() -> str:
    toks = T.tokens_sql("text")
    return f"""
    WITH tok AS (
        SELECT doc_id, unnest({toks}) AS tok
        FROM documents WHERE doc_id IS NOT NULL
    ), lm AS (
        SELECT tok, COUNT(*) AS tf FROM tok GROUP BY tok
    ), tot AS (
        SELECT SUM(tf) AS total FROM lm
    ), bits AS (
        SELECT tok, round(-log2(CAST(tf AS DOUBLE) / CAST(total AS DOUBLE)), 6)
                   AS bits
        FROM lm, tot
    )
    SELECT doc_id, COUNT(*) AS n_tokens,
           {exact.dravg_sql("bits", scale=6, precision=18)}
               AS bits_per_token
    FROM tok JOIN bits USING (tok)
    GROUP BY doc_id ORDER BY doc_id
    """


# --- deterministic shard export ----------------------------------------------

def shard_export(t: Tables, n_shards: int = N_SHARDS) -> DataFrame:
    """(doc_id, shard, pos, n_in_shard): a reproducible training-shard
    layout that is a pure function of the doc ids.

    shard = md5-60bit(doc_id) mod n_shards gives near-uniform shard
    sizes with no coordination; pos orders within the shard by the same
    hash (a deterministic pseudo-random shuffle — adjacent source docs
    land far apart, which is exactly what a training loader wants). One
    shuffle on shard; the window never sees more than corpus/n_shards
    rows per partition. At export time the same expressions drive
    ``write_shards`` so the parquet layout equals this plan's output.
    """
    h = _token_hash60(F.col("doc_id").cast("string"))
    base = (
        t["documents"]
        .filter(F.col("doc_id").isNotNull())
        .select("doc_id", h.alias("h"), (h % n_shards).alias("shard"))
    )
    w = Window.partitionBy("shard").orderBy("h", "doc_id")
    wc = Window.partitionBy("shard")
    return (
        base.select(
            "doc_id", "shard",
            F.row_number().over(w).alias("pos"),
            F.count(F.lit(1)).over(wc).alias("n_in_shard"),
        )
        .orderBy("shard", "pos")
    )


def shard_export_oracle(n_shards: int = N_SHARDS) -> str:
    h = _token_hash60_sql("CAST(doc_id AS VARCHAR)")
    return f"""
    WITH hashed AS (
        SELECT doc_id, {h} AS h, {h} % {n_shards} AS shard
        FROM documents WHERE doc_id IS NOT NULL
    )
    SELECT doc_id, shard,
           ROW_NUMBER() OVER (PARTITION BY shard ORDER BY h, doc_id) AS pos,
           COUNT(*) OVER (PARTITION BY shard) AS n_in_shard
    FROM hashed ORDER BY shard, pos
    """


def write_shards(docs: DataFrame, path: str,
                 n_shards: int = N_SHARDS) -> None:
    """Materialise the shard_export layout: one parquet directory per
    shard, rows in deterministic intra-shard order. Byte-reproducible
    across re-runs (hash order, no timestamps, no task-order effects):
    repartition on the shard key then sortWithinPartitions(h) pins both
    the file assignment and the row order."""
    h = _token_hash60(F.col("doc_id").cast("string"))
    (
        docs.filter(F.col("doc_id").isNotNull())
        .withColumn("h", h)
        .withColumn("shard", F.col("h") % n_shards)
        .repartition(n_shards, "shard")
        .sortWithinPartitions("h", "doc_id")
        .drop("h")
        .write.mode("overwrite").partitionBy("shard").parquet(path)
    )


# --- nearest-centroid assignment ---------------------------------------------

def label_centroid_vectors(emb: DataFrame) -> DataFrame:
    """(c_label, centroid array<double>) — per-label mean vectors with
    order-independent decimal sums (the label_centroids parity recipe),
    reassembled into arrays via a dim-sorted collect_list. The centroid
    table has one row per label — driver-safe and broadcast-safe at any
    corpus size."""
    return (
        valid_vectors(emb)
        .filter(F.col("label").isNotNull())
        .select("label", F.posexplode("embedding").alias("dim", "x"))
        .groupBy("label", "dim")
        .agg(
            (
                F.sum(F.col("x").cast("string").cast("decimal(28,15)"))
                .cast("double") / F.count(F.lit(1))
            ).alias("mean_val")
        )
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "mean_val"))).alias("s"))
        .select(
            F.col("label").alias("c_label"),
            F.transform("s", lambda st: st["mean_val"]).alias("centroid"),
        )
    )


def centroid_assign(emb: DataFrame) -> DataFrame:
    """Assign every vector to its max-cosine class centroid (Rocchio /
    nearest-centroid classification; the per-vector kernel of a k-means
    assignment step).

    Plan: centroids (|labels| rows) are BROADCAST and every corpus
    vector scores against all of them in one scan — cost |corpus| ×
    |labels| JVM folds, no shuffle of the big side; the argmax is a
    map-side-collapsing min_by aggregate (see ``_assign_cells``), so
    the only corpus exchange carries one row per vector, not one per
    (vector, centroid). Scoring uses the strict left-to-right JVM
    cosine (functions/vectors.py), so scores hash-match the DuckDB
    oracle bit-for-bit.
    """
    cents = label_centroid_vectors(emb)
    scored = (
        valid_vectors(emb)
        .filter(F.col("label").isNotNull())
        .join(broadcast(cents))
        .select(
            "vec_id",
            F.col("label").alias("true_label"),
            "c_label",
            V.cosine_gated("embedding", "centroid").alias("score"),
        )
    )
    best = F.min_by(F.struct("c_label", "score"), _argmax_ordering())
    return (
        scored.groupBy("vec_id", "true_label")
        .agg(best.alias("best"))
        .select(
            "vec_id", "true_label",
            F.col("best.c_label").alias("assigned_label"),
            F.round("best.score", 9).alias("score"),
        )
        .orderBy("vec_id")
    )


def centroid_assign_oracle() -> str:
    cos = V.cosine_gated_sql("e.embedding", "c.centroid")
    return f"""
    WITH vemb AS (
        SELECT * FROM embeddings
        WHERE {VALID_VECTORS_SQL} AND label IS NOT NULL
    ), dims AS (
        SELECT label, CAST(p.i - 1 AS INT) AS dim,
               CAST(SUM(CAST(CAST(p.x AS VARCHAR) AS DECIMAL(28,15))) AS DOUBLE)
                   / COUNT(*) AS mean_val
        FROM (
            SELECT label,
                   unnest(list_transform(range(1, len(embedding) + 1),
                          i -> {{'i': i, 'x': embedding[i]}})) AS p
            FROM vemb
        )
        GROUP BY 1, 2
    ), cent AS (
        SELECT label AS c_label, list(mean_val ORDER BY dim) AS centroid
        FROM dims GROUP BY label
    ), scored AS (
        SELECT e.vec_id, e.label AS true_label, c.c_label, {cos} AS score
        FROM vemb e, cent c
    )
    SELECT vec_id, true_label, c_label AS assigned_label,
           round(score, 9) AS score
    FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                     ORDER BY score DESC, c_label) AS rn
        FROM scored
    ) WHERE rn = 1
    ORDER BY vec_id
    """


# --- line-level dedup (C4 / RefinedWeb style) --------------------------------

def line_dedup_stats(t: Tables, min_count: int = 2) -> DataFrame:
    """Corpus-wide line-level deduplication (the C4/RefinedWeb move:
    boilerplate lines — nav bars, cookie banners, licence footers —
    repeat across documents even when no two whole documents match).

    A line is "duplicated" when its exact text occurs ``min_count`` or
    more times across the corpus; every occurrence is dropped from
    ``clean_text``. Per doc: line totals, the duplicate count, and the
    cleaned text with original line order preserved.

    Plan shape: explode lines (one pass), ONE shuffle on the md5 line
    key for the corpus-wide count, a hash join back to the line stream,
    and a per-doc reassembly aggregation. Lines move as 16-byte md5
    keys through the counting shuffle — the text itself only travels
    with its doc-keyed rows. Cost is linear in total lines; the join
    key is skewed exactly on the boilerplate lines being hunted, which
    is AQE-skew-split territory at web scale.
    """
    lines = (
        t["documents"]
        .filter(F.col("doc_id").isNotNull() & F.col("text").isNotNull())
        .select(
            "doc_id",
            F.posexplode(F.split("text", "\n")).alias("line_no", "line"),
        )
        .withColumn("lh", F.md5("line"))
    )
    dup = (
        lines.groupBy("lh").agg(F.count(F.lit(1)).alias("n_occ"))
        .filter(F.col("n_occ") >= min_count)
        .select("lh", F.lit(True).alias("is_dup"))
    )
    flagged = lines.join(dup, "lh", "left").select(
        "doc_id", "line_no", "line",
        F.coalesce("is_dup", F.lit(False)).alias("is_dup"),
    )
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.col("is_dup").cast("long")).alias("n_dup_lines"),
            F.concat_ws(
                "\n",
                F.transform(
                    F.array_sort(F.collect_list(
                        F.when(~F.col("is_dup"),
                               F.struct("line_no", "line")))),
                    lambda s: s["line"],
                ),
            ).alias("clean_text"),
        )
        .orderBy("doc_id")
    )


def line_dedup_stats_oracle(min_count: int = 2) -> str:
    return f"""
    WITH lines AS (
        SELECT doc_id, p.line_no, p.line, md5(p.line) AS lh
        FROM (
            SELECT doc_id,
                   unnest(list_transform(
                       string_split(text, chr(10)),
                       (l, i) -> {{'line_no': i - 1, 'line': l}})) AS p
            FROM documents
            WHERE doc_id IS NOT NULL AND text IS NOT NULL
        )
    ), dup AS (
        SELECT lh FROM lines GROUP BY lh HAVING COUNT(*) >= {min_count}
    ), flagged AS (
        SELECT doc_id, line_no, line, lh IN (SELECT lh FROM dup) AS is_dup
        FROM lines
    )
    SELECT doc_id, COUNT(*) AS n_lines,
           CAST(SUM(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dup_lines,
           COALESCE(string_agg(CASE WHEN NOT is_dup THEN line END, chr(10)
                               ORDER BY line_no), '') AS clean_text
    FROM flagged
    GROUP BY doc_id ORDER BY doc_id
    """


# --- int8 embedding quantization ---------------------------------------------

def embedding_quantize(emb: DataFrame) -> DataFrame:
    """Symmetric per-vector int8 quantization accounting: for each
    vector, scale = max|x| / 127, q_i = clamp(floor(x_i/scale + 0.5),
    -127, 127), and the report row carries the scale, the int8
    sparsity, the L2 reconstruction error and the cosine between the
    original and the dequantized vector.

    This is the storage-side move that makes 100 TB ANN tractable: a
    float32 corpus drops 4x (embeddings dominate index bytes), and the
    cos_keep column is the measured evidence that scoring against
    dequantized vectors preserves ranking geometry. The operator is a
    single narrow projection — per-row JVM expressions only, no
    shuffle, no UDF; at scale it pipelines into the parquet write of
    the quantized index (int8 arrays + one float scale per row).

    Cross-engine exactness: all arithmetic is double IEEE with the
    same sequential fold order as functions/vectors.py; floor(x/s+0.5)
    avoids round() (HALF_UP vs HALF_EVEN ambiguity across engines) and
    the scale==0 branch (all-zero vector) is gated identically in both
    engines. Outputs rounded once at the end.
    """
    xd = V.to_double(F.col("embedding"))
    base = (
        valid_vectors(emb)
        .select("vec_id", xd.alias("xd"))
        .withColumn(
            "scale",
            F.aggregate("xd", F.lit(0.0),
                        lambda acc, y: F.greatest(acc, F.abs(y))) / F.lit(127.0),
        )
    )
    # projection boundary: `scale` is computed once per row, not per
    # element inside the transform lambda below
    q = F.when(
        F.col("scale") == 0.0,
        F.transform("xd", lambda y: F.lit(0.0)),
    ).otherwise(
        F.transform(
            "xd",
            lambda y: F.greatest(
                F.lit(-127.0),
                F.least(F.lit(127.0),
                        F.floor(y / F.col("scale") + F.lit(0.5)).cast("double")),
            ),
        )
    )
    deq = F.transform("q", lambda v: v * F.col("scale"))
    return (
        base.withColumn("q", q)
        .withColumn("deq", deq)
        .select(
            "vec_id",
            F.round("scale", 9).alias("scale"),
            F.size(F.filter("q", lambda v: v != 0.0)).alias("n_nonzero"),
            F.round(V.l2_distance("xd", "deq"), 9).alias("recon_err_l2"),
            F.round(V.cosine_gated("xd", "deq"), 9).alias("cos_keep"),
        )
        .orderBy("vec_id")
    )


def embedding_quantize_oracle() -> str:
    l2 = V.l2_distance_sql("xd", "deq")
    cos = V.cosine_gated_sql("xd", "deq")
    return f"""
    WITH v AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS xd
        FROM embeddings WHERE {VALID_VECTORS_SQL}
    ), s AS (
        SELECT vec_id, xd,
               list_reduce(list_transform(xd, x -> abs(x)),
                           (a, b) -> greatest(a, b)) / 127.0 AS scale
        FROM v
    ), qd AS (
        SELECT vec_id, xd, scale,
               CASE WHEN scale = 0
                    THEN list_transform(xd, x -> 0.0)
                    ELSE list_transform(
                        xd, x -> greatest(-127.0,
                                 least(127.0, floor(x / scale + 0.5))))
               END AS q
        FROM s
    ), dq AS (
        SELECT vec_id, xd, scale, q,
               list_transform(q, x -> x * scale) AS deq
        FROM qd
    )
    SELECT vec_id, round(scale, 9) AS scale,
           CAST(len(list_filter(q, x -> x <> 0.0)) AS INT) AS n_nonzero,
           round({l2}, 9) AS recon_err_l2,
           round({cos}, 9) AS cos_keep
    FROM dq ORDER BY vec_id
    """


# --- bigram Kneser-Ney-style perplexity --------------------------------------

KN_DISCOUNT = 0.75


def _doc_token_arrays(docs: DataFrame) -> DataFrame:
    """(doc_id, tk): per-doc token arrays, zero-token docs dropped."""
    return (
        docs.filter(F.col("doc_id").isNotNull())
        .select("doc_id", T.tokens("text").alias("tk"))
        .filter(F.size("tk") >= 1)
    )


def card_base(docs: DataFrame) -> DataFrame:
    """Shared per-doc base for the release-card sections (r12): ONE
    documents scan + ONE tokenize carrying every column any section
    needs — UNFILTERED (doc_id/lang/text NULL rows included; each
    section applies its own filters exactly as its standalone shape
    does, so section outputs are row-identical). The card materialises
    this once (eager localCheckpoint) and five sections derive from the
    cached blocks instead of five independent scan+tokenize subtrees —
    which also removes the lock-convoy of concurrent broadcast-subtree
    jobs racing to materialise the same lazy intermediate (r12 stage
    profile: 32-task stages at ~95% blocked time, executorRunTime 66 s
    vs 1.1 s CPU)."""
    return docs.select(
        "doc_id", "lang", "source", "n_chars",
        F.col("text").isNotNull().alias("has_text"),
        F.md5("text").alias("h"),
        T.tokens("text").alias("tk"),
    )


def _bigram_instances(base: DataFrame) -> DataFrame:
    """(doc_id, w1, w2): row-local adjacent bigrams — transform over
    sequence, no window, no per-doc shuffle."""
    return base.filter(F.size("tk") >= 2).select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("tk") - 2),
                lambda i: F.struct(
                    F.element_at("tk", (i + 1).cast("int")).alias("w1"),
                    F.element_at("tk", (i + 2).cast("int")).alias("w2"),
                ),
            )
        ).alias("p"),
    ).select("doc_id", "p.w1", "p.w2")


def bigram_bits_frames(base: DataFrame):
    """(bits_bi, bits_uni): the KN bigram LM as two vocabulary-sized
    frames — (w1, w2, bits) for every observed bigram type and
    (w, bits) for every unigram — shared by the batch scorer and the
    streaming artifact build (streaming/quality.py). ``base`` is a
    _doc_token_arrays frame. All stats derive from ONE checkpointed
    bigram-type frame plus one unigram aggregate; the bits expression
    keeps a fixed IEEE operation order so both engines and both
    consumers agree bit-for-bit."""
    D = KN_DISCOUNT
    bi = _bigram_instances(base)
    big_types = (
        bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
        .localCheckpoint(eager=False)
    )
    # c1(w1) = Σ_w2 c12(w1,w2): derived from the checkpointed bigram
    # types instead of re-scanning the corpus (measured: 3 → 2 documents
    # scans in the final plan)
    c1 = big_types.groupBy("w1").agg(F.sum("c12").alias("c1"))
    n1r = big_types.groupBy("w1").agg(F.count(F.lit(1)).alias("n1r"))
    n1l = big_types.groupBy("w2").agg(F.count(F.lit(1)).alias("n1l"))
    btot = big_types.agg(F.count(F.lit(1)).alias("b_types"))
    # one bits value per distinct bigram type, identical op order to SQL:
    # ((c12 - D) + (D * n1r) * (n1l / B)) / c1
    bits_bi = (
        big_types.join(c1, "w1").join(n1r, "w1").join(n1l, "w2")
        .join(broadcast(btot))
        .select(
            "w1", "w2", "c12",
            F.round(-F.log2(
                ((F.col("c12").cast("double") - F.lit(D))
                 + (F.lit(D) * F.col("n1r").cast("double"))
                 * (F.col("n1l").cast("double")
                    / F.col("b_types").cast("double")))
                / F.col("c1").cast("double")
            ), 6).alias("bits"),
        )
    )
    toks = base.select(F.explode("tk").alias("w"))
    uni = toks.groupBy("w").agg(F.count(F.lit(1)).alias("cw")) \
        .localCheckpoint(eager=False)
    utot = uni.agg(F.sum("cw").alias("total"))
    bits_uni = uni.join(broadcast(utot)).select(
        "w", "cw", "total",
        F.round(-F.log2(F.col("cw").cast("double")
                        / F.col("total").cast("double")), 6).alias("bits"),
    )
    return bits_bi, bits_uni


def quality_perplexity_bigram(t: Tables) -> DataFrame:
    """Per-doc bits/token under an interpolated absolute-discount bigram
    LM (Kneser-Ney continuation smoothing) trained on the corpus itself
    — the stronger CCNet-grade quality signal beside the unigram one
    (quality_perplexity): templated/boilerplate text scores LOW because
    its bigrams are corpus-frequent, rare-token line noise scores HIGH.

    Model (self-scored, so every scored bigram is observed — no unseen
    branch): with instance counts c12(w1,w2), left totals c1(w1),
    right-type fan-out N1r(w1), continuation types N1l(w2), bigram-type
    count B and D = 0.75,

        p(w2|w1) = (c12 − D + D·N1r(w1)·(N1l(w2)/B)) / c1(w1)

    and each doc's FIRST token backs off to the unigram c(w)/T.

    Plan shape: bigrams are built ROW-LOCALLY from the per-doc token
    array (transform over sequence — no window, no per-doc shuffle);
    the LM is three aggregates on (w1,w2) / w1 / w2 — vocabulary-sized
    frames, one shuffle each — joined back to the distinct-bigram
    frame; scoring is one corpus-side equi-join on the bigram key plus
    the per-doc decimal-sum aggregate. No driver collect.

    Cross-engine exactness: p is evaluated with an IDENTICAL operation
    order in both engines (each step a single IEEE rounding), bits are
    rounded once per distinct bigram/unigram type, and the per-doc mean
    is an order-independent decimal sum (the quality_perplexity
    recipe). D = 0.75 is binary-exact.
    """
    base = _doc_token_arrays(t["documents"])
    bi = _bigram_instances(base)
    first = base.select("doc_id", F.element_at("tk", 1).alias("w"))
    bits_bi, bits_uni = bigram_bits_frames(base)
    scored = (
        bi.join(bits_bi, ["w1", "w2"]).select("doc_id", "bits")
        .unionByName(first.join(bits_uni, "w").select("doc_id", "bits"))
    )
    # report the EXACT decimal total (6dp grid → integer*1e-6, always an
    # exact double) rather than a rounded mean: one sf0.001 doc's mean
    # sat on a .0000005 round-half boundary where Spark and DuckDB
    # resolve the double's representation differently — the sum has no
    # boundary to disagree on, and bits/token is total/n for any consumer
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            exact.dsum("bits", scale=6, precision=18).alias("bits_total"),
        )
        .orderBy("doc_id")
    )


def quality_perplexity_bigram_oracle() -> str:
    toks = T.tokens_sql("text")
    D = KN_DISCOUNT
    return f"""
    WITH base AS (
        SELECT doc_id, {toks} AS tk
        FROM documents WHERE doc_id IS NOT NULL
    ), docs1 AS (
        SELECT doc_id, tk FROM base WHERE len(tk) >= 1
    ), bi AS (
        SELECT doc_id, p.w1, p.w2 FROM (
            SELECT doc_id,
                   unnest(list_transform(range(1, len(tk)),
                       i -> {{'w1': tk[i], 'w2': tk[i + 1]}})) AS p
            FROM docs1 WHERE len(tk) >= 2
        )
    ), first_tok AS (
        SELECT doc_id, tk[1] AS w FROM docs1
    ), big_types AS (
        SELECT w1, w2, COUNT(*) AS c12 FROM bi GROUP BY 1, 2
    ), c1 AS (
        SELECT w1, COUNT(*) AS c1 FROM bi GROUP BY 1
    ), n1r AS (
        SELECT w1, COUNT(*) AS n1r FROM big_types GROUP BY 1
    ), n1l AS (
        SELECT w2, COUNT(*) AS n1l FROM big_types GROUP BY 1
    ), btot AS (
        SELECT COUNT(*) AS b_types FROM big_types
    ), bits_bi AS (
        SELECT bt.w1, bt.w2,
               round(-log2(
                   ((CAST(bt.c12 AS DOUBLE) - {D})
                    + ({D} * CAST(n1r.n1r AS DOUBLE))
                    * (CAST(n1l.n1l AS DOUBLE) / CAST(btot.b_types AS DOUBLE)))
                   / CAST(c1.c1 AS DOUBLE)), 6) AS bits
        FROM big_types bt
        JOIN c1 USING (w1) JOIN n1r USING (w1) JOIN n1l USING (w2), btot
    ), uni AS (
        SELECT w, COUNT(*) AS cw FROM (
            SELECT unnest(tk) AS w FROM docs1
        ) GROUP BY 1
    ), utot AS (
        SELECT SUM(cw) AS total FROM uni
    ), bits_uni AS (
        SELECT w, round(-log2(CAST(cw AS DOUBLE) / CAST(total AS DOUBLE)), 6)
                   AS bits
        FROM uni, utot
    ), scored AS (
        SELECT doc_id, bits FROM bi JOIN bits_bi USING (w1, w2)
        UNION ALL
        SELECT doc_id, bits FROM first_tok JOIN bits_uni USING (w)
    )
    SELECT doc_id, COUNT(*) AS n_tokens,
           {exact.dsum_sql("bits", scale=6, precision=18)} AS bits_total
    FROM scored GROUP BY doc_id ORDER BY doc_id
    """


# --- n-gram novelty scoring --------------------------------------------------

def ngram_novelty(t: Tables, n: int = 3) -> DataFrame:
    """(doc_id, n_shingles, n_novel, novelty): per doc, the share of its
    distinct word n-grams that occur NOWHERE else in the corpus
    (corpus document frequency 1) — the diversity/novelty signal a
    data-mixing pass weighs against dedup pressure: boilerplate-heavy
    docs score near 0, genuinely fresh text near 1.

    Reuses the dedup suite's shingle frame (distinct n-grams per doc,
    hashed to 8-byte longs before the df shuffle): one groupBy on the
    shingle hash for corpus df, a join back, and a per-doc aggregate —
    the exact cost profile of contamination_check, linear at 100 TB.
    The ratio is one IEEE division of two exact longs, identical in
    both engines. Docs with fewer than n tokens vanish (no shingles),
    matching the shingles() contract.
    """
    from resin_spark.operators.dedup import shingles
    sh = shingles(t["documents"].filter(F.col("doc_id").isNotNull()), n) \
        .select("doc_id", F.xxhash64("shingle").alias("h"))
    dfreq = sh.groupBy("h").agg(F.count(F.lit(1)).alias("df"))
    return (
        sh.join(dfreq, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum((F.col("df") == 1).cast("long")).alias("n_novel"),
        )
        .select(
            "doc_id", "n_shingles", "n_novel",
            (F.col("n_novel") / F.col("n_shingles")).alias("novelty"),
        )
        .orderBy("doc_id")
    )


def ngram_novelty_oracle(n: int = 3) -> str:
    from resin_spark.operators.dedup import _shingles_sql
    return f"""
    WITH sh AS (
        SELECT doc_id, shingle
        FROM ({_shingles_sql(n)}) WHERE doc_id IS NOT NULL
    ), dfreq AS (
        SELECT shingle, COUNT(*) AS df FROM sh GROUP BY shingle
    )
    SELECT doc_id, COUNT(*) AS n_shingles,
           CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_novel,
           CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT)
               / COUNT(*) AS novelty
    FROM sh JOIN dfreq USING (shingle)
    GROUP BY doc_id ORDER BY doc_id
    """


# --- duplicated-span coverage (exact substring-dedup accounting) -------------

SPAN_K = 10


def dup_span_coverage(t: Tables, k: int = SPAN_K) -> DataFrame:
    """(doc_id, n_tokens, covered_tokens, dup_fraction): per doc, how
    many token positions sit inside at least one ``k``-gram that occurs
    ≥ 2 times in the whole corpus (counting within-doc repeats) — the
    accounting pass of exact substring deduplication (the "dedup
    training data at the span level" move): dup_fraction ≈ 0 means the
    doc is substring-fresh, ≈ 1 means it is assembled from text that
    exists elsewhere.

    Plan: positional k-grams are built ROW-LOCALLY from the per-doc
    token array; the only corpus-wide shuffle is the k-gram df count
    (grams move as xxhash64 longs); duplicated occurrences come back as
    (doc_id, pos) intervals [pos, pos+k-1], and per-doc coverage is a
    classic gaps-and-islands merge — running-max-of-end window keyed by
    doc_id, so no interval self-join and no driver work. Cost is linear
    in corpus tokens; the df key is skewed exactly on boilerplate
    spans (AQE skew-split territory), like every dedup join here.

    Exactness: pure integer arithmetic until the final one-division
    dup_fraction; the oracle mirrors the same island construction on
    k-gram STRINGS (hashes are an internal shuffle-width optimisation —
    df counts agree because xxhash64 is collision-free at any
    realistic corpus). Docs with fewer than k tokens report coverage 0;
    zero-token docs vanish (the suite's explode semantics).
    """
    base = _doc_token_arrays(t["documents"])
    grams = base.filter(F.size("tk") >= k).select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("tk") - k),
                lambda i: F.struct(
                    i.cast("int").alias("pos"),
                    F.xxhash64(F.concat_ws(
                        " ", F.slice("tk", (i + 1).cast("int"), k))).alias("h"),
                ),
            )
        ).alias("g"),
    ).select("doc_id", "g.pos", "g.h")
    dfreq = grams.groupBy("h").agg(F.count(F.lit(1)).alias("df"))
    dup = (
        grams.join(dfreq.filter(F.col("df") >= 2), "h")
        .select("doc_id", "pos", (F.col("pos") + (k - 1)).alias("end"))
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    prev_end = F.max("end").over(
        w.rowsBetween(Window.unboundedPreceding, -1))
    islands = (
        dup.withColumn(
            "new_island",
            F.when(prev_end.isNull() | (F.col("pos") > prev_end), 1)
            .otherwise(0))
        .withColumn("island", F.sum("new_island").over(w))
        .groupBy("doc_id", "island")
        .agg((F.max("end") - F.min("pos") + 1).alias("span_len"))
        .groupBy("doc_id")
        .agg(F.sum("span_len").alias("covered_tokens"))
    )
    counts = base.select("doc_id", F.size("tk").cast("long").alias("n_tokens"))
    return (
        counts.join(islands, "doc_id", "left")
        .select(
            "doc_id", "n_tokens",
            F.coalesce("covered_tokens", F.lit(0)).alias("covered_tokens"),
            (F.coalesce("covered_tokens", F.lit(0)) / F.col("n_tokens"))
            .alias("dup_fraction"),
        )
        .orderBy("doc_id")
    )


def dup_span_coverage_oracle(k: int = SPAN_K) -> str:
    toks = T.tokens_sql("text")
    return f"""
    WITH base AS (
        SELECT doc_id, {toks} AS tk
        FROM documents WHERE doc_id IS NOT NULL
    ), docs1 AS (
        SELECT doc_id, tk FROM base WHERE len(tk) >= 1
    ), grams AS (
        SELECT doc_id, g.pos, g.gram FROM (
            SELECT doc_id,
                   unnest(list_transform(range(1, len(tk) - {k} + 2),
                       i -> {{'pos': i - 1,
                             'gram': array_to_string(tk[i : i + {k} - 1], ' ')}}))
                       AS g
            FROM docs1 WHERE len(tk) >= {k}
        )
    ), dfreq AS (
        SELECT gram FROM grams GROUP BY gram HAVING COUNT(*) >= 2
    ), dup AS (
        SELECT doc_id, pos, pos + {k} - 1 AS "end"
        FROM grams WHERE gram IN (SELECT gram FROM dfreq)
    ), flagged AS (
        SELECT doc_id, pos, "end",
               CASE WHEN MAX("end") OVER (
                        PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                        IS NULL
                    OR pos > MAX("end") OVER (
                        PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    THEN 1 ELSE 0 END AS new_island
        FROM dup
    ), islands AS (
        SELECT doc_id,
               SUM(new_island) OVER (PARTITION BY doc_id ORDER BY pos
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS island,
               pos, "end"
        FROM flagged
    ), spans AS (
        SELECT doc_id, island, MAX("end") - MIN(pos) + 1 AS span_len
        FROM islands GROUP BY doc_id, island
    ), covered AS (
        SELECT doc_id, CAST(SUM(span_len) AS BIGINT) AS covered_tokens
        FROM spans GROUP BY doc_id
    )
    SELECT d.doc_id, CAST(len(d.tk) AS BIGINT) AS n_tokens,
           COALESCE(c.covered_tokens, 0) AS covered_tokens,
           COALESCE(c.covered_tokens, 0) / CAST(len(d.tk) AS BIGINT)
               AS dup_fraction
    FROM docs1 d LEFT JOIN covered c USING (doc_id)
    ORDER BY d.doc_id
    """


# --- Naive-Bayes language classifier (train + score in one plan) -------------

def nb_lang_classify(t: Tables, base: DataFrame | None = None) -> DataFrame:
    """Multinomial Naive-Bayes language classifier, trained on the
    corpus's own ``lang`` labels and self-scored (the fastText-style
    "learned filter" counterpart of the rule-based ``lang_id``).

    Model: P(tok|lang) with add-1 smoothing over the global vocabulary,
    P(lang) from doc counts. Per doc, the score of candidate language L
    is prior_bits(L) + Σ_tok bits(tok|L); the argmin (fewest bits) wins.

    Plan shape: ONE corpus tokenise feeds both training and scoring —
    the (lang, tok) count frame is vocabulary-sized and checkpointed,
    so training is one shuffle on (lang, tok); every derived frame
    (per-language totals, vocabulary size, unseen-token default bits,
    priors) is |langs|-rows-or-one and broadcast. Scoring re-reads the
    same token stream, fans out ×|langs| against the broadcast
    candidate frame, left-joins the model on (cand, tok) — Zipf skew on
    tok, AQE splits it — and aggregates bits per (doc, cand). No
    driver collect; the model build is the only corpus-scale shuffle.

    Cross-engine exactness: every distinct (lang, tok) bits value is
    round(−log2((c+1)/(n_lang+V)), 6) computed once (exact IEEE
    division, both engines agree far inside the rounding grain), doc
    totals are order-independent decimal sums, and prior bits join the
    sum in decimal before the final cast. Ties in the argmin break on
    candidate language ascending.

    Scale: the model is |vocab|×|langs| rows — broadcastable for real
    language sets; at 100 TB the scoring join on tok is the only big
    exchange and is the same shape quality_perplexity already sweeps.
    """
    docs = t["documents"]
    model, cand = nb_model_frames(docs, base=base)
    return nb_classify_with_model(docs, model, cand, base=base)


def _nb_base(docs: DataFrame, base: DataFrame | None = None) -> DataFrame:
    # shared card base (r12): same (doc_id, lang, tokens(text)) columns
    # read from a caller-cached tokenize; filters identical.
    src = (base.select("doc_id", "lang", "tk") if base is not None else
           docs.select("doc_id", "lang", T.tokens("text").alias("tk")))
    return (
        src
        .filter(F.col("doc_id").isNotNull() & F.col("lang").isNotNull())
        .filter(F.size("tk") >= 1)
    )


def nb_model_frames(docs: DataFrame, with_counts: bool = False,
                    base: DataFrame | None = None):
    """(model, cand[, cnt]): the NB classifier as two relations —
    (cand, tok, bits) per observed (language, token) pair, and the
    |langs|-row (cand, prior_bits, oov_bits) frame. Shared by the
    self-scoring query, the parquet persistence pair (write_nb_model /
    read_nb_model), and the streaming artifact build; ``with_counts``
    additionally returns the checkpointed (lang, tok, c) count frame
    so consumers can derive global token frequencies WITHOUT another
    corpus scan (the streaming vocab cap does)."""
    base = _nb_base(docs, base=base)
    toks = base.select(F.col("lang"), F.explode("tk").alias("tok"))
    cnt = (
        toks.groupBy("lang", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)
    )
    n_lang = cnt.groupBy("lang").agg(F.sum("c").alias("n_lang"))
    vocab = cnt.agg(F.countDistinct("tok").alias("v"))
    model = cnt.join(n_lang, "lang").join(broadcast(vocab)).select(
        F.col("lang").alias("cand"), "tok",
        F.round(-F.log2(
            (F.col("c") + 1).cast("double")
            / (F.col("n_lang") + F.col("v")).cast("double")), 6).alias("bits"),
    )
    # localCheckpoint (r11): priors feeds both the total aggregate and
    # the cand join — each branch would otherwise re-run the corpus
    # tokenize behind it. |langs| rows materialised.
    priors = opt_checkpoint(
        base.groupBy("lang").agg(F.count(F.lit(1)).alias("docs_lang")),
        "priors")
    total = priors.agg(F.sum("docs_lang").alias("docs_total"))
    cand = (
        priors.join(broadcast(total)).join(n_lang, "lang")
        .join(broadcast(vocab))
        .select(
            F.col("lang").alias("cand"),
            F.round(-F.log2(F.col("docs_lang").cast("double")
                            / F.col("docs_total").cast("double")), 6)
            .alias("prior_bits"),
            F.round(-F.log2(F.lit(1.0)
                            / (F.col("n_lang") + F.col("v")).cast("double")), 6)
            .alias("oov_bits"),
        )
    )
    if with_counts:
        return model, cand, cnt
    return model, cand


def nb_classify_with_model(docs: DataFrame, model: DataFrame,
                           cand: DataFrame,
                           base: DataFrame | None = None) -> DataFrame:
    """Score ``docs`` with an NB model given as relations — the apply
    side of the train-once/classify-forever split. With the frames
    straight from nb_model_frames this IS nb_lang_classify; with
    frames read back from parquet (read_nb_model) the output is
    row-for-row identical (pinned in tests)."""
    toks = _nb_base(docs, base=base).select(
        "doc_id", F.col("lang").alias("true_lang"),
        F.explode("tk").alias("tok"))
    scored = (
        toks.join(broadcast(cand))
        .join(model, ["cand", "tok"], "left")
        .groupBy("doc_id", "true_lang", "cand", "prior_bits")
        .agg(
            (
                F.col("prior_bits").cast("decimal(18,6)")
                + F.sum(F.coalesce("bits", "oov_bits")
                        .cast("decimal(18,6)"))
            ).cast("double").alias("total_bits")
        )
    )
    # argmin as a map-side-collapsing aggregate, not a rank window (the
    # _assign_cells r5 rewrite): the exchange carries one row per doc,
    # not one per (doc, language). Tie-break preserved: lowest bits,
    # then language ascending.
    best = F.min_by(F.struct("cand", "total_bits"),
                    F.struct(F.col("total_bits"), F.col("cand")))
    return (
        scored.groupBy("doc_id", "true_lang")
        .agg(best.alias("best"))
        .select(
            "doc_id", "true_lang",
            F.col("best.cand").alias("pred_lang"),
            F.round("best.total_bits", 6).alias("best_bits"),
            (F.col("best.cand") == F.col("true_lang")).alias("correct"),
        )
        .orderBy("doc_id")
    )


def write_nb_model(docs: DataFrame, path: str) -> None:
    """Persist the NB language model: ``{path}/token_bits`` (cand, tok,
    bits) and ``{path}/lang_stats`` (cand, prior_bits, oov_bits). The
    production deployment path — train on the standing corpus once,
    then every later batch/stream classifies against the stored
    relations without re-reading the training corpus (the
    write_pq_index / write_dedup_index precedent applied to the
    learned filter). Deterministic: same corpus → byte-identical
    model relations."""
    model, cand = nb_model_frames(docs)
    model.write.mode("overwrite").parquet(f"{path}/token_bits")
    cand.coalesce(1).write.mode("overwrite").parquet(f"{path}/lang_stats")


def read_nb_model(spark, path: str):
    """(model, cand) frames read back from write_nb_model output."""
    return (spark.read.parquet(f"{path}/token_bits"),
            spark.read.parquet(f"{path}/lang_stats"))


def nb_lang_classify_oracle() -> str:
    tk = T.tokens_sql("text")
    return f"""
    WITH base AS (
        SELECT doc_id, lang, {tk} AS tk
        FROM documents
        WHERE doc_id IS NOT NULL AND lang IS NOT NULL
    ), base1 AS (
        SELECT * FROM base WHERE len(tk) >= 1
    ), tok AS (
        SELECT doc_id, lang AS true_lang, unnest(tk) AS tok FROM base1
    ), cnt AS (
        SELECT true_lang AS lang, tok, COUNT(*) AS c
        FROM tok GROUP BY 1, 2
    ), n_lang AS (
        SELECT lang, SUM(c) AS n_lang FROM cnt GROUP BY lang
    ), vocab AS (
        SELECT COUNT(DISTINCT tok) AS v FROM cnt
    ), model AS (
        SELECT cnt.lang AS cand, cnt.tok,
               round(-log2(CAST(c + 1 AS DOUBLE)
                           / CAST(n_lang + v AS DOUBLE)), 6) AS bits
        FROM cnt JOIN n_lang USING (lang), vocab
    ), priors AS (
        SELECT lang, COUNT(*) AS docs_lang FROM base1 GROUP BY lang
    ), total AS (
        SELECT SUM(docs_lang) AS docs_total FROM priors
    ), cand AS (
        SELECT p.lang AS cand,
               round(-log2(CAST(docs_lang AS DOUBLE)
                           / CAST(docs_total AS DOUBLE)), 6) AS prior_bits,
               round(-log2(1.0 / CAST(n_lang + v AS DOUBLE)), 6) AS oov_bits
        FROM priors p JOIN n_lang n ON n.lang = p.lang, total, vocab
    ), scored AS (
        SELECT t.doc_id, t.true_lang, c.cand, c.prior_bits,
               CAST(CAST(c.prior_bits AS DECIMAL(18,6))
                    + SUM(CAST(COALESCE(m.bits, c.oov_bits)
                               AS DECIMAL(18,6)))
                    AS DOUBLE) AS total_bits
        FROM tok t
        CROSS JOIN cand c
        LEFT JOIN model m ON m.cand = c.cand AND m.tok = t.tok
        GROUP BY 1, 2, 3, 4
    )
    SELECT doc_id, true_lang, cand AS pred_lang,
           round(total_bits, 6) AS best_bits,
           cand = true_lang AS correct
    FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                     ORDER BY total_bits ASC, cand) AS rn
        FROM scored
    ) WHERE rn = 1
    ORDER BY doc_id
    """


# --- DSIR-style hashed-n-gram importance weights -----------------------------

DSIR_BUCKETS = 4096


def importance_weights(t: Tables, target_lang: str = "en",
                       n_buckets: int = DSIR_BUCKETS) -> DataFrame:
    """Data Selection via Importance Resampling (DSIR, Xie et al. 2023)
    log importance weights: score every doc by how target-like its
    hashed-bigram distribution is, log w(doc) = Σ_f [bits_raw(f) −
    bits_target(f)] over the doc's bigram features, where both bag-of-
    hashed-bigram models use add-1 smoothing over a FIXED bucket space.

    The hashing trick is the whole scale story: both "models" are
    ≤ n_buckets rows no matter the corpus size, so scoring is a
    broadcast join against a 4096-row frame — one corpus-scale shuffle
    total (the raw bucket count), since the target side aggregates a
    filtered subset of the same scan. At 100 TB the plan is: scan →
    row-local bigrams → hash→bucket → two partial-agg counts → per-doc
    broadcast-join fold. No driver collect.

    Cross-engine exactness: bucket ids are the md5-based 60-bit token
    hash mod n_buckets (both engines agree integer-exactly), each
    bucket's log-ratio is rounded once to 6 decimals, per-doc sums are
    order-independent decimal sums. Docs with < 2 tokens vanish at the
    bigram explode in both engines.
    """
    base = (
        t["documents"]
        .filter(F.col("doc_id").isNotNull() & F.col("lang").isNotNull())
        .select("doc_id", "lang", T.tokens("text").alias("tk"))
        .filter(F.size("tk") >= 1)
    )
    # lang rides along with each feature row so the final per-doc
    # aggregate needs no join back to documents (4 corpus scans → 3)
    feats = (
        base.filter(F.size("tk") >= 2).select(
            "doc_id", "lang",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size("tk") - 2),
                    lambda i: F.struct(
                        F.element_at("tk", (i + 1).cast("int")).alias("w1"),
                        F.element_at("tk", (i + 2).cast("int")).alias("w2"),
                    ),
                )
            ).alias("p"),
        ).select(
            "doc_id", "lang",
            (_token_hash60(F.concat_ws(" ", "p.w1", "p.w2")) % n_buckets)
            .alias("b"),
        )
    )
    raw = (
        feats.groupBy("b").agg(F.count(F.lit(1)).alias("c_raw"))
        .localCheckpoint(eager=False)
    )
    tgt_docs = base.filter(F.col("lang") == target_lang)
    # re-derive target features from the same row-local transform on the
    # filtered scan (cheaper than re-shuffling the raw feature stream)
    tgt = (
        _bigram_instances(tgt_docs)
        .select((_token_hash60(F.concat_ws(" ", "w1", "w2")) % n_buckets)
                .alias("b"))
        .groupBy("b").agg(F.count(F.lit(1)).alias("c_tgt"))
    )
    n_raw = raw.agg(F.sum("c_raw").alias("n_raw"))
    n_tgt = tgt.agg(F.sum("c_tgt").alias("n_tgt"))
    ratios = (
        raw.join(tgt, "b", "left")
        .join(broadcast(n_raw)).join(broadcast(n_tgt))
        .select(
            "b",
            F.round(
                F.log2((F.coalesce("c_tgt", F.lit(0)) + 1).cast("double")
                       / (F.col("n_tgt") + n_buckets).cast("double"))
                - F.log2((F.col("c_raw") + 1).cast("double")
                         / (F.col("n_raw") + n_buckets).cast("double")),
                6).alias("logw"),
        )
    )
    return (
        feats.join(broadcast(ratios), "b")
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.round(exact.dsum("logw", scale=6, precision=18), 6)
            .alias("log_weight"),
            exact.dravg("logw", scale=6, precision=18)
            .alias("log_weight_per_feat"),
        )
        .select("doc_id", "lang", "n_feats", "log_weight",
                "log_weight_per_feat")
        .orderBy("doc_id")
    )


def importance_weights_oracle(target_lang: str = "en",
                              n_buckets: int = DSIR_BUCKETS) -> str:
    tk = T.tokens_sql("text")
    bh = _token_hash60_sql("w1 || ' ' || w2")
    return f"""
    WITH base AS (
        SELECT doc_id, lang, {tk} AS tk
        FROM documents
        WHERE doc_id IS NOT NULL AND lang IS NOT NULL
    ), base1 AS (
        SELECT * FROM base WHERE len(tk) >= 1
    ), big AS (
        SELECT doc_id, lang, p.w1, p.w2 FROM (
            SELECT doc_id, lang,
                   unnest(list_transform(range(1, len(tk) - 1 + 1),
                          i -> {{'w1': tk[i], 'w2': tk[i + 1]}})) AS p
            FROM base1 WHERE len(tk) >= 2
        )
    ), feats AS (
        SELECT doc_id, lang, ({bh}) % {n_buckets} AS b FROM big
    ), raw AS (
        SELECT b, COUNT(*) AS c_raw FROM feats GROUP BY b
    ), tgt AS (
        SELECT b, COUNT(*) AS c_tgt FROM feats
        WHERE lang = '{target_lang}' GROUP BY b
    ), n_raw AS (SELECT SUM(c_raw) AS n_raw FROM raw),
    n_tgt AS (SELECT SUM(c_tgt) AS n_tgt FROM tgt),
    ratios AS (
        SELECT raw.b,
               round(log2(CAST(COALESCE(c_tgt, 0) + 1 AS DOUBLE)
                          / CAST(n_tgt + {n_buckets} AS DOUBLE))
                     - log2(CAST(c_raw + 1 AS DOUBLE)
                            / CAST(n_raw + {n_buckets} AS DOUBLE)),
                     6) AS logw
        FROM raw LEFT JOIN tgt USING (b), n_raw, n_tgt
    )
    SELECT f.doc_id, f.lang, COUNT(*) AS n_feats,
           round({exact.dsum_sql("logw", scale=6, precision=18)}, 6)
               AS log_weight,
           {exact.dravg_sql("logw", scale=6, precision=18)}
               AS log_weight_per_feat
    FROM feats f JOIN ratios r USING (b)
    GROUP BY f.doc_id, f.lang
    ORDER BY f.doc_id
    """


# --- deterministic multi-epoch training shuffle ------------------------------

N_EPOCHS = 3


def epoch_shuffle(t: Tables, n_epochs: int = N_EPOCHS,
                  n_shards: int = N_SHARDS) -> DataFrame:
    """Reproducible per-epoch global shuffle for training export: every
    (epoch, doc) gets a (shard, pos) that is a pure function of the
    epoch number and doc id, so epoch k's read order is a deterministic
    permutation — different every epoch, byte-identical on re-run (the
    multi-epoch extension of shard_export's reproducibility contract).

    Plan: docs × a broadcast |epochs|-row frame, shuffle key =
    md5-hash60 of "epoch:doc_id", shard = key mod n_shards, pos =
    row_number within (epoch, shard) ordered by (key, doc_id). No
    global sort: ordering is established per (epoch, shard) partition —
    exactly the layout a partitioned parquet write consumes, so the
    1000-executor version is repartition(epoch, shard) +
    sortWithinPartitions, never a single-range total order.
    """
    docs = t["documents"].filter(F.col("doc_id").isNotNull()) \
        .select("doc_id")
    epochs = docs.sparkSession.range(n_epochs) \
        .select(F.col("id").cast("int").alias("epoch"))
    keyed = (
        docs.join(broadcast(epochs))
        .select(
            "doc_id", "epoch",
            _token_hash60(F.concat_ws(":", "epoch", "doc_id")).alias("k"),
        )
    )
    w = Window.partitionBy("epoch", (F.col("k") % n_shards)) \
        .orderBy("k", "doc_id")
    return (
        keyed.select(
            "doc_id", "epoch",
            (F.col("k") % n_shards).cast("int").alias("shard"),
            F.row_number().over(w).alias("pos"),
        )
        .orderBy("epoch", "shard", "pos")
    )


def epoch_shuffle_oracle(n_epochs: int = N_EPOCHS,
                         n_shards: int = N_SHARDS) -> str:
    kh = _token_hash60_sql("CAST(epoch AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)")
    return f"""
    WITH epochs AS (
        SELECT unnest(range({n_epochs})) AS epoch
    ), keyed AS (
        SELECT doc_id, CAST(epoch AS INT) AS epoch, ({kh}) AS k
        FROM documents, epochs
        WHERE doc_id IS NOT NULL
    )
    SELECT doc_id, epoch, CAST(k % {n_shards} AS INT) AS shard,
           CAST(ROW_NUMBER() OVER (PARTITION BY epoch, k % {n_shards}
                                   ORDER BY k, doc_id) AS BIGINT) AS pos
    FROM keyed
    ORDER BY epoch, shard, pos
    """


# --- k-means Lloyd refinement (iterative, unrolled) --------------------------

KMEANS_ITERS = 2


def _argmax_ordering(score: str = "score", label: str = "c_label"):
    """min_by ordering struct equivalent to the r4 rank window's
    ``orderBy(score desc, label asc)``: smallest (-score, label) wins.
    ``cosine_gated`` is total (never NULL), so the ordering struct is
    never NULL-skipped. -0.0 cannot diverge from the window order:
    Spark compares -0.0 == 0.0 since 3.0, and the gate emits literal
    0.0 for degenerate pairs anyway."""
    return F.struct((-F.col(score)).alias("ns"), F.col(label).alias("lb"))


def _assign_cells(vecs: DataFrame, cents: DataFrame) -> DataFrame:
    """(vec_id, cell): max-cosine assignment against broadcast centroids
    — the shared kernel of centroid_assign / semantic_dedup / IVF.

    The argmax is a ``groupBy(vec_id).agg(min_by(...))`` aggregate, NOT
    a rank window: min_by is a declarative aggregate, so the scored
    |corpus|×|cells| frame collapses MAP-SIDE (the broadcast join emits
    each vector's k cell rows consecutively in one partition) and the
    exchange carries one (vec_id, cell) row per vector — n rows, not
    n×k. The r4 rank-window form shuffled the full scored frame through
    a hash exchange before collapsing; at 100 TB with thousands of
    cells that is shuffling corpus×k instead of the corpus (the r4
    verdict's one remaining scale smell). Tie-break preserved exactly:
    highest score, then smallest cell label (GraphSearcher.cs best-hit
    semantics: first-best wins a tie)."""
    return (
        vecs.join(broadcast(cents))
        .select("vec_id", "c_label",
                V.cosine_gated("embedding", "centroid").alias("score"))
        .groupBy("vec_id")
        .agg(F.min_by("c_label", _argmax_ordering()).alias("cell"))
    )


def _cell_means(vecs: DataFrame, assign: DataFrame) -> DataFrame:
    """(c_label, centroid): decimal-exact per-cell mean vectors from an
    assignment — the Lloyd update step (same exactness recipe as
    label_centroid_vectors, keyed by assigned cell instead of label)."""
    return (
        vecs.join(assign, "vec_id")
        .select("cell", F.posexplode("embedding").alias("dim", "x"))
        .groupBy("cell", "dim")
        .agg(
            (
                F.sum(F.col("x").cast("string").cast("decimal(28,15)"))
                .cast("double") / F.count(F.lit(1))
            ).alias("mean_val")
        )
        .groupBy("cell")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "mean_val"))).alias("s"))
        .select(
            F.col("cell").alias("c_label"),
            F.transform("s", lambda st: st["mean_val"]).alias("centroid"),
        )
    )


def kmeans_refine(emb: DataFrame, iters: int = KMEANS_ITERS) -> DataFrame:
    """Distributed spherical k-means: ``iters`` full Lloyd iterations
    (assign to max-cosine centroid → recompute exact-mean centroids),
    seeded from the label-mean centroids, reporting the final per-cell
    membership and cohesion.

    This is the clustering pass a SemDeDup / IVF / topic-bucketing
    pipeline runs before its per-cell work. Output per cell:
    member count and mean cosine-to-centroid (the cohesion signal that
    decides whether a cell needs splitting).

    Plan/scale: each iteration is (a) one broadcast-scored scan + a
    linear rank-1 window for assignment and (b) one (cell, dim) shuffle
    of posexploded components for the update — both linear in rows ×
    dims; centroids stay |cells| rows and BROADCAST at every step, so
    iterations never shuffle the corpus against itself. Assignments
    are localCheckpointed per iteration (id+cell, 12 bytes/row) to cut
    lineage regrowth — the same guard dedup_components uses for its
    propagation loop. No driver collect.

    Cross-engine exactness: every centroid component is an
    order-independent decimal mean; assignment ties break on cell id
    ascending; the reported mean cosine is a decimal-exact average of
    per-vector cosines rounded once at 9 decimals (both engines agree
    far inside the grain — the centroid_assign precedent).
    """
    from resin_spark.operators.similarity import valid_vectors

    vecs = valid_vectors(emb).filter(F.col("label").isNotNull()) \
        .select("vec_id", "embedding", "label")
    cents = label_centroid_vectors(vecs)
    assign = None
    for _ in range(iters):
        assign = _assign_cells(vecs, cents).localCheckpoint(eager=False)
        cents = _cell_means(vecs, assign)
    scored = (
        vecs.join(assign, "vec_id")
        .join(broadcast(cents), F.col("cell") == F.col("c_label"))
        .select(
            "cell",
            F.round(V.cosine_gated("embedding", "centroid"), 9).alias("cos"),
        )
    )
    return (
        scored.groupBy("cell")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            exact.dravg("cos", scale=9, precision=20)
            .alias("mean_cos"),
        )
        .orderBy("cell")
    )


def kmeans_refine_oracle(iters: int = KMEANS_ITERS) -> str:
    from resin_spark.operators.similarity import VALID_VECTORS_SQL

    def means_cte(src_assign: str, out: str) -> str:
        return f"""{out}_dims AS (
        SELECT a.cell, CAST(p.i - 1 AS INT) AS dim,
               CAST(SUM(CAST(CAST(p.x AS VARCHAR) AS DECIMAL(28,15))) AS DOUBLE)
                   / COUNT(*) AS mean_val
        FROM (
            SELECT vec_id,
                   unnest(list_transform(range(1, len(embedding) + 1),
                          i -> {{'i': i, 'x': embedding[i]}})) AS p
            FROM vemb
        ) v JOIN {src_assign} a USING (vec_id)
        GROUP BY 1, 2
    ), {out} AS (
        SELECT cell AS c_label, list(mean_val ORDER BY dim) AS centroid
        FROM {out}_dims GROUP BY cell
    )"""

    def assign_cte(cent: str, out: str) -> str:
        cos = V.cosine_gated_sql("e.embedding", "c.centroid")
        return f"""{out} AS (
        SELECT vec_id, cell FROM (
            SELECT e.vec_id, c.c_label AS cell,
                   ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                      ORDER BY {cos} DESC, c.c_label) AS rn
            FROM vemb e, {cent} c
        ) WHERE rn = 1
    )"""

    parts = [f"""vemb AS (
        SELECT vec_id, embedding, label FROM embeddings
        WHERE {VALID_VECTORS_SQL} AND label IS NOT NULL
    ), cent0_dims AS (
        SELECT label AS cell, CAST(p.i - 1 AS INT) AS dim,
               CAST(SUM(CAST(CAST(p.x AS VARCHAR) AS DECIMAL(28,15))) AS DOUBLE)
                   / COUNT(*) AS mean_val
        FROM (
            SELECT label,
                   unnest(list_transform(range(1, len(embedding) + 1),
                          i -> {{'i': i, 'x': embedding[i]}})) AS p
            FROM vemb
        )
        GROUP BY 1, 2
    ), cent0 AS (
        SELECT cell AS c_label, list(mean_val ORDER BY dim) AS centroid
        FROM cent0_dims GROUP BY cell
    )"""]
    cent = "cent0"
    assign = None
    for i in range(iters):
        assign = f"assign{i}"
        parts.append(assign_cte(cent, assign))
        cent = f"cent{i + 1}"
        parts.append(means_cte(assign, cent))
    cos_final = V.cosine_gated_sql("e.embedding", "c.centroid")
    return f"""
    WITH {", ".join(parts)}
    SELECT a.cell, COUNT(*) AS n_members,
           {exact.dravg_sql("round(" + "cosx" + ", 9)", scale=9, precision=20)}
               AS mean_cos
    FROM (
        SELECT a.vec_id, a.cell, {cos_final} AS cosx
        FROM vemb e
        JOIN {assign} a USING (vec_id)
        JOIN {cent} c ON c.c_label = a.cell
    ) a(vec_id, cell, cosx)
    GROUP BY a.cell
    ORDER BY a.cell
    """


# --- corpus statistics sheet (dataset card) ----------------------------------

def corpus_stats(t: Tables, base: DataFrame | None = None) -> DataFrame:
    """One-row corpus summary — the numbers a dataset card leads with:
    doc/token totals, exact vocabulary size, type-token ratio, mean and
    exact p50/p95 document lengths, language count and the dominant
    language's share.

    Scale design: everything is an aggregate except the length
    quantiles, which are computed EXACTLY without a corpus-wide sort:
    per-doc token counts collapse to a (length, n_docs) value histogram
    first — a frame bounded by the max document length, not the corpus
    — and the cumulative window runs over that bounded frame. The same
    trick price_quantiles uses per group, applied corpus-wide where a
    single-partition sort of all docs would be the 100 TB smell. One
    token-explode shuffle (vocab + totals), one doc-length shuffle
    (histogram); every later frame is bounded.

    Cross-engine exactness: counts are integers; ratios are single
    IEEE divisions of exact integers; quantiles are order statistics
    picked by exact integer comparison (rn-style cum ≥ p·n).

    ``base`` (r12, the r11 pairs=/scores= precedent): an optional
    shared :func:`card_base` relation. When given, the token arrays
    and the language counts derive from it (one cached tokenize for
    the whole card) instead of fresh documents scans; rows and values
    are identical (same filters applied on top). Default None keeps
    the standalone entry self-contained.
    """
    if base is not None:
        arrays = (base.filter(F.col("doc_id").isNotNull())
                  .select("doc_id", "tk").filter(F.size("tk") >= 1))
        lang_src = base
    else:
        arrays = _doc_token_arrays(t["documents"])
        lang_src = t["documents"]
    lens = arrays.select("doc_id", F.size("tk").cast("long").alias("n_tok"))
    if base is None:
        # localCheckpoint (r11): the per-doc length frame feeds the
        # length histogram AND the doc totals — two branches that would
        # each re-run the corpus tokenize. Two scalar columns per doc.
        # (With a shared base the recompute is a cheap map over cached
        # blocks — no checkpoint needed.)
        lens = opt_checkpoint(lens, "lens")
    toks = arrays.select(F.explode("tk").alias("tok"))
    tok_agg = toks.agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.countDistinct("tok").alias("vocab"),
    )
    hist = lens.groupBy("n_tok").agg(F.count(F.lit(1)).alias("c"))
    wcum = Window.orderBy("n_tok").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    # the cumulative window runs on the BOUNDED histogram frame (≤ max
    # doc length rows) — acceptable single-partition state, unlike a
    # corpus-wide sort
    cum = hist.select(
        "n_tok", F.sum("c").over(wcum).alias("cum"),
        F.sum("c").over(Window.partitionBy()).alias("n_docs"),
    )
    quants = cum.agg(
        F.min(F.when(F.col("cum") * 100 >= 50 * F.col("n_docs"),
                     F.col("n_tok"))).alias("p50_doc_tokens"),
        F.min(F.when(F.col("cum") * 100 >= 95 * F.col("n_docs"),
                     F.col("n_tok"))).alias("p95_doc_tokens"),
    )
    doc_agg = lens.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("sum_tok"),
    )
    langs = (
        lang_src.filter(F.col("doc_id").isNotNull()
                        & F.col("lang").isNotNull())
        .groupBy("lang").agg(F.count(F.lit(1)).alias("c"))
    )
    # rank-1 window over the BOUNDED langs frame (|langs| rows);
    # tie-break on lang ascending — portable, unlike max_by-on-struct
    wl = Window.orderBy(F.col("c").desc(), "lang")
    lang_agg = (
        langs
        .withColumn("rn", F.row_number().over(wl))
        .agg(
            F.count(F.lit(1)).alias("n_langs"),
            F.min(F.when(F.col("rn") == 1, F.col("lang"))).alias("top_lang"),
            F.min(F.when(F.col("rn") == 1, F.col("c"))).alias("top_lang_docs"),
            F.sum("c").alias("lang_docs_total"),
        )
    )
    return (
        doc_agg.join(broadcast(tok_agg)).join(broadcast(quants))
        .join(broadcast(lang_agg))
        .select(
            "n_docs", "n_tokens", "vocab",
            # try_divide: a zero-token / zero-doc corpus reports NULL
            # instead of aborting under ANSI (r6 fuzz find)
            F.try_divide(F.col("vocab").cast("double"),
                         F.col("n_tokens").cast("double"))
            .alias("type_token_ratio"),
            F.try_divide(F.col("sum_tok").cast("double"),
                         F.col("n_docs").cast("double"))
            .alias("mean_doc_tokens"),
            "p50_doc_tokens", "p95_doc_tokens",
            "n_langs", "top_lang",
            F.try_divide(F.col("top_lang_docs").cast("double"),
                         F.col("lang_docs_total").cast("double"))
            .alias("top_lang_share"),
        )
    )


def corpus_stats_oracle() -> str:
    tk = T.tokens_sql("text")
    return f"""
    WITH base AS (
        SELECT doc_id, {tk} AS tk
        FROM documents WHERE doc_id IS NOT NULL
    ), base1 AS (
        SELECT doc_id, tk, CAST(len(tk) AS BIGINT) AS n_tok
        FROM base WHERE len(tk) >= 1
    ), tok AS (
        SELECT unnest(tk) AS tok FROM base1
    ), tok_agg AS (
        SELECT COUNT(*) AS n_tokens, COUNT(DISTINCT tok) AS vocab FROM tok
    ), hist AS (
        SELECT n_tok, COUNT(*) AS c FROM base1 GROUP BY n_tok
    ), cum AS (
        SELECT n_tok,
               SUM(c) OVER (ORDER BY n_tok
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cum,
               SUM(c) OVER () AS n_docs
        FROM hist
    ), quants AS (
        SELECT MIN(CASE WHEN cum * 100 >= 50 * n_docs THEN n_tok END)
                   AS p50_doc_tokens,
               MIN(CASE WHEN cum * 100 >= 95 * n_docs THEN n_tok END)
                   AS p95_doc_tokens
        FROM cum
    ), doc_agg AS (
        SELECT COUNT(*) AS n_docs, SUM(n_tok) AS sum_tok FROM base1
    ), langs AS (
        SELECT lang, COUNT(*) AS c FROM documents
        WHERE doc_id IS NOT NULL AND lang IS NOT NULL GROUP BY lang
    ), ranked AS (
        SELECT *, ROW_NUMBER() OVER (ORDER BY c DESC, lang) AS rn FROM langs
    ), lang_agg AS (
        SELECT COUNT(*) AS n_langs,
               MIN(CASE WHEN rn = 1 THEN lang END) AS top_lang,
               MIN(CASE WHEN rn = 1 THEN c END) AS top_lang_docs,
               SUM(c) AS lang_docs_total
        FROM ranked
    )
    SELECT CAST(d.n_docs AS BIGINT) AS n_docs,
           CAST(t.n_tokens AS BIGINT) AS n_tokens,
           CAST(t.vocab AS BIGINT) AS vocab,
           CAST(t.vocab AS DOUBLE) / NULLIF(CAST(t.n_tokens AS DOUBLE), 0)
               AS type_token_ratio,
           CAST(d.sum_tok AS DOUBLE) / NULLIF(CAST(d.n_docs AS DOUBLE), 0)
               AS mean_doc_tokens,
           q.p50_doc_tokens, q.p95_doc_tokens,
           CAST(l.n_langs AS BIGINT) AS n_langs, l.top_lang,
           CAST(l.top_lang_docs AS DOUBLE)
               / NULLIF(CAST(l.lang_docs_total AS DOUBLE), 0)
               AS top_lang_share
    FROM doc_agg d, tok_agg t, quants q, lang_agg l
    """


def lang_stats(t: Tables, base: DataFrame | None = None) -> DataFrame:
    """Per-language dataset-card rows — the grouped form of
    corpus_stats: docs, tokens, exact vocabulary, mean and exact
    p50/p95 document lengths, and each language's doc/token share.

    Plan: ONE token-explode shuffle keyed by (lang, tok) covers the
    per-language token totals and vocabularies; lengths collapse to a
    per-language (length, count) histogram — bounded by max doc length
    × |langs| — and the quantile cumulative runs over that bounded
    frame partitioned by lang (groups bound the window's parallelism,
    the price_quantiles shape). Corpus totals re-join by broadcast.
    Exactness: integer counts, single IEEE divisions, integer-compare
    order statistics — the corpus_stats recipe per group.
    """
    if base is not None:
        b = (base.filter(F.col("doc_id").isNotNull()
                         & F.col("lang").isNotNull())
             .select("doc_id", "lang", "tk")
             .filter(F.size("tk") >= 1))
    else:
        b = (
            t["documents"]
            .filter(F.col("doc_id").isNotNull() & F.col("lang").isNotNull())
            .select("doc_id", "lang", T.tokens("text").alias("tk"))
            .filter(F.size("tk") >= 1)
        )
    # localCheckpoints (r11): lens feeds the histogram, the doc totals
    # and (via doc_agg) the corpus total — three tokenize re-runs
    # without it; tok_agg feeds both the per-lang join and the corpus
    # token total — a token-explode + countDistinct re-run without it.
    # Materialisations are 2 scalars/doc and |langs| rows. (With a
    # shared card base the lens recompute is a cheap map over cached
    # blocks, so its checkpoint is skipped; tok_agg keeps its
    # checkpoint in both modes — it saves a real aggregation.)
    lens = b.select("lang", F.size("tk").cast("long").alias("n_tok"))
    if base is None:
        lens = opt_checkpoint(lens, "langlens")
    toks = b.select("lang", F.explode("tk").alias("tok"))
    tok_agg = toks.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.countDistinct("tok").alias("vocab"),
    )
    tok_agg = opt_checkpoint(tok_agg, "langtok")
    hist = lens.groupBy("lang", "n_tok").agg(F.count(F.lit(1)).alias("c"))
    wcum = Window.partitionBy("lang").orderBy("n_tok").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    wall = Window.partitionBy("lang")
    cum = hist.select(
        "lang", "n_tok",
        F.sum("c").over(wcum).alias("cum"),
        F.sum("c").over(wall).alias("n_docs"),
    )
    quants = cum.groupBy("lang").agg(
        F.min(F.when(F.col("cum") * 100 >= 50 * F.col("n_docs"),
                     F.col("n_tok"))).alias("p50_doc_tokens"),
        F.min(F.when(F.col("cum") * 100 >= 95 * F.col("n_docs"),
                     F.col("n_tok"))).alias("p95_doc_tokens"),
    )
    doc_agg = lens.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("sum_tok"),
    )
    totals = doc_agg.agg(
        F.sum("n_docs").alias("docs_total")).join(
        tok_agg.agg(F.sum("n_tokens").alias("tokens_total")))
    return (
        doc_agg.join(tok_agg, "lang").join(quants, "lang")
        .join(broadcast(totals))
        .select(
            "lang", "n_docs", "n_tokens", "vocab",
            (F.col("sum_tok").cast("double")
             / F.col("n_docs").cast("double")).alias("mean_doc_tokens"),
            "p50_doc_tokens", "p95_doc_tokens",
            (F.col("n_docs").cast("double")
             / F.col("docs_total").cast("double")).alias("doc_share"),
            (F.col("n_tokens").cast("double")
             / F.col("tokens_total").cast("double")).alias("token_share"),
        )
        .orderBy("lang")
    )


def lang_stats_oracle() -> str:
    tk = T.tokens_sql("text")
    return f"""
    WITH base AS (
        SELECT doc_id, lang, {tk} AS tk
        FROM documents
        WHERE doc_id IS NOT NULL AND lang IS NOT NULL
    ), base1 AS (
        SELECT lang, tk, CAST(len(tk) AS BIGINT) AS n_tok
        FROM base WHERE len(tk) >= 1
    ), tok AS (
        SELECT lang, unnest(tk) AS tok FROM base1
    ), tok_agg AS (
        SELECT lang, COUNT(*) AS n_tokens, COUNT(DISTINCT tok) AS vocab
        FROM tok GROUP BY lang
    ), hist AS (
        SELECT lang, n_tok, COUNT(*) AS c FROM base1 GROUP BY lang, n_tok
    ), cum AS (
        SELECT lang, n_tok,
               SUM(c) OVER (PARTITION BY lang ORDER BY n_tok
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cum,
               SUM(c) OVER (PARTITION BY lang) AS n_docs
        FROM hist
    ), quants AS (
        SELECT lang,
               MIN(CASE WHEN cum * 100 >= 50 * n_docs THEN n_tok END)
                   AS p50_doc_tokens,
               MIN(CASE WHEN cum * 100 >= 95 * n_docs THEN n_tok END)
                   AS p95_doc_tokens
        FROM cum GROUP BY lang
    ), doc_agg AS (
        SELECT lang, COUNT(*) AS n_docs, SUM(n_tok) AS sum_tok
        FROM base1 GROUP BY lang
    ), totals AS (
        SELECT (SELECT SUM(n_docs) FROM doc_agg) AS docs_total,
               (SELECT SUM(n_tokens) FROM tok_agg) AS tokens_total
    )
    SELECT d.lang, CAST(d.n_docs AS BIGINT) AS n_docs,
           CAST(ta.n_tokens AS BIGINT) AS n_tokens,
           CAST(ta.vocab AS BIGINT) AS vocab,
           CAST(d.sum_tok AS DOUBLE) / CAST(d.n_docs AS DOUBLE)
               AS mean_doc_tokens,
           q.p50_doc_tokens, q.p95_doc_tokens,
           CAST(d.n_docs AS DOUBLE) / CAST(t.docs_total AS DOUBLE)
               AS doc_share,
           CAST(ta.n_tokens AS DOUBLE) / CAST(t.tokens_total AS DOUBLE)
               AS token_share
    FROM doc_agg d
    JOIN tok_agg ta USING (lang)
    JOIN quants q USING (lang), totals t
    ORDER BY d.lang
    """


# --- embedding snapshot drift (late r5) --------------------------------------

DRIFT_SCALE_MOD = 7
DRIFT_SCALE = 1.25


def embedding_drift(old: DataFrame, new: DataFrame) -> DataFrame:
    """Per-label drift card between two embedding snapshots: (label,
    n_old, n_new, centroid_shift_l2, mean_norm_old, mean_norm_new) —
    the monitoring step a pipeline runs after re-embedding a corpus
    (model update, preprocessing change): which classes moved, and did
    vector magnitudes shift. Catches an embedding-space regression
    before it silently degrades every downstream ANN/dedup/cluster
    result.

    Exactness: centroids use the decimal-exact per-label means
    (label_centroid_vectors); the shift is the strict left-to-right L2
    fold between the two centroid arrays; per-label mean norms use the
    string→decimal(28,15) exact-sum recipe over per-vector norms. All
    rounded to 9 for hash-stable output.

    Scale: each side is one posexplode + (label, dim) partial-agg
    shuffle (the centroid build every labeled operator pays) plus a
    per-label norm aggregate; the join is |labels| rows. Labels
    present in only one snapshot report null metrics with the other
    side's count 0.
    """
    def side(emb, suffix):
        base = _valid_labeled(emb)
        cents = label_centroid_vectors(emb).select(
            F.col("c_label").alias("label"),
            F.col("centroid").alias(f"centroid_{suffix}"))
        stats = base.groupBy("label").agg(
            F.count(F.lit(1)).alias(f"n_{suffix}"),
            F.round(
                F.sum(V.norm("embedding").cast("string")
                      .cast("decimal(28,15)")).cast("double")
                / F.count(F.lit(1)), 9).alias(f"mean_norm_{suffix}"),
        )
        return cents.join(stats, "label")

    o, n = side(old, "old"), side(new, "new")
    return (
        o.join(n, "label", "full_outer")
        .select(
            "label",
            F.coalesce("n_old", F.lit(0)).alias("n_old"),
            F.coalesce("n_new", F.lit(0)).alias("n_new"),
            F.when(
                F.col("centroid_old").isNotNull()
                & F.col("centroid_new").isNotNull(),
                F.round(V.l2_distance("centroid_old", "centroid_new"), 9),
            ).alias("centroid_shift_l2"),
            "mean_norm_old", "mean_norm_new",
        )
        .orderBy("label")
    )


def _valid_labeled(emb: DataFrame) -> DataFrame:
    from resin_spark.operators.similarity import valid_vectors
    return valid_vectors(emb).filter(F.col("label").isNotNull())


def embedding_drift_demo(t: Tables) -> DataFrame:
    """embedding_drift over a deterministic synthetic second snapshot:
    every DRIFT_SCALE_MOD-th vector scaled by DRIFT_SCALE (a model
    update that stretched part of the space) — the driver-checkable
    form; the library API is embedding_drift(old, new)."""
    emb = t["embeddings"]
    # scaled elements round back to FLOAT so both snapshots stay
    # array<float>: unscaled vectors keep exact bit identity (no
    # representation-only phantom drift), and the float round-trip is
    # deterministic on both engines (CAST ... AS REAL in the oracle)
    new = emb.withColumn(
        "embedding",
        F.when(
            F.col("vec_id") % DRIFT_SCALE_MOD == 0,
            F.transform(
                "embedding",
                lambda x: (x.cast("double") * DRIFT_SCALE).cast("float")),
        ).otherwise(F.col("embedding")),
    )
    return embedding_drift(emb, new)


def embedding_drift_demo_oracle() -> str:
    from resin_spark.operators.similarity import VALID_VECTORS_SQL
    shift = V.l2_distance_sql("o.centroid", "n.centroid")
    norm = V.norm_sql("embedding")

    def cent_cte(src, name):
        return f"""
    {name}_dims AS (
        SELECT label, CAST(p.i - 1 AS INT) AS dim,
               CAST(SUM(CAST(CAST(p.x AS VARCHAR) AS DECIMAL(28,15))) AS DOUBLE)
                   / COUNT(*) AS mean_val
        FROM (
            SELECT label,
                   unnest(list_transform(range(1, len(embedding) + 1),
                          i -> {{'i': i, 'x': embedding[i]}})) AS p
            FROM {src}
        )
        GROUP BY 1, 2
    ),
    {name}_cent AS (
        SELECT label, list(mean_val ORDER BY dim) AS centroid
        FROM {name}_dims GROUP BY label
    ),
    {name}_stats AS (
        SELECT label, COUNT(*) AS n,
               round(CAST(SUM(CAST(CAST({norm} AS VARCHAR)
                                   AS DECIMAL(28,15))) AS DOUBLE)
                     / COUNT(*), 9) AS mean_norm
        FROM {src} GROUP BY label
    )"""

    return f"""
    WITH vold AS (
        SELECT * FROM embeddings
        WHERE {VALID_VECTORS_SQL} AND label IS NOT NULL
    ),
    vnew AS (
        SELECT vec_id,
               CASE WHEN vec_id % {DRIFT_SCALE_MOD} = 0
                    THEN list_transform(embedding,
                                        x -> CAST(CAST(x AS DOUBLE)
                                                  * {DRIFT_SCALE} AS REAL))
                    ELSE embedding
               END AS embedding, label
        FROM embeddings
        WHERE {VALID_VECTORS_SQL} AND label IS NOT NULL
    ),{cent_cte("vold", "o")},{cent_cte("vnew", "n")}
    SELECT COALESCE(o.label, n.label) AS label,
           COALESCE(os.n, 0) AS n_old,
           COALESCE(ns.n, 0) AS n_new,
           CASE WHEN o.centroid IS NOT NULL AND n.centroid IS NOT NULL
                THEN round({shift}, 9) END AS centroid_shift_l2,
           os.mean_norm AS mean_norm_old,
           ns.mean_norm AS mean_norm_new
    FROM o_cent o
    FULL OUTER JOIN n_cent n ON o.label = n.label
    LEFT JOIN o_stats os ON os.label = COALESCE(o.label, n.label)
    LEFT JOIN n_stats ns ON ns.label = COALESCE(o.label, n.label)
    ORDER BY label
    """


# --- language-metadata QA: NB confusion matrix --------------------------------

def lang_confusion(t: Tables, base: DataFrame | None = None) -> DataFrame:
    """Language-metadata QA card: confusion matrix of the self-trained
    NB classifier (nb_lang_classify) against the corpus's declared
    ``lang`` labels — (true_lang, pred_lang, n_docs, share_of_true).

    A heavy off-diagonal cell means mislabeled metadata or a genuinely
    confusable language pair — either way, the langs whose declared
    labels can't be trusted for mixture weighting / per-lang filtering.

    Adds one |langs|²-bounded aggregate on top of the classifier's
    plan (traindata.py:860 — model build is the only corpus-scale
    shuffle); share_of_true is a single exact-long division.
    """
    # localCheckpoint (r11): the |langs|²-row confusion frame feeds
    # both the row-total aggregate and the share join — without it one
    # action runs the ENTIRE NB classifier (model build + scoring
    # fan-out) twice. Tiny materialisation, halves the section.
    per = (
        nb_lang_classify(t, base=base)
        .groupBy("true_lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    per = opt_checkpoint(per, "conf")
    tot = per.groupBy("true_lang").agg(F.sum("n_docs").alias("n_true"))
    return (
        per.join(tot, "true_lang")
        .select(
            "true_lang", "pred_lang", "n_docs",
            (F.col("n_docs") / F.col("n_true")).alias("share_of_true"),
        )
        .orderBy("true_lang", "pred_lang")
    )


def lang_confusion_oracle() -> str:
    return f"""
    WITH cls AS (
        SELECT * FROM ({nb_lang_classify_oracle()}) q
    ),
    per AS (
        SELECT true_lang, pred_lang, COUNT(*) AS n_docs
        FROM cls GROUP BY true_lang, pred_lang
    ),
    tot AS (
        SELECT true_lang, SUM(n_docs) AS n_true FROM per GROUP BY true_lang
    )
    SELECT per.true_lang, pred_lang, n_docs,
           n_docs / n_true AS share_of_true
    FROM per JOIN tot ON per.true_lang = tot.true_lang
    ORDER BY per.true_lang, pred_lang
    """


# --- content-defined chunk dedup ----------------------------------------------

# Window width (tokens) and boundary mask for content-defined chunking:
# a chunk boundary falls after token i whenever the k-gram ending at i
# hashes to 0 mod (CDC_MASK+1) — expected chunk length ≈ CDC_MASK+1
# tokens. Lockstep knobs: both engines derive boundaries from the same
# md5-based 60-bit hash (_token_hash60).
CDC_K = 4
CDC_MASK = 15


def cdc_chunks(docs: DataFrame, k: int = CDC_K,
               mask: int = CDC_MASK,
               base: DataFrame | None = None) -> DataFrame:
    """(doc_id, n_tokens, chunk_no, chunk, ch) — the content-defined
    chunk relation: boundary selection and chunk assembly as row-local
    higher-order functions over ONE tokenize. Shared by the batch
    stats rollup and the streaming classifier
    (streaming/quality.py:stream_cdc_flags)."""
    d = mask + 1
    # shared card base (r12): the has_text flag mirrors the standalone
    # text-notnull filter; tk is the cached tokens(text).
    src = (base.filter(F.col("has_text")).select("doc_id", "tk")
           if base is not None else
           docs.filter(F.col("text").isNotNull())
           .select("doc_id", T.tokens("text").alias("tk")))
    base = (
        src.filter(F.col("doc_id").isNotNull())
        .filter(F.size("tk") >= 1)
    )
    n = F.size("tk")
    gram_at = lambda i: F.concat_ws(  # noqa: E731
        " ", F.slice(F.col("tk"), i - (k - 1), F.lit(k)))
    bpos = F.when(
        n > k,
        F.filter(F.sequence(F.lit(k), n - 1),
                 lambda i: _token_hash60(gram_at(i)) % d == 0),
    ).otherwise(F.array().cast("array<int>"))
    with_spans = base.select(
        "doc_id", "tk", n.alias("n_tokens"),
        F.concat(F.array(F.lit(1)),
                 F.transform(bpos, lambda b: b + 1)).alias("starts"),
        F.concat(bpos, F.array(n)).alias("ends"),
    )
    return with_spans.select(
        "doc_id", "n_tokens",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.size("starts")),
                lambda j: F.concat_ws(
                    " ",
                    F.slice(F.col("tk"), F.element_at("starts", j),
                            F.element_at("ends", j)
                            - F.element_at("starts", j) + 1)),
            )
        ).alias("chunk_no", "chunk"),
    ).withColumn("ch", F.md5("chunk"))


def cdc_chunk_stats(t: Tables, k: int = CDC_K, mask: int = CDC_MASK,
                    min_count: int = 2,
                    base: DataFrame | None = None) -> DataFrame:
    """Content-defined-chunk duplication accounting — the
    storage-dedup trick (Rabin/CDC) applied to corpus hygiene: chunk
    boundaries are chosen by CONTENT (k-gram hash ≡ 0 mod mask+1), so
    a duplicated passage chunks identically wherever it appears,
    regardless of shift — catching copied spans that line_dedup_stats
    (traindata.py:299) misses when the surrounding text moves the line
    breaks and dup_span_coverage's fixed-width grams only tally
    per-token.

    Per doc: (doc_id, n_tokens, n_chunks, n_dup_chunks,
    dup_chunk_share) where a chunk is "duplicated" when its exact text
    occurs ``min_count``+ times corpus-wide.

    Plan: boundary selection and chunk assembly are row-local
    higher-order functions over ONE tokenize (no shuffle, no UDF);
    chunks travel as md5 keys through one counting shuffle + one hash
    join back — line_dedup_stats' exact shape with content-defined
    spans. Linear at 100 TB; boundary-hash skew is impossible (keys
    are content hashes).
    """
    # NOT checkpointed (r11 A/B on the nesting card): AQE reuses the
    # identical chunk-subtree exchange across the duplicate-count and
    # rollup branches at runtime; a checkpoint only adds a barrier.
    chunks = cdc_chunks(t["documents"], k=k, mask=mask, base=base) \
        .select("doc_id", "n_tokens", "ch")
    dup = (
        chunks.groupBy("ch").agg(F.count(F.lit(1)).alias("n_occ"))
        .filter(F.col("n_occ") >= min_count)
        .select("ch", F.lit(True).alias("is_dup"))
    )
    return (
        chunks.join(dup, "ch", "left")
        .groupBy("doc_id", "n_tokens")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(F.coalesce("is_dup", F.lit(False)).cast("long"))
            .alias("n_dup_chunks"),
        )
        .select(
            "doc_id", "n_tokens", "n_chunks", "n_dup_chunks",
            (F.col("n_dup_chunks") / F.col("n_chunks"))
            .alias("dup_chunk_share"),
        )
        .orderBy("doc_id")
    )


def cdc_chunk_stats_oracle(k: int = CDC_K, mask: int = CDC_MASK,
                           min_count: int = 2) -> str:
    d = mask + 1
    toks = T.tokens_sql("text")
    gram = f"array_to_string(list_slice(tk, i - {k - 1}, i), ' ')"
    return f"""
    WITH base AS (
        SELECT doc_id, {toks} AS tk FROM documents
        WHERE doc_id IS NOT NULL AND text IS NOT NULL
    ), base1 AS (
        SELECT doc_id, tk, len(tk) AS n FROM base WHERE len(tk) >= 1
    ), spans AS (
        SELECT doc_id, tk, n,
               list_concat([1], list_transform(bpos, b -> b + 1)) AS starts,
               list_concat(bpos, [n]) AS ends
        FROM (
            SELECT doc_id, tk, n,
                   list_filter(range({k}, n),
                       i -> ({_token_hash60_sql(gram)}) % {d} = 0) AS bpos
            FROM base1
        )
    ), chunks AS (
        SELECT doc_id, n AS n_tokens,
               md5(array_to_string(list_slice(tk, starts[j], ends[j]), ' '))
                   AS ch
        FROM spans, unnest(range(1, len(starts) + 1)) AS u(j)
    ), dup AS (
        SELECT ch FROM chunks GROUP BY ch HAVING COUNT(*) >= {min_count}
    )
    SELECT doc_id, n_tokens, COUNT(*) AS n_chunks,
           CAST(SUM(CASE WHEN ch IN (SELECT ch FROM dup)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
           CAST(SUM(CASE WHEN ch IN (SELECT ch FROM dup)
                         THEN 1 ELSE 0 END) AS BIGINT) / COUNT(*)
               AS dup_chunk_share
    FROM chunks GROUP BY doc_id, n_tokens ORDER BY doc_id
    """


# --- C61: perplexity-threshold retention curve ---------------------------------

# CCNet keeps the LOW-perplexity side of the corpus; this grid sweeps
# the cut. Lockstep knob with the oracle (change both sides together).
# Points straddle the synthetic corpus's tight bits/token band
# (~4.88-5.36 at sf0.01) so every grid row shows real variation.
PPL_CURVE_THRESHOLDS: tuple[float, ...] = (4.88, 4.90, 4.91, 4.93, 5.0, 5.4)


def perplexity_threshold_curve(
        t: Tables,
        thresholds: tuple[float, ...] = PPL_CURVE_THRESHOLDS) -> DataFrame:
    """Retention curve for the CCNet-style perplexity filter: for each
    candidate cut, how many docs and tokens survive ``bits_per_token <=
    threshold`` — (threshold, n_docs_kept, n_tokens_kept, doc_share,
    token_share). The eyes-open sheet behind choosing THE perplexity
    cut (D13's sibling for the quality side): C24 scores at one corpus,
    this shows what every candidate cut would keep, from ONE scoring
    pass. Shares are over the scored universe (tokenizable docs — the
    filter's actual input; zero-token docs vanish at the explode in
    both engines).

    Exactness: bits_per_token is C24's oracle-green rounded-6 double,
    so both engines compare IDENTICAL doubles against identical parsed
    grid literals — boundary docs land the same. Totals are counts and
    long sums of identical rows; shares one IEEE division each.

    Scale: one C24 scoring pass, checkpointed because BOTH the grid
    join and the one-row total read it (|docs|x3 cols — per-executor
    footprint is trivial; without the pin the whole tokenise+LM DAG
    runs twice); the grid rollup is a broadcast cross with
    |thresholds| rows, one bounded aggregate, and a one-row total.
    At 100 TB nothing here exceeds the C24 pass itself.
    """
    spark = t["documents"].sparkSession
    scored = quality_perplexity(t).localCheckpoint(eager=False)
    th = spark.createDataFrame([(float(x),) for x in thresholds],
                               "threshold double")
    kept = scored.join(F.broadcast(th),
                       F.col("bits_per_token") <= F.col("threshold"))
    per = kept.groupBy("threshold").agg(
        F.count(F.lit(1)).alias("n_docs_kept"),
        F.sum("n_tokens").alias("n_tokens_kept"))
    tot = scored.agg(F.count(F.lit(1)).alias("td"),
                     F.sum("n_tokens").alias("tt")).first()
    zero = F.lit(0).cast("long")
    return (
        th.join(per, "threshold", "left")
        .select(
            "threshold",
            F.coalesce("n_docs_kept", zero).alias("n_docs_kept"),
            F.coalesce("n_tokens_kept", zero).alias("n_tokens_kept"),
            F.try_divide(F.coalesce("n_docs_kept", zero).cast("double"),
                         F.lit(tot["td"]).cast("long")).alias("doc_share"),
            F.try_divide(F.coalesce("n_tokens_kept", zero).cast("double"),
                         F.lit(tot["tt"]).cast("long")).alias("token_share"),
        )
        .orderBy("threshold")
    )


def perplexity_threshold_curve_oracle(
        thresholds: tuple[float, ...] = PPL_CURVE_THRESHOLDS) -> str:
    """Nests the C24 oracle as the scored CTE — any quality_perplexity
    change re-windows this op too."""
    grid = ", ".join(repr(float(x)) for x in thresholds)
    return f"""
    WITH scored AS ({quality_perplexity_oracle()}),
    th AS (SELECT CAST(unnest([{grid}]) AS DOUBLE) AS threshold),
    kept AS (
        SELECT threshold, COUNT(*) AS n_docs_kept,
               CAST(SUM(n_tokens) AS BIGINT) AS n_tokens_kept
        FROM scored, th
        WHERE bits_per_token <= threshold
        GROUP BY 1
    ),
    total AS (SELECT COUNT(*) AS td, SUM(n_tokens) AS tt FROM scored)
    SELECT th.threshold,
           COALESCE(n_docs_kept, 0) AS n_docs_kept,
           COALESCE(n_tokens_kept, 0) AS n_tokens_kept,
           CAST(COALESCE(n_docs_kept, 0) AS DOUBLE) / NULLIF(td, 0)
               AS doc_share,
           CAST(COALESCE(n_tokens_kept, 0) AS DOUBLE) / NULLIF(tt, 0)
               AS token_share
    FROM th LEFT JOIN kept USING (threshold) CROSS JOIN total
    ORDER BY threshold
    """


# --- H13: release-manifest signature per shard ----------------------------------

def shard_manifest(t: Tables, n_shards: int = N_SHARDS) -> DataFrame:
    """Per-shard release manifest: (shard, n_docs, n_chars, content_sig)
    — the sign-off sheet an export pipeline publishes next to its
    shards so a replica (or a re-run months later) can prove
    shard-level equality WITHOUT diffing bytes: same doc set + same
    text per doc ⟺ same signature per shard.

    content_sig is a bit_xor fold of the 60-bit md5 of
    ``doc_id:md5(text)`` — order-INDEPENDENT by construction, so it is
    a pure map-side partial aggregate with O(n_shards) state at ANY
    corpus size (a concat-in-order signature would buffer
    corpus/n_shards rows per group; the XOR fold buffers 8 bytes).
    Row order inside a shard needs no signing: write_shards pins it
    deterministically by (h, doc_id), which the doc SET already
    determines. XOR cancellation needs two identical (doc_id, text)
    rows — impossible while doc_id is unique, which dedup_exact
    upstream guarantees; NULL text signs as the empty string (the
    adjudicated NULL-payload convention).

    Exactness: both engines fold identical 60-bit integers with an
    associative-commutative XOR — no ordering, no floats. Shares the
    C25 shard expression (_token_hash60 % n_shards), so the manifest
    describes exactly the layout write_shards materialises.

    SECURITY SCOPE (ADVICE r6): content_sig is an INTEGRITY/EQUALITY
    check for non-adversarial replica comparison, NOT a cryptographic
    signature — the XOR fold is linear over GF(2), so an adversary can
    craft distinct doc multisets that collide (and a doubled batch
    cancels its own contribution). Tamper-evident release signing
    needs a real digest over a canonically ordered serialisation (or
    an order-free cryptographic accumulator) applied OUTSIDE the
    engine; do not treat content_sig as one.
    """
    return (
        manifest_rows(t["documents"], n_shards)
        .groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum("nc").alias("n_chars"),
             F.bit_xor("sig").alias("content_sig"))
        .orderBy("shard")
    )


def manifest_rows(docs: DataFrame, n_shards: int = N_SHARDS) -> DataFrame:
    """The manifest's pre-aggregate frame (shard, nc, sig) — shared
    verbatim by the batch card and its streaming twin so their folds
    are equal by construction, not by test alone."""
    h = _token_hash60(F.col("doc_id").cast("string"))
    sig = _token_hash60(F.concat(
        F.col("doc_id").cast("string"), F.lit(":"),
        F.md5(F.coalesce(F.col("text"), F.lit("")))))
    return (
        docs.filter(F.col("doc_id").isNotNull())
        .select((h % n_shards).alias("shard"),
                F.coalesce(F.col("n_chars").cast("long"), F.lit(0))
                .alias("nc"),
                sig.alias("sig"))
    )


def shard_manifest_oracle(n_shards: int = N_SHARDS) -> str:
    h = _token_hash60_sql("CAST(doc_id AS VARCHAR)")
    sig = _token_hash60_sql(
        "CAST(doc_id AS VARCHAR) || ':' || md5(COALESCE(text, ''))")
    return f"""
    WITH rows_in AS (
        SELECT {h} % {n_shards} AS shard,
               COALESCE(CAST(n_chars AS BIGINT), 0) AS nc,
               {sig} AS sig
        FROM documents WHERE doc_id IS NOT NULL
    )
    SELECT shard, COUNT(*) AS n_docs,
           CAST(SUM(nc) AS BIGINT) AS n_chars,
           bit_xor(sig) AS content_sig
    FROM rows_in GROUP BY shard ORDER BY shard
    """


def merge_manifests(*manifests: DataFrame) -> DataFrame:
    """Merge per-shard release manifests (H13) without touching the
    corpora that produced them: counts and char totals ADD, the XOR
    content signature FOLDS — so the standing manifest of a growing
    export updates at the cost of the NEW batch's manifest alone (the
    H8-H12 append-family contract applied to release signing).

    Correct for DISJOINT doc sets (the append case: a crawl batch of
    new doc_ids joins a standing export). A doc present in two inputs
    XORs itself out of the signature — which is exactly the loud
    outcome a release pipeline wants when it double-counts a batch:
    the merged signature STOPS matching a fresh full manifest (pinned
    in tests).

    Scale: |shards|-row inputs, one bounded aggregate; never reads
    documents. Same SECURITY SCOPE as shard_manifest: equality check
    for non-adversarial replicas, not a tamper-evident signature (the
    GF(2)-linear fold collides under crafted inputs).
    """
    assert manifests, "merge_manifests needs at least one manifest"
    u = manifests[0]
    for m in manifests[1:]:
        u = u.unionByName(m)
    return (
        u.groupBy("shard")
        .agg(F.sum("n_docs").alias("n_docs"),
             F.sum("n_chars").alias("n_chars"),
             F.bit_xor("content_sig").alias("content_sig"))
        .orderBy("shard")
    )
