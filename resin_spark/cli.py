"""Command-line surface: the reference's Resin.WikipediaCommandLine
re-expressed over the Spark operators.

The reference ships four ICommand plugins resolved by name (PluginReader
strips the "Command" suffix and lowercases — PluginReader.cs:40-47):

  lexicon          LexiconCommand.cs        build the angle-keyed lexicon
  validatelexicon  ValidateLexiconCommand.cs positive + synthetic-negative
                                            validation and angle-gap probe
  stringcompare    StringCompareCommand.cs  CompareToUnitVector of two strings
  truncate         TruncateCommand.cs       empty a collection

Argument syntax is ArgumentParser.cs parity: ``command --key value ...``,
a ``--flag`` immediately followed by another ``--key`` parses as
``"true"``, and a trailing valueless key parses as None. Unknown
commands exit 0 after a notice, mirroring Program.cs:14/42 (null plugin,
return 0).

Sources: ``--source`` accepts a Wikipedia cirrussearch ``.json``/
``.json.gz`` dump (the reference's only source) or a parquet file/dir
with a ``text`` column (the native format here); detection is by
extension. The lexicon store is a parquet directory ``<dir>/lexicon``
ordered by angle_key — the Spark analog of the reference's angle-sorted
KV pages (StringAnalyzer.cs:55-80).
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from resin_spark import io as rio
from resin_spark.functions import hashing
from resin_spark.functions import text as T
from resin_spark.operators import synth
from resin_spark.operators.textops import _probe_missing_from


def parse_args(argv: list[str]) -> tuple[str, dict[str, str | None]]:
    """(command, flags) with ArgumentParser.cs:6-24 semantics.

    argv[0] is the command (defaulting to "validate" when empty —
    Program.cs:11, which matches no plugin and is a notice-and-exit).
    Pairs are consumed two at a time; a value starting with ``--`` means
    the previous key was a bare flag and becomes ``"true"``.
    """
    command = argv[0].lower() if argv else "validate"
    flags: dict[str, str | None] = {}
    i = 1
    while i < len(argv):
        key = argv[i].replace("--", "")
        value = argv[i + 1] if i + 1 < len(argv) else None
        if value is not None and value.startswith("--"):
            flags[key] = "true"
            i += 1
        else:
            flags[key] = value
            i += 2
    return command, flags


def _read_source(spark: SparkSession, source: str, field: str = "text",
                 take: int | None = None) -> DataFrame:
    """One ``text`` column from a cirrussearch dump or a parquet store."""
    if ".json" in source:
        df = rio.read_cirrussearch(spark, source, [field], take=take)
        return df.select(F.col(field).alias("text"))
    df = spark.read.parquet(source).select(F.col(field).alias("text"))
    return df.limit(take) if take is not None else df


def _lexicon_path(dir_: str) -> str:
    return dir_.rstrip("/") + "/lexicon"


def _build_lexicon_frame(docs: DataFrame, dims: int) -> DataFrame:
    """Distinct tokens keyed by the reference's lexicon angle
    (BuildLexicon, StringAnalyzer.cs:35-80): first-wins per key is
    min(token), collisions counted, ordered by angle for the same write
    locality the reference gets from its angle-sorted pages."""
    ak = hashing.angle_key_udf(dims)
    return (
        docs.select(F.explode(T.split_words("text")).alias("token"))
        .distinct()
        .select("token", ak(F.col("token")).alias("angle_key"))
        .groupBy("angle_key")
        .agg(F.min("token").alias("token"),
             F.count(F.lit(1)).alias("n_collisions"))
        .orderBy("angle_key")
    )


def cmd_lexicon(flags: dict, spark: SparkSession, log=print) -> int:
    """LexiconCommand.cs:15-60: optional truncate, read source, build
    the lexicon, persist it."""
    dir_ = flags["dir"]
    take = int(flags["take"]) if flags.get("take") else None
    dims = int(flags.get("dims") or 512)
    if flags.get("truncate") == "true":
        rio.truncate(spark, _lexicon_path(dir_))
        log("truncate complete")
    docs = _read_source(spark, flags["source"], flags.get("field") or "text",
                        take)
    lex = _build_lexicon_frame(docs, dims)
    lex.write.mode("overwrite").parquet(_lexicon_path(dir_))
    n = spark.read.parquet(_lexicon_path(dir_)).count()
    log(f"lexicon build finished: {n} entries at {_lexicon_path(dir_)}")
    return 0


def cmd_validatelexicon(flags: dict, spark: SparkSession, log=print) -> int:
    """ValidateLexiconCommand.cs:16-46: (1) positive validation — every
    token of the source sample must be reachable through its angle key;
    (2) LexiconInspector angle-gap probe; (3) synthetic negatives from
    the TokenSynthesizer analog, which should NOT all be reachable."""
    dims = int(flags.get("dims") or 512)
    take = int(flags.get("take") or 100)
    lex = spark.read.parquet(_lexicon_path(flags["dir"]))

    docs = _read_source(spark, flags["source"], flags.get("field") or "text",
                        take)
    ak = hashing.angle_key_udf(dims)
    keys = lex.select("angle_key").distinct()

    def _unreachable(tokens: DataFrame) -> int:
        return (
            tokens.distinct()
            .select(ak(F.col("token")).alias("angle_key"))
            .join(keys, "angle_key", "left_anti")
            .count()
        )

    missing_pos = _unreachable(
        docs.select(F.explode(T.split_words("text")).alias("token")))
    positive = missing_pos == 0
    log(f"positive validation result: {positive} "
        f"({missing_pos} unreachable tokens)")

    n_sample = 32
    missing = _probe_missing_from(spark, lex, n_sample, precision=2).count()
    log(f"synthesized probe: sampled={n_sample}, missing={missing}")

    synthetic = synth.synthesize_tokens(
        spark, count=max(8, missing), dims=dims,
        seed=int(flags.get("seed") or 12345),
    ).select(F.col("token"))
    missing_neg = _unreachable(synthetic)
    negative = missing_neg == 0
    log(f"synthetic negative validation result (should be false): "
        f"{negative} ({missing_neg} unreachable of {max(8, missing)})")
    return 0


def cmd_stringcompare(flags: dict, spark: SparkSession, log=print) -> int:
    """StringCompareCommand.cs:9-19: print CompareToUnitVector of both
    strings. Runs through the same Arrow angle UDF as the lexicon so the
    printed angles are exactly the stored key values."""
    s1, s2 = flags["str1"], flags["str2"]
    ak = hashing.angle_key_udf(int(flags.get("dims") or 512))
    rows = (
        spark.createDataFrame([(s1,), (s2,)], "token string")
        .select("token", ak(F.col("token")).alias("angle"))
        .collect()
    )
    angle = {r["token"]: r["angle"] for r in rows}
    log(f"{s1}: {angle[s1]} and {s2}: {angle[s2]}")
    return 0


def cmd_truncate(flags: dict, spark: SparkSession, log=print) -> int:
    """TruncateCommand.cs:9-15: empty a collection (managed table or
    path-based store)."""
    rio.truncate(spark, flags["collection"])
    log(f"truncated {flags['collection']}")
    return 0


def cmd_validateindex(flags: dict, spark: SparkSession, log=print) -> int:
    """GraphIndexValidator.cs / SeekableGraphIndexValidator.cs as a CLI
    surface: re-probe a persisted index store (--path, --kind one of
    the validate.VALIDATORS keys — ann|pq|ivf|dedup|cell|nb_model|text)
    and print one check line per invariant; --corpus <parquet> enables
    the re-encode/re-assign/re-tokenize checks for pq/cell/text. Exit
    0 regardless (Program.cs convention); failures are printed per
    line and summarised."""
    from resin_spark.operators import validate as val

    kind, path = flags["kind"], flags["path"]
    kwargs: dict = {}
    if flags.get("corpus"):
        src = spark.read.parquet(flags["corpus"])
        if kind in ("pq", "cell"):
            kwargs["emb"] = src
        elif kind == "text":
            kwargs["docs"] = src
    rows = val.validate_index(spark, path, kind, **kwargs).collect()
    bad = [r for r in rows if not r["ok"]]
    for r in rows:
        log(f"{r['artifact']}.{r['check']}: {r['n']} "
            f"{'ok' if r['ok'] else 'FAILED'}")
    log(f"{path}: " + ("valid"
                       if not bad else f"{len(bad)} failed checks"))
    return 0


def _index_writers():
    from resin_spark.operators import dedup, similarity, textindex
    return {
        "text": textindex.write_text_index,    # documents: doc_id, text
        "dedup": dedup.write_dedup_index,      # documents: doc_id, text
        "ann": similarity.write_ann_index,     # embeddings: vec_id, embedding
        "pq": similarity.write_pq_index,       # embeddings
        "ivf": similarity.write_ivf_index,     # embeddings
    }


def cmd_buildindex(flags: dict, spark: SparkSession, log=print) -> int:
    """Build a persisted index store from a parquet source: --kind
    text|dedup (documents: doc_id, text) or ann|pq|ivf (embeddings:
    vec_id, embedding), --source <parquet>, --path <store dir>. The
    CLI face of the write_* index builders (GraphSerializer's
    build-side as a command, beside validateindex's read side)."""
    kind, path = flags["kind"], flags["path"]
    writers = _index_writers()
    if kind not in writers:
        log(f"unknown index kind: {kind} (one of {sorted(writers)})")
        return 0
    src = spark.read.parquet(flags["source"])
    writers[kind](src, path)
    log(f"built {kind} index at {path} from {src.count()} source rows")
    return 0


def cmd_appendindex(flags: dict, spark: SparkSession, log=print) -> int:
    """Merge a NEW batch into a stored incremental index: --kind
    text|dedup|ivf|ann|pq, --source <parquet batch>, --path <store
    dir> (ann appends at the writer's default hyperplane params; ivf/pq
    append at the stored centroids/codebooks).
    Fresh ids required — the underlying append op refuses overlap
    (see append_text_index / append_dedup_index / append_ivf_index;
    ivf appends at the STORED centroids — rebuild when
    embedding_drift says the cells went stale)."""
    from resin_spark.operators import dedup, similarity, textindex

    kind, path = flags["kind"], flags["path"]
    appenders = {"text": textindex.append_text_index,
                 "dedup": dedup.append_dedup_index,
                 "ivf": similarity.append_ivf_index,
                 "ann": similarity.append_ann_index,
                 "pq": similarity.append_pq_index}
    if kind not in appenders:
        log(f"unknown append kind: {kind} (one of {sorted(appenders)})")
        return 0
    src = spark.read.parquet(flags["source"])
    try:
        appenders[kind](src, path)
    except ValueError as e:
        log(f"append refused: {e}")
        return 0
    log(f"appended {src.count()} batch rows into {kind} index at {path}")
    return 0


def cmd_search(flags: dict, spark: SparkSession, log=print) -> int:
    """Query a persisted text index — the serving face the reference
    is for (GraphSearcher over SeekableGraphReader, here BM25 /
    phrase over the pruned postings store): --path <store>,
    --query "free terms" (BM25 ranked) or --phrase "exact phrase"
    (consecutive-occurrence ranked), --k (default 10). Prints one
    ranked line per hit."""
    from resin_spark.operators import textindex as ti

    path, k = flags["path"], int(flags.get("k") or 10)
    if flags.get("phrase"):
        terms = tuple(flags["phrase"].lower().split())
        rows = ti.phrase_topk_indexed(spark, path, phrase=terms,
                                      k=k).collect()
        for r in rows:
            log(f"{r['rank']}. doc {r['doc_id']} — "
                f"{r['n_occurrences']} occurrence(s) in "
                f"{r['n_tokens']} tokens")
    else:
        terms = tuple(flags["query"].lower().split())
        rows = ti.bm25_topk_indexed(spark, path, query=terms,
                                    k=k).collect()
        for r in rows:
            log(f"{r['rank']}. doc {r['doc_id']} — score "
                f"{r['score']:.6f} ({r['n_hits']} of {len(terms)} "
                f"terms)")
    log(f"{len(rows)} hit(s)")
    return 0


def cmd_vsearch(flags: dict, spark: SparkSession, log=print) -> int:
    """Vector search off a persisted ANN store (the GraphSearcher /
    ClosestMatch serving shape, batch form): --kind ivf|ann|pq,
    --path <store>, --queries <parquet with vec_id, embedding>,
    --k (default 10), --n-probe (ivf) / --probe-radius (ann) /
    --rerank (pq). Prints per-query ranked neighbor lines."""
    from resin_spark.operators import similarity as sim

    kind, path, k = flags["kind"], flags["path"], int(flags.get("k") or 10)
    queries = spark.read.parquet(flags["queries"]).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_vec"))
    if kind == "ivf":
        entries, cent = sim.read_ivf_index(spark, path)
        out = sim.ivf_topk_indexed(
            entries, cent, queries, k=k,
            n_probe=int(flags.get("n-probe") or 8))
    elif kind == "ann":
        idx = sim.read_ann_index(spark, path)
        out = sim.lsh_topk_indexed(
            idx, queries, k=k,
            probe_radius=int(flags.get("probe-radius") or 2))
    elif kind == "pq":
        if not flags.get("corpus"):
            log("pq vsearch needs --corpus <raw vectors parquet> for "
                "the exact rerank stage (the codes relation alone "
                "ranks by ADC only)")
            return 0
        codes, books = sim.read_pq_index(spark, path)
        emb = spark.read.parquet(flags["corpus"])
        out = sim.pq_topk_indexed(codes, books, queries, emb, k=k,
                                  rerank=int(flags.get("rerank") or 100))
    else:
        log(f"unknown vector index kind: {kind} (one of ann|ivf|pq)")
        return 0
    n = 0
    for r in out.collect():
        n += 1
        log(f"q {r['query_id']}: #{r['rank']} -> {r['neighbor_id']} "
            f"(score {r['score']:.6f})")
    log(f"{n} result row(s)")
    return 0


def cmd_health(flags: dict, spark: SparkSession, log=print) -> int:
    """Corpus-health reports over a documents-shaped parquet store
    (doc_id, text, source): --docs <parquet>, --report
    anomalies|overlap|mixture|profile|chunks|divergence|coverage|
    dupcurve|agreement|healthcard|govcard|tuningcard|all (default all;
    the three *card reports print the C64/C65/C66 typed melts instead
    of the member reports; govcard also needs --emb <embeddings
    parquet>), --budget <tokens> (mixture planner, default
    pipeline.MIX_BUDGET). Prints one line per report row."""
    from resin_spark.operators import dedup, health, pipeline, traindata

    docs = spark.read.parquet(flags["docs"])
    which = (flags.get("report") or "all").lower()
    kinds = ("anomalies", "overlap", "mixture", "profile", "chunks",
             "divergence", "coverage", "dupcurve", "agreement",
             "healthcard", "govcard", "tuningcard", "all")
    if which not in kinds:
        log(f"unknown report: {which} (one of {'|'.join(kinds)})")
        return 0

    def print_melt(title, df):
        log(f"-- {title} --")
        for r in df.collect():
            if r["value_num"] is not None:
                v = f"{r['value_num']:g}"
            elif r["value_str"] is not None:
                v = r["value_str"]
            else:
                # both faces NULL (e.g. min/max of an all-NULL profiled
                # column) — same placeholder as cmd_ingest's NULL-share
                v = "-"
            log(f"{r['section']}/{r['metric']} = {v}")
        return 0

    # the one-page typed melts (C64/C65/C66) — exactly the relations
    # the driver hash-checks; not part of `all` (which prints the
    # member reports individually)
    if which == "healthcard":
        return print_melt("health card (typed melt)",
                          health.health_card_typed({"documents": docs}))
    if which == "tuningcard":
        return print_melt("curation tuning card (typed melt)",
                          pipeline.curation_tuning_card(
                              {"documents": docs}))
    if which == "govcard":
        emb_path = flags.get("emb")
        if not emb_path:
            log("govcard needs --emb <embeddings parquet> (semantic "
                "leakage section reads vectors)")
            return 0
        t = {"documents": docs, "embeddings": spark.read.parquet(emb_path)}
        return print_melt("split governance card (typed melt)",
                          pipeline.split_governance_card(t))
    if which in ("anomalies", "all"):
        log("-- encoding anomalies --")
        for r in health.encoding_anomalies(docs).collect():
            log(f"{r['source']}: {r['n_flagged']}/{r['n_docs']} docs flagged "
                f"(repl {r['repl_chars']}, ctrl {r['ctrl_chars']}, "
                f"moji {r['moji_marks']}; share {r['flagged_share']:.4f})")
    if which in ("overlap", "all"):
        log("-- source overlap --")
        for r in health.source_overlap_matrix(docs).collect():
            log(f"{r['source_a']} ~ {r['source_b']}: jaccard "
                f"{r['jaccard']:.6f} ({r['n_shared']} shared of "
                f"{r['n_a']}/{r['n_b']} shingles)")
    if which in ("mixture", "all"):
        budget = int(flags.get("budget") or pipeline.MIX_BUDGET)
        log(f"-- mixture plan (budget {budget}) --")
        for r in pipeline.mixture_plan(docs, budget).collect():
            log(f"{r['source']}: {r['n_tokens']} tokens -> plan "
                f"{r['planned_tokens']} (share {r['temp_share']:.4f}, "
                f"rate {r['sampling_rate']:.3f}, epochs {r['n_epochs']})")
    if which in ("profile", "all"):
        log("-- table profile --")
        for r in health.table_profile(docs).collect():
            log(f"{r['col_name']} ({r['dtype']}): {r['n_null']} null / "
                f"{r['n_rows']} rows, {r['n_distinct']} distinct, "
                f"range [{r['min_value']} .. {r['max_value']}]")
    if which in ("divergence", "all"):
        log("-- source divergence --")
        for r in pipeline.source_divergence(docs).collect():
            log(f"{r['source']}: KL {r['kl_bits']:.4f} bits "
                f"({r['n_tokens']} tokens, {r['n_distinct']} distinct)")
    if which in ("coverage", "all"):
        log("-- vocab coverage --")
        for r in health.vocab_coverage(docs).collect():
            if r["n_tokens"]:
                log(f"{r['source']}: coverage {r['coverage_share']:.4f} "
                    f"({r['covered_tokens']}/{r['n_tokens']} tokens; "
                    f"oov {r['oov_terms']}/{r['distinct_terms']} terms; "
                    f"{r['mean_token_chars']:.2f} chars/token)")
            else:
                log(f"{r['source']}: no tokens")
    if which in ("dupcurve", "all"):
        log("-- dedup threshold curve --")
        for r in dedup.dedup_threshold_curve(docs).collect():
            log(f"tau {r['threshold']:.1f}: {r['n_pairs']} pairs, "
                f"{r['n_docs_in_pairs']} docs entangled "
                f"(share {r['dup_doc_share']:.4f})")
    if which in ("agreement", "all"):
        log("-- dedup method agreement --")
        for r in dedup.dedup_method_agreement(docs).collect():
            agr = (f"{r['agreement']:.4f}" if r["agreement"] is not None
                   else "-")
            log(f"{r['method_a']} ~ {r['method_b']}: {r['pairs_both']} "
                f"shared of {r['pairs_a']}/{r['pairs_b']} pairs "
                f"(agreement {agr})")
    if which in ("chunks", "all"):
        log("-- cdc chunk dedup --")
        stats = traindata.cdc_chunk_stats({"documents": docs})
        agg = stats.groupBy().agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("n_chunks").alias("chunks"),
            F.sum("n_dup_chunks").alias("dups")).collect()[0]
        log(f"{agg['docs']} docs, {agg['chunks']} chunks, "
            f"{agg['dups']} duplicated")
        for r in stats.filter(F.col("n_dup_chunks") > 0)\
                      .orderBy(F.desc("dup_chunk_share"), "doc_id")\
                      .limit(20).collect():
            log(f"doc {r['doc_id']}: {r['n_dup_chunks']}/{r['n_chunks']} "
                f"chunks duplicated (share {r['dup_chunk_share']:.3f})")
    return 0


def cmd_hybrid(flags: dict, spark: SparkSession, log=print) -> int:
    """Hybrid BM25+vector search over documents/embeddings parquet
    stores, fused by reciprocal-rank fusion: --docs <parquet>,
    --embeddings <parquet>, --query "free terms" (default the demo
    terms), --vec-id <stored query embedding id> (default 0),
    --k (default 10), --mmr [lambda] (re-rank the page for diversity;
    bare flag uses MMR_LAMBDA). Prints one fused ranked line per hit
    with each leg's rank."""
    from resin_spark.operators import retrieval

    t = {
        "documents": spark.read.parquet(flags["docs"]),
        "embeddings": spark.read.parquet(flags["embeddings"]),
    }
    terms = tuple((flags.get("query")
                   or " ".join(retrieval.HYBRID_QUERY)).lower().split())
    qid = int(flags.get("vec-id") or retrieval.HYBRID_QUERY_VEC_ID)
    k = int(flags.get("k") or 10)
    page = retrieval.hybrid_search_rrf(t, query=terms, query_vec_id=qid, k=k)
    if "mmr" in flags:
        lam = (retrieval.MMR_LAMBDA if flags["mmr"] in (None, "true")
               else float(flags["mmr"]))
        rows = retrieval.mmr_rerank(page, t["embeddings"],
                                    lam=lam).collect()
        for r in rows:
            log(f"{r['mmr_rank']}. doc {r['doc_id']} — rrf "
                f"{r['rrf_score']:.6f} (max sim to picked "
                f"{r['max_sim_selected']:.3f})")
    else:
        rows = page.collect()
        for r in rows:
            lex = (f"lex #{r['lex_rank']}" if r["lex_rank"] is not None
                   else "lex -")
            vec = (f"vec #{r['vec_rank']}" if r["vec_rank"] is not None
                   else "vec -")
            log(f"{r['rank']}. doc {r['doc_id']} — rrf {r['rrf_score']:.6f} "
                f"({lex}, {vec})")
    log(f"{len(rows)} hit(s)")
    return 0


def cmd_ingest(flags: dict, spark: SparkSession, log=print) -> int:
    """Crawl ingest: WARC segments → documents-shaped parquet.
    --warc <dir of .warc/.warc.gz>, --out <parquet dir> (omit for a
    dry run that only counts), --extractor full|blocks|main (default
    full: all visible text flat; blocks: lossless one-block-per-line;
    main: jusText-style main-content classification), --compare (print
    the per-host extraction_compare_card instead of/before writing)."""
    from resin_spark.operators import extract

    # validate the extractor flag FIRST — a typo must not burn the two
    # full extraction passes the --compare card costs (ADVICE r8)
    kind = (flags.get("extractor") or "full").lower()
    fns = {"full": None, "blocks": extract.html_block_text,
           "main": extract.html_main_text}
    if kind not in fns:
        log(f"unknown extractor: {kind} (one of {'|'.join(fns)})")
        return 0
    warc = rio.read_warc(spark, flags["warc"])
    if "compare" in flags:
        log("-- extraction compare (full vs main, per host) --")
        for r in extract.extraction_compare_card(warc).collect():
            share = (f"{r['main_kept_share']:.3f}"
                     if r["main_kept_share"] is not None else "-")
            log(f"{r['host']}: {r['n_docs']} docs, {r['chars_all']} chars "
                f"-> {r['chars_main']} main (kept {share})")
    docs = extract.warc_extract_text(warc, extractor=fns[kind])
    out = flags.get("out")
    if out:
        docs.write.mode("overwrite").parquet(out)
        docs = spark.read.parquet(out)
    n, chars = docs.selectExpr("count(*)", "sum(n_chars)").first()
    log(f"ingested {n} doc(s), {chars or 0} chars via extractor={kind}"
        + (f" -> {out}" if out else " (dry run, nothing written)"))
    return 0


COMMANDS = {
    "lexicon": cmd_lexicon,
    "validatelexicon": cmd_validatelexicon,
    "stringcompare": cmd_stringcompare,
    "truncate": cmd_truncate,
    "validateindex": cmd_validateindex,
    "buildindex": cmd_buildindex,
    "appendindex": cmd_appendindex,
    "search": cmd_search,
    "vsearch": cmd_vsearch,
    "hybrid": cmd_hybrid,
    "health": cmd_health,
    "ingest": cmd_ingest,
}


def main(argv: list[str] | None = None, spark: SparkSession | None = None,
         log=print) -> int:
    """Program.cs:9-62: resolve the command, time it, always exit 0."""
    argv = sys.argv[1:] if argv is None else argv
    command, flags = parse_args(argv)
    fn = COMMANDS.get(command)
    if fn is None:
        log(f"unknown command: {command}")
        return 0
    own_session = spark is None
    if own_session:
        from resin_spark.session import get_spark
        spark = get_spark(f"resin-cli-{command}")
    log(f"running command: {command}")
    t0 = time.monotonic()
    try:
        rc = fn(flags, spark, log=log)
    finally:
        if own_session:
            spark.stop()
    log(f"finished in {time.monotonic() - t0:.3f}s")
    return rc


if __name__ == "__main__":
    sys.exit(main())
