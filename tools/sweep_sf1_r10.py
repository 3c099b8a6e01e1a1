"""One-decade scale sweep, r10 extension (VERDICT r9 items 3+7): sf1
rows for every registered entry above ~2 s at sf0.1 that had no decade
measurement yet, so BASELINE.md's sf1 column (the new home of the 1.5x
regression gate for the cost leaders) starts fully populated:

- q4_order_priority / q22_idle_customers — the A-block LeftSemi and
  LeftAnti+broadcast-scalar shapes (orders/lineitem/customer replicated
  with coherent key offsets, so semi/anti match structure is preserved
  per replica).
- shard_manifest — map-side XOR content signatures.
- cluster_split / curation_tuning_card — the r9/r10 registrations
  (cluster_split is D2-PPJoin-dominated; the tuning card melts the
  nine formerly-staged operators).
- domain_mix, dedup_simhash, dedup_incremental, dedup_embedding,
  kmeans_refine, importance_weights, nb_lang_classify — the remaining
  >=2 s rows with no direct sf1 reading (dedup_components bounded
  simhash transitively in r8; this measures it directly).
- warc-path boilerplate_card — synthetic member-gzip crawl at 1x/10x
  pages, read_warc + warc_extract_text + boilerplate_card end-to-end
  (the r8 addendum swept the card over parquet documents only).

index_validate is deliberately NOT here: its cost is two scratch index
WRITES + the full validator suite per run (by design, I/O-dominated);
tools/sweep_validate.py measured the validator scaling in r5.

Run: python tools/sweep_sf1_r10.py   (markdown table; don't run
concurrently with bench.py — both grab local[32])
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from resin_spark.io import load_tables, read_warc, warc_segment_bytes
from resin_spark.operators import dedup, extract, pipeline, traindata
from resin_spark.plans import tpch
from resin_spark.session import get_spark
from sweep_sf1_r8 import M, docs_10x, emb_10x, noop, timed  # noqa: E402

KEY_OFFSET = 100_000_000


def rep10(df, *key_cols):
    """10x replication with coherent key offsets: every replica's keys
    shift together, so join/semi/anti match structure per replica is
    identical to the 1x corpus (pair volume grows linearly)."""
    out = df
    for r in range(1, M):
        rep = df
        for k in key_cols:
            rep = rep.withColumn(k, F.col(k) + r * KEY_OFFSET)
        out = out.unionByName(rep)
    return out.localCheckpoint(eager=True)


def _crawl(root: str, n_segments: int, pages_per_seg: int) -> str:
    """Synthetic member-gzip crawl (the sweep_warc_ingest template:
    shared nav/footer chrome + page-unique prose)."""
    chrome = ("<nav>" + " | ".join(f'<a href="/s{k}">Section {k}</a>'
                                   for k in range(8)) + "</nav>")
    footer = ('<footer>All rights reserved - <a href="/p">Privacy</a>'
              "</footer>")
    para = ("the quick brown fox jumps over the lazy dog while a "
            "crawler collects paragraphs of visible text ")
    os.makedirs(root, exist_ok=True)
    for seg in range(n_segments):
        recs = []
        for i in range(pages_per_seg):
            body = ("<html><head><title>P%d-%d</title></head><body>%s%s%s"
                    "</body></html>" % (
                        seg, i, chrome,
                        "".join(f"<p>{para * 3} #{seg}-{i}-{k}</p>"
                                for k in range(8)),
                        footer)).encode()
            recs.append((f"https://host{seg}.example/p{i}",
                         b"HTTP/1.1 200 OK\r\nContent-Type: text/html; "
                         b"charset=utf-8\r\n\r\n" + body))
        with open(os.path.join(root, f"seg-{seg:05d}.warc.gz"), "wb") as fh:
            fh.write(warc_segment_bytes(recs))
    return os.path.join(root, "*.warc.gz")


def main() -> None:
    spark = get_spark("sweep-sf1-r10")
    spark.sparkContext.setLogLevel("ERROR")
    lt = load_tables(spark, "/root/testdata/sf0.1")
    d1 = lt["documents"].filter(F.col("doc_id").isNotNull()) \
        .localCheckpoint(eager=True)
    e1 = lt["embeddings"].localCheckpoint(eager=True)
    or1 = lt["orders"].localCheckpoint(eager=True)
    li1 = lt["lineitem"].localCheckpoint(eager=True)
    cu1 = lt["customer"].localCheckpoint(eager=True)
    d10, e10 = docs_10x(d1), emb_10x(e1)
    # coherent key offsets: o_orderkey tracks l_orderkey, o_custkey
    # tracks c_custkey, so Q4's semi probe and Q22's anti probe match
    # replica-locally exactly as they do at 1x
    or10 = rep10(or1, "o_orderkey", "o_custkey")
    li10 = rep10(li1, "l_orderkey")
    cu10 = rep10(cu1, "c_custkey")
    t1 = {"documents": d1, "embeddings": e1, "orders": or1,
          "lineitem": li1, "customer": cu1}
    t10 = {"documents": d10, "embeddings": e10, "orders": or10,
           "lineitem": li10, "customer": cu10}
    print(f"documents {d1.count()} -> {d10.count()}; orders "
          f"{or1.count()} -> {or10.count()}; lineitem {li1.count()} -> "
          f"{li10.count()}; customer {cu1.count()} -> {cu10.count()}")
    print("| entry | sf0.1 (s) | sf1 (s) | ratio | note |")
    print("|---|---|---|---|---|")

    def row(name, f_small, f_big, note=""):
        a, b = timed(f_small), timed(f_big)
        print(f"| {name} | {a:.2f} | {b:.2f} | {b / a:.2f}x | {note} |",
              flush=True)

    row("q4_order_priority",
        lambda: noop(tpch.q4_order_priority(t1)),
        lambda: noop(tpch.q4_order_priority(t10)),
        "LeftSemi probe, |priorities| groups")
    row("q22_idle_customers",
        lambda: noop(tpch.q22_idle_customers(t1)),
        lambda: noop(tpch.q22_idle_customers(t10)),
        "LeftAnti + broadcast scalar avg")
    row("shard_manifest",
        lambda: noop(traindata.shard_manifest(t1)),
        lambda: noop(traindata.shard_manifest(t10)),
        "map-side XOR fold, O(n_shards) state")
    row("domain_mix",
        lambda: noop(pipeline.domain_mix(t1)),
        lambda: noop(pipeline.domain_mix(t10)),
        "per-source mixture shares")
    row("nb_lang_classify",
        lambda: noop(traindata.nb_lang_classify(t1)),
        lambda: noop(traindata.nb_lang_classify(t10)),
        "1 model shuffle + broadcast scoring")
    row("importance_weights",
        lambda: noop(traindata.importance_weights(t1)),
        lambda: noop(traindata.importance_weights(t10)),
        "DSIR hashed bigrams, <=4096-row broadcast model")
    row("kmeans_refine",
        lambda: noop(traindata.kmeans_refine(e1)),
        lambda: noop(traindata.kmeans_refine(e10)),
        "2 Lloyd iterations, broadcast centroids")
    row("dedup_embedding",
        lambda: noop(dedup.embedding_dedup_pairs(e1)),
        lambda: noop(dedup.embedding_dedup_pairs(e10)),
        "cell-gated cosine pairs")
    row("dedup_simhash",
        lambda: noop(dedup.simhash_pairs(d1)),
        lambda: noop(dedup.simhash_pairs(d10)),
        "Hamming-banded simhash (direct; r8 bounded it via components)")
    row("dedup_incremental",
        lambda: noop(dedup.incremental_dedup(d1)),
        lambda: noop(dedup.incremental_dedup(d10)),
        "new-vs-index banded minhash, cross-side only")
    row("cluster_split",
        lambda: noop(pipeline.cluster_split_demo(t1)),
        lambda: noop(pipeline.cluster_split_demo(t10)),
        "D2-PPJoin-dominated leakage-free split")
    row("curation_tuning_card",
        lambda: noop(pipeline.curation_tuning_card(t1)),
        lambda: noop(pipeline.curation_tuning_card(t10)),
        "nine nested curation cards (r10 melt)")

    # warc-path boilerplate_card: crawl bytes -> read_warc ->
    # warc_extract_text -> boilerplate_card, timed end-to-end
    root = tempfile.mkdtemp(prefix="resin_sweep_warc_r10_")
    try:
        glob1 = _crawl(os.path.join(root, "x1"), 5, 100)
        glob10 = _crawl(os.path.join(root, "x10"), 50, 100)

        def warc_boiler(glob):
            docs = extract.warc_extract_text(read_warc(spark, glob))
            return extract.boilerplate_card(docs)

        row("warc boilerplate_card", lambda: noop(warc_boiler(glob1)),
            lambda: noop(warc_boiler(glob10)),
            "crawl -> extract -> per-source boilerplate shares, 500 vs "
            "5000 pages")
    finally:
        shutil.rmtree(root, ignore_errors=True)

    spark.stop()


if __name__ == "__main__":
    main()
