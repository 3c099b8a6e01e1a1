"""One-decade scale sweep, r9 extension (VERDICT r8 item 7): the NEW
cost leaders at sf0.1 (1x) vs synthetic sf1 (10x), on the same
unique-content replication axis as tools/sweep_sf1_r8.py (salted doc
text, basis-shifted embeddings, offset lineitem keys):

- dataset_card_typed — the slowest C-entry (13 scans / 44 hash
  aggregates over five nested cards; its dominant subtree
  dedup_components measured sub-linear in r8).
- health_card_typed / split_governance_card — the two r9 composite
  melts (six resp. five nested cards each).
- hybrid_search_rrf — BM25 + cosine legs, k-bounded fusion.
- kv_paginate — the r8 driver-artifact noise outlier; page-chain
  layout over lineitem (pure window + aggregate).
- amortised ANN index probes — write_ann_index / write_pq_index build
  once per scale, then the PROBE is timed (the production amortised
  number; bm25's probe was swept in r8).

Run: python tools/sweep_sf1_r9.py   (markdown table; don't run
concurrently with bench.py — both grab local[32])
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from resin_spark.io import load_tables
from resin_spark.operators import health, pipeline, retrieval, similarity
from resin_spark.session import get_spark
from sweep_sf1_r8 import M, docs_10x, emb_10x, noop, timed  # noqa: E402

LI_OFFSET = 100_000_000


def main() -> None:
    spark = get_spark("sweep-sf1-r9")
    spark.sparkContext.setLogLevel("ERROR")
    lt = load_tables(spark, "/root/testdata/sf0.1")
    # LazyTables is not a plain dict — materialise the tables the card
    # members read
    t1 = {name: lt[name] for name in
          ("documents", "embeddings", "lineitem")}
    d1 = t1["documents"].filter(F.col("doc_id").isNotNull()) \
        .localCheckpoint(eager=True)
    e1 = t1["embeddings"].localCheckpoint(eager=True)
    li1 = t1["lineitem"].localCheckpoint(eager=True)
    d10, e10 = docs_10x(d1), emb_10x(e1)
    li10 = li1
    for r in range(1, M):
        li10 = li10.unionByName(
            li1.withColumn("l_orderkey", F.col("l_orderkey") + r * LI_OFFSET))
    li10 = li10.localCheckpoint(eager=True)
    t1 = {**t1, "documents": d1, "embeddings": e1, "lineitem": li1}
    t10 = {**t1, "documents": d10, "embeddings": e10, "lineitem": li10}
    print(f"documents {d1.count()} -> {d10.count()}; embeddings "
          f"{e1.count()} -> {e10.count()}; lineitem {li1.count()} -> "
          f"{li10.count()}")
    print("| entry | sf0.1 (s) | sf1 (s) | ratio | note |")
    print("|---|---|---|---|---|")
    rows = []

    def row(name, f_small, f_big, note=""):
        a, b = timed(f_small), timed(f_big)
        rows.append((name, a, b))
        print(f"| {name} | {a:.2f} | {b:.2f} | {b / a:.2f}x | {note} |",
              flush=True)

    def paginate(t):
        # the kv_paginate entry reads from sf_dir; time the operator
        # body directly on the in-memory frames instead
        from resin_spark.operators import kv
        li = t["lineitem"]
        return kv.paginate(li.select(
            F.col("l_orderkey").alias("key"),
            F.col("l_linenumber").alias("seq")))

    row("kv_paginate",
        lambda: noop(paginate(t1)), lambda: noop(paginate(t10)),
        "page-chain layout, per-key window")
    row("hybrid_search_rrf",
        lambda: noop(retrieval.hybrid_search_demo(t1)),
        lambda: noop(retrieval.hybrid_search_demo(t10)),
        "BM25 + cosine legs, k-bounded RRF fusion")
    row("dataset_card_typed",
        lambda: noop(pipeline.dataset_card_typed(t1)),
        lambda: noop(pipeline.dataset_card_typed(t10)),
        "five nested cards, dedup_components-dominated")
    row("health_card_typed",
        lambda: noop(health.health_card_typed(t1)),
        lambda: noop(health.health_card_typed(t10)),
        "six nested health cards (r9 melt)")
    row("split_governance_card",
        lambda: noop(pipeline.split_governance_card(t1)),
        lambda: noop(pipeline.split_governance_card(t10)),
        "five nested governance cards (r9 melt)")

    # amortised index probes: build once per scale (untimed), probe min-of-2
    root = "/tmp/resin_sweep_sf1_r9"
    shutil.rmtree(root, ignore_errors=True)

    def qvecs(emb):
        return emb.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_vec"))

    for name, emb in (("1x", e1), ("10x", e10)):
        similarity.write_ann_index(emb, f"{root}/ann_{name}",
                                   n_planes=6, n_tables=8)
        similarity.write_pq_index(emb, f"{root}/pq_{name}")
    a = timed(lambda: noop(similarity.lsh_topk_indexed(
        similarity.read_ann_index(spark, f"{root}/ann_1x"), qvecs(e1),
        n_planes=6, n_tables=8, probe_radius=2)))
    b = timed(lambda: noop(similarity.lsh_topk_indexed(
        similarity.read_ann_index(spark, f"{root}/ann_10x"), qvecs(e10),
        n_planes=6, n_tables=8, probe_radius=2)))
    rows.append(("ann lsh indexed probe", a, b))
    print(f"| ann lsh indexed probe | {a:.2f} | {b:.2f} | {b / a:.2f}x "
          f"| stored-bucket probe, build amortised |", flush=True)

    def pq_probe(tag, emb):
        codes, books = similarity.read_pq_index(spark, f"{root}/pq_{tag}")
        return similarity.pq_topk_indexed(codes, books, qvecs(emb), emb,
                                          rerank=50)
    a = timed(lambda: noop(pq_probe("1x", e1)))
    b = timed(lambda: noop(pq_probe("10x", e10)))
    rows.append(("ann pq indexed probe", a, b))
    print(f"| ann pq indexed probe | {a:.2f} | {b:.2f} | {b / a:.2f}x "
          f"| ADC over stored codes, lean rerank 50 |", flush=True)

    shutil.rmtree(root, ignore_errors=True)
    flat_ok = {"ann lsh indexed probe", "ann pq indexed probe"}
    super_linear = [n for n, a, b in rows
                    if n not in flat_ok and b / a > M * 1.3]
    print(f"\nsuper-linear (> {M}x * 1.3): {super_linear or 'none'}")
    spark.stop()


if __name__ == "__main__":
    main()
