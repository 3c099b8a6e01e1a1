"""One-decade scale sweep (r8, VERDICT r7 item 8): the dedup/search
headliners at sf0.1 (1x) vs a synthetic sf1 (10x) — a REAL order-of-
magnitude corpus step on the realistic unique-content axis, not the
exact-replica adversarial axis:

- documents 10x: replica text salted with its replica id (the
  sweep_deep_r5 convention) — per-doc near-dup structure preserved,
  no cross-replica matches, so pair volume grows ~linearly.
- embeddings 10x: each replica's vectors shifted by a per-replica
  basis direction (magnitude ~ corpus norms), so replicas form their
  own neighborhoods — cell/pair volume grows ~linearly, not m².

Headliners: dedup_ngram_jaccard (PPJoin), dedup_minhash_lsh (banded),
dedup_components (simhash + clique collapse), bm25 indexed
(build + pruned probe), semantic_dedup (cell-partitioned SemDeDup).
Each row reports sf0.1 s, sf1 s, and the wall ratio; a linear operator
should ratio <= ~10, the pruned probe should stay ~flat.

Run: python tools/sweep_sf1_r8.py   (prints a markdown table;
don't run concurrently with bench.py — both grab local[32])
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from resin_spark.io import load_tables
from resin_spark.operators import dedup, textindex as ti
from resin_spark.session import get_spark

M = 10
DOC_OFFSET = 10_000_000
VEC_OFFSET = 10_000_000


def docs_10x(docs):
    out = docs
    for r in range(1, M):
        out = out.unionByName(
            docs.withColumn("doc_id", F.col("doc_id") + r * DOC_OFFSET)
            .withColumn("text", F.concat_ws(" ", "text",
                                            F.lit(f"replica{r}"))))
    return out.localCheckpoint(eager=True)


def emb_10x(emb, dims: int = 64):
    """Replica r's vectors shift along basis direction (r mod dims) by
    2.0 (the testdata vectors are ~unit scale), so cross-replica cosine
    falls well below the semantic thresholds while within-replica
    neighborhoods survive."""
    out = emb
    for r in range(1, M):
        j = r % dims
        out = out.unionByName(
            emb.withColumn("vec_id", F.col("vec_id") + r * VEC_OFFSET)
            .withColumn(
                "embedding",
                F.transform(
                    "embedding",
                    lambda x, i: (x + F.when(i == F.lit(j), F.lit(2.0))
                                  .otherwise(F.lit(0.0))).cast("float"),
                )))
    return out.localCheckpoint(eager=True)


def timed(fn):
    """min-of-2 after a discarded warm run (bench.py methodology)."""
    fn()
    best = None
    for _ in range(2):
        t0 = time.monotonic()
        fn()
        el = time.monotonic() - t0
        best = el if best is None else min(best, el)
    return best


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    spark = get_spark("sweep-sf1-r8")
    spark.sparkContext.setLogLevel("ERROR")
    t01 = load_tables(spark, "/root/testdata/sf0.1")
    d1 = t01["documents"].filter(F.col("doc_id").isNotNull()) \
        .localCheckpoint(eager=True)
    e1 = t01["embeddings"].localCheckpoint(eager=True)
    d10 = docs_10x(d1)
    e10 = emb_10x(e1)
    n1, n10 = d1.count(), d10.count()
    v1, v10 = e1.count(), e10.count()
    print(f"documents: {n1} -> {n10}; embeddings: {v1} -> {v10}")
    print("| headliner | sf0.1 (s) | sf1 (s) | ratio | note |")
    print("|---|---|---|---|---|")

    rows = []

    def row(name, f_small, f_big, note=""):
        a = timed(f_small)
        b = timed(f_big)
        rows.append((name, a, b))
        print(f"| {name} | {a:.2f} | {b:.2f} | {b / a:.2f}x | {note} |",
              flush=True)

    row("dedup_ngram_jaccard",
        lambda: noop(dedup.ngram_jaccard_pairs(d1)),
        lambda: noop(dedup.ngram_jaccard_pairs(d10)),
        "PPJoin prefix-filtered exact Jaccard")
    row("dedup_minhash_lsh",
        lambda: noop(dedup.minhash_lsh_pairs(d1)),
        lambda: noop(dedup.minhash_lsh_pairs(d10)),
        "banded LSH + exact verify")
    row("dedup_components",
        lambda: noop(dedup.dedup_components(d1)),
        lambda: noop(dedup.dedup_components(d10)),
        "simhash + clique-collapsed components")
    row("semantic_dedup",
        lambda: noop(dedup.semantic_dedup(e1)),
        lambda: noop(dedup.semantic_dedup(e10)),
        "SemDeDup cell-partitioned")

    root = "/tmp/resin_sweep_sf1"
    shutil.rmtree(root, ignore_errors=True)

    def build(docs, path):
        shutil.rmtree(path, ignore_errors=True)
        t0 = time.monotonic()
        ti.write_text_index(docs, path)
        return time.monotonic() - t0

    b1 = build(d1, f"{root}/t1")
    b10 = build(d10, f"{root}/t10")
    rows.append(("bm25 index build", b1, b10))
    print(f"| bm25 index build | {b1:.2f} | {b10:.2f} | {b10 / b1:.2f}x "
          f"| tokenise + postings write |", flush=True)
    p1 = timed(lambda: ti.bm25_topk_indexed(spark, f"{root}/t1").collect())
    p10 = timed(lambda: ti.bm25_topk_indexed(spark, f"{root}/t10").collect())
    rows.append(("bm25 indexed probe", p1, p10))
    print(f"| bm25 indexed probe | {p1:.2f} | {p10:.2f} | {p10 / p1:.2f}x "
          f"| pruned postings directories |", flush=True)

    shutil.rmtree(root, ignore_errors=True)
    super_linear = [n for n, a, b in rows
                    if n != "bm25 indexed probe" and b / a > M * 1.3]
    print(f"\nsuper-linear (> {M}x * 1.3): {super_linear or 'none'}")
    spark.stop()


if __name__ == "__main__":
    main()
