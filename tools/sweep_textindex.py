"""Replication sweep of the persisted text index (r5).

Claim under test: an indexed query's cost is proportional to the QUERY
TERMS' postings, not the corpus — the probe reads only its bucket
directories (3 of 64 for the default query), so as the corpus
replicates m×, the direct bm25_search scan re-pays the full tokenise
every time while the indexed probe pays only the pruned postings
growth. Phrase probes likewise never rescan the corpus.

Method: sf0.1 documents replicated 1×/4×/8× with offset ids; the index
is rebuilt per replication (build time reported — the amortised cost);
probe timings are min-of-1 after a discarded warm run.

Run: python tools/sweep_textindex.py   (prints a markdown table)
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from resin_spark.io import load_tables
from resin_spark.operators import textindex as ti
from resin_spark.operators import textops as tx
from resin_spark.session import get_spark


def replicate(df, m: int, offset: int = 10_000_000):
    out = df
    for r in range(1, m):
        out = out.unionByName(
            df.withColumn("doc_id", F.col("doc_id") + r * offset))
    return out.localCheckpoint(eager=True)


def timed(fn):
    best = None
    for run in range(2):
        t0 = time.monotonic()
        fn()
        el = time.monotonic() - t0
        if run > 0:
            best = el
    return best


def main() -> None:
    spark = get_spark("sweep-textindex")
    spark.sparkContext.setLogLevel("ERROR")
    base_docs = load_tables(spark, "/root/testdata/sf0.1")["documents"] \
        .filter(F.col("doc_id").isNotNull())
    root = "/tmp/resin_sweep_textindex"
    print("| m | docs | build (s) | bm25 direct (s) | bm25 probe (s) |"
          " phrase direct (s) | phrase probe (s) |")
    print("|---|---|---|---|---|---|---|")
    for m in (1, 4, 8):
        docs = replicate(base_docs, m)
        n = docs.count()
        t = {"documents": docs}
        shutil.rmtree(root, ignore_errors=True)
        t0 = time.monotonic()
        ti.write_text_index(docs, f"{root}/text")
        build = time.monotonic() - t0
        d_bm = timed(lambda: tx.bm25_search(t).collect())
        p_bm = timed(lambda: ti.bm25_topk_indexed(
            spark, f"{root}/text").collect())
        d_ph = timed(lambda: tx.phrase_search(t).collect())
        p_ph = timed(lambda: ti.phrase_topk_indexed(
            spark, f"{root}/text").collect())
        print(f"| {m}x | {n} | {build:.2f} | {d_bm:.2f} | {p_bm:.2f} "
              f"| {d_ph:.2f} | {p_ph:.2f} |")
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
