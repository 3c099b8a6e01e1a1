"""Deep replication sweep (r5): 8×/16×/32× UNIQUE documents.

Earlier sweeps replicate exact copies (adversarial for dedup: pair
counts grow m²). This one grows the corpus along the realistic axis —
more UNIQUE documents (each replica's text is salted with its replica
id, so near-dup structure per doc is preserved but replicas don't
match each other) — and times the heavy operators at up to 160k docs
(32× sf0.1). Claim: wall time grows ~linearly with unique-corpus size
for minhash-LSH dedup, Bloom decontamination, and the BM25 index
build, while the indexed BM25 probe stays flat.

Run: python tools/sweep_deep_r5.py   (prints a markdown table)
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from resin_spark.io import load_tables
from resin_spark.operators import dedup, pipeline, textindex as ti
from resin_spark.session import get_spark


def replicate_unique(df, m: int, offset: int = 10_000_000):
    out = df
    for r in range(1, m):
        out = out.unionByName(
            df.withColumn("doc_id", F.col("doc_id") + r * offset)
            .withColumn("text", F.concat_ws(" ", "text",
                                            F.lit(f"replica{r}"))))
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
    spark = get_spark("sweep-deep-r5")
    spark.sparkContext.setLogLevel("ERROR")
    base = load_tables(spark, "/root/testdata/sf0.1")["documents"] \
        .filter(F.col("doc_id").isNotNull())
    root = "/tmp/resin_sweep_deep"
    print("| m | docs | minhash_lsh (s) | bloom_contam (s) |"
          " text-index build (s) | bm25 probe (s) |")
    print("|---|---|---|---|---|---|")
    for m in (8, 16, 32):
        docs = replicate_unique(base, m)
        n = docs.count()
        t = {"documents": docs}
        mh = timed(lambda: dedup.minhash_lsh_pairs(docs)
                   .write.format("noop").mode("overwrite").save())
        bl = timed(lambda: pipeline.bloom_contamination(t)
                   .write.format("noop").mode("overwrite").save())
        shutil.rmtree(root, ignore_errors=True)
        t0 = time.monotonic()
        ti.write_text_index(docs, f"{root}/text")
        build = time.monotonic() - t0
        probe = timed(lambda: ti.bm25_topk_indexed(
            spark, f"{root}/text").collect())
        print(f"| {m}x | {n} | {mh:.2f} | {bl:.2f} | {build:.2f} "
              f"| {probe:.2f} |", flush=True)
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
