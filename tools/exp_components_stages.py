"""Stage profile of dedup_components / dup_cluster_histogram (r12,
VERDICT item 3): where does the eager construction go vs the final
action?  Usage: python tools/exp_components_stages.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from resin_spark.io import load_tables
from resin_spark.operators import dedup
from resin_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("exp-components")
    spark.sparkContext.setLogLevel("ERROR")
    t = load_tables(spark, sf_dir)
    docs = t["documents"]

    from pyspark.sql import functions as F

    def run_once(tag: str) -> None:
        # mirror dedup_components' construction step by step
        t0 = time.monotonic()
        sims = dedup.simhash(docs).localCheckpoint(eager=False)
        nodes = (sims.groupBy("simhash").agg(F.min("doc_id").alias("rep"))
                 .localCheckpoint(eager=False))
        chunk_bits = dedup.N_BITS // dedup.N_CHUNKS
        mask = (1 << chunk_bits) - 1
        vchunks = nodes.select(
            "simhash", "rep",
            F.posexplode(F.array(*[
                F.shiftright("simhash", i * chunk_bits).bitwiseAND(F.lit(mask))
                for i in range(dedup.N_CHUNKS)
            ])).alias("chunk_idx", "chunk_val"),
        )
        a, b = vchunks.alias("a"), vchunks.alias("b")
        edges = (
            a.join(b, (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
                   & (F.col("a.chunk_val") == F.col("b.chunk_val"))
                   & (F.col("a.rep") < F.col("b.rep")))
            .filter(F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))) <= 3)
            .select(F.col("a.rep").alias("doc_a"), F.col("b.rep").alias("doc_b"))
            .distinct()
            .localCheckpoint(eager=False)
        )
        t1 = time.monotonic()
        n_edges = edges.count()
        t2 = time.monotonic()
        n_pulled = 0
        for _ in edges.toLocalIterator():
            n_pulled += 1
        t3 = time.monotonic()
        # the full entry, end to end, for reference
        t4 = time.monotonic()
        dedup.dedup_components(docs).write.format("noop").mode(
            "overwrite").save()
        t5 = time.monotonic()
        print(f"{tag}: build-lazy {t1-t0:.3f}  count(materialise) {t2-t1:.3f}"
              f"  toLocalIterator {t3-t2:.3f} ({n_pulled} edges)"
              f"  full-entry {t5-t4:.3f}  [n_edges={n_edges}]", flush=True)

    run_once("warm")
    for i in range(3):
        run_once(f"run{i}")

    # alternative pull shapes over an identical checkpointed edge frame
    sims = dedup.simhash(docs).localCheckpoint(eager=False)
    nodes = (sims.groupBy("simhash").agg(F.min("doc_id").alias("rep"))
             .localCheckpoint(eager=False))
    chunk_bits = dedup.N_BITS // dedup.N_CHUNKS
    mask = (1 << chunk_bits) - 1
    vchunks = nodes.select(
        "simhash", "rep",
        F.posexplode(F.array(*[
            F.shiftright("simhash", i * chunk_bits).bitwiseAND(F.lit(mask))
            for i in range(dedup.N_CHUNKS)
        ])).alias("chunk_idx", "chunk_val"),
    )
    a, b = vchunks.alias("a"), vchunks.alias("b")
    edges = (
        a.join(b, (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
               & (F.col("a.chunk_val") == F.col("b.chunk_val"))
               & (F.col("a.rep") < F.col("b.rep")))
        .filter(F.bit_count(
            F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))) <= 3)
        .select(F.col("a.rep").alias("doc_a"), F.col("b.rep").alias("doc_b"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    edges.count()  # materialise once
    for _ in range(3):
        t0 = time.monotonic()
        n = sum(1 for _ in edges.toLocalIterator())
        t1 = time.monotonic()
        rows = edges.collect()
        t2 = time.monotonic()
        print(f"pull shapes over warm ckpt: toLocalIterator {t1-t0:.3f}"
              f" ({n})  collect {t2-t1:.3f} ({len(rows)})", flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
