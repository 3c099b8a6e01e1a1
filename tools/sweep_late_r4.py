"""Replication sweep of the late-r4 operators: nb_lang_classify,
importance_weights, epoch_shuffle, semantic_dedup.

Claims under test:

- nb_lang_classify — model build is one (lang, tok) shuffle, scoring
  one broadcast-fanout join: work ∝ total tokens × |langs|; exact
  replication keeps the vocabulary constant (model frame size flat)
  while deepening the Zipf skew on the scoring join key.
- importance_weights — both bucket models are ≤ 4096 rows at ANY
  corpus size (the hashing trick); work ∝ total bigrams, model build
  cost FLAT.
- epoch_shuffle — per-(epoch, shard) windows only; work ∝ rows ×
  epochs, no global sort to super-linearise.
- semantic_dedup — candidate matmul is linear in rows (broadcast
  operating point), pair verify is output-proportional; exact ×m
  replication multiplies true in-cell pairs ~m²-fold, so runtime may
  grow super-linearly ONLY in proportion to emitted pairs (the same
  output-proportionality contract the D2/D3 sweeps pin).

Method mirrors tools/sweep_traindata.py: sf0.1 tables replicated
1x/2x/4x with offset ids, steady-state min-of-1 after a discarded
warm run, noop writes.

Run: python tools/sweep_late_r4.py   (prints a markdown table)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from resin_spark.io import load_tables
from resin_spark.operators import dedup
from resin_spark.operators import pipeline as pl
from resin_spark.operators import sketch as sk
from resin_spark.io import load_tables as _lt
from resin_spark.operators import traindata as td
from resin_spark.session import get_spark


def replicate(df, id_col: str, m: int, offset: int = 10_000_000):
    out = df
    for r in range(1, m):
        out = out.unionByName(
            df.withColumn(id_col, F.col(id_col) + r * offset))
    return out.localCheckpoint(eager=True)


def timed(build, runs: int = 1):
    best = None
    for run in range(runs + 1):
        t0 = time.monotonic()
        build().write.format("noop").mode("overwrite").save()
        el = time.monotonic() - t0
        if run > 0:
            best = el if best is None else min(best, el)
    return best


def main() -> None:
    spark = get_spark("sweep-late-r4")
    spark.sparkContext.setLogLevel("ERROR")
    t = load_tables(spark, "/root/testdata/sf0.1")
    print("| m | docs | nb_lang | importance_w | epoch_shuffle "
          "| filter_funnel | bloom | cms | corpus_st | lang_st "
          "| emb rows | semantic_dedup | sem pairs | kmeans_refine |")
    print("|---|---|---|---|---|---|---|---|---|---|---|---|---|---|")
    for m in (1, 2, 4):
        docs = replicate(t["documents"], "doc_id", m)
        emb = replicate(t["embeddings"], "vec_id", m)
        td_t = {"documents": docs}
        nb = timed(lambda: td.nb_lang_classify(td_t))
        iw = timed(lambda: td.importance_weights(td_t))
        ep = timed(lambda: td.epoch_shuffle(td_t))
        ff = timed(lambda: pl.filter_funnel(td_t))
        bl = timed(lambda: pl.bloom_contamination(td_t))
        cm = timed(lambda: sk.cms_heavy_hitters(td_t))
        cs = timed(lambda: td.corpus_stats(td_t))
        ls = timed(lambda: td.lang_stats(td_t))
        sd = timed(lambda: dedup.semantic_dedup(emb))
        km = timed(lambda: td.kmeans_refine(emb))
        pairs = (dedup.semantic_dedup(emb)
                 .agg(F.sum("n_dups_earlier")).first()[0])
        print(f"| {m}x | {docs.count():,} | {nb:.2f}s | {iw:.2f}s "
              f"| {ep:.2f}s | {ff:.2f}s | {bl:.2f}s | {cm:.2f}s "
              f"| {cs:.2f}s | {ls:.2f}s | {emb.count():,} | {sd:.2f}s "
              f"| {pairs:,} | {km:.2f}s |")
        docs.unpersist(); emb.unpersist()


if __name__ == "__main__":
    main()
