"""Replication sweep of the traindata operators: quality_perplexity,
shard_export, centroid_assign.

Claim under test: each operator's runtime grows ~linearly with corpus
size (the plans have no self-join / no per-doc quadratic term):

- quality_perplexity — two corpus scans (LM build, scoring) + a join
  on the Zipf-skewed token key; work ∝ total tokens.
- shard_export — one shuffle on the shard key + a bounded window;
  work ∝ rows.
- centroid_assign — one centroid pass + one broadcast-scored scan;
  work ∝ rows × |labels|.

Method mirrors SCALING.md's sweeps: sf0.1 documents (5,000 rows) /
embeddings (2,000 x 64) replicated 1x/2x/4x/8x with offset ids.
Replicated DOCUMENTS are exact text copies — adversarial for the LM
join (every token's df grows m-fold, deepening the skew on common
tokens) while the vocabulary stays constant. Timings are steady-state
min-of-1 after a discarded warm run, materialised with noop writes.

Run: python tools/sweep_traindata.py   (prints a markdown table)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from resin_spark.io import load_tables
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
    spark = get_spark("sweep-traindata")
    spark.sparkContext.setLogLevel("ERROR")
    t = load_tables(spark, "/root/testdata/sf0.1")
    print("| m | docs | perplexity | shard_export | emb rows | centroid_assign |")
    print("|---|---|---|---|---|---|")
    for m in (1, 2, 4, 8):
        docs = replicate(t["documents"], "doc_id", m)
        emb = replicate(t["embeddings"], "vec_id", m)
        td_t = {"documents": docs}
        p = timed(lambda: td.quality_perplexity(td_t))
        s = timed(lambda: td.shard_export(td_t))
        c = timed(lambda: td.centroid_assign(emb))
        print(f"| {m}x | {docs.count():,} | {p:.2f}s | {s:.2f}s "
              f"| {emb.count():,} | {c:.2f}s |")
        docs.unpersist(); emb.unpersist()


if __name__ == "__main__":
    main()
