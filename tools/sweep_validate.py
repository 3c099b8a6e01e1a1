"""Replication sweep of the persisted-index validators (r5).

Claim under test: a validator run costs about one index build over the
indexed rows — the posting compare is ONE full-outer equi-join on the
posting key plus conditional aggregates, so runtime grows ~linearly
with index size (no per-check extra passes after the r5 consolidation,
no quadratic shapes anywhere).

Method mirrors SCALING.md's sweeps: sf0.1 documents / embeddings
replicated 1×/4×/8× with offset ids, the dedup and ANN indexes written
per replication (build time reported separately), then the validator
timed on the stored relations. min-of-1 after a discarded warm run.

Run: python tools/sweep_validate.py   (prints a markdown table)
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from resin_spark.io import load_tables
from resin_spark.operators import dedup, similarity, validate
from resin_spark.session import get_spark


def replicate(df, id_col: str, m: int, offset: int = 10_000_000):
    out = df
    for r in range(1, m):
        out = out.unionByName(
            df.withColumn(id_col, F.col(id_col) + r * offset))
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
    spark = get_spark("sweep-validate")
    spark.sparkContext.setLogLevel("ERROR")
    t = load_tables(spark, "/root/testdata/sf0.1")
    base = "/tmp/resin_sweep_validate"
    print("| m | docs | build dedup (s) | validate dedup (s) |"
          " build ann (s) | validate ann (s) |")
    print("|---|---|---|---|---|---|")
    for m in (1, 4, 8):
        docs = replicate(t["documents"].filter(F.col("doc_id").isNotNull()),
                         "doc_id", m)
        emb = replicate(t["embeddings"], "vec_id", m)
        n = docs.count()
        shutil.rmtree(base, ignore_errors=True)
        t0 = time.monotonic()
        dedup.write_dedup_index(docs, f"{base}/dedup")
        b_d = time.monotonic() - t0
        v_d = timed(lambda: validate.validate_dedup_index(
            spark, f"{base}/dedup").collect())
        t0 = time.monotonic()
        similarity.write_ann_index(emb, f"{base}/ann")
        b_a = time.monotonic() - t0
        v_a = timed(lambda: validate.validate_ann_index(
            spark, f"{base}/ann").collect())
        print(f"| {m}x | {n} | {b_d:.2f} | {v_d:.2f} | {b_a:.2f} "
              f"| {v_a:.2f} |")
    shutil.rmtree(base, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
