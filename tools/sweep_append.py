"""Incremental-append cost sweep (r6).

Claim under test: append_text_index / append_dedup_index cost is
proportional to the NEW BATCH (plus, for text, the bucket partitions
its terms touch) — NOT to the standing index — so as the standing
corpus grows m×, a fixed-size batch's append time stays near-flat
while the full rebuild it replaces grows linearly. This is the whole
point of the maintenance path: a 100 TB index absorbs a daily crawl
at crawl cost.

Method: sf0.1 documents replicated 1×/4×/8× with offset ids form the
standing corpus; the appended batch is a FIXED 2000-doc slice with
fresh ids. Per scale: build the standing index (rebuild baseline),
then time one append of the batch. Wall times are single-shot (build
and append are one-off jobs by nature; the comparison is the trend,
not the microsecond).

Run: python tools/sweep_append.py   (prints a markdown table)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from resin_spark.io import load_tables
from resin_spark.operators import dedup
from resin_spark.operators import textindex as ti
from resin_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
BATCH = 2000
OFF = 10_000_000


def replicate(docs, m):
    parts = [docs]
    for i in range(1, m):
        parts.append(
            docs.withColumn("doc_id", F.col("doc_id") + OFF * i)
            .withColumn("text", F.concat_ws(" ", "text", F.lit(f"r{i}"))))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main() -> None:
    spark = get_spark("sweep-append")
    docs = load_tables(spark, SF_DIR)["documents"] \
        .filter(F.col("doc_id").isNotNull()).localCheckpoint()
    batch = (
        docs.orderBy("doc_id").limit(BATCH)
        .withColumn("doc_id", F.col("doc_id") + OFF * 100)
        .withColumn("text", F.concat_ws(" ", "text", F.lit("fresh")))
        .localCheckpoint()
    )
    print(f"| m | standing docs | text build (s) | text append (s) "
          f"| dedup build (s) | dedup append (s) |")
    print("|---|---|---|---|---|---|")
    for m in (1, 4, 8):
        standing = replicate(docs, m).localCheckpoint()
        n = standing.count()
        base = f"/tmp/resin_spark_sweep_append/m{m}"
        t0 = time.monotonic()
        ti.write_text_index(standing, f"{base}/text")
        tb = time.monotonic() - t0
        t0 = time.monotonic()
        ti.append_text_index(batch, f"{base}/text")
        ta = time.monotonic() - t0
        t0 = time.monotonic()
        dedup.write_dedup_index(standing, f"{base}/dedup")
        db = time.monotonic() - t0
        t0 = time.monotonic()
        dedup.append_dedup_index(batch, f"{base}/dedup")
        da = time.monotonic() - t0
        print(f"| {m}x | {n} | {tb:.2f} | {ta:.2f} "
              f"| {db:.2f} | {da:.2f} |", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
