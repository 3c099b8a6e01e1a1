"""Corpus-health operator sweep (late r6).

Claims under test as the corpus grows m×:

- encoding_anomalies and table_profile are single-scan jobs → wall
  time grows at most linearly with rows.
- source_overlap_matrix's self-join output is bounded by
  n_sources × distinct shingles, NOT rows²: with REPLICATED text
  (distinct shingles constant) time should stay near-flat after the
  scan cost; with SALTED text (distinct shingles grow m×) time grows
  linearly — never quadratically.
- mixture_plan is one aggregate + broadcast → linear.

Method: sf0.1 documents replicated 1×/2×/4×/8× with offset ids; the
salted variant suffixes a per-replica token so every replica's
shingles are new. Wall times single-shot; the trend is the reading.

Run: python tools/sweep_health.py   (prints a markdown table)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from resin_spark.io import load_tables
from resin_spark.operators import health, pipeline
from resin_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OFF = 10_000_000


def replicate(docs, m, salt):
    parts = [docs]
    for i in range(1, m):
        p = docs.withColumn("doc_id", F.col("doc_id") + OFF * i)
        if salt:
            p = p.withColumn("text", F.concat_ws(" ", "text", F.lit(f"r{i}")))
        parts.append(p)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def timed(fn):
    t0 = time.monotonic()
    n = fn().count()
    return time.monotonic() - t0, n


def main() -> None:
    spark = get_spark("sweep-health")
    docs = load_tables(spark, SF_DIR)["documents"].filter(
        F.col("doc_id").isNotNull())
    base = docs.count()
    print(f"base docs: {base} ({SF_DIR})")
    print("| m | rows | anomalies (s) | profile (s) | mixture (s) |"
          " overlap repl (s) | overlap salted (s) |")
    print("|---|---|---|---|---|---|---|")
    for m in (1, 2, 4, 8):
        rep = replicate(docs, m, salt=False).localCheckpoint()
        sal = replicate(docs, m, salt=True).localCheckpoint() if m > 1 else rep
        ta, _ = timed(lambda: health.encoding_anomalies(rep))
        tp, _ = timed(lambda: health.table_profile(rep))
        tm, _ = timed(lambda: pipeline.mixture_plan(rep))
        to, _ = timed(lambda: health.source_overlap_matrix(rep))
        ts, _ = timed(lambda: health.source_overlap_matrix(sal))
        print(f"| {m}x | {base * m} | {ta:.2f} | {tp:.2f} | {tm:.2f} |"
              f" {to:.2f} | {ts:.2f} |")
    spark.stop()


if __name__ == "__main__":
    main()
