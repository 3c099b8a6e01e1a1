"""Release-card sweep (r7): dataset_card_typed cost vs corpus size.

Claim under test: the typed release card is five single-scan bounded
aggregates plus a row-local melt — wall time grows at most linearly
with rows, and the output row count tracks the CARD dimensions
(langs/sources/stages/buckets), never the corpus. The simhash
duplication section collapses identical-content cliques on distinct
fingerprint VALUES, so exact replication (re-crawl shape) must not add
clustering work beyond the scan.

Method: sf0.1 documents replicated 1×/2×/4× with offset ids (exact
replicas — the adversarial case for the duplication histogram). Wall
times single-shot; the trend is the reading.

Run: python tools/sweep_card.py   (prints a markdown table)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from resin_spark.io import load_tables
from resin_spark.operators import pipeline
from resin_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OFF = 10_000_000


def replicate(docs, m):
    parts = [docs] + [docs.withColumn("doc_id", F.col("doc_id") + OFF * i)
                      for i in range(1, m)]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main() -> None:
    spark = get_spark("sweep-card")
    docs = load_tables(spark, SF_DIR)["documents"]
    print("| m | rows | card_rows | sec |")
    print("|---|------|-----------|-----|")
    for m in (1, 2, 4):
        d = replicate(docs, m).localCheckpoint()
        n = d.count()
        t0 = time.time()
        rows = pipeline.dataset_card_typed({"documents": d}).collect()
        dt = time.time() - t0
        print(f"| {m} | {n} | {len(rows)} | {dt:.2f} |")
    spark.stop()


if __name__ == "__main__":
    main()
