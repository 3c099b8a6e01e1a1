"""r12 single-session alternating A/B for the ann_topk_pq probe dedup.

The working-tree shape (B) reads dims + n_rows from ONE
corpus_bytes_estimate call (memoized per plan); the r11 shape (A) paid
an extra un-memoized `_probe_dims` first() job per call on top of the
trainer's internal estimate.  The code delta is exactly that probe, so
A is reproduced as `_probe_dims(); ann_topk_pq()` — same session, same
plans, alternating order, min/median over reps.

Usage: python tools/ab_pq_probe.py <sf_dir> [reps=5]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from resin_spark.io import load_tables
from resin_spark.operators import similarity as S
from resin_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark("ab-pq-probe")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_tables(spark, sf_dir)["embeddings"]
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_vec"))

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def run_new():
        noop(S.ann_topk_pq(emb, queries, rerank=1_000_000))

    def run_old():
        S._probe_dims(S.valid_vectors(emb, "embedding"), "embedding")
        noop(S.ann_topk_pq(emb, queries, rerank=1_000_000))

    run_new(); run_old()  # warm (fills the estimate memo, JIT, AQE)
    a, b = [], []
    for i in range(reps):
        for name, fn, acc in (("old", run_old, a), ("new", run_new, b)):
            t0 = time.monotonic(); fn(); acc.append(time.monotonic() - t0)
    print(f"old(shape r11) min {min(a):.3f} med {statistics.median(a):.3f}")
    print(f"new(shape r12) min {min(b):.3f} med {statistics.median(b):.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
