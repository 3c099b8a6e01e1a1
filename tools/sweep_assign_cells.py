"""Cell-count sweep of the _assign_cells argmax kernel (r5 rewrite).

Claim under test: after the map-side min_by rewrite, the post-scoring
exchange carries one row per VECTOR regardless of |cells| — so scaling
the cell count 10× → 100× must scale runtime only with the linear
scoring work (|corpus| × |cells| JVM cosine folds), never with an
exchange of the scored |corpus| × |cells| frame. The r4 rank-window
form shuffled corpus×k rows; its cost curve bent with k for the wrong
reason (shuffle volume), which the late-r4 sweep could not see because
it held |cells| = |labels| = 5 while scaling the corpus.

Method: sf0.1 embeddings (2,000 × 64) replicated 4× (8,000 vectors);
synthetic unit-ish centroid frames of 10 / 100 / 1000 cells built from
hashed axes (deterministic, no RNG). Each timing materialises the
(vec_id, cell) assignment with a noop write, steady-state min-of-1
after a discarded warm run. Shuffle-record accounting comes from the
executed plan's exchange metrics to prove the n-rows claim directly.

Run: python tools/sweep_assign_cells.py   (prints a markdown table)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from resin_spark.io import load_tables
from resin_spark.operators import traindata as td
from resin_spark.operators.similarity import valid_vectors
from resin_spark.session import get_spark


def centroids(spark, k: int, dims: int = 64):
    """k deterministic pseudo-random centroids: dim j of cell c is a
    hash-derived value in [-1, 1] — no RNG, reproducible across runs."""
    return (
        spark.range(k).select(F.col("id").cast("int").alias("c_label"))
        .select(
            "c_label",
            F.transform(
                F.sequence(F.lit(0), F.lit(dims - 1)),
                lambda j: (F.pmod(F.xxhash64(F.concat_ws(
                    ":", F.col("c_label"), j)), F.lit(2001)) - 1000)
                / 1000.0,
            ).alias("centroid"),
        )
        .localCheckpoint(eager=True)
    )


def exchange_rows(df) -> list[int]:
    """Records written by each shuffle exchange of the EXECUTED plan
    (AQE final), largest first — the n-vs-n×k receipt."""
    plan = df._jdf.queryExecution().executedPlan()
    out = []

    def walk(node):
        name = node.nodeName()
        if name.startswith("AdaptiveSparkPlan"):
            walk(node.executedPlan())  # unwrap to the AQE final plan
            return
        if "Exchange" in name and "Broadcast" not in name:
            m = node.metrics()
            it = m.iterator()
            while it.hasNext():
                kv = it.next()
                if kv._1() in ("numOutputRows", "shuffleRecordsWritten"):
                    out.append(int(kv._2().value()))
        # QueryStage nodes wrap their subtree behind .plan()
        if hasattr(node, "plan") and "QueryStage" in name:
            walk(node.plan())
        for i in range(node.children().size()):
            walk(node.children().apply(i))

    walk(plan)
    return sorted(out, reverse=True)


def main() -> None:
    spark = get_spark("sweep-assign-cells")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_tables(spark, "/root/testdata/sf0.1")["embeddings"]
    base = valid_vectors(emb).filter(F.col("label").isNotNull()) \
        .select("vec_id", "embedding")
    rep = base
    for r in range(1, 4):
        rep = rep.unionByName(
            base.withColumn("vec_id", F.col("vec_id") + r * 10_000_000))
    rep = rep.localCheckpoint(eager=True)
    n = rep.count()
    print(f"corpus: {n} vectors (sf0.1 embeddings x4)\n")
    print("| cells | sec | biggest shuffle rows | rows/vector |")
    print("|---|---|---|---|")
    for k in (10, 100, 1000):
        cents = centroids(spark, k)
        best = None
        for run in range(2):
            t0 = time.monotonic()
            df = td._assign_cells(rep, cents)
            df.write.format("noop").mode("overwrite").save()
            el = time.monotonic() - t0
            if run > 0:
                best = el
        # metrics must come from the SAME QueryExecution that ran —
        # a noop write plans its own, so collect through the DataFrame
        # (the result is (vec_id, cell): n small rows)
        df = td._assign_cells(rep, cents)
        df.collect()
        rows = exchange_rows(df)
        big = rows[0] if rows else -1
        print(f"| {k} | {best:.2f} | {big} | {big / n:.2f} |")
    spark.stop()


if __name__ == "__main__":
    main()
