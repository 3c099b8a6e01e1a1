"""Vector-store append cost sweep (closing r6).

Claim under test: append_ivf_index / append_ann_index /
append_pq_index cost tracks the NEW BATCH (assign/hash/encode one
batch + an id-only dup-guard scan of the standing store), NOT the
standing index — so as the standing vector corpus grows m×, a
fixed-size batch's append time stays near-flat while the rebuild it
replaces grows with the corpus. The training state is frozen on
append by design (stored centroids / seeded hyperplanes / stored
codebooks), which is precisely what makes the cost batch-local.

Method: sf0.1 embeddings replicated 1×/2×/4×/8× with offset ids form
the standing store; the appended batch is a FIXED 500-vector slice
with fresh ids. Per scale: build the standing store (rebuild
baseline), then time one append of the batch. Wall times single-shot;
the trend is the reading.

Run: python tools/sweep_append_vec.py   (prints a markdown table)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from resin_spark.io import load_tables
from resin_spark.operators import similarity as sim
from resin_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
BATCH = 500
OFF = 10_000_000


def main() -> None:
    spark = get_spark("sweep-append-vec")
    emb = load_tables(spark, SF_DIR)["embeddings"] \
        .filter(F.col("embedding").isNotNull()).localCheckpoint()
    batch = (
        emb.limit(BATCH)
        .withColumn("vec_id", F.col("vec_id") + 9 * OFF)
        .localCheckpoint()
    )
    print("| m | standing vecs | ivf build (s) | ivf append (s) "
          "| ann build (s) | ann append (s) | pq build (s) | pq append (s) |")
    print("|---|---|---|---|---|---|---|---|")
    for m in (1, 2, 4, 8):
        parts = [emb]
        for i in range(1, m):
            parts.append(emb.withColumn("vec_id", F.col("vec_id") + OFF * i))
        standing = parts[0]
        for p in parts[1:]:
            standing = standing.unionByName(p)
        standing = standing.localCheckpoint()
        n = standing.count()
        root = tempfile.mkdtemp()
        try:
            cols = {}
            for kind, build, append in (
                ("ivf",
                 lambda pth: sim.write_ivf_index(standing, pth, n_cells=32),
                 lambda pth: sim.append_ivf_index(batch, pth)),
                ("ann",
                 lambda pth: sim.write_ann_index(standing, pth),
                 lambda pth: sim.append_ann_index(batch, pth)),
                ("pq",
                 lambda pth: sim.write_pq_index(standing, pth),
                 lambda pth: sim.append_pq_index(batch, pth)),
            ):
                pth = f"{root}/{kind}"
                t0 = time.monotonic()
                build(pth)
                tb = time.monotonic() - t0
                t0 = time.monotonic()
                append(pth)
                ta = time.monotonic() - t0
                cols[kind] = (tb, ta)
            print(f"| {m}x | {n} "
                  f"| {cols['ivf'][0]:.2f} | {cols['ivf'][1]:.2f} "
                  f"| {cols['ann'][0]:.2f} | {cols['ann'][1]:.2f} "
                  f"| {cols['pq'][0]:.2f} | {cols['pq'][1]:.2f} |")
        finally:
            shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
