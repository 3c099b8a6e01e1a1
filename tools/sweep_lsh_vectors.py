"""Replication sweep of the FORCED-LSH (past-the-broadcast-ceiling)
vector paths: graph_dedup, dedup_embedding, knn_classify.

Claim under test: on the bucketed route, runtime is proportional to the
CANDIDATE-PAIR volume the buckets emit, never to corpus². So each row
reports the measured candidate count next to the wall time — the ratio
runtime/candidates should stay ~flat while both grow.

Method mirrors SCALING.md's dedup sweeps: the sf0.1 embeddings table
(2,000 x 64) replicated 1x/2x/4x/8x as EXACT copies with offset
vec_ids — adversarial by construction, because every vector gains m-1
cos=1.0 partners that share ALL of its LSH buckets in every table:
bucket occupancy grows m-fold, so candidates grow ~m² while the corpus
grows m-fold. (This 2k-64k regime is ARTIFICIAL for the gate — a
corpus this size takes the broadcast-matmul route; past the real 2 GiB
ceiling (~4M vectors) adaptive_planes keeps expected occupancy ~1024
so candidate growth is linear in n. The sweep forces the bucketed
plan at toy scale to measure its work/candidate shape, k-NN capped at
4x because the m² candidate mass dominates the toy regime.)

The broadcast gate is forced open by patching corpus_bytes_estimate to
report bytes past any ceiling (the same seam tests/test_autogate.py
uses) while keeping the TRUE row count so adaptive_planes sizes the
bucket grid for the real corpus. Timings are steady-state min-of-1
after a discarded warm run, materialised with count().

Run: python tools/sweep_lsh_vectors.py   (prints a markdown table)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from resin_spark.io import load_tables
from resin_spark.operators import dedup, graph, similarity
from resin_spark.session import get_spark


def replicate(emb, m: int, offset: int = 1_000_000):
    out = emb
    for r in range(1, m):
        out = out.unionByName(
            emb.select(
                (F.col("vec_id") + r * offset).alias("vec_id"),
                "embedding", "label",
            )
        )
    return out.localCheckpoint(eager=True)


def timed(build, runs: int = 1):
    best, rows = None, None
    for run in range(runs + 1):
        t0 = time.monotonic()
        rows = build().count()
        el = time.monotonic() - t0
        if run > 0:
            best = el if best is None else min(best, el)
    return best, rows


def main() -> None:
    spark = get_spark("lsh-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    emb0 = load_tables(spark, "/root/testdata/sf0.1")["embeddings"]

    # force the bucketed route: bytes past any ceiling, true n for
    # adaptive_planes (the test_autogate seam)
    orig_est = similarity.corpus_bytes_estimate
    similarity.corpus_bytes_estimate = (
        lambda emb, *a, **kw: (1 << 60,) + orig_est(emb)[1:]
    )

    print("| m | rows | graph cands | graph_dedup | dedup cands | "
          "dedup_embedding pairs | dedup_embedding | knn cands | knn_classify |")
    print("|---|---|---|---|---|---|---|---|---|")
    for m in (1, 2, 4, 8):
        emb = replicate(emb0, m)
        n = emb.count()
        # candidate volumes of the exact stage-1 frames each operator runs
        g_cand = similarity.self_threshold_candidates_lsh(
            emb, 64, n_planes=8, n_tables=6, probe_radius=0).count()
        t_graph, kept = timed(lambda: graph.graph_dedup(emb, use_lsh=True))
        d_cand = similarity.self_threshold_candidates_lsh(emb, 64).count()
        t_ded, pairs = timed(lambda: dedup.embedding_dedup_pairs(emb, tau=0.99))
        if m <= 4:
            k_cand = similarity.self_topk_candidates_lsh(
                emb, 64, similarity.adaptive_planes(n), 8, 2).count()
            t_knn, _ = timed(lambda: similarity.knn_classify(emb, k=10))
            knn_cell = f"{k_cand} | {t_knn:.2f}s"
        else:
            knn_cell = "- | - (m² toy-regime mass; see note)"
        print(f"| {m}x | {n} | {g_cand} | {t_graph:.2f}s (kept {kept}) | "
              f"{d_cand} | {pairs} | {t_ded:.2f}s | {knn_cell} |")
        sys.stdout.flush()

    similarity.corpus_bytes_estimate = orig_est
    spark.stop()


if __name__ == "__main__":
    main()
