"""Closing-r6 operator sweep: retrieval + mixture executor + cards.

Claims under test as the corpus grows m×:

- hybrid_search_rrf: each leg is k_each-bounded BEFORE fusion, so the
  fusion stage is constant-size; total time grows with the legs' scan
  costs (linear), never with fused-relation size.
- apply_mixture: plan broadcast + one map-side scan → linear.
- vocab_coverage: one (source, term) shuffle + V-row broadcast →
  linear. With REPLICATED text the vocabulary is constant; coverage
  shares must be IDENTICAL at every m (replication adds no new terms)
  — a self-validation, not just a timing.
- length_histogram: single scan onto |sources|×≤64 groups → linear,
  and doc_share/cum_doc_share are replication-invariant too.
- dedup_threshold_curve: the pair relation is the cost; the SALTED
  variant suffixes EVERY token per replica, so replicas are
  shingle-disjoint from each other and each contributes exactly the
  base corpus's internal pair set — pairs and wall time must grow
  LINEARLY in m (replicating without salting is the known worst case:
  every replica pairs with every other at J≈1, pairs ~m² per clique,
  which the clique-collapsing operators D4/D6 absorb and the exact
  pair-emitting op by spec does not).

Method: sf0.1 documents replicated 1×/2×/4×/8× with offset ids; the
salted variant rewrites every token with a per-replica suffix so ALL
of a replica's shingles are new. Wall times single-shot; the trend is
the reading.

Run: python tools/sweep_closing_r6.py   (prints a markdown table)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from resin_spark.io import load_tables
from resin_spark.operators import dedup, health, pipeline, retrieval
from resin_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OFF = 10_000_000


def replicate(docs, m, salt):
    parts = [docs]
    for i in range(1, m):
        p = docs.withColumn("doc_id", F.col("doc_id") + OFF * i)
        if salt:
            # suffix every TOKENIZER token ([a-z0-9]+ after lower —
            # T.tokens' split), so replica i's shingle set is disjoint
            # from every other replica's. A whitespace-run salt is not
            # enough: 'a.b.c.d' keeps tokens a/b/c unchanged and a
            # trailing-only salt was measured to grow pairs ~m² via
            # cross-replica near-dups.
            p = p.withColumn(
                "text", F.regexp_replace(F.lower(F.col("text")),
                                         r"([a-z0-9]+)", f"$1r{i}"))
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
    spark = get_spark("sweep-closing-r6")
    t = load_tables(spark, SF_DIR)
    docs = t["documents"].filter(F.col("doc_id").isNotNull())
    emb = t["embeddings"]
    print("| m | rows | hybrid (s) | apply_mixture (s) | coverage (s) "
          "| cov share drift | histogram (s) | curve salted (s) "
          "| curve pairs@0.5 |")
    print("|---|---|---|---|---|---|---|---|---|" )
    base_cov = None
    for m in (1, 2, 4, 8):
        rep = replicate(docs, m, salt=False).localCheckpoint()
        salted = replicate(docs, m, salt=True).localCheckpoint()
        n = rep.count()
        tt = {"documents": rep, "embeddings": emb}
        s_hyb, _ = timed(lambda: retrieval.hybrid_search_rrf(tt))
        s_mix, n_mix = timed(lambda: pipeline.apply_mixture(rep))
        assert n_mix == n
        t0 = time.monotonic()
        cov = {r["source"]: r["coverage_share"]
               for r in health.vocab_coverage(rep).collect()}
        s_cov = time.monotonic() - t0
        if base_cov is None:
            base_cov = cov
        drift = max(abs((cov[s] or 0) - (base_cov[s] or 0))
                    for s in base_cov)
        s_hist, _ = timed(lambda: health.length_histogram(rep))
        t0 = time.monotonic()
        curve = {r["threshold"]: r["n_pairs"]
                 for r in dedup.dedup_threshold_curve(salted).collect()}
        s_curve = time.monotonic() - t0
        print(f"| {m}x | {n} | {s_hyb:.2f} | {s_mix:.2f} | {s_cov:.2f} "
              f"| {drift:.1e} | {s_hist:.2f} | {s_curve:.2f} "
              f"| {curve[0.5]} |")
    spark.stop()


if __name__ == "__main__":
    main()
