"""Split-governance cost sweep (overtime r6).

Measures, at a given SF, what each split-governance op adds on top of
the stage it composes — the 100 TB question is always "what does the
NEW stage cost beside the stage I already pay for":

- dataset_split: the one-scan card (baseline: a bare count over the
  same table).
- split_leakage vs the bare D2 pair stage: labelling must be ~free
  (map-side expression, no assignment join).
- cluster_split vs split_leakage: the component loop's overhead, plus
  the loop's actual input size (paired docs only — the fraction of
  the corpus that near-dups at tau; the loop never carries the rest).
- semantic_split_leakage vs the bare D5 pair stage: same ~free
  labelling claim on the vector side.
- perplexity_threshold_curve vs quality_perplexity: the grid rollup's
  overhead on top of the scoring pass it checkpoints.

Usage: python tools/sweep_split_governance.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from resin_spark.io import load_tables  # noqa: E402
from resin_spark.operators import dedup, pipeline, traindata  # noqa: E402
from resin_spark.session import get_spark  # noqa: E402


def timed(label, fn):
    t0 = time.time()
    n = fn().count()
    dt = time.time() - t0
    print(f"{label:42s} {dt:7.2f}s  rows={n}")
    return dt, n


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("sweep-split-governance")
    t = load_tables(spark, sf_dir)
    docs, emb = t["documents"], t["embeddings"]
    print(f"== split governance @ {sf_dir} ==")

    timed("documents bare count", lambda: docs)
    timed("dataset_split (C59 card)", lambda: pipeline.dataset_split(docs))

    _, n_pairs = timed("D2 pair stage alone (LEAK_N/LEAK_TAU)",
                       lambda: dedup.ngram_jaccard_pairs(
                           docs, pipeline.LEAK_N, pipeline.LEAK_TAU))
    timed("split_leakage (D15: pairs + labels)",
          lambda: pipeline.split_leakage(docs))

    t0 = time.time()
    comp = pipeline.cluster_components(docs)
    n_docs = docs.filter("doc_id IS NOT NULL").count()
    moved = pipeline.cluster_split(docs)
    card = moved.collect()
    dt = time.time() - t0
    n_moved = sum(r["n_moved"] for r in card)
    paired = comp.filter("doc_id != component").count()
    print(f"{'cluster_split (C60: components + card)':42s} {dt:7.2f}s  "
          f"docs={n_docs} pairs={n_pairs} non-canonical={paired} "
          f"moved={n_moved}")

    timed("D5 pair stage alone (SEM_LEAK_TAU)",
          lambda: dedup.embedding_dedup_pairs(emb, pipeline.SEM_LEAK_TAU))
    timed("semantic_split_leakage (D16)",
          lambda: pipeline.semantic_split_leakage(emb))

    timed("quality_perplexity alone (C24)",
          lambda: traindata.quality_perplexity(t))
    timed("perplexity_threshold_curve (C61)",
          lambda: traindata.perplexity_threshold_curve(t))

    spark.stop()


if __name__ == "__main__":
    main()
