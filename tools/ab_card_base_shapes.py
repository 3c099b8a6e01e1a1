"""r12 three-shape single-session A/B for the card shared-base design.

Shapes, per card:
  none  — the r11 wiring: every section builds its own scan+tokenize
          (no base).
  eager — base = card_base(docs).localCheckpoint(eager=True): the
          construction barrier pays the materialisation up front.
  lazy  — base = card_base(docs).localCheckpoint(eager=False): the
          subtree is shared but materialises inside the action (the
          block-lock-convoy-prone shape under concurrency).

Usage: python tools/ab_card_base_shapes.py <card> <sf_dir> [reps=4]
       card in {dataset, curation}
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame

from resin_spark.io import load_tables
from resin_spark.operators import pipeline as P
from resin_spark.operators.dedup import (dedup_threshold_curve_demo,
                                         dup_cluster_histogram)
from resin_spark.operators.textops import (bm25_scores, search_facets,
                                           search_snippets)
from resin_spark.operators.traindata import (card_base, cdc_chunk_stats,
                                             corpus_stats, lang_confusion,
                                             lang_stats)
from resin_spark.session import get_spark


def dataset_card(t, base) -> DataFrame:
    docs = t["documents"]
    parts = [
        P._melt_typed(corpus_stats(t, base=base), "corpus", []),
        P._melt_typed(lang_stats(t, base=base), "languages", ["lang"]),
        P._melt_typed(P.filter_funnel(t, base=base), "funnel",
                      ["stage", "stage_name"]),
        P._melt_typed(dup_cluster_histogram(docs, base=base), "duplication",
                      ["cluster_size"]),
        P._melt_typed(P.dataset_split(docs, base=base), "splits",
                      ["source", "split"]),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("section", "metric", "value_num")


def curation_card(t, base) -> DataFrame:
    docs = t["documents"]
    plan = P.mixture_plan_demo(t, base=base).localCheckpoint(eager=False)
    scores = bm25_scores(t, base=base).localCheckpoint(eager=False)
    sections = {
        "mixture": plan,
        "mixture_applied": P.apply_mixture_demo(t, plan=plan, base=base),
        "divergence": P.source_divergence(docs, base=base),
        "lang_confusion": lang_confusion(t, base=base),
        "cdc_chunks": cdc_chunk_stats(t, base=base),
        "dedup_curve": dedup_threshold_curve_demo(t, base=base),
        "snippets": search_snippets(t, scores=scores, base=base),
        "facets": search_facets(t, scores=scores, base=base),
        "chunks": P.chunk_documents_demo(t, base=base),
    }
    parts = [P._melt_typed(sections[name], name, keys)
             for name, keys, _, _ in P.TUNE_SECTIONS]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("section", "metric", "value_num", "value_str")


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "dataset"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    build = dataset_card if which == "dataset" else curation_card
    spark = get_spark("ab-card-base-shapes")
    spark.sparkContext.setLogLevel("ERROR")
    t = load_tables(spark, sf_dir)
    docs = t["documents"]

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    shapes = {
        "none ": lambda: build(t, None),
        "eager": lambda: build(t, card_base(docs).localCheckpoint(eager=True)),
        "lazy ": lambda: build(t, card_base(docs).localCheckpoint(eager=False)),
    }
    for fn in shapes.values():  # warm each shape once
        noop(fn())
    acc = {k: [] for k in shapes}
    for _ in range(reps):
        for k, fn in shapes.items():
            t0 = time.monotonic(); noop(fn()); acc[k].append(time.monotonic() - t0)
    for k, xs in acc.items():
        print(f"{which} {k} min {min(xs):.3f} med {statistics.median(xs):.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
