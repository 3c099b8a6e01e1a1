"""r12 single-session alternating A/B for the curation card shared base.

OLD (r11 shape): nine sections each build their own documents
scan + tokenize subtree (plan/scores shared, no base) — reproduced
inline below from the r11 card body.  NEW (working tree): ONE eager
card_base localCheckpoint feeds every section (the dataset_card
precedent, commit bd9d9f4).

Usage: python tools/ab_curation_base.py <sf_dir> [reps=4]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame

import __spark_entry__ as entry_mod
from resin_spark.io import load_tables
from resin_spark.operators import pipeline as P
from resin_spark.operators.dedup import dedup_threshold_curve_demo
from resin_spark.operators.textops import (bm25_scores, search_facets,
                                           search_snippets)
from resin_spark.operators.traindata import cdc_chunk_stats, lang_confusion
from resin_spark.session import get_spark


def old_card(t) -> DataFrame:
    docs = t["documents"]
    plan = P.mixture_plan_demo(t).localCheckpoint(eager=False)
    scores = bm25_scores(t).localCheckpoint(eager=False)
    sections = {
        "mixture": plan,
        "mixture_applied": P.apply_mixture_demo(t, plan=plan),
        "divergence": P.source_divergence(docs),
        "lang_confusion": lang_confusion(t),
        "cdc_chunks": cdc_chunk_stats(t),
        "dedup_curve": dedup_threshold_curve_demo(t),
        "snippets": search_snippets(t, scores=scores),
        "facets": search_facets(t, scores=scores),
        "chunks": P.chunk_documents_demo(t),
    }
    parts = [P._melt_typed(sections[name], name, keys)
             for name, keys, _, _ in P.TUNE_SECTIONS]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("section", "metric", "value_num", "value_str")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark("ab-curation-base")
    spark.sparkContext.setLogLevel("ERROR")
    t = load_tables(spark, sf_dir)

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def run_old():
        noop(old_card(t))

    def run_new():
        noop(P.curation_tuning_card(t))

    assert P.curation_tuning_card(t).exceptAll(old_card(t)).isEmpty()
    assert old_card(t).exceptAll(P.curation_tuning_card(t)).isEmpty()

    run_old(); run_new()  # warm
    a, b = [], []
    for _ in range(reps):
        for fn, acc in ((run_old, a), (run_new, b)):
            t0 = time.monotonic(); fn(); acc.append(time.monotonic() - t0)
    print(f"old(per-section tokenize) min {min(a):.3f} med {statistics.median(a):.3f}")
    print(f"new(shared eager base)    min {min(b):.3f} med {statistics.median(b):.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
