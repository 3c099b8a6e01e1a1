"""r11 optimization-round measurement harness.

Three subcommands, all sharing bench.py's methodology (noop sink, warm
run discarded, min-of-N) so numbers are comparable to BENCH_LOCAL.json:

  python tools/profile_r11.py time <sf_dir> <query> [query...]
      Isolated per-query timing: min of 3 timed runs after 1 discarded
      warm run, in ONE fresh session (like a quiet-machine A/B).

  python tools/profile_r11.py plan <out_dir> <suffix> <query> [query...]
      Write .explain("formatted") of each query to
      <out_dir>/<query>_<suffix>.txt (builds the DataFrame, which for
      persisted-path entries pays the index build once).

  python tools/profile_r11.py sections <sf_dir> <card>
      Time each member section of a melt card individually (noop sink,
      min of 2 after warm) — where does the card's wall go?
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from resin_spark.io import load_tables
from resin_spark.session import get_spark


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def _time_df(build, runs=3):
    best = None
    for run in range(runs + 1):
        t0 = time.monotonic()
        _noop(build())
        el = time.monotonic() - t0
        if run > 0:
            best = el if best is None else min(best, el)
    return best


def cmd_time(sf_dir: str, names: list[str]) -> None:
    spark = get_spark("profile-r11")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    for name in names:
        spark.sparkContext.setJobDescription(f"time:{name}")
        best = _time_df(lambda: qs[name](spark, sf_dir))
        print(f"{best:8.3f}  {name}", flush=True)
    spark.stop()


def cmd_plan(out_dir: str, suffix: str, names: list[str]) -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("plan-r11")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        p = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(p, "w") as fh:
            fh.write(df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution
                .ExplainMode.fromString("formatted")))
        print(f"wrote {p}", flush=True)
    spark.stop()


def _card_sections(card: str, t):
    from resin_spark.operators import health, pipeline
    from resin_spark.operators.dedup import (dedup_threshold_curve_demo,
                                             dup_cluster_histogram)
    from resin_spark.operators.textops import search_facets, search_snippets
    from resin_spark.operators.traindata import (cdc_chunk_stats, corpus_stats,
                                                 lang_confusion, lang_stats)

    docs = t["documents"]
    if card == "curation_tuning_card":
        return {
            "mixture": lambda: pipeline.mixture_plan_demo(t),
            "mixture_applied": lambda: pipeline.apply_mixture_demo(t),
            "divergence": lambda: pipeline.source_divergence(docs),
            "lang_confusion": lambda: lang_confusion(t),
            "cdc_chunks": lambda: cdc_chunk_stats(t),
            "dedup_curve": lambda: dedup_threshold_curve_demo(t),
            "snippets": lambda: search_snippets(t),
            "facets": lambda: search_facets(t),
            "chunks": lambda: pipeline.chunk_documents_demo(t),
        }
    if card == "dataset_card_typed":
        return {
            "corpus": lambda: corpus_stats(t),
            "languages": lambda: lang_stats(t),
            "funnel": lambda: pipeline.filter_funnel(t),
            "duplication": lambda: dup_cluster_histogram(docs),
            "splits": lambda: pipeline.dataset_split(docs),
        }
    if card == "health_card_typed":
        return {
            "encoding": lambda: health.encoding_anomalies_demo(t),
            "overlap": lambda: health.source_overlap_demo(t),
            "profile": lambda: health.table_profile_demo(t),
            "drift": lambda: health.profile_drift_demo(t),
            "coverage": lambda: health.vocab_coverage_demo(t),
            "lengths": lambda: health.length_histogram_demo(t),
        }
    if card == "split_governance_card":
        from resin_spark.operators.traindata import perplexity_threshold_curve
        return {
            "splits": lambda: pipeline.dataset_split_demo(t),
            "leakage": lambda: pipeline.split_leakage(docs),
            "cluster_splits": lambda: pipeline.cluster_split(docs),
            "semantic_leakage": lambda: pipeline.semantic_split_leakage(
                t["embeddings"]),
            "perplexity_curve": lambda: perplexity_threshold_curve(t),
        }
    raise SystemExit(f"unknown card {card}")


def cmd_sections(sf_dir: str, card: str) -> None:
    spark = get_spark("profile-r11-sections")
    spark.sparkContext.setLogLevel("ERROR")
    t = load_tables(spark, sf_dir)
    sections = _card_sections(card, t)
    total = 0.0
    for name, build in sections.items():
        spark.sparkContext.setJobDescription(f"{card}:{name}")
        best = _time_df(build, runs=2)
        total += best
        print(f"{best:8.3f}  {name}", flush=True)
    print(f"{total:8.3f}  == sum of sections", flush=True)
    qs = entry_mod.queries()
    spark.sparkContext.setJobDescription(f"{card}:whole")
    best = _time_df(lambda: qs[card](spark, sf_dir), runs=2)
    print(f"{best:8.3f}  == whole card", flush=True)
    spark.stop()


if __name__ == "__main__":
    cmd = sys.argv[1]
    if cmd == "time":
        cmd_time(sys.argv[2], sys.argv[3:])
    elif cmd == "plan":
        cmd_plan(sys.argv[2], sys.argv[3], sys.argv[4:])
    elif cmd == "sections":
        cmd_sections(sys.argv[2], sys.argv[3])
    else:
        raise SystemExit(f"unknown command {cmd}")
