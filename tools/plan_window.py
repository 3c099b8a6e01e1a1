"""Mechanical window planner for the next round's queries() re-order.

The §6 window priority (red > edited > rotation-due > promotions) and
the two-round rotation invariant are both mechanical — this tool
computes the whole proposed ordering so the forced re-window stops
being a hand-built list (the r7 re-window consumed a session's worth
of cross-checking; the r8 one is due the moment CORRECTNESS_r07
lands).

Inputs:
- the CURRENT registry (__spark_entry__.queries()),
- the LATEST CORRECTNESS artifact (its keys are last round's window =
  the entries allowed to ride the coming round's tail; everything
  else is rotation-DUE),
- a base ref (last round's final commit) — entries whose reachable
  function/constant/oracle AST changed since it are EDITED and must
  re-window regardless of cohort (audit_window's machinery, reused),
- the §6 promotion queue and retirement slate (encoded below, one
  place to edit when §6 changes).

Output: the proposed key order (ready to paste as the queries() dict
order), slack accounting, and the §6 retirement checklist. Exit 1 if
the plan is infeasible (red + edited + due > WINDOW) — that means a
deliberate decision is needed (retire more, or defer an edit), not a
bigger window.

Usage: python tools/plan_window.py <base-ref>
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from audit_window import (  # noqa: E402
    WINDOW, REPO, _load_defs, oracle_callables, reachable,
)

# --- §6 policy state (SURVEY.md; edit HERE when the policy changes) ----------

# Judge-ranked promotion queue, highest verified-surface-per-slot first.
# r9 registered cluster_split / shard_manifest / warc_ingest /
# ann_topk_ivf_indexed / q4 / q22 / health_card_typed /
# split_governance_card / boilerplate_card. The health and governance
# melts transitively pin encoding_anomalies, source_overlap_matrix,
# table_profile, profile_drift, vocab_coverage, length_histogram,
# dataset_split, split_leakage, semantic_split_leakage and
# perplexity_threshold_curve — those stay parity-green in pytest and
# no longer need their own slots. The queue below is the r10+ order
# over the remaining truly-unpinned staged ops.
PROMOTION_QUEUE = [
    "mixture_plan", "lang_confusion", "cdc_chunk_stats",
    "source_divergence", "dup_cluster_histogram",
    "dedup_threshold_curve", "apply_mixture",
    "chunk_documents", "search_snippets", "search_facets",
]

# Entries that retire to retired_queries() once the latest artifact
# shows them green (§6 item 3: their fix/verification condition met).
# r8 retired four mm_* + phrase_topk_indexed; r9 retired corpus_stats
# + lang_stats + filter_funnel (nested verbatim in dataset_card_typed's
# r8-green slot, section-equality pins as the row-identity license).
# §6 allows a new entry here only with a pinned row-identical twin (or
# verbatim-nesting melt) already driver-checked.
RETIREMENT_SLATE: list[str] = []


def _latest_artifact():
    arts = sorted(
        glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")),
        key=lambda p: int(re.search(r"r(\d+)", os.path.basename(p)).group(1)))
    if not arts:
        sys.exit("no CORRECTNESS_r*.json artifact found")
    with open(arts[-1]) as fh:
        return os.path.basename(arts[-1]), json.load(fh)


def _edited_entries(m, q, base: str) -> dict[str, list[str]]:
    """name -> list of changed reachable symbols, vs base ref."""
    cache: dict = {}
    oracles = oracle_callables(os.path.join(REPO, "__spark_entry__.py"))
    out: dict[str, list[str]] = {}
    for name, fn in q.items():
        funcs, consts = reachable(fn)
        osym = oracles.get(name)
        if osym is not None:
            ofn = getattr(getattr(m, osym[0], None), osym[1], None)
            if callable(ofn):
                of, oc = reachable(ofn)
                funcs |= of
                consts |= oc
        diffs: list[str] = []
        for rel, sym in sorted(funcs):
            if rel == "__spark_entry__.py":
                continue
            now = _load_defs(cache, rel, None)
            was = _load_defs(cache, rel, base)
            if (now.defs.get(sym) if now else None) != \
                    (was.defs.get(sym) if was else None):
                diffs.append(f"def {rel}:{sym}")
        for rel, sym in sorted(consts):
            if rel == "__spark_entry__.py":
                continue
            now = _load_defs(cache, rel, None)
            was = _load_defs(cache, rel, base)
            if now is None or sym not in now.assigns:
                continue
            if was is None or now.assigns[sym] != was.assigns.get(sym):
                diffs.append(f"const {rel}:{sym}")
        if diffs:
            out[name] = diffs
    return out


def main() -> int:
    if len(sys.argv) < 2:
        sys.exit("usage: plan_window.py <base-ref (last round's final commit)>")
    base = sys.argv[1]
    import __spark_entry__ as m

    art_name, art = _latest_artifact()
    q = m.queries()
    registered = list(q)

    # err == "no_oracle" is the rows-only sentinel (declared design,
    # VERDICT-accepted), not a failure
    red = [k for k in registered
           if k in art and ((art[k].get("err")
                             and art[k]["err"] != "no_oracle")
                            or art[k].get("rows_match") is False
                            or art[k].get("schema_match") is False
                            or art[k].get("hash_match") is False)]
    retire = [k for k in RETIREMENT_SLATE
              if k in registered and k in art and k not in red]
    if retire:
        print(f"# §6 retirement slate — green in {art_name}, move to "
              f"retired_queries()/retired_oracle_sql():")
        for k in retire:
            print(f"#   retire: {k}")
    keep = [k for k in registered if k not in retire]

    due = [k for k in keep if k not in art]
    edited_map = _edited_entries(
        m, {k: q[k] for k in keep}, base)
    edited = [k for k in keep if k in edited_map and k not in due
              and k not in red]

    window: list[str] = []
    for bucket in (red, edited, due):
        for k in bucket:
            if k not in window:
                window.append(k)
    if len(window) > WINDOW:
        print(f"INFEASIBLE: red({len(red)}) + edited({len(edited)}) + "
              f"due({len(due)}) = {len(window)} > {WINDOW}. Retire more, "
              f"defer an edit (window-contract revert-and-defer recipe), "
              f"or accept a deliberate contract exception IN WRITING.")
        for k in edited:
            print(f"  edited {k}: {', '.join(edited_map[k][:4])}")
        return 1

    slack = WINDOW - len(window)
    promos = [k for k in PROMOTION_QUEUE
              if k not in window and k not in registered][:slack]
    print(f"# window plan vs {base} / {art_name}: "
          f"{len(red)} red + {len(edited)} edited + {len(due)} due "
          f"= {len(window)}; slack {slack} -> {len(promos)} promotions")
    for k in edited:
        print(f"#   edited: {k} ({', '.join(edited_map[k][:3])})")
    for k in promos:
        print(f"#   promote (register + slot): {k}")
    tail = [k for k in keep if k not in window]
    order = window + promos + tail
    print("# proposed queries() key order "
          f"({len(window) + len(promos)}-entry window, {len(tail)} tail):")
    print(json.dumps(order, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
