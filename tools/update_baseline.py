"""Regenerate BASELINE.md's per-query table from full bench sweeps.

The judge reads each round's BENCH_r{N}.json against BASELINE.md, but
through r7 the newest column here was r5 — the per-query 1.5x gate was
being enforced by hand against a two-round-old column (VERDICT r7
item 4). This tool rebuilds the table mechanically so adding a round
is one invocation, not table surgery:

- r4/r5 values and the per-query notes are parsed from the EXISTING
  BASELINE.md (they are the historical record; the prose around the
  table is preserved verbatim),
- later columns come from full-sweep BENCH_LOCAL-shaped JSON files
  given as `label=path` args (the driver's BENCH_r{N}.json keeps only
  the budgeted stdout tail — 71 rows — so the committed round-end
  BENCH_LOCAL.json per round is the 96-row source of truth:
  `git show <round-final-commit>:BENCH_LOCAL.json`),
- the ratio column is last/previous, flagged `**bold**` past the 1.5x
  gate so a missing stated reason is visible in the diff.

Usage:
  python tools/update_baseline.py r6=/tmp/bench_r6.json r7=BENCH_LOCAL.json
"""

from __future__ import annotations

import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASELINE = os.path.join(REPO, "BASELINE.md")
GATE = 1.5


def parse_existing(md: str):
    """(preamble, postamble, rows) — rows keyed by query name with the
    r4/r5 historical values and the free-text note."""
    lines = md.splitlines()
    start = next(i for i, l in enumerate(lines) if l.startswith("| query |"))
    end = start
    while end < len(lines) and lines[end].startswith("|"):
        end += 1
    hdr = [c.strip() for c in lines[start].strip().strip("|").split("|")]
    # column positions are resolved from the HEADER, not assumed — the
    # first regeneration changes the layout, and a positional parse of
    # the regenerated table silently duplicates later columns into
    # r4/r5 (caught r8)
    i4 = next(i for i, c in enumerate(hdr) if c.startswith("r4"))
    i5 = next(i for i, c in enumerate(hdr) if c.startswith("r5 ")
              or c == "r5 (s)" or c.startswith("r5("))
    rows: dict[str, dict] = {}
    order: list[str] = []
    for line in lines[start + 2:end]:
        cells = [c.strip() for c in line.strip().strip("|").split("|")]
        name = cells[0].strip("* ")
        if name == "total":
            continue
        rows[name] = {"r4": cells[i4], "r5": cells[i5], "note": cells[-1]}
        order.append(name)
    return "\n".join(lines[:start]), "\n".join(lines[end:]), rows, order


def main() -> None:
    sweeps: list[tuple[str, dict[str, float]]] = []
    for arg in sys.argv[1:]:
        label, path = arg.split("=", 1)
        sweeps.append((label, json.load(open(path))["queries"]))
    if not sweeps:
        sys.exit("usage: update_baseline.py r6=path.json [r7=path.json ...]")

    pre, post, rows, order = parse_existing(open(BASELINE).read())
    # registry order of the LAST sweep drives the row order: it contains
    # every currently registered entry (retired ones keep their history
    # rows at the bottom)
    last_label, last_q = sweeps[-1]
    prev_label, prev_q = (sweeps[-2] if len(sweeps) > 1
                          else (None, {}))
    all_names = list(last_q) + [n for n in order if n not in last_q]

    hdr_cols = ["query", "r4 (s)", "r5 (s)"] + [
        f"{lb} (s)" for lb, _ in sweeps]
    if prev_label:
        hdr_cols.append(f"{last_label}/{prev_label}")
    hdr_cols.append("note")
    out = ["| " + " | ".join(hdr_cols) + " |",
           "| " + " | ".join("---" for _ in hdr_cols) + " |"]
    totals = {lb: 0.0 for lb, _ in sweeps}
    for name in all_names:
        hist = rows.get(name, {"r4": "-", "r5": "-", "note": ""})
        cells = [name, hist["r4"], hist["r5"]]
        for lb, q in sweeps:
            v = q.get(name)
            cells.append(f"{v:.3f}" if v is not None else "-")
            if v is not None:
                totals[lb] += v
        if prev_label:
            a, b = last_q.get(name), prev_q.get(name)
            if a is not None and b:
                r = a / b
                cells.append(f"**{r:.2f}**" if r > GATE else f"{r:.2f}")
            else:
                cells.append("-")
        note = hist["note"]
        if name not in last_q and "retired" not in note:
            note = (note + "; " if note else "") + \
                f"retired to pytest parity after {prev_label or 'r7'}"
        cells.append(note)
        out.append("| " + " | ".join(cells) + " |")
    tot = ["**total**", "**74.5/53.2 r2/r3**", "**50.8**", "**101.3**"][:3]
    tot_cells = ["**total**", "**50.8**", "**101.3**"] + [
        f"**{totals[lb]:.1f}**" for lb, _ in sweeps]
    if prev_label:
        tot_cells.append("-")
    tot_cells.append("full-sweep totals; cross-run totals carry uniform "
                     "machine noise (see notes below)")
    out.append("| " + " | ".join(tot_cells) + " |")

    open(BASELINE, "w").write(pre + "\n" + "\n".join(out) + "\n" + post + "\n")
    print(f"BASELINE.md rewritten: {len(all_names)} rows, "
          f"columns {[lb for lb, _ in sweeps]}")


if __name__ == "__main__":
    main()
