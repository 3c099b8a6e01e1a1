"""Window-contract audit (the check .claude/skills/verify/SKILL.md
prescribes before each round): every queries() entry PAST the driver's
50-entry verification window must be bit-identical to its last
driver-checked form — so if the module that defines an entry (or its
oracle) changed since the given git ref, that entry must sit INSIDE
the window.

Usage: python tools/audit_window.py <base-ref>
  e.g. python tools/audit_window.py 'HEAD~40'  (≈ start of the round)

Prints every tail entry whose defining module(s) changed since
<base-ref>. A clean audit prints nothing but the summary line; any
WARNING line means either re-order the dict or justify the entry's
tail comment by checking the function-level diff by hand.
"""

from __future__ import annotations

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WINDOW = 50
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def modules_of(fn) -> set[str]:
    """Repo-relative source files reachable from a queries() callable:
    its own module, any resin_spark function captured in closure cells
    (the _mk_text wrapper pattern), and any resin_spark module or
    function the wrapper references by NAME through its globals (the
    plain `def _x(spark, sf): return dedup.exact_dedup(...)` pattern —
    closure walking alone silently missed these)."""
    import types as _t

    out: set[str] = set()
    stack, seen = [fn], set()

    def add_module(mod) -> None:
        path = getattr(mod, "__file__", None)
        if path and "resin_spark" in path:
            out.add(os.path.relpath(path, REPO))

    while stack:
        f = stack.pop()
        if id(f) in seen or not callable(f):
            continue
        seen.add(id(f))
        add_module(sys.modules.get(getattr(f, "__module__", "")))
        for cell in getattr(f, "__closure__", None) or []:
            v = cell.cell_contents
            if callable(v):
                stack.append(v)
        code = getattr(f, "__code__", None)
        gl = getattr(f, "__globals__", {})
        names = tuple(getattr(code, "co_names", ()))
        for name in names:
            v = gl.get(name)
            if isinstance(v, _t.ModuleType):
                add_module(v)
                # `mod.func(...)` puts BOTH 'mod' and 'func' in
                # co_names — resolve the attribute too so the walk
                # continues into the called function's own modules
                # (one-hop stop here missed cross-module deps)
                for attr in names:
                    a = getattr(v, attr, None)
                    if callable(a):
                        stack.append(a)
            elif callable(v) and getattr(v, "__module__", "").startswith(
                    "resin_spark"):
                stack.append(v)
    return out


def main() -> None:
    if len(sys.argv) < 2:
        sys.exit("usage: audit_window.py <base-ref>")
    base = sys.argv[1]
    changed = set(
        subprocess.run(
            ["git", "diff", "--name-only", f"{base}..HEAD", "--",
             "resin_spark/", "__spark_entry__.py"],
            cwd=REPO, capture_output=True, text=True, check=True,
        ).stdout.split()
    )
    import __spark_entry__ as m

    q = m.queries()
    warned = 0
    for i, (name, fn) in enumerate(q.items()):
        if i < WINDOW:
            continue
        # __spark_entry__ itself changes every time an entry is added —
        # only flag tail entries whose OPERATOR module changed
        hits = sorted((modules_of(fn) & changed) - {"__spark_entry__.py"})
        if hits:
            warned += 1
            print(f"WARNING tail[{i}] {name}: module(s) changed since "
                  f"{base}: {', '.join(hits)} — re-window or justify")
    print(f"audited {len(q)} entries, window={WINDOW}, "
          f"tail={len(q) - WINDOW}, warnings={warned}")


if __name__ == "__main__":
    main()
