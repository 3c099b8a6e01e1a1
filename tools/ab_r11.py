"""One-session alternating A/B for env-gated code variants (r11).

Usage: python tools/ab_r11.py <sf_dir> <query> <ENV_VAR> [reps=4]

Builds the query DataFrame with ENV_VAR unset (A) and =1 (B),
alternating A,B,A,B,... in ONE session (noop sink), reporting min and
median per variant — same-session alternation cancels the machine-state
noise that defeats fresh-session comparisons.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from resin_spark.session import get_spark


def main() -> None:
    sf_dir, name, env = sys.argv[1], sys.argv[2], sys.argv[3]
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 4
    # env may be "VAR" (B sets VAR=1) or "VAR=value" (A sets it, B unsets)
    if "=" in env:
        var, val = env.split("=", 1)
        a_sets = True
    else:
        var, val, a_sets = env, "1", False
    spark = get_spark("ab-r11")
    spark.sparkContext.setLogLevel("ERROR")
    fn = entry_mod.queries()[name]
    times: dict[str, list[float]] = {"A": [], "B": []}
    # one discarded warm run per variant
    import gc
    for variant in ("A", "B", *("AB" * reps)):
        gc.collect()  # release prior runs' localCheckpoint RDDs (bench.py does the same)
        if (variant == "B") != a_sets:
            os.environ[var] = val
        else:
            os.environ.pop(var, None)
        t0 = time.monotonic()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        el = time.monotonic() - t0
        times[variant].append(el)
    for v in ("A", "B"):
        timed = times[v][1:]  # drop the warm run
        print(f"{v}: min {min(timed):.3f}  med {statistics.median(timed):.3f}"
              f"  runs {[round(x, 2) for x in timed]}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
