"""One-command driver simulation: runs entry(), every queries() entry,
and the DuckDB oracle comparison at a chosen scale factor — the same
gate the round driver applies — and prints one correctness JSON line
per entry plus a summary.

Usage:
    python tools/driver_sim.py                  # sf0.01, all entries
    python tools/driver_sim.py sf0.001          # other scale dir name
    python tools/driver_sim.py sf0.01 kv_ ann_  # filter by key prefix

Exit code 0 iff every oracle-backed entry matches and every rows-only
entry runs. This is the standalone form of the harness
tests/test_oracle_parity.py wraps in pytest — use it when you want the
driver's view without the test runner (fresh process, plain session).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "sf0.01"
    prefixes = tuple(sys.argv[2:])
    sf_dir = f"/root/testdata/{sf}"

    from pyspark.sql import SparkSession

    import __spark_entry__ as m
    from oracle_util import compare

    spark = (
        SparkSession.builder.appName("driver-sim").master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    assert m.entry(spark).count() > 0, "entry() produced no rows"
    queries, oracles = m.queries(), m.oracle_sql()
    failed = 0
    for name, fn in queries.items():
        if prefixes and not name.startswith(prefixes):
            continue
        t0 = time.monotonic()
        rec: dict = {"key": name}
        try:
            df = fn(spark, sf_dir)
            if name in oracles:
                compare(df, oracles[name], sf_dir)
                rec.update(ok=True, mode="oracle")
            else:
                rec.update(ok=True, mode="rows_only", rows=df.count())
        except Exception as e:  # noqa: BLE001 — report and continue
            rec.update(ok=False, err=str(e)[:300])
            failed += 1
        rec["sec"] = round(time.monotonic() - t0, 2)
        print(json.dumps(rec), flush=True)
    print(json.dumps({"summary": True, "sf": sf,
                      "checked": len([k for k in queries
                                      if not prefixes
                                      or k.startswith(prefixes)]),
                      "failed": failed}))
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
