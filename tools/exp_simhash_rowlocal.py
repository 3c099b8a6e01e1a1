"""Single-session A/B: row-local simhash (HOF aggregate, no explode /
no Exchange) vs the committed explode + 60-agg groupBy shape.

Checks bit-identity of the simhash relation first, then alternates
noop-sink timings in ONE session — the only measurement this host's
cross-session noise permits (OPTIMIZATION_r11 methodology).
"""
from __future__ import annotations

import gc
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from resin_spark.functions import text as T
from resin_spark.io import load_tables
from resin_spark.operators import dedup
from resin_spark.operators.dedup import N_BITS, _token_hash60
from resin_spark.session import get_spark

SF_DIR = f"/root/testdata/{sys.argv[1] if len(sys.argv) > 1 else 'sf0.1'}"

def simhash_rowlocal(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """simhash as a pure per-row projection: the fingerprint depends only
    on the row's own distinct-token set, so no explode, no shuffle."""
    POWERS = F.array(*[F.lit(1 << j).cast("long") for j in range(N_BITS)])
    base = (
        docs.select(F.col(id_col).alias("doc_id"),
                    T.tokens(text_col).alias("tk"))
        .filter(F.size("tk") >= 1)
    )
    hs = F.transform(F.array_distinct(F.col("tk")), _token_hash60)
    counts = F.aggregate(
        hs,
        F.array_repeat(F.lit(0), N_BITS),
        lambda acc, h: F.zip_with(
            acc, POWERS,
            lambda c, p: c + F.when(h.bitwiseAND(p) != 0, 1).otherwise(-1),
        ),
    )
    sim = F.aggregate(
        F.zip_with(counts, POWERS,
                   lambda c, p: F.when(c > 0, p).otherwise(F.lit(0).cast("long"))),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    return base.select("doc_id", sim.alias("simhash"))


def main() -> None:
    spark = get_spark("exp-simhash-rowlocal")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_tables(spark, SF_DIR)["documents"]

    old = dedup.simhash(docs)
    new = simhash_rowlocal(docs)

    d1 = old.exceptAll(new).count()
    d2 = new.exceptAll(old).count()
    print(f"IDENTITY exceptAll old-new={d1} new-old={d2}", flush=True)
    if d1 or d2:
        print("NOT BIT-IDENTICAL — abort timing")
        sys.exit(1)

    def t(df: DataFrame) -> float:
        gc.collect()
        t0 = time.monotonic()
        df.write.format("noop").mode("overwrite").save()
        return time.monotonic() - t0

    t(old); t(new)  # discarded warm runs
    res: dict[str, list[float]] = {"old": [], "new": []}
    for _ in range(4):
        res["old"].append(t(dedup.simhash(docs)))
        res["new"].append(t(simhash_rowlocal(docs)))
    for k, v in res.items():
        print(f"simhash-only {k}: min {min(v):.2f} med {sorted(v)[len(v)//2]:.2f}"
              f" runs {[round(x, 2) for x in v]}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
