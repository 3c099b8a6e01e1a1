"""r12 single-session alternating A/B for the session_overlap width probe.

OLD (r11 shape): adaptive bucket width resolved by an EAGER driver-side
`.first()` probe at construction time (one extra py4j round-trip + job
per action).  NEW (working tree): the width is a scalar subquery
(`DataFrame.scalar()`) evaluated inside the main action.

The old shape is reproduced inline from the r11 body (the code delta is
exactly the probe); both legs share _sessions() and the downstream pair
join, so any timing difference is the probe vs the subquery.

Usage: python tools/ab_session_overlap.py <sf_dir> [reps=5]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from resin_spark.io import load_tables
from resin_spark.operators import timeseries as TS
from resin_spark.session import get_spark


def _downstream(sess: DataFrame, buckets: DataFrame) -> DataFrame:
    a, b = buckets.alias("a"), buckets.alias("b")
    pairs = (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col("a.user_id") != F.col("b.user_id"))
               & (F.col("a.s_start") <= F.col("b.s_end"))
               & (F.col("b.s_start") <= F.col("a.s_end")))
        .select(
            F.col("a.user_id").alias("user_id"),
            F.col("a.sess_no").alias("sess_no"),
            F.col("a.s_start").alias("s_start"),
            F.col("b.user_id").alias("ouser"),
            F.col("b.sess_no").alias("osess"),
        )
        .distinct()
    )
    counts = pairs.groupBy("user_id", "sess_no", "s_start").agg(
        F.count(F.lit(1)).alias("n_concurrent"))
    return (
        sess.join(counts, ["user_id", "sess_no", "s_start"], "left")
        .select(
            "user_id",
            F.col("s_start").alias("session_start"),
            F.coalesce("n_concurrent", F.lit(0)).alias("n_concurrent"),
        )
        .orderBy("user_id", "session_start")
    )


def old_shape(t) -> DataFrame:
    sess = TS._sessions(t["events"]).localCheckpoint(eager=False)
    row = sess.agg(
        F.greatest(
            F.lit(TS._BUCKET_S),
            F.expr("percentile_approx(s_end - s_start, 0.95)").cast("long"),
        ).alias("w_bucket")
    ).first()
    w = int(row["w_bucket"]) if row and row["w_bucket"] is not None \
        else TS._BUCKET_S
    buckets = sess.withColumn(
        "bucket",
        F.explode(F.sequence(
            (F.col("s_start") / w).cast("long"),
            (F.col("s_end") / w).cast("long"),
        )),
    )
    return _downstream(sess, buckets)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark("ab-session-overlap")
    spark.sparkContext.setLogLevel("ERROR")
    t = load_tables(spark, sf_dir)

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def run_old():
        noop(old_shape(t))

    def run_new():
        noop(TS.session_overlap(t))

    # rows must agree before timing means anything
    assert TS.session_overlap(t).exceptAll(old_shape(t)).isEmpty()
    assert old_shape(t).exceptAll(TS.session_overlap(t)).isEmpty()

    run_old(); run_new()  # warm
    a, b = [], []
    for _ in range(reps):
        for fn, acc in ((run_old, a), (run_new, b)):
            t0 = time.monotonic(); fn(); acc.append(time.monotonic() - t0)
    print(f"old(eager probe)     min {min(a):.3f} med {statistics.median(a):.3f}")
    print(f"new(scalar subquery) min {min(b):.3f} med {statistics.median(b):.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
