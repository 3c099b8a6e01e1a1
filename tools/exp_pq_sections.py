"""r12 section profile for ann_topk_pq (VERDICT r11 item 4).

Times the PQ pipeline's stages in one session at the driver entry's
operating point (k=10, m_sub=8, n_codes=16, rerank=100):

  probes  — the eager construction probes ann_topk_pq pays per call
            (corpus_bytes_estimate row count inside the trainer,
            _probe_dims first()) plus the driver-side toPandas sample
  train   — the 10-iteration numpy Lloyd loop per subspace (driver)
  encode  — the corpus Arrow encode pass alone (noop sink)
  adc     — encode + broadcast LUT join + ADC fold + per-query
            top-rerank window (noop sink)
  full    — the whole entry: adc + exact rerank join + final top-k

Stages nest (encode ⊂ adc ⊂ full), so stage cost is the delta between
consecutive rows. min-of-N after a discarded warm run per row.

Usage: python tools/exp_pq_sections.py <sf_dir> [reps=3]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from resin_spark.io import load_tables
from resin_spark.operators import similarity as S
from resin_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("exp-pq-sections")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_tables(spark, sf_dir)["embeddings"]
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_vec"))
    m_sub, n_codes, rerank, k, cap, seed = 8, 16, 100, 10, 100_000, 51

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    vemb = S.valid_vectors(emb, "embedding")
    vq = S.valid_vectors(queries, "q_vec")

    def do_probes():
        dims = S._probe_dims(vemb, "embedding")
        _est, n_rows, _d = S.corpus_bytes_estimate(
            vemb, "vec_id", "embedding",
            ceiling_bytes=S.BROADCAST_CEILING_BYTES)
        return dims, n_rows

    dims, n_rows = do_probes()
    print(f"corpus rows={n_rows} dims={dims}", flush=True)

    def do_train():
        return S._train_pq_codebooks(vemb, m_sub, n_codes, dims, cap, seed,
                                     "vec_id", "embedding")

    books = do_train()

    def do_encode():
        noop(vemb.select(
            F.col("vec_id"),
            S._pq_encode_udf(books)(F.col("embedding")).alias("codes")))

    def do_adc():
        encoded = vemb.select(
            F.col("vec_id"),
            S._pq_encode_udf(books)(F.col("embedding")).alias("codes"))
        return S._pq_adc_topk(encoded, books, vq, vemb, k, rerank,
                              "vec_id", "embedding", "query_id", "q_vec")

    def do_full():
        noop(S.ann_topk_pq(emb, queries, k=k, m_sub=m_sub, n_codes=n_codes,
                           rerank=rerank, sample_cap=cap, seed=seed))

    def timed(fn, n=reps):
        fn()
        vals = []
        for _ in range(n):
            t0 = time.monotonic(); fn(); vals.append(time.monotonic() - t0)
        return min(vals), statistics.median(vals)

    rows = [
        ("probes", lambda: do_probes()),
        ("train", lambda: do_train()),
        ("encode", do_encode),
        ("adc+rerank(full tail)", lambda: noop(do_adc())),
        ("full entry", do_full),
    ]
    for name, fn in rows:
        mn, md = timed(fn)
        print(f"{name:24s} min {mn:7.3f}  med {md:7.3f}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
