"""End-to-end continuous-ingest cycle over the persisted stores — the
production loop a crawl pipeline runs, composed from the library APIs
exactly as a user would:

  crawl N+1 arrives
    → corpus_delta vs the standing snapshot      (what changed?)
    → incremental_dedup_indexed on the ADDED docs (near-dup gate
      against the standing dedup index)
    → survivors append into BOTH standing indexes
      (append_dedup_index + append_text_index)
    → probes over the appended stores equal full rebuilds; validators
      green

Each step is individually driver/pytest-checked elsewhere; this test
pins that they COMPOSE — ids, schemas, and store contracts line up
across the whole loop."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from resin_spark.io import load_tables
from resin_spark.operators import dedup, pipeline, textindex as ti, validate

pytestmark = pytest.mark.full_suite  # end-to-end persisted-store cycles: full tier only (VERDICT r11 item 1)


SF = "/root/testdata/sf0.001"


def test_continuous_ingest_cycle(spark, tmp_path):
    docs = load_tables(spark, SF)["documents"] \
        .filter(F.col("doc_id").isNotNull()).select("doc_id", "text")

    # standing corpus = crawl 0; its indexes are the standing state
    standing = docs.filter(F.col("doc_id") % 4 != 3).localCheckpoint()
    tpath, dpath = str(tmp_path / "text"), str(tmp_path / "dedup")
    ti.write_text_index(standing, tpath)
    dedup.write_dedup_index(standing, dpath)

    # crawl 1 = standing plus fresh docs: some genuinely new text, some
    # near-copies of standing docs (the dup-mass a re-crawl drags in)
    fresh = docs.filter(F.col("doc_id") % 4 == 3).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat_ws(" ", "text", F.lit("brand new crawl")).alias("text"))
    copies = standing.limit(20).select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"), "text")
    crawl1 = standing.unionByName(fresh).unionByName(copies)

    # 1. what changed?
    delta = pipeline.corpus_delta(standing, crawl1)
    by_status = {r["status"]: r["n_docs"]
                 for r in delta.groupBy("status")
                 .agg(F.count(F.lit(1)).alias("n_docs")).collect()}
    n_added = fresh.count() + copies.count()
    assert by_status.get("added", 0) == n_added
    assert by_status.get("removed", 0) == 0
    assert by_status.get("modified", 0) == 0
    added_ids = delta.filter(F.col("status") == "added").select("doc_id")

    # 2. near-dup gate: the added docs against the STANDING dedup index
    added_docs = crawl1.join(added_ids, "doc_id").localCheckpoint()
    idx_hashes, idx_bands = dedup.read_dedup_index(spark, dpath)
    verdicts = dedup.incremental_dedup_indexed(
        added_docs, idx_hashes, idx_bands)
    flagged = verdicts.filter("is_dup").collect()
    dup_ids = {r["doc_id"] for r in flagged}
    # every verbatim copy must be caught (best match at jaccard 1.0,
    # pointing back into the standing corpus)...
    copy_rows = {r["doc_id"]: r for r in flagged
                 if r["doc_id"] >= 2_000_000}
    copy_ids = {r["doc_id"] for r in copies.select("doc_id").collect()}
    assert copy_ids == set(copy_rows)
    standing_ids = {r["doc_id"] for r in standing.select("doc_id").collect()}
    for r in copy_rows.values():
        assert r["best_jaccard"] == 1.0 and r["best_match"] in standing_ids
    # ...and every flagged doc (the corpus carries organic near-dups,
    # so some genuinely-fresh text may rightly match too) clears the
    # exact-Jaccard bar against a standing doc — no false positives
    for r in flagged:
        assert r["best_jaccard"] >= 0.5 and r["best_match"] in standing_ids
    fresh_ids = {r["doc_id"] for r in fresh.select("doc_id").collect()}
    assert fresh_ids - dup_ids, "every fresh doc flagged — gate broken"

    # 3. survivors append into both standing stores
    survivors = added_docs.filter(
        ~F.col("doc_id").isin(list(dup_ids))).localCheckpoint()
    ti.append_text_index(survivors, tpath)
    dedup.append_dedup_index(survivors, dpath)

    # 4. the appended stores equal rebuilds over standing ∪ survivors
    final_corpus = standing.unionByName(survivors)
    ti.write_text_index(final_corpus, str(tmp_path / "text_full"))
    assert [tuple(r) for r in ti.bm25_topk_indexed(spark, tpath).collect()] \
        == [tuple(r) for r in ti.bm25_topk_indexed(
            spark, str(tmp_path / "text_full")).collect()]
    assert [tuple(r) for r in ti.phrase_topk_indexed(spark, tpath).collect()] \
        == [tuple(r) for r in ti.phrase_topk_indexed(
            spark, str(tmp_path / "text_full")).collect()]

    for path, kind in ((tpath, "text"), (dpath, "dedup")):
        res = {r["check"]: r["ok"]
               for r in validate.validate_index(spark, path, kind).collect()}
        assert all(res.values()), (kind, res)

    # 5. next crawl's gate sees the survivors: a copy of a survivor is
    # now a dup even though it missed crawl 0
    idx_hashes2, idx_bands2 = dedup.read_dedup_index(spark, dpath)
    recopy = survivors.limit(5).select(
        (F.col("doc_id") + 3_000_000).alias("doc_id"), "text")
    v2 = dedup.incremental_dedup_indexed(recopy, idx_hashes2, idx_bands2)
    assert v2.filter("is_dup").count() == recopy.count()


def test_vector_ingest_cycle_serves_hybrid(spark, tmp_path):
    """The vector-side ingest loop: stores built on the standing half,
    a crawl's embeddings appended at frozen training state, validators
    green, and the SERVED fused page (hybrid_search_indexed over the
    appended stores at complete probe) equals the direct computation
    over the full corpus — append + serve compose end-to-end."""
    from resin_spark.operators import retrieval, similarity

    t = load_tables(spark, SF)
    docs, emb = t["documents"], t["embeddings"]
    old = emb.filter("vec_id % 2 = 0")
    new = emb.filter("vec_id % 2 = 1")

    tpath = str(tmp_path / "text_store")
    vpath = str(tmp_path / "ivf_store")
    ti.write_text_index(docs, tpath)
    similarity.write_ivf_index(old, vpath, n_cells=16)
    similarity.append_ivf_index(new, vpath)

    rep = validate.validate_ivf_index(spark, vpath)
    assert all(r["ok"] for r in rep.collect())

    served = [tuple(r) for r in retrieval.hybrid_search_indexed(
        spark, tpath, vpath).collect()]
    direct = [tuple(r) for r in retrieval.hybrid_search_demo(t).collect()]
    assert served == direct and served


def _warc_seg(recs):
    import gzip
    return b"".join(gzip.compress(r) for r in recs)


def _rec(uri, html, date=b"2026-01-01T00:00:00Z"):
    payload = b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8" \
              b"\r\n\r\n" + html
    h = [b"WARC/1.0",
         b"WARC-Type: response",
         b"WARC-Date: " + date,
         b"WARC-Target-URI: " + uri.encode(),
         b"Content-Length: " + str(len(payload)).encode()]
    return b"\r\n".join(h) + b"\r\n\r\n" + payload + b"\r\n\r\n"


def test_crawl_to_curated_cycle(spark, tmp_path):
    """The documents-side production loop, composed from the library
    APIs exactly as a user would: WARC segments → extracted documents
    frame → exact dedup → quality gate → deterministic split card.
    Each stage is pinned elsewhere; this pins that they COMPOSE on
    real crawl bytes (ids, schemas, NULL conventions line up)."""
    from resin_spark.io import read_warc
    from resin_spark.operators import dedup as dd
    from resin_spark.operators.extract import warc_extract_text
    from resin_spark.operators.textops import quality_score

    long_body = ("the quick brown fox jumps over a lazy dog and then "
                 "some more plain words follow here to pass the gate "
                 "with a few stopwords in the mix for the ratio").encode()
    seg = _warc_seg([
        _rec("https://a.example/1", b"<p>" + long_body + b"</p>"),
        # byte-identical re-crawl of the same page at a later date:
        # new doc_id (date is in the id), caught by exact dedup
        _rec("https://a.example/1", b"<p>" + long_body + b"</p>",
             date=b"2026-02-01T00:00:00Z"),
        _rec("https://a.example/2", b"<script>x</script><p>!!!</p>"),
        _rec("https://a.example/3", b"<p>short</p>"),
    ])
    (tmp_path / "crawl").mkdir()
    (tmp_path / "crawl" / "seg.warc.gz").write_bytes(seg)

    docs = warc_extract_text(read_warc(spark, str(tmp_path / "crawl"))) \
        .localCheckpoint()
    assert docs.count() == 4

    # exact dedup flags the re-crawl pair; keeper is min doc_id
    kept = dd.exact_dedup(docs).collect()
    assert len(kept) == 3
    assert sum(r["n_copies"] for r in kept) == 4  # the re-crawl collapsed
    survivors = {r["keep_id"] for r in kept}
    docs = docs.join(
        spark.createDataFrame([(d,) for d in survivors], "doc_id long"),
        "doc_id")

    # quality gate: the long doc passes, punctuation-only and too-short fail
    q = {r["doc_id"]: r["quality_ok"]
         for r in quality_score({"documents": docs}).collect()}
    assert sum(q.values()) == 1

    curated = docs.join(
        spark.createDataFrame([(d,) for d, ok in q.items() if ok],
                              "doc_id long"), "doc_id")

    # the split card runs on the curated frame unchanged — shares sum
    # to 1 per source and every curated doc is counted exactly once
    from resin_spark.operators.pipeline import dataset_split
    card = dataset_split(curated).collect()
    assert sum(r["n_docs"] for r in card) == curated.count() == 1
    assert abs(sum(r["doc_share"] for r in card) - 1.0) < 1e-12


def test_warc_ingest_demo_roundtrip(spark):
    """The staged r8 driver demo (__spark_entry__._warc_ingest): a
    bounded documents slice exported via io.warc_segment_bytes and
    re-ingested through read_warc → warc_extract_text must reproduce
    every document's text exactly up to the extractor's whitespace
    normalisation, keyed by the synthesised url."""
    import re

    import __spark_entry__ as entry_mod
    from resin_spark.io import load_tables

    sf = "/root/testdata/sf0.001"
    out = {r["url"]: r["text"]
           for r in entry_mod._warc_ingest(spark, sf).collect()}
    src = (load_tables(spark, sf)["documents"]
           .filter("doc_id IS NOT NULL AND text IS NOT NULL")
           .orderBy("doc_id").limit(40).collect())
    assert len(out) == len(src) == 40
    ws = re.compile(r"\s+")
    for r in src:
        url = f"http://corpus.local/doc/{r['doc_id']}"
        assert out[url] == ws.sub(" ", r["text"]).strip(), url
