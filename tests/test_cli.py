"""CLI surface tests: ArgumentParser parity (pure), then a full
lexicon → validatelexicon → stringcompare → truncate round-trip mirroring
the reference's command set (Resin.WikipediaCommandLine)."""

import os

import pytest

from resin_spark import cli

SF_DIR = "/root/testdata/sf0.001"


def test_parse_args_pairs():
    cmd, flags = cli.parse_args(
        ["lexicon", "--dir", "/tmp/x", "--take", "100"])
    assert cmd == "lexicon"
    assert flags == {"dir": "/tmp/x", "take": "100"}


def test_parse_args_bare_flag_before_pair():
    # ArgumentParser.cs:13-17 — value starting with "--" means the
    # previous key was a bare flag and becomes "true"
    cmd, flags = cli.parse_args(
        ["lexicon", "--truncate", "--take", "10"])
    assert flags == {"truncate": "true", "take": "10"}


def test_parse_args_trailing_valueless_key():
    # ArgumentParser.cs:20 — last key with no value parses as null
    _, flags = cli.parse_args(["lexicon", "--debug"])
    assert flags == {"debug": None}


def test_parse_args_empty_defaults_to_validate():
    cmd, flags = cli.parse_args([])
    assert cmd == "validate" and flags == {}


def test_unknown_command_exits_zero(spark):
    out = []
    assert cli.main(["nosuchcmd"], spark=spark, log=out.append) == 0
    assert any("unknown command" in line for line in out)


@pytest.fixture(scope="module")
def store_dir(tmp_path_factory):
    return str(tmp_path_factory.mktemp("cli_store"))


def test_cmd_lexicon_builds_store(spark, store_dir):
    out = []
    rc = cli.main(
        ["lexicon", "--dir", store_dir,
         "--source", os.path.join(SF_DIR, "documents.parquet"),
         "--take", "50", "--truncate"],
        spark=spark, log=out.append,
    )
    assert rc == 0
    lex = spark.read.parquet(store_dir + "/lexicon")
    assert lex.columns == ["angle_key", "token", "n_collisions"]
    n = lex.count()
    assert n > 0
    # angle keys are the lexicon's primary key
    assert lex.select("angle_key").distinct().count() == n


def test_cmd_validatelexicon(spark, store_dir):
    out = []
    rc = cli.main(
        ["validatelexicon", "--dir", store_dir,
         "--source", os.path.join(SF_DIR, "documents.parquet"),
         "--field", "text", "--take", "50"],
        spark=spark, log=out.append,
    )
    assert rc == 0
    text = "\n".join(out)
    # every sampled token was stored, so positive validation holds
    assert "positive validation result: True" in text
    assert "synthesized probe: sampled=32" in text
    # synthetic gibberish should not be fully reachable
    assert "synthetic negative validation result (should be false): False" in text


def test_cmd_stringcompare_matches_lexicon_keys(spark, store_dir):
    out = []
    rc = cli.main(
        ["stringcompare", "--str1", "hello", "--str2", "world"],
        spark=spark, log=out.append,
    )
    assert rc == 0
    line = [l for l in out if "hello" in l and "world" in l][0]
    # printed angles are the exact angle_key_udf values
    from pyspark.sql import functions as F
    from resin_spark.functions import hashing
    ak = hashing.angle_key_udf(512)
    exp = {
        r["token"]: r["angle"]
        for r in spark.createDataFrame([("hello",), ("world",)], "token string")
        .select("token", ak(F.col("token")).alias("angle")).collect()
    }
    assert f"hello: {exp['hello']} and world: {exp['world']}" == line


def test_cmd_truncate_removes_store(spark, store_dir):
    assert cli.main(
        ["truncate", "--collection", store_dir + "/lexicon"],
        spark=spark, log=lambda *_: None,
    ) == 0
    assert not os.path.exists(store_dir + "/lexicon")


@pytest.mark.full_suite
def test_cmd_validateindex_reports_and_exits_zero(spark, tmp_path):
    """validateindex: one line per check against a fresh dedup index
    (all ok), then FAILED lines after corrupting a band partition —
    exit code 0 both times (Program.cs convention: report, don't
    throw)."""
    import shutil

    from resin_spark.io import load_tables
    from resin_spark.operators import dedup

    path = str(tmp_path / "didx")
    docs = load_tables(spark, SF_DIR)["documents"].limit(60)
    dedup.write_dedup_index(docs, path)

    lines: list[str] = []
    rc = cli.main(["validateindex", "--path", path, "--kind", "dedup"],
                  spark=spark, log=lines.append)
    assert rc == 0
    assert any(l.endswith(": valid") for l in lines), lines
    assert not any("FAILED" in l for l in lines)

    shutil.rmtree(f"{path}/bands/band=1")
    lines = []
    rc = cli.main(["validateindex", "--path", path, "--kind", "dedup"],
                  spark=spark, log=lines.append)
    assert rc == 0
    assert any("FAILED" in l for l in lines), lines
    assert any("failed checks" in l for l in lines)


def test_compact_parquet_reduces_files_preserves_rows(spark, tmp_path):
    from resin_spark import io as rio
    path = str(tmp_path / "frag")
    spark.range(0, 10_000).repartition(64).write.parquet(path)
    before = spark.read.parquet(path).count()
    rep = rio.compact_parquet(spark, path, target_mb=512)
    assert rep["files_before"] >= 64
    assert rep["files_after"] < rep["files_before"]
    after = spark.read.parquet(path)
    assert after.count() == before
    assert {r["id"] for r in after.collect()} == set(range(10_000))
    # backup of the pre-swap layout exists for operator recovery
    import os
    assert os.path.exists(path + ".compact_bak")


def test_key_skew_report_flags_heavy_hitter(spark):
    from resin_spark import io as rio
    from pyspark.sql import functions as F
    df = spark.range(0, 1000).select(
        F.when(F.col("id") < 900, F.lit(7)).otherwise(F.col("id"))
        .alias("k"))
    rep = rio.key_skew_report(df, "k", top_n=3).collect()
    assert rep[0]["key_value"] == "7"
    assert rep[0]["n_rows"] == 900
    assert rep[0]["share"] == 0.9
    assert rep[0]["x_uniform"] > 80  # 900 vs ~9.9 uniform


@pytest.mark.full_suite
def test_cmd_buildindex_and_appendindex_lifecycle(spark, tmp_path):
    """buildindex → appendindex → validateindex over the text kind: the
    full index lifecycle through the CLI face, probe-equal to a direct
    rebuild; append of overlapping ids reports the refusal and exits 0
    (Program.cs convention)."""
    from pyspark.sql import functions as F

    from resin_spark.io import load_tables
    from resin_spark.operators import textindex as ti

    docs = load_tables(spark, SF_DIR)["documents"] \
        .filter(F.col("doc_id").isNotNull()).select("doc_id", "text")
    old = docs.filter(F.col("doc_id") % 2 == 0)
    new = docs.filter(F.col("doc_id") % 2 == 1)
    old.write.parquet(str(tmp_path / "old"))
    new.write.parquet(str(tmp_path / "new"))
    path = str(tmp_path / "tidx")

    lines: list[str] = []
    assert cli.main(["buildindex", "--kind", "text", "--source",
                     str(tmp_path / "old"), "--path", path],
                    spark=spark, log=lines.append) == 0
    assert any("built text index" in l for l in lines)

    lines.clear()
    assert cli.main(["appendindex", "--kind", "text", "--source",
                     str(tmp_path / "new"), "--path", path],
                    spark=spark, log=lines.append) == 0
    assert any("appended" in l for l in lines)

    full = str(tmp_path / "tidx_full")
    ti.write_text_index(docs, full)
    assert [tuple(r) for r in ti.bm25_topk_indexed(spark, path).collect()] \
        == [tuple(r) for r in ti.bm25_topk_indexed(spark, full).collect()]

    lines.clear()
    assert cli.main(["validateindex", "--path", path, "--kind", "text"],
                    spark=spark, log=lines.append) == 0
    assert any(l.endswith(": valid") for l in lines), lines

    # overlap refuses but still exits 0 through the CLI
    lines.clear()
    assert cli.main(["appendindex", "--kind", "text", "--source",
                     str(tmp_path / "new"), "--path", path],
                    spark=spark, log=lines.append) == 0
    assert any("append refused" in l for l in lines)

    # ivf builds through the CLI too (embeddings kind)
    emb = load_tables(spark, SF_DIR)["embeddings"]
    emb.write.parquet(str(tmp_path / "emb"))
    lines.clear()
    assert cli.main(["buildindex", "--kind", "ivf", "--source",
                     str(tmp_path / "emb"), "--path",
                     str(tmp_path / "ivfidx")],
                    spark=spark, log=lines.append) == 0
    lines.clear()
    assert cli.main(["validateindex", "--path", str(tmp_path / "ivfidx"),
                     "--kind", "ivf"],
                    spark=spark, log=lines.append) == 0
    assert any(l.endswith(": valid") for l in lines), lines


def test_cmd_search_bm25_and_phrase(spark, tmp_path):
    """search: BM25 ranked hits and exact-phrase hits off a persisted
    store, agreeing with the library probes."""
    from pyspark.sql import functions as F

    from resin_spark.io import load_tables
    from resin_spark.operators import textindex as ti
    from resin_spark.operators.textops import BM25_QUERY, PHRASE_QUERY

    docs = load_tables(spark, SF_DIR)["documents"]
    path = str(tmp_path / "sidx")
    ti.write_text_index(docs, path)

    lines: list[str] = []
    assert cli.main(["search", "--path", path, "--query",
                     " ".join(BM25_QUERY), "--k", "5"],
                    spark=spark, log=lines.append) == 0
    want = ti.bm25_topk_indexed(spark, path, k=5).collect()
    hits = [l for l in lines if ". doc " in l]
    assert len(hits) == len(want)
    for line, r in zip(hits, want):
        assert line.startswith(f"{r['rank']}. doc {r['doc_id']} ")

    lines.clear()
    assert cli.main(["search", "--path", path, "--phrase",
                     " ".join(PHRASE_QUERY), "--k", "5"],
                    spark=spark, log=lines.append) == 0
    wantp = ti.phrase_topk_indexed(spark, path, k=5).collect()
    hits = [l for l in lines if ". doc " in l]
    assert len(hits) == len(wantp)
    for line, r in zip(hits, wantp):
        assert line.startswith(f"{r['rank']}. doc {r['doc_id']} ")


def test_cmd_vsearch_ivf_and_ann(spark, tmp_path):
    """vsearch: ranked neighbor lines off persisted ivf and ann stores,
    agreeing with the library probes."""
    from pyspark.sql import functions as F

    from resin_spark.io import load_tables
    from resin_spark.operators import similarity as sim

    emb = load_tables(spark, SF_DIR)["embeddings"]
    emb.filter(F.col("vec_id") < 3).write.parquet(str(tmp_path / "q"))
    sim.write_ivf_index(emb, str(tmp_path / "ivf"), n_cells=16)
    sim.write_ann_index(emb, str(tmp_path / "ann"))

    for kind in ("ivf", "ann"):
        lines: list[str] = []
        assert cli.main(["vsearch", "--kind", kind, "--path",
                         str(tmp_path / kind), "--queries",
                         str(tmp_path / "q"), "--k", "3"],
                        spark=spark, log=lines.append) == 0
        hits = [l for l in lines if l.startswith("q ")]
        assert len(hits) == 9, (kind, lines)  # 3 queries x k=3
        assert "9 result row(s)" in lines


@pytest.mark.full_suite
def test_cmd_health_reports_all_three(spark, tmp_path):
    """health: anomaly, overlap and mixture reports over a parquet
    store, agreeing with the library operators' row counts."""
    from pyspark.sql import functions as F

    from resin_spark.io import load_tables
    from resin_spark.operators import health

    docs = health.corrupt_demo_docs(
        load_tables(spark, SF_DIR)["documents"]
        .filter(F.col("doc_id").isNotNull()))
    path = str(tmp_path / "docs_pq")
    docs.write.parquet(path)

    lines: list[str] = []
    assert cli.main(["health", "--docs", path, "--budget", "10000"],
                    spark=spark, log=lines.append) == 0
    text = "\n".join(lines)
    assert "-- encoding anomalies --" in text
    assert "-- source overlap --" in text
    assert "-- mixture plan (budget 10000) --" in text
    assert "-- table profile --" in text
    assert "-- cdc chunk dedup --" in text
    assert "-- source divergence --" in text
    assert len([l for l in lines if "distinct, range [" in l]) == 4
    n_sources = docs.select("source").distinct().count()
    assert len([l for l in lines if "docs flagged" in l]) == n_sources
    # ': jaccard ' is the overlap-matrix line shape; the agreement
    # report's method NAMES also contain the bare word 'jaccard'
    assert len([l for l in lines if ": jaccard " in l]) \
        == n_sources * (n_sources - 1) // 2
    assert len([l for l in lines if "-> plan" in l]) == n_sources

    lines.clear()
    assert cli.main(["health", "--docs", path, "--report", "bogus"],
                    spark=spark, log=lines.append) == 0
    assert any("unknown report" in l for l in lines)


def test_cmd_health_coverage_and_dupcurve(spark, tmp_path):
    from resin_spark.io import load_tables
    from resin_spark.operators import dedup, health

    docs = load_tables(spark, SF_DIR)["documents"]
    path = str(tmp_path / "docs_pq2")
    docs.write.parquet(path)

    lines: list[str] = []
    assert cli.main(["health", "--docs", path, "--report", "coverage"],
                    spark=spark, log=lines.append) == 0
    n_sources = docs.filter(docs.doc_id.isNotNull()) \
        .select("source").distinct().count()
    assert len([l for l in lines if ": coverage " in l]) == n_sources

    lines.clear()
    assert cli.main(["health", "--docs", path, "--report", "dupcurve"],
                    spark=spark, log=lines.append) == 0
    assert len([l for l in lines if l.startswith("tau ")]) \
        == len(dedup.CURVE_THRESHOLDS)


def test_cmd_hybrid_ranked_lines(spark):
    lines: list[str] = []
    assert cli.main(
        ["hybrid",
         "--docs", os.path.join(SF_DIR, "documents.parquet"),
         "--embeddings", os.path.join(SF_DIR, "embeddings.parquet"),
         "--k", "5"],
        spark=spark, log=lines.append) == 0
    ranked = [l for l in lines if " — rrf " in l]
    assert len(ranked) == 5 and "5 hit(s)" in lines
    # leg ranks surface in the output
    assert any("lex #" in l for l in ranked)
    assert any("vec #" in l for l in ranked)


@pytest.mark.full_suite
def test_cmd_appendindex_ivf(spark, tmp_path):
    """appendindex --kind ivf appends at the stored centroids; the
    validateindex command stays green on the appended store."""
    from resin_spark.io import load_tables
    from resin_spark.operators import similarity

    emb = load_tables(spark, SF_DIR)["embeddings"]
    path = str(tmp_path / "ivf_cli")
    similarity.write_ivf_index(emb.filter("vec_id % 2 = 0"), path,
                               n_cells=8)
    batch = str(tmp_path / "new_half")
    emb.filter("vec_id % 2 = 1").write.parquet(batch)

    lines: list[str] = []
    assert cli.main(["appendindex", "--kind", "ivf", "--source", batch,
                     "--path", path], spark=spark, log=lines.append) == 0
    assert any("appended" in l and "ivf" in l for l in lines)
    # refusing the same batch again
    lines.clear()
    assert cli.main(["appendindex", "--kind", "ivf", "--source", batch,
                     "--path", path], spark=spark, log=lines.append) == 0
    assert any("append refused" in l for l in lines)
    lines.clear()
    assert cli.main(["validateindex", "--kind", "ivf", "--path", path],
                    spark=spark, log=lines.append) == 0
    assert not any("FAIL" in l for l in lines)


def test_cmd_hybrid_mmr_flag(spark):
    lines: list[str] = []
    assert cli.main(
        ["hybrid",
         "--docs", os.path.join(SF_DIR, "documents.parquet"),
         "--embeddings", os.path.join(SF_DIR, "embeddings.parquet"),
         "--k", "5", "--mmr", "0.5"],
        spark=spark, log=lines.append) == 0
    ranked = [l for l in lines if "max sim to picked" in l]
    assert len(ranked) == 5 and "5 hit(s)" in lines


def test_cmd_hybrid_bare_trailing_mmr_flag(spark):
    """A bare trailing --mmr (parsed as None) must still trigger the
    MMR branch at the default lambda — the review-r6 regression."""
    lines: list[str] = []
    assert cli.main(
        ["hybrid",
         "--docs", os.path.join(SF_DIR, "documents.parquet"),
         "--embeddings", os.path.join(SF_DIR, "embeddings.parquet"),
         "--k", "3", "--mmr"],
        spark=spark, log=lines.append) == 0
    assert len([l for l in lines if "max sim to picked" in l]) == 3


def test_cmd_ingest_extractors_and_compare(spark, tmp_path):
    from resin_spark.io import warc_segment_bytes

    para = ("a real paragraph of article prose that comfortably clears "
            "the eighty character main-content threshold for the test")
    pages = [
        (f"https://h.test/p{i}",
         (f'<html><body><nav><a href="/">Home</a> <a href="/a">A</a> '
          f'<a href="/b">B</a></nav><p>Doc {i}: {para}</p>'
          f"<footer>All rights reserved</footer></body></html>").encode())
        for i in range(3)
    ]
    d = tmp_path / "crawl"
    d.mkdir()
    (d / "seg.warc.gz").write_bytes(warc_segment_bytes(pages))

    out = []
    rc = cli.main(["ingest", "--warc", str(d), "--out",
                   str(tmp_path / "docs_main"), "--extractor", "main",
                   "--compare"], spark=spark, log=out.append)
    assert rc == 0
    txt = "\n".join(out)
    assert "h.test: 3 docs" in txt and "extractor=main" in txt
    rows = spark.read.parquet(str(tmp_path / "docs_main")).collect()
    assert len(rows) == 3
    assert all("Home" not in r["text"]
               and "rights reserved" not in r["text"] for r in rows)
    assert all(para in r["text"] for r in rows)

    # dry run with the lossless block extractor keeps the chrome
    out2 = []
    assert cli.main(["ingest", "--warc", str(d), "--extractor", "blocks"],
                    spark=spark, log=out2.append) == 0
    assert "dry run" in "\n".join(out2)

    # unknown extractor: notice + exit 0 (Program.cs parity)
    out3 = []
    assert cli.main(["ingest", "--warc", str(d), "--extractor", "nope"],
                    spark=spark, log=out3.append) == 0
    assert any("unknown extractor" in line for line in out3)


@pytest.mark.full_suite
def test_cmd_health_healthcard_melt(spark, tmp_path):
    """health --report healthcard prints the C64 typed melt, one line
    per (section, metric) cell, matching the library relation's row
    count."""
    from pyspark.sql import functions as F

    from resin_spark.io import load_tables
    from resin_spark.operators import health

    docs = load_tables(spark, SF_DIR)["documents"] \
        .filter(F.col("doc_id").isNotNull())
    path = str(tmp_path / "docs_pq")
    docs.write.parquet(path)

    lines: list[str] = []
    assert cli.main(["health", "--docs", path, "--report", "healthcard"],
                    spark=spark, log=lines.append) == 0
    n_cells = health.health_card_typed(
        {"documents": spark.read.parquet(path)}).count()
    cell_lines = [l for l in lines if " = " in l]
    assert len(cell_lines) == n_cells
    assert any(l.startswith("coverage/") for l in cell_lines)
    assert any(l.startswith("lengths/") for l in cell_lines)


@pytest.mark.full_suite
def test_cmd_health_govcard_and_tuningcard(spark, tmp_path):
    """govcard (needs --emb) and tuningcard print their typed melts;
    govcard without --emb explains itself instead of crashing."""
    from pyspark.sql import functions as F

    from resin_spark.io import load_tables
    from resin_spark.operators import pipeline as pl

    t = load_tables(spark, SF_DIR)
    docs = t["documents"].filter(F.col("doc_id").isNotNull())
    dpath, epath = str(tmp_path / "docs_pq"), str(tmp_path / "emb_pq")
    docs.write.parquet(dpath)
    t["embeddings"].write.parquet(epath)

    lines: list[str] = []
    assert cli.main(["health", "--docs", dpath, "--report", "govcard"],
                    spark=spark, log=lines.append) == 0
    assert any("needs --emb" in l for l in lines)

    lines.clear()
    assert cli.main(["health", "--docs", dpath, "--report", "govcard",
                     "--emb", epath], spark=spark, log=lines.append) == 0
    n = pl.split_governance_card(
        {"documents": spark.read.parquet(dpath),
         "embeddings": spark.read.parquet(epath)}).count()
    assert len([l for l in lines if " = " in l]) == n

    lines.clear()
    assert cli.main(["health", "--docs", dpath, "--report", "tuningcard"],
                    spark=spark, log=lines.append) == 0
    n = pl.curation_tuning_card(
        {"documents": spark.read.parquet(dpath)}).count()
    assert len([l for l in lines if " = " in l]) == n
