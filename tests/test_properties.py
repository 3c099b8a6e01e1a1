"""Property-based tests (hypothesis) for KV semantics and string hashes.

Mirrors the reference's randomized round-trip style (DoubleTests.cs KV
put/get/append/dup-key round-trips) with generated inputs instead of
fixed fixtures. Spark examples are kept small and few — the properties
do the work, not the volume.
"""

from __future__ import annotations

import pytest

import numpy as np
from hypothesis import given, settings, strategies as st

from resin_spark.functions import hashing as H
from resin_spark.operators import kv

pytestmark = pytest.mark.full_suite  # the brute-force property batteries: full tier only (VERDICT r11 item 1)


KNUTH_INIT = 3074457345618258791
KNUTH_MULT = 3074457345618258799
U64 = 1 << 64


def knuth_reference(s: str) -> int:
    """Direct transliteration of HashOperations.CalculateKnuthHash:
    foreach (char c in s) — UTF-16 code units — h = (h + c) * M."""
    h = KNUTH_INIT
    for unit in np.frombuffer(s.encode("utf-16-le"), dtype="<u2"):
        h = ((h + int(unit)) * KNUTH_MULT) % U64
    return h - U64 if h >= 1 << 63 else h


@given(st.lists(st.text(max_size=12), min_size=1, max_size=8))
@settings(max_examples=25, deadline=None)
def test_knuth_hash_matches_reference(texts):
    import pandas as pd
    got = H.knuth_hash.func(pd.Series(texts))
    for s, g in zip(texts, got):
        assert g == knuth_reference(s), repr(s)


def test_knuth_hash_non_bmp():
    """Non-BMP chars contribute two surrogate halves, exactly as C#."""
    import pandas as pd
    s = "a\U0001F600b"  # emoji: surrogate pair in UTF-16
    assert H.knuth_hash.func(pd.Series([s]))[0] == knuth_reference(s)


kv_rows = st.lists(
    st.tuples(st.integers(0, 5), st.integers(0, 100), st.integers(-50, 50)),
    min_size=1, max_size=30, unique_by=lambda r: (r[0], r[1]),
)


@given(kv_rows)
@settings(max_examples=8, deadline=None)
def test_try_put_first_wins(spark, rows):
    df = spark.createDataFrame(rows, "key long, seq long, value long")
    got = {r["key"]: (r["seq"], r["value"]) for r in kv.try_put(df).collect()}
    want = {}
    for k, s, v in sorted(rows, key=lambda r: r[1]):
        want.setdefault(k, (s, v))
    assert got == want


@given(kv_rows)
@settings(max_examples=8, deadline=None)
def test_get_many_ordered_by_seq(spark, rows):
    df = spark.createDataFrame(rows, "key long, seq long, value long")
    got = {r["key"]: (list(r["values"]), r["value_count"])
           for r in kv.get_many(df).collect()}
    want = {}
    for k, s, v in sorted(rows, key=lambda r: (r[1], r[2])):
        want.setdefault(k, []).append(v)
    assert got == {k: (vs, len(vs)) for k, vs in want.items()}


@given(st.sets(st.integers(0, 30), max_size=15),
       st.sets(st.integers(0, 30), max_size=15))
@settings(max_examples=8, deadline=None)
def test_set_ops_match_python_sets(spark, a, b):
    mk = lambda s: spark.createDataFrame([(x,) for x in s] or [(None,)],
                                         "key long").filter("key IS NOT NULL")
    da, db = mk(a), mk(b)
    assert {r["key"] for r in kv.set_union(da, db).collect()} == a | b
    assert {r["key"] for r in kv.set_intersect(da, db).collect()} == a & b
    assert {r["key"] for r in kv.set_except(da, db).collect()} == a - b


# --- time-series properties: random event sets vs brute-force oracles --------

event_rows = st.lists(
    st.tuples(st.integers(0, 3),          # user_id
              st.integers(0, 5000),       # ts offset seconds
              st.sampled_from(["signup", "click", "purchase", "view"])),
    min_size=1, max_size=40,
)


def _ev_frame(spark, rows):
    import datetime as dt
    data = [
        (i, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s), u, et, 0.0, "{}")
        for i, (u, s, et) in enumerate(rows)
    ]
    return {
        "events": spark.createDataFrame(
            data,
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        )
    }


@given(event_rows)
@settings(max_examples=12, deadline=None)
def test_asof_join_matches_bruteforce(spark, rows):
    from resin_spark.operators import timeseries
    got = {r["event_id"]: r["right_ts"]
           for r in timeseries.asof_join(_ev_frame(spark, rows)).collect()}
    # brute force: for each purchase, max click ts <= its ts, same user
    base = 1704067200
    want = {}
    for i, (u, s, et) in enumerate(rows):
        if et != "purchase":
            continue
        cands = [s2 for (u2, s2, e2) in rows if e2 == "click" and u2 == u and s2 <= s]
        want[i] = (base + max(cands)) if cands else None
    assert got == want


@given(event_rows)
@settings(max_examples=12, deadline=None)
def test_funnel_matches_bruteforce(spark, rows):
    from resin_spark.operators import timeseries
    got = {r["event_type"]: r["n_users"]
           for r in timeseries.funnel(_ev_frame(spark, rows)).collect()}

    def reaches(u, steps):
        # existence of a strictly increasing ts sequence of the step types
        prev = None
        for s in steps:
            nxt = [ts for (u2, ts, e2) in rows
                   if u2 == u and e2 == s and (prev is None or ts > prev)]
            if not nxt:
                return False
            prev = min(nxt)   # greedy earliest is complete
        return True

    users = {u for (u, _, _) in rows}
    steps = ("signup", "click", "purchase")
    for k, s in enumerate(steps):
        assert got[s] == sum(reaches(u, steps[:k + 1]) for u in users), s


@given(event_rows)
@settings(max_examples=12, deadline=None)
def test_retention_matches_bruteforce(spark, rows):
    from resin_spark.operators import timeseries
    got = {(r["cohort_day"], r["offset_days"]): r["n_users"]
           for r in timeseries.retention(_ev_frame(spark, rows)).collect()}
    base_day = 1704067200 // 86400
    days = {}
    for (u, s, _) in rows:
        days.setdefault(u, set()).add(base_day + (s // 86400))
    want = {}
    for u, ds in days.items():
        c = min(ds)
        for d in ds:
            key = (c, d - c)
            want[key] = want.get(key, 0) + 1
    assert got == want


def test_session_overlap_long_sessions_adaptive_width(spark):
    """Degenerate interval lengths: user 1 holds one multi-day session
    (events every 20 min for 50 h), users 2/3 have short sessions inside
    and outside it. The adaptive bucket width (p95 session length) keeps
    the explode fan-out bounded — the old fixed 1h grid would emit 50
    bucket rows for the long session — while the result stays exactly
    the brute-force pairwise overlap count, re-derived here with the
    same 30-min-gap sessionisation in plain Python."""
    from resin_spark.operators import timeseries

    rows = []
    # user 1: one session spanning 50 hours (20-min cadence < 30-min gap)
    rows += [(1, s, "click") for s in range(0, 50 * 3600 + 1, 1200)]
    # user 2: short session inside the long one, and one far outside
    rows += [(2, 10 * 3600 + s, "click") for s in (0, 600)]
    rows += [(2, 400 * 3600 + s, "click") for s in (0, 600)]
    # user 3: short session overlapping nothing
    rows += [(3, 200 * 3600 + s, "click") for s in (0, 300)]
    got = {(r["user_id"], r["session_start"]): r["n_concurrent"]
           for r in timeseries.session_overlap(_ev_frame(spark, rows)).collect()}

    # brute force: sessionise (gap > 30 min) then count overlapping
    # sessions of OTHER users (closed intervals)
    base = 1704067200
    by_user: dict = {}
    for (u, s, _t) in rows:
        by_user.setdefault(u, []).append(s)
    sess = []
    for u, ts in by_user.items():
        ts.sort()
        start = prev = ts[0]
        for s in ts[1:]:
            if s - prev > 30 * 60:
                sess.append((u, start, prev))
                start = s
            prev = s
        sess.append((u, start, prev))
    want = {}
    for (u, s0, e0) in sess:
        n = sum(1 for (v, s1, e1) in sess
                if v != u and s0 <= e1 and s1 <= e0)
        want[(u, base + s0)] = n
    assert got == want


def test_hll_matches_python_reference(spark):
    """The deterministic HLL registers must equal a scalar Python
    reimplementation (bucket split, leading-zero rank, register sums,
    estimate branches) on a crafted corpus with dup-heavy groups."""
    import hashlib

    from resin_spark.operators import sketch as sk

    rows = [("a", i % 37) for i in range(300)] + \
           [("b", i) for i in range(900)] + [("c", 1)]
    ev = spark.createDataFrame(
        [(t, u) for t, u in rows], "event_type string, user_id long")
    got = {r["event_type"]: (r["n_exact"], r["registers_used"],
                             r["hll_estimate"])
           for r in sk.hll_distinct({"events": ev}).collect()}

    W = 1 << 52
    groups = {}
    for t, u in rows:
        h = int(hashlib.md5(str(u).encode()).hexdigest()[:15], 16)
        b, w = h >> 52, h & (W - 1)
        regs = groups.setdefault(t, {})
        rho = 53 - len(bin(w)[2:])  # bin('0b0') -> '0' length 1 caps at 52
        regs[b] = max(regs.get(b, 0), rho)
    import math
    for t, regs in groups.items():
        used = len(regs)
        s_total = sum(1 << (52 - m) for m in regs.values()) \
            + (256 - used) * W
        e_raw = sk._HLL_NUM / float(s_total)
        zeros = 256 - used
        if e_raw <= 2.5 * 256 and zeros > 0:
            est = 256.0 * math.log(256.0 / zeros)
        else:
            est = e_raw
        exact = len({u for tt, u in rows if tt == t})
        assert got[t][0] == exact
        assert got[t][1] == used
        assert abs(got[t][2] - round(est, 6)) < 1e-9, (t, got[t][2], est)
    # sketch accuracy on the big group: within 20% at 900 distinct
    assert abs(got["b"][2] - 900) / 900 < 0.2


def test_hll_registers_merge_as_union(spark):
    """The 100 TB property: HLL over a union of two corpora equals
    max-merging the two corpora's registers — i.e. partial aggregation
    IS the sketch union, so per-shard/per-hour sketches roll up to the
    global sketch without touching raw data."""
    from resin_spark.operators import sketch as sk

    a = spark.createDataFrame(
        [("x", i) for i in range(400)], "event_type string, user_id long")
    b = spark.createDataFrame(
        [("x", i) for i in range(200, 700)], "event_type string, user_id long")
    merged = sk.hll_distinct({"events": a.unionByName(b)}).first()
    # simulate a rollup tree: registers from each side, max-merged
    import hashlib
    W = 1 << 52
    regs = {}
    for part in ([r["user_id"] for r in a.collect()],
                 [r["user_id"] for r in b.collect()]):
        for u in part:
            h = int(hashlib.md5(str(u).encode()).hexdigest()[:15], 16)
            bk, w = h >> 52, h & (W - 1)
            regs[bk] = max(regs.get(bk, 0), 53 - len(bin(w)[2:]))
    import math
    used = len(regs)
    s_total = sum(1 << (52 - m) for m in regs.values()) + (256 - used) * W
    e_raw = sk._HLL_NUM / float(s_total)
    zeros = 256 - used
    est = 256.0 * math.log(256.0 / zeros) \
        if (e_raw <= 2.5 * 256 and zeros > 0) else e_raw
    assert merged["hll_estimate"] == round(est, 6)
    assert merged["n_exact"] == 700


def test_cms_matches_python_reference_and_overestimates(spark):
    """CMS counters and estimates must equal a scalar reimplementation,
    and the estimate must never under-count (the CMS guarantee) even
    on a corpus engineered to collide (vocabulary ≫ w would force
    collisions; here we check exactness of the machinery and the
    one-sided property on a skewed corpus)."""
    import hashlib

    from resin_spark.operators import sketch as sk

    words = [f"w{i}" for i in range(50)]
    text = " ".join(w for i, w in enumerate(words) for _ in range(i + 1))
    docs = spark.createDataFrame(
        [(0, text), (1, "w49 " * 30), (2, None)],
        "doc_id long, text string")
    out = {r["tok"]: (r["exact_tf"], r["cms_estimate"])
           for r in sk.cms_heavy_hitters({"documents": docs},
                                          topk=10).collect()}

    toks = [w for i, w in enumerate(words) for _ in range(i + 1)] + ["w49"] * 30
    counters = {}
    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
    for tok in toks:
        for j in range(sk.CMS_D):
            key = (j, h60(f"{tok}@{j}") % sk.CMS_W)
            counters[key] = counters.get(key, 0) + 1
    from collections import Counter
    exact = Counter(toks)
    top10 = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert set(out) == {tok for tok, _ in top10}
    for tok, tf in top10:
        est = min(counters[(j, h60(f"{tok}@{j}") % sk.CMS_W)]
                  for j in range(sk.CMS_D))
        assert out[tok] == (tf, est)
        assert est >= tf


# --- filter_funnel vs scalar reference (hypothesis) --------------------------

_word = st.sampled_from(
    ["the", "a", "of", "and", "to", "der", "die", "und", "ist", "le",
     "la", "et", "el", "los", "de", "shi", "cat", "dog", "xyz", "q7"])
_doc = st.lists(_word, min_size=0, max_size=12).map(" ".join)
_lang = st.sampled_from(["en", "de", "fr", "es", "zh"])
funnel_docs = st.lists(st.tuples(_doc, _lang), min_size=1, max_size=12)


def _funnel_reference(rows):
    """Scalar reimplementation of pipeline.filter_funnel on
    (doc_id, text, lang) rows — cumulative stages, keep-min dedup
    among stage-3 survivors."""
    import hashlib

    from resin_spark.functions.text import LANG_PROFILES
    langs = sorted(LANG_PROFILES)
    feats = []
    for doc_id, text, lang in rows:
        tk = [t for t in __import__("re").split(r"[^a-z0-9]+",
                                                (text or "").lower()) if t]
        nt = len(tk)
        s0 = doc_id is not None and text is not None
        s1 = s0 and nt >= 5
        frac = (len(set(tk)) / nt) if nt else 0.0
        s2 = s1 and frac >= 0.3
        counts = {lg: sum(1 for t in tk if t in LANG_PROFILES[lg])
                  for lg in langs}
        best = max(counts.values()) if counts else 0
        pred = next((lg for lg in langs if counts[lg] == best), None)
        s3 = s2 and pred == lang
        h = hashlib.md5(text.encode()).hexdigest() if text is not None else None
        feats.append(dict(doc_id=doc_id, nt=nt, h=h,
                          s0=s0, s1=s1, s2=s2, s3=s3))
    for f in feats:
        surv = [g["doc_id"] for g in feats if g["s3"] and g["h"] == f["h"]]
        f["s4"] = f["s3"] and f["doc_id"] == min(surv)
    out = {}
    names = ["ingest", "length", "repetition", "langid", "dedup"]
    for i, nme in enumerate(names):
        docs_in = len(feats) if i == 0 else out[names[i - 1]][1]
        docs_out = sum(1 for f in feats if f[f"s{i}"])
        toks_out = sum(f["nt"] for f in feats if f[f"s{i}"])
        out[nme] = (docs_in, docs_out, toks_out)
    return out


@given(funnel_docs)
@settings(max_examples=8, deadline=None)
def test_filter_funnel_matches_scalar_reference(spark, docs):
    from resin_spark.operators.pipeline import filter_funnel
    rows = [(i, text, lang) for i, (text, lang) in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {r["stage_name"]: (r["docs_in"], r["docs_out"], r["tokens_out"])
           for r in filter_funnel({"documents": df}).collect()}
    assert got == _funnel_reference(rows)


@given(st.lists(
    st.tuples(st.integers(0, 30),
              st.lists(st.sampled_from(["merge", "sort", "window", "x",
                                        "join", "scan"]),
                       min_size=0, max_size=12)),
    min_size=1, max_size=12, unique_by=lambda r: r[0]))
@settings(max_examples=10, deadline=None)
def test_bm25_matches_python_reference(spark, rows):
    """bm25_scores on random small corpora must equal a scalar Python
    BM25 with the module's exact conventions: rational Okapi idf, the
    same IEEE op order, and string→decimal(28,15) HALF_UP exact sums.
    The fixed-corpus oracle checks one distribution; this checks the
    formula on arbitrary tf/df/dl combinations including all-miss and
    single-doc corpora."""
    from decimal import ROUND_HALF_UP, Decimal

    from resin_spark.operators import textops as tx

    docs = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in rows],
        "doc_id long, text string")
    got = {r["doc_id"]: (r["n_hits"], r["score"])
           for r in tx.bm25_scores({"documents": docs}).collect()}

    corpus = {i: toks for i, toks in rows}
    lens = {i: len(t) for i, t in corpus.items() if len(t) > 0}
    if not lens:
        assert got == {}
        return
    n, avgdl = len(lens), sum(lens.values()) / len(lens)
    k1, b = tx.BM25_K1, tx.BM25_B
    k11, omb = k1 + 1.0, 1.0 - b
    dfq = {q: sum(1 for t in corpus.values() if q in t)
           for q in tx.BM25_QUERY}
    want = {}
    q15 = Decimal("1e-15")
    for i, toks in corpus.items():
        if not toks:
            continue
        total, hits = Decimal(0), 0
        for q in tx.BM25_QUERY:
            tf = toks.count(q)
            if tf == 0:
                continue
            hits += 1
            idf = (float(n - dfq[q]) + 0.5) / (float(dfq[q]) + 0.5)
            denom = float(tf) + k1 * (omb + b * (float(len(toks)) / avgdl))
            s = idf * ((float(tf) * k11) / denom)
            total += Decimal(repr(s)).quantize(q15, rounding=ROUND_HALF_UP)
        if hits:
            want[i] = (hits, float(total))
    assert got == want


@given(st.lists(
    st.tuples(st.integers(0, 30),
              st.lists(st.sampled_from(["merge", "sort", "x"]),
                       min_size=0, max_size=10)),
    min_size=1, max_size=10, unique_by=lambda r: r[0]))
@settings(max_examples=10, deadline=None)
def test_phrase_search_matches_python_reference(spark, rows):
    """phrase_search occurrence counts on random token sequences must
    equal a scalar sliding-window count — including overlapping runs
    ('merge sort merge sort'), docs shorter than the phrase, and empty
    docs."""
    from resin_spark.operators import textops as tx

    docs = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in rows],
        "doc_id long, text string")
    got = {r["doc_id"]: r["n_occurrences"]
           for r in tx.phrase_search({"documents": docs}, k=100).collect()}
    phrase = list(tx.PHRASE_QUERY)
    want = {}
    for i, toks in rows:
        c = sum(1 for j in range(len(toks) - len(phrase) + 1)
                if toks[j:j + len(phrase)] == phrase)
        if c:
            want[i] = c
    assert got == want


snapshot = st.lists(
    st.tuples(st.integers(0, 15),
              st.one_of(st.none(), st.text(alphabet="abc ", max_size=6))),
    min_size=0, max_size=12, unique_by=lambda r: r[0])


@given(snapshot, snapshot)
@settings(max_examples=10, deadline=None)
def test_corpus_delta_matches_python_reference(spark, old_rows, new_rows):
    """corpus_delta status classification on random snapshot pairs must
    equal the set-theoretic reference — including null-text docs on
    either or both sides (md5(NULL) compares null-safely equal)."""
    from resin_spark.operators import pipeline as pl

    old = spark.createDataFrame(old_rows, "doc_id long, text string")
    new = spark.createDataFrame(new_rows, "doc_id long, text string")
    got = {r["doc_id"]: r["status"]
           for r in pl.corpus_delta(old, new).collect()}
    o, n = dict(old_rows), dict(new_rows)
    want = {}
    for i in set(o) | set(n):
        if i not in o:
            want[i] = "added"
        elif i not in n:
            want[i] = "removed"
        elif o[i] == n[i]:
            want[i] = "unchanged"
        else:
            want[i] = "modified"
    assert got == want


corpus = st.lists(
    st.tuples(st.integers(0, 20),
              st.one_of(st.none(),
                        st.text(alphabet="ab c", max_size=10))),
    min_size=0, max_size=10, unique_by=lambda r: r[0])


@given(corpus, st.integers(0, 20))
@settings(max_examples=6, deadline=None)
def test_append_text_index_property(spark, tmp_path_factory, rows, pivot):
    """append == rebuild on random corpora and split points — including
    empty standing indexes, empty batches, null-text docs, and batches
    whose terms touch no/few buckets."""
    from pyspark.sql import functions as F

    from resin_spark.operators import textindex as ti

    base = str(tmp_path_factory.mktemp("prop"))
    docs = spark.createDataFrame(rows, "doc_id long, text string") \
        if rows else spark.createDataFrame([], "doc_id long, text string")
    standing = docs.filter(F.col("doc_id") < pivot)
    batch = docs.filter(F.col("doc_id") >= pivot)

    ti.write_text_index(standing, f"{base}/inc", n_buckets=8)
    ti.append_text_index(batch, f"{base}/inc")
    ti.write_text_index(docs, f"{base}/full", n_buckets=8)

    pi, di, si = ti.read_text_index(spark, f"{base}/inc")
    pf, df_, sf_ = ti.read_text_index(spark, f"{base}/full")
    assert sorted((r["term"], r["doc_id"], r["tf"], tuple(r["positions"]))
                  for r in pi.collect()) == \
        sorted((r["term"], r["doc_id"], r["tf"], tuple(r["positions"]))
               for r in pf.collect())
    assert sorted(map(tuple, di.collect())) == \
        sorted(map(tuple, df_.collect()))
    assert (si is None) == (sf_ is None) or \
        (si["n_docs"], si["total_tokens"]) == \
        (sf_["n_docs"], sf_["total_tokens"])


# --- corpus-health properties -------------------------------------------------

_anom_text = st.text(
    alphabet=st.sampled_from(list("ab \n\tÃÂ�") + ["\x07", "€", "â", "™"]),
    max_size=30)


@given(st.lists(st.tuples(_anom_text, st.sampled_from(["s1", "s2"])),
                min_size=1, max_size=12))
@settings(max_examples=10, deadline=None)
def test_encoding_anomalies_matches_python_reference(spark, rows):
    """Damage counts equal a straightforward scalar Python count on
    arbitrary mixes of clean chars, marks and controls."""
    import re as _re

    from resin_spark.operators import health

    df = spark.createDataFrame(
        [(i, t, "en", s) for i, (t, s) in enumerate(rows)],
        "doc_id long, text string, lang string, source string")
    got = {r["source"]: r for r in health.encoding_anomalies(df).collect()}

    expected: dict = {}
    for t, s in rows:
        e = expected.setdefault(s, [0, 0, 0, 0, 0])  # docs, flag, repl, ctrl, moji
        n_repl = t.count("�")
        n_ctrl = len(_re.findall("[\x00-\x08\x0b\x0c\x0e-\x1f]", t))
        n_moji = t.count("Ã") + t.count("Â") + t.count("â€")
        e[0] += 1
        e[1] += 1 if n_repl + n_ctrl + n_moji > 0 else 0
        e[2] += n_repl
        e[3] += n_ctrl
        e[4] += n_moji
    assert set(got) == set(expected)
    for s, (nd, nf, nr, nc, nm) in expected.items():
        r = got[s]
        assert (r["n_docs"], r["n_flagged"], r["repl_chars"],
                r["ctrl_chars"], r["moji_marks"]) == (nd, nf, nr, nc, nm), s


_overlap_doc = st.lists(st.sampled_from("abcde"), min_size=0, max_size=8)


@given(st.lists(st.tuples(_overlap_doc, st.sampled_from(["s1", "s2", "s3"])),
                min_size=1, max_size=10))
@settings(max_examples=10, deadline=None)
def test_source_overlap_matches_python_sets(spark, rows):
    """Pairwise Jaccard equals the set-theoretic reference on random
    tiny corpora (3-gram shingles over single-char tokens)."""
    from resin_spark.operators import health

    df = spark.createDataFrame(
        [(i, " ".join(toks), "en", s) for i, (toks, s) in enumerate(rows)],
        "doc_id long, text string, lang string, source string")
    got = {(r["source_a"], r["source_b"]): r
           for r in health.source_overlap_matrix(df).collect()}

    sets: dict = {}
    for toks, s in rows:
        sh = {" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}
        sets.setdefault(s, set()).update(sh)
    srcs = sorted(sets)
    expected_pairs = {(a, b) for i, a in enumerate(srcs)
                      for b in srcs[i + 1:]}
    assert set(got) == expected_pairs
    for (a, b), r in got.items():
        inter = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        assert (r["n_a"], r["n_b"], r["n_shared"]) == (
            len(sets[a]), len(sets[b]), inter), (a, b)
        if union:
            assert abs(r["jaccard"] - inter / union) < 1e-12


_cdc_doc = st.lists(st.sampled_from("abc"), min_size=0, max_size=14)


@given(st.lists(_cdc_doc, min_size=1, max_size=8))
@settings(max_examples=10, deadline=None)
def test_cdc_chunk_stats_property(spark, docs_tokens):
    """Chunk counts/dup flags equal the scalar reference on random tiny
    corpora (small alphabet → heavy chunk collisions exercise the
    min_count path)."""
    from test_traindata import _cdc_python

    from resin_spark.operators import traindata as td

    texts = [(i, " ".join(toks)) for i, toks in enumerate(docs_tokens)]
    df = spark.createDataFrame(
        [(i, t, "en", "s") for i, t in texts],
        "doc_id long, text string, lang string, source string")
    got = {r["doc_id"]: (r["n_tokens"], r["n_chunks"], r["n_dup_chunks"])
           for r in td.cdc_chunk_stats({"documents": df}).collect()}
    assert got == _cdc_python(texts)


@given(st.lists(st.tuples(st.integers(1, 40), st.sampled_from(["a", "b", "c"])),
                min_size=1, max_size=12),
       st.integers(100, 100_000))
@settings(max_examples=10, deadline=None)
def test_mixture_plan_invariants(spark, rows, budget):
    """Shares sum to 1, the floor allocation never exceeds the budget,
    and sqrt-flattening never orders shares against token counts."""
    from resin_spark.operators import pipeline

    df = spark.createDataFrame(
        [(i, " ".join("w" for _ in range(n)), "en", s)
         for i, (n, s) in enumerate(rows)],
        "doc_id long, text string, lang string, source string")
    out = pipeline.mixture_plan(df, budget).collect()
    assert abs(sum(r["temp_share"] for r in out) - 1.0) < 1e-9
    assert abs(sum(r["token_share"] for r in out) - 1.0) < 1e-9
    assert sum(r["planned_tokens"] for r in out) <= budget
    # temperature flattening preserves the ordering of token counts
    by_tokens = sorted(out, key=lambda r: r["n_tokens"])
    shares = [r["temp_share"] for r in by_tokens]
    assert shares == sorted(shares)
    for r in out:
        assert r["n_epochs"] == -(-r["planned_tokens"] // r["n_tokens"])


# --- closing-r6 ops: RRF fusion / mixture executor / histogram ----------------

doc_rows = st.lists(
    st.tuples(st.integers(0, 40),
              st.lists(st.sampled_from(["alpha", "beta", "gamma", "delta",
                                        "epsilon", "zeta"]),
                       min_size=0, max_size=12),
              st.sampled_from(["s0", "s1", "s2"])),
    min_size=1, max_size=20, unique_by=lambda r: r[0],
)


@given(doc_rows, st.integers(2, 6))
@settings(max_examples=6, deadline=None)
def test_length_histogram_buckets_partition_and_shares_sum(spark, rows, _v):
    from resin_spark.operators import health

    df = spark.createDataFrame(
        [(i, " ".join(ws), "en", src) for i, ws, src in rows],
        "doc_id long, text string, lang string, source string")
    out = health.length_histogram(df).collect()
    # every doc's nt must land inside its bucket bounds
    for r in out:
        assert r["bucket_lo"] <= r["bucket_hi"]
        if r["bucket"] > 0:
            assert r["bucket_lo"] == 2 ** (r["bucket"] - 1)
            assert r["bucket_hi"] == 2 ** r["bucket"] - 1
    # per source: doc_share sums to 1, cumulative ends at 1
    from collections import defaultdict
    per = defaultdict(list)
    for r in out:
        per[r["source"]].append(r)
    for src, rs in per.items():
        assert abs(sum(r["doc_share"] for r in rs) - 1.0) < 1e-9
        assert rs[-1]["cum_doc_share"] == max(r["cum_doc_share"] for r in rs)
        n_total = sum(r["n_docs"] for r in rs)
        assert n_total == sum(1 for i, ws, s in rows if s == src)


@given(doc_rows, st.integers(1, 8))
@settings(max_examples=6, deadline=None)
def test_vocab_coverage_partitions_and_is_monotone_in_v(spark, rows, v):
    from resin_spark.operators import health

    df = spark.createDataFrame(
        [(i, " ".join(ws), "en", src) for i, ws, src in rows],
        "doc_id long, text string, lang string, source string")
    small = {r["source"]: r for r in health.vocab_coverage(df, v=v).collect()}
    big = {r["source"]: r
           for r in health.vocab_coverage(df, v=v + 2).collect()}
    for src, r in small.items():
        assert r["covered_tokens"] <= r["n_tokens"]
        assert r["oov_terms"] <= r["distinct_terms"]
        if r["coverage_share"] is not None:
            assert 0.0 <= r["coverage_share"] <= 1.0
            # a larger vocabulary never covers less
            assert big[src]["covered_tokens"] >= r["covered_tokens"]


@given(doc_rows, st.integers(50, 5000))
@settings(max_examples=6, deadline=None)
def test_apply_mixture_copy_bounds(spark, rows, budget):
    import math

    from resin_spark.operators import pipeline as pl

    df = spark.createDataFrame(
        [(i, " ".join(ws), "en", src) for i, ws, src in rows],
        "doc_id long, text string, lang string, source string")
    plan = {r["source"]: r for r in pl.mixture_plan(df, budget).collect()}
    out = pl.apply_mixture(df, budget).collect()
    assert len(out) == len(rows)
    for r in out:
        rate = plan[r["source"]]["sampling_rate"]
        if rate is None:
            assert r["n_copies"] == 0
        else:
            assert r["n_copies"] in (math.floor(rate), math.ceil(rate))


@given(st.integers(1, 60), st.integers(2, 12), st.integers(0, 6))
@settings(max_examples=8, deadline=None)
def test_chunk_documents_covers_and_reconstructs(spark, n, chunk, ov):
    from resin_spark.operators import pipeline as pl

    if ov >= chunk:
        ov = chunk - 1
    words = [f"w{j}" for j in range(n)]
    docs = spark.createDataFrame(
        [(1, " ".join(words), "en", "s")],
        "doc_id long, text string, lang string, source string")
    chunks = sorted(
        pl.chunk_documents(docs, chunk_tokens=chunk, overlap=ov).collect(),
        key=lambda r: r["chunk_id"])
    # every position covered, no gaps: chunk i starts inside (or right
    # after) the previous chunk's span
    assert chunks[0]["start_pos"] == 1
    for a, b in zip(chunks, chunks[1:]):
        assert b["start_pos"] <= a["start_pos"] + a["n_tokens"]
    last = chunks[-1]
    assert last["start_pos"] + last["n_tokens"] - 1 == n
    # dropping each chunk's first `overlap` tokens (except chunk 0)
    # reconstructs the document exactly
    rebuilt = chunks[0]["chunk_text"].split()
    for c in chunks[1:]:
        toks = c["chunk_text"].split()
        already = len(rebuilt) - (c["start_pos"] - 1)
        rebuilt += toks[already:]
    assert rebuilt == words


@given(st.integers(0, 10_000_000), st.integers(1, 4096))
@settings(max_examples=200, deadline=None)
def test_stream_micro_mean_half_up_matches_decimal(micro, n):
    """The streaming quality twin's integer mean — floor((2·micro+n)/(2n))
    — must equal exact decimal HALF_UP of micro/n for every non-negative
    micro-bits total (the batch side, exact.dravg, rounds the exact
    decimal quotient; a float mean loses .5-at-the-7th-digit ties —
    r7 stream-fuzz find, seed 13002)."""
    from decimal import ROUND_HALF_UP, Decimal

    got = (2 * micro + n) // (2 * n)
    want = int((Decimal(micro) / Decimal(n)).quantize(
        Decimal("1"), rounding=ROUND_HALF_UP))
    assert got == want
