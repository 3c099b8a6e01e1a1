"""Behavior tests for the curation-pipeline extras (pipeline.py).

The synthetic corpus contains no PII and little pathological
repetition, so the oracle-parity rows alone would only certify zeros;
these tests pin the actual detection/flagging semantics on crafted
documents.
"""

from __future__ import annotations

import pytest

from resin_spark.operators import pipeline


def _docs(spark, texts):
    rows = [
        (i, t, "en", f"src{i % 2}", len(t)) for i, t in enumerate(texts)
    ]
    return {
        "documents": spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        )
    }


def test_pii_redact_finds_and_redacts(spark):
    t = _docs(spark, [
        "contact Alice.B@example.com or +1 555-123-4567 today",
        "server at 10.0.0.1 and 192.168.1.255 responded",
        "nothing sensitive here at all",
    ])
    rows = {r["doc_id"]: r for r in pipeline.pii_redact(t).collect()}
    assert rows[0]["n_emails"] == 1 and rows[0]["n_phones"] == 1
    assert rows[0]["has_pii"] is True
    assert rows[1]["n_ips"] == 2 and rows[1]["n_emails"] == 0
    assert rows[2]["has_pii"] is False
    # redaction shrank doc 0 (long email+phone -> short placeholders)
    assert rows[0]["redacted_len"] < len(t["documents"].collect()[0]["text"])
    assert rows[2]["redacted_len"] == len("nothing sensitive here at all")


def test_quality_repetition_flags_degenerate_docs(spark):
    t = _docs(spark, [
        "spam spam spam spam spam spam spam spam spam spam",   # one token repeated
        "buy now buy now buy now buy now buy now buy now",     # one bigram repeated
        "a genuinely varied sentence with distinct useful words",
    ])
    rows = {r["doc_id"]: r for r in pipeline.quality_repetition(t).collect()}
    assert rows[0]["top_unigram_frac"] == 1.0 and rows[0]["flagged"] is True
    assert rows[1]["top_bigram_frac"] > 0.45 and rows[1]["flagged"] is True
    assert rows[2]["flagged"] is False
    assert rows[2]["distinct_frac"] == 1.0


def test_quality_repetition_single_token_doc(spark):
    t = _docs(spark, ["word"])
    r = pipeline.quality_repetition(t).collect()[0]
    assert r["n_tokens"] == 1
    assert r["top_bigram_frac"] is None       # no bigrams in a 1-token doc
    assert r["top_unigram_frac"] == 1.0 and r["flagged"] is True


def test_domain_mix_shares_sum_to_one(spark):
    t = _docs(spark, [
        "alpha beta gamma delta",
        "one two three",
        "lone",
    ])
    out = pipeline.domain_mix(t).collect()
    assert sum(r["n_tokens"] for r in out) == 8
    assert sum(r["token_share"] for r in out) == pytest.approx(1.0)
    for r in out:
        assert r["temp_weight"] == pytest.approx(r["n_tokens"] ** 0.5)
