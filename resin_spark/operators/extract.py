"""Crawl-payload text extraction (SURVEY.md H14's downstream half).

read_warc lands (payload: binary) rows; this module turns a crawl
response into a documents-shaped frame the WHOLE existing pipeline
consumes unchanged (quality scores, dedup, splits, packing): strip the
HTTP envelope, decode by the declared charset, extract visible text
with the stdlib HTMLParser (no third-party parser in this container —
and none needed: script/style/comment suppression plus entity decoding
covers the crawl-extraction baseline; a trafilatura-class extractor
drops into ``html_to_text`` behind the same signature).

Everything here is row-local Python over Arrow batches — the correct
shape for parse work Spark expressions can't express — and the output
is pure columns, so the moment extraction ends, the plan is back on
the JVM side.
"""

from __future__ import annotations

import re
from collections.abc import Iterator
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_CHARSET_RE = re.compile(rb"charset=([A-Za-z0-9_\-]+)", re.I)
_WS_RE = re.compile(r"\s+")


def http_split(payload: bytes) -> tuple[bytes, bytes]:
    """(header-block, body) of an HTTP message; a payload with no
    header terminator is treated as all body (some crawlers store the
    bare entity)."""
    sep = payload.find(b"\r\n\r\n")
    if sep < 0:
        return b"", payload
    return payload[:sep], payload[sep + 4:]


class _TextCollector(HTMLParser):
    _SKIP = {"script", "style", "template", "noscript"}

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._depth = 0
        self.parts: list[str] = []

    def handle_starttag(self, tag, attrs):
        if tag in self._SKIP:
            self._depth += 1

    def handle_endtag(self, tag):
        if tag in self._SKIP and self._depth > 0:
            self._depth -= 1

    def handle_data(self, data):
        if self._depth == 0 and data.strip():
            self.parts.append(data)


def html_to_text(html: str) -> str:
    """Visible text of an HTML document: tags dropped, script/style/
    template/noscript subtrees suppressed, character references decoded
    (convert_charrefs), whitespace normalised to single spaces."""
    p = _TextCollector()
    p.feed(html)
    p.close()
    return _WS_RE.sub(" ", " ".join(p.parts)).strip()


def _decode(body: bytes, header: bytes) -> str:
    m = _CHARSET_RE.search(header)
    if m:
        try:
            return body.decode(m.group(1).decode("ascii"), errors="replace")
        except LookupError:
            pass
    return body.decode("utf-8", errors="replace")


def warc_extract_text(warc: DataFrame) -> DataFrame:
    """WARC response rows → documents-shaped frame: (doc_id, url, text,
    n_chars, source). doc_id is xxhash64(url || warc_date) — computed
    JVM-side AFTER extraction, deterministic across runs/partitionings
    (re-crawls of a url at a new date are new docs, which is what
    incremental dedup expects to adjudicate).

    Scale: one Arrow pass per record batch, no shuffle anywhere; the
    binary payload column dies inside the pass, so everything
    downstream moves extracted text only. Feed the output straight to
    quality/dedup/split ops — it is schema-compatible with the
    documents table (lang intentionally absent: that's lang_id's job,
    not the extractor's).
    """
    schema = "url string, warc_date string, text string"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, dates, texts = [], [], []
            for uri, date, blob in zip(pdf["target_uri"], pdf["warc_date"],
                                       pdf["payload"]):
                header, body = http_split(bytes(blob))
                texts.append(html_to_text(_decode(body, header)))
                urls.append(uri)
                dates.append(date)
            yield pd.DataFrame(
                {"url": urls, "warc_date": dates, "text": texts})

    return (
        warc.select("target_uri", "warc_date", "payload")
        .mapInPandas(gen, schema)
        .select(
            F.xxhash64(F.concat_ws("|", "url", "warc_date")).alias("doc_id"),
            "url",
            "text",
            F.length("text").cast("long").alias("n_chars"),
            F.lit("warc").alias("source"),
        )
    )


# --- URL-level dedup (crawl step 0) ---------------------------------------------

def url_normalize(url_col):
    """Canonical URL as a pure column expression (JVM-side, zero
    Python): lowercase scheme://authority (the path stays
    case-significant), strip the fragment, drop tracking params
    (utm_*, fbclid, gclid), tidy the separators their removal leaves
    behind, then drop a bare trailing '?'/'&' and a trailing '/'.
    Remaining params keep their ORDER — full param sorting is
    deliberately not done (?a=1&b=2 vs ?b=2&a=1 are distinct resources
    often enough that merging them over-collapses).

    Crawl step 0 runs BEFORE fetch at 100 TB: the frontier dedups on
    this key, so everything here is cheap, row-local codegen — no
    UDF, no shuffle. Non-absolute strings (no scheme://) pass through
    trimmed but otherwise untouched.
    """
    c = F.trim(url_col)
    head = F.regexp_extract(c, r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1)
    rest = F.substr(c, F.length(head) + F.lit(1), F.length(c))
    rest = F.regexp_replace(rest, r"#.*$", "")
    rest = F.regexp_replace(
        rest, r"([?&])(utm_[A-Za-z0-9_]*|fbclid|gclid)=[^&#]*", r"$1")
    rest = F.regexp_replace(rest, r"\?&+", "?")
    rest = F.regexp_replace(rest, r"&{2,}", "&")
    rest = F.regexp_replace(rest, r"[?&]+$", "")
    rest = F.regexp_replace(rest, r"/$", "")
    return F.when(head == "", c).otherwise(
        F.concat(F.lower(head), rest))


def url_dedup_card(docs: DataFrame, url_col: str = "url") -> DataFrame:
    """Per-host URL-duplication card: (host, n_urls, n_canonical,
    dup_share) where n_canonical counts DISTINCT normalised urls — the
    frontier-dedup sheet showing which hosts hand the crawler the same
    resource under many spellings (tracking params, fragments, case).

    One scan; the aggregate shuffles (host, canonical-url) pairs onto
    \|hosts\| groups — at 100 TB this is the standard two-level
    distinct-count shape and the card is host-bounded.
    """
    canon = url_normalize(F.col(url_col))
    host = F.regexp_extract(canon, r"^[a-z0-9+.-]*://([^/?#]*)", 1)
    return (
        docs.select(host.alias("host"), canon.alias("canon"))
        .groupBy("host")
        .agg(F.count(F.lit(1)).alias("n_urls"),
             F.countDistinct("canon").alias("n_canonical"))
        .withColumn(
            "dup_share",
            F.try_divide(
                (F.col("n_urls") - F.col("n_canonical")).cast("double"),
                F.col("n_urls")))
        .orderBy("host")
    )
