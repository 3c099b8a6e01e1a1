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
