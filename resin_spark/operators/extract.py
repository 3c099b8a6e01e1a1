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

_CHARSET_RE = re.compile(rb"charset=[\"']?([A-Za-z0-9_\-]+)", re.I)
_META_TAG_RE = re.compile(rb"<meta[^>]*>", re.I)
_WS_RE = re.compile(r"\s+")
# WHATWG encoding sniffing: a byte-order mark outranks BOTH the
# transport header and the in-document meta declaration. Order matters:
# UTF-16LE's BOM (ff fe) is a prefix-sibling of UTF-32LE's, but UTF-32
# isn't in the WHATWG encoding set, so the three below are the whole
# table.
_BOMS = (
    (b"\xef\xbb\xbf", "utf-8"),
    (b"\xff\xfe", "utf-16-le"),
    (b"\xfe\xff", "utf-16-be"),
)


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


# --- main-content extraction (the H15 trafilatura-class seam, filled) -----
#
# A jusText/readability-style block classifier in pure stdlib (Pomikálek
# 2011's paragraph heuristics, simplified and made deterministic): the
# page is segmented into text blocks at block-level tag boundaries, each
# block scored by link density + length + subtree role, and only blocks
# classified "good" (plus shorts/headings adjacent to good prose) are
# kept. This is the main-content extractor SURVEY H15 documents as the
# drop-in for ``html_to_text`` — nav bars, footers, cookie banners and
# link farms never reach the corpus instead of being measured after the
# fact by boilerplate_card.

# tags that end an inline run — a visible-text block boundary
_BLOCK_TAGS = {
    "address", "article", "aside", "blockquote", "body", "br", "caption",
    "dd", "div", "dl", "dt", "fieldset", "figcaption", "figure", "footer",
    "form", "h1", "h2", "h3", "h4", "h5", "h6", "header", "hr", "html",
    "li", "main", "nav", "ol", "p", "pre", "section", "table", "tbody",
    "td", "tfoot", "th", "thead", "tr", "ul",
}
# subtrees that are chrome by construction, whatever their text says
_BAD_SUBTREES = {"nav", "header", "footer", "aside", "form"}
_HEADINGS = {"h1", "h2", "h3", "h4", "h5", "h6"}
# a low-link-density block this long is prose (jusText's max_length_low
# neighbourhood); shorter blocks need a good neighbour to survive
MAIN_MIN_BLOCK_CHARS = 80
# above this share of characters inside <a>, a block is link chrome
MAIN_MAX_LINK_DENSITY = 0.33
# CJK-dominant blocks gate at a lower length (r11, SCALING.md r10: the
# 80-char latin gate killed isolated complete Chinese sentences —
# cjk-page kept share 0.488). 14 chars = a minimal complete CJK clause;
# at the ~2.5-3x information-per-char ratio of space-free CJK scripts
# that is the 35-42 latin-char band, accepted deliberately because CJK
# prose sentences ARE that short and the link-density + bad-subtree
# gates, not length, carry the boilerplate load for CJK nav chrome.
MAIN_MIN_BLOCK_CHARS_CJK = 14
# Han (unified + ext A + compat), kana, hangul
_CJK_CHAR_RE = re.compile("[\u3040-\u30ff\u3400-\u4dbf\u4e00-\u9fff\uf900-\ufaff\uac00-\ud7af]")


def _min_block_chars(text: str) -> int:
    """Length gate for one block: the CJK threshold iff at least half
    the block's alphanumeric chars are CJK (majority script rule — a
    latin block with a quoted CJK word keeps the latin gate, and
    vice versa)."""
    letters = sum(ch.isalnum() for ch in text)
    if not letters:
        return MAIN_MIN_BLOCK_CHARS
    cjk = len(_CJK_CHAR_RE.findall(text))
    return (MAIN_MIN_BLOCK_CHARS_CJK if 2 * cjk >= letters
            else MAIN_MIN_BLOCK_CHARS)


class _BlockCollector(HTMLParser):
    """Segments visible text into blocks, tracking per block the chars
    contributed inside <a> (link density), whether the block sits inside
    a chrome subtree, and whether it is a heading. Suppresses <title> on
    top of html_to_text's skip set — document metadata, not content (the
    cascade would otherwise promote it above the first heading)."""

    _SKIP = _TextCollector._SKIP | {"title"}

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._skip = 0
        self._bad = 0
        self._link = 0
        self._head = 0
        self._open_new = True
        self.blocks: list[dict] = []

    def _cur(self) -> dict:
        if self._open_new or not self.blocks:
            self.blocks.append({"parts": [], "link_parts": [],
                                "bad": self._bad > 0,
                                "heading": self._head > 0})
            self._open_new = False
        return self.blocks[-1]

    def handle_starttag(self, tag, attrs):
        if tag in self._SKIP:
            self._skip += 1
            return
        if tag in _BAD_SUBTREES:
            self._bad += 1
        if tag == "a":
            self._link += 1
        if tag in _HEADINGS:
            self._head += 1
        if tag in _BLOCK_TAGS:
            self._open_new = True

    def handle_endtag(self, tag):
        if tag in self._SKIP:
            if self._skip > 0:
                self._skip -= 1
            return
        if tag in _BAD_SUBTREES and self._bad > 0:
            self._bad -= 1
        if tag == "a" and self._link > 0:
            self._link -= 1
        if tag in _HEADINGS and self._head > 0:
            self._head -= 1
        if tag in _BLOCK_TAGS:
            self._open_new = True

    def handle_data(self, data):
        if self._skip or not data.strip():
            return
        b = self._cur()
        b["parts"].append(data)
        if self._link > 0:
            b["link_parts"].append(data)


def html_block_text(html: str) -> str:
    """ALL visible text, one block per line — ``html_to_text``'s content
    with ``html_main_text``'s block structure and no classification
    (<title> suppressed like the main extractor; it is metadata). The
    right extractor seam when downstream line-level ops
    (line_dedup_stats, boilerplate_card) should see real block
    boundaries but extraction must stay lossless."""
    p = _BlockCollector()
    p.feed(html)
    p.close()
    out = []
    for b in p.blocks:
        text = _WS_RE.sub(" ", " ".join(b["parts"])).strip()
        if text:
            out.append(text)
    return "\n".join(out)


def html_main_text(html: str) -> str:
    """Main-content text of an HTML document, one kept block per line.

    Deterministic three-step classification:

    1. segment into blocks at block-tag boundaries (script/style/
       template/noscript suppressed exactly as in ``html_to_text``);
    2. label each block — **bad** if inside nav/header/footer/aside/form
       or link density > ``MAIN_MAX_LINK_DENSITY``; **good** if a
       non-heading block of ≥ ``MAIN_MIN_BLOCK_CHARS`` normalised chars;
       **short** otherwise (headings always start short);
    3. context passes in fixed order — one forward sweep promotes a
       short block whose predecessor ended up good, then one backward
       sweep promotes a short whose successor is good; both cascade
       through runs of shorts (jusText's near-good rule), so captions
       between paragraphs and the title above its article survive,
       while shorts not touching any good prose die.

    A page with no good block (link farm, bare chrome) yields "" — at
    crawl scale that IS the extraction verdict, and the empty-text row
    is what the downstream quality gates expect to drop. Blocks join
    with newlines so line-level ops (line_dedup_stats, boilerplate_card)
    see real block boundaries instead of one flat line.
    """
    p = _BlockCollector()
    p.feed(html)
    p.close()
    blocks: list[tuple[str, bool]] = []  # (text, heading)
    labels: list[str] = []
    for b in p.blocks:
        text = _WS_RE.sub(" ", " ".join(b["parts"])).strip()
        if not text:
            continue
        a_len = len(_WS_RE.sub(" ", " ".join(b["link_parts"])).strip())
        link_density = a_len / len(text)
        if b["bad"] or link_density > MAIN_MAX_LINK_DENSITY:
            labels.append("bad")
        elif len(text) >= _min_block_chars(text) and not b["heading"]:
            labels.append("good")
        else:
            labels.append("short")
        blocks.append((text, b["heading"]))
    for i in range(1, len(labels)):
        if labels[i] == "short" and labels[i - 1] == "good":
            labels[i] = "good"
    for i in range(len(labels) - 2, -1, -1):
        if labels[i] == "short" and labels[i + 1] == "good":
            labels[i] = "good"
    return "\n".join(t for (t, _), lab in zip(blocks, labels)
                     if lab == "good")


def _decode(body: bytes, header: bytes) -> str:
    """Decode an HTTP entity with WHATWG-ordered encoding sniffing:

    1. a UTF-8 / UTF-16 byte-order mark wins outright (the WHATWG spec
       ranks the BOM above the transport header AND the meta prescan —
       a BOM'd UTF-16 page used to mojibake here);
    2. else the Content-Type header's charset;
    3. else an HTML ``<meta charset=..>`` / http-equiv declaration in
       the first 1024 body bytes (the WHATWG prescan window) — scanned
       only INSIDE ``<meta ...>`` tags, so a ``?charset=gbk`` query
       string in a script/link src can't hijack the page (ADVICE r8);
    4. else UTF-8.

    Unknown encoding names fall through to the next candidate rather
    than raise (later valid declarations are no longer shadowed by an
    earlier unknown one)."""
    for bom, enc in _BOMS:
        if body.startswith(bom):
            return body[len(bom):].decode(enc, errors="replace")
    for m in _CHARSET_RE.finditer(header):
        try:
            return body.decode(m.group(1).decode("ascii"), errors="replace")
        except LookupError:
            continue
    # WHATWG prescan: a <meta> qualifies if the tag STARTS inside the
    # 1024-byte prescan window even when its '>' lands past it (the
    # hard body[:1024] slice used to drop exactly those stragglers —
    # ADVICE r9, fixed in the r11 window). Scanning a doubled slice
    # and gating on tag.start() bounds the straggler allowance at one
    # more window's worth of attribute bytes, which covers any sane
    # <meta> while keeping the scan O(1) per page.
    for tag in _META_TAG_RE.finditer(body[:2048]):
        if tag.start() >= 1024:
            break
        m = _CHARSET_RE.search(tag.group(0))
        if m:
            try:
                return body.decode(m.group(1).decode("ascii"),
                                   errors="replace")
            except LookupError:
                continue
    return body.decode("utf-8", errors="replace")


def warc_extract_text(warc: DataFrame, extractor=None) -> DataFrame:
    """WARC response rows → documents-shaped frame: (doc_id, url, text,
    n_chars, source). doc_id is xxhash64(url || warc_date) — computed
    JVM-side AFTER extraction, deterministic across runs/partitionings
    (re-crawls of a url at a new date are new docs, which is what
    incremental dedup expects to adjudicate).

    ``extractor`` is the html→text seam SURVEY H15 documents: default
    ``html_to_text`` (all visible text), pass ``html_main_text`` for
    main-content extraction (boilerplate stripped at the source). Must
    be a module-level callable (it ships to executors in the Arrow
    closure).

    Scale: one Arrow pass per record batch, no shuffle anywhere; the
    binary payload column dies inside the pass, so everything
    downstream moves extracted text only. Feed the output straight to
    quality/dedup/split ops — it is schema-compatible with the
    documents table (lang intentionally absent: that's lang_id's job,
    not the extractor's).
    """
    schema = "url string, warc_date string, text string"
    extract_fn = extractor or html_to_text

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, dates, texts = [], [], []
            for uri, date, blob in zip(pdf["target_uri"], pdf["warc_date"],
                                       pdf["payload"]):
                header, body = http_split(bytes(blob))
                texts.append(extract_fn(_decode(body, header)))
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


# --- boilerplate-mass card (the H15 stdlib-extractor trade, quantified) ------

# a non-empty line seen in >= this many DISTINCT docs is template mass
BOILER_MIN_DOCS = 3
# nav/footer/cookie-banner lexicon: deliberately small and literal —
# the regex runs identically as Spark rlike (Java) and DuckDB
# regexp_matches (RE2); both support the inline (?i) flag
BOILER_KEYWORD_RE = (
    r"(?i)(cookie|subscribe|newsletter|all rights reserved|"
    r"privacy policy|terms of (service|use)|sign in|log ?in|"
    r"skip to (main )?content|related articles|share (this|on)|"
    r"copyright|©)"
)


def boiler_line_rows(docs: DataFrame) -> DataFrame:
    """(source, doc_id, line, lh, n_chars, is_keyword) for every
    non-blank trimmed line — the stateless line-classification frame
    SHARED VERBATIM between the batch card and its streaming keyword
    twin (streaming/quality.stream_boilerplate_keywords), so the two
    faces cannot drift. Works unchanged on a static or streaming
    DataFrame (explode + row-local expressions only)."""
    return (
        docs.filter(F.col("doc_id").isNotNull() & F.col("text").isNotNull())
        .select("source", "doc_id",
                F.explode(F.split("text", "\n")).alias("raw"))
        .select("source", "doc_id", F.trim("raw").alias("line"))
        .filter(F.col("line") != "")
        .select(
            "source", "doc_id", "line",
            F.xxhash64("line").alias("lh"),
            F.length("line").alias("n_chars"),
            F.col("line").rlike(BOILER_KEYWORD_RE).alias("is_keyword"),
        )
    )


def boilerplate_card(docs: DataFrame,
                     min_docs: int = BOILER_MIN_DOCS) -> DataFrame:
    """Per-source boilerplate-mass card: how much of the extracted text
    is template, by two independent signals —

    - **template lines**: non-blank lines whose exact text appears in
      ``min_docs``+ distinct documents (nav bars, footers, licence
      blocks — the C4/RefinedWeb repeated-line signal, measured at the
      corpus level instead of removed per doc like line_dedup_stats),
    - **keyword lines**: lines matching the nav/footer/cookie lexicon
      (catches boilerplate too rare to repeat at small corpus scale).

    This is the measurement half of the documented H15 trade (SURVEY
    H15: the stdlib extractor keeps boilerplate a trafilatura-class
    main-content extractor would drop): a crawl build reads
    template_char_share/keyword_char_share per source and knows how
    much mass the quality gates are carrying before model training.

    Plan: one explode pass; the doc-frequency count shuffles
    (xxhash64(line), doc_id) pairs — 16 bytes/row, never the text —
    then a hash join back to the line stream and one per-source
    aggregate. Skew lands exactly on the boilerplate lines being
    hunted (AQE-skew-split territory at web scale, same note as
    line_dedup_stats).
    """
    lines = boiler_line_rows(docs)
    template = (
        lines.groupBy("lh")
        .agg(F.countDistinct("doc_id").alias("n_docs_with_line"))
        .filter(F.col("n_docs_with_line") >= min_docs)
        .select("lh", F.lit(True).alias("is_template"))
    )
    flagged = lines.join(template, "lh", "left").select(
        "source",
        "n_chars",
        F.coalesce("is_template", F.lit(False)).alias("is_template"),
        "is_keyword",
    )
    tmpl_chars = F.sum(F.when(F.col("is_template"),
                              F.col("n_chars")).otherwise(F.lit(0)))
    kw_chars = F.sum(F.when(F.col("is_keyword"),
                            F.col("n_chars")).otherwise(F.lit(0)))
    total_chars = F.sum("n_chars")
    return (
        flagged.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            total_chars.cast("long").alias("n_chars"),
            F.sum(F.col("is_template").cast("long")).alias("template_lines"),
            F.sum(F.col("is_keyword").cast("long")).alias("keyword_lines"),
            F.try_divide(tmpl_chars.cast("double"),
                         total_chars).alias("template_char_share"),
            F.try_divide(kw_chars.cast("double"),
                         total_chars).alias("keyword_char_share"),
        )
        .orderBy("source")
    )


def boilerplate_card_demo(t: dict) -> DataFrame:
    """Driver-entry form over the documents table (staged, SURVEY H15)."""
    return boilerplate_card(t["documents"])


def boilerplate_card_oracle(min_docs: int = BOILER_MIN_DOCS) -> str:
    # lockstep: BOILER_MIN_DOCS + BOILER_KEYWORD_RE are shared knobs;
    # line definition = trimmed, non-blank split on chr(10), exactly
    # the engine's. Grouping by line text (vs the engine's xxhash64
    # key) yields the same groups.
    return f"""
    WITH lines AS (
        SELECT source, doc_id, trim(l) AS line
        FROM (
            SELECT source, doc_id, unnest(string_split(text, chr(10))) AS l
            FROM documents
            WHERE doc_id IS NOT NULL AND text IS NOT NULL
        )
        WHERE trim(l) <> ''
    ), template AS (
        SELECT line FROM lines GROUP BY line
        HAVING COUNT(DISTINCT doc_id) >= {min_docs}
    ), flagged AS (
        SELECT source, length(line) AS n_chars,
               line IN (SELECT line FROM template) AS is_template,
               regexp_matches(line, '{BOILER_KEYWORD_RE}') AS is_keyword
        FROM lines
    )
    SELECT source,
           COUNT(*) AS n_lines,
           CAST(SUM(n_chars) AS BIGINT) AS n_chars,
           CAST(SUM(CASE WHEN is_template THEN 1 ELSE 0 END) AS BIGINT)
               AS template_lines,
           CAST(SUM(CASE WHEN is_keyword THEN 1 ELSE 0 END) AS BIGINT)
               AS keyword_lines,
           CAST(SUM(CASE WHEN is_template THEN n_chars ELSE 0 END) AS DOUBLE)
               / NULLIF(SUM(n_chars), 0) AS template_char_share,
           CAST(SUM(CASE WHEN is_keyword THEN n_chars ELSE 0 END) AS DOUBLE)
               / NULLIF(SUM(n_chars), 0) AS keyword_char_share
    FROM flagged
    GROUP BY source ORDER BY source
    """


def url_dedup_card(docs: DataFrame, url_col: str = "url") -> DataFrame:
    """Per-host URL-duplication card: (host, n_urls, n_canonical,
    dup_share) where n_canonical counts DISTINCT normalised urls — the
    frontier-dedup sheet showing which hosts hand the crawler the same
    resource under many spellings (tracking params, fragments, case).

    One scan; the aggregate shuffles (host, canonical-url) pairs onto
    |hosts| groups — at 100 TB this is the standard two-level
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


def extraction_compare_card(warc: DataFrame) -> DataFrame:
    """Per-host A/B of the two extractors over the SAME crawl bytes:
    (host, n_docs, chars_all, chars_main, main_kept_share) — how much
    of each host's visible text the main-content classifier keeps. A
    host near 1.0 is prose-dominant; a host near 0.0 is chrome/link
    farm, and the card is the evidence for routing it through
    ``html_main_text`` (or skipping it entirely) before a 100 TB build.

    The denominator is ``html_block_text`` — the lossless extractor
    sharing the main classifier's skip set (title suppressed in both) —
    so an all-prose titled page reads exactly 1.0; ``html_to_text``
    would count the title into chars_all and systematically understate
    the share (ADVICE r8).

    Both extractions run in ONE Arrow pass per batch (the page is
    parsed twice but fetched/decoded once, and the payload dies inside
    the pass); the only shuffle is the |hosts|-group aggregate over
    16-byte count rows.
    """
    schema = "url string, chars_all long, chars_main long"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, ca, cm = [], [], []
            for uri, blob in zip(pdf["target_uri"], pdf["payload"]):
                header, body = http_split(bytes(blob))
                html = _decode(body, header)
                urls.append(uri)
                ca.append(len(html_block_text(html)))
                cm.append(len(html_main_text(html)))
            yield pd.DataFrame(
                {"url": urls, "chars_all": ca, "chars_main": cm})

    host = F.regexp_extract(
        url_normalize(F.col("url")), r"^[a-z0-9+.-]*://([^/?#]*)", 1)
    return (
        warc.select("target_uri", "payload")
        .mapInPandas(gen, schema)
        .groupBy(host.alias("host"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("chars_all").alias("chars_all"),
            F.sum("chars_main").alias("chars_main"),
            F.try_divide(F.sum("chars_main").cast("double"),
                         F.sum("chars_all")).alias("main_kept_share"),
        )
        .orderBy("host")
    )
