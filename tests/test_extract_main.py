"""Main-content extraction (SURVEY H15's trafilatura-class seam,
filled): html_main_text — a deterministic jusText/readability-style
block classifier in pure stdlib — plus the warc_extract_text extractor
seam and the per-host extraction_compare_card A/B. Extraction output is
parser-defined (no SQL oracle by design, the H15 adjudication); the
battery pins the classifier's scalar behavior and the Spark plumbing
end-to-end from WARC bytes, and boilerplate_card measures that the main
extractor actually removes the template mass the card was built to
quantify."""

from __future__ import annotations

from resin_spark.operators import extract
from resin_spark.operators.extract import (
    MAIN_MIN_BLOCK_CHARS,
    html_main_text,
    html_to_text,
)

PARA1 = ("This is the first real paragraph of the article, long enough "
         "to clear the prose threshold because it keeps going with "
         "actual sentences and actual words.")
PARA2 = ("And this is the second real paragraph, also comfortably "
         "longer than eighty characters so the classifier treats it as "
         "good prose content too.")


def _page(body: str) -> str:
    return f"<html><head><title>T</title></head><body>{body}</body></html>"


# --- scalar classification battery -----------------------------------------

def test_main_chrome_subtrees_stripped():
    html = _page(
        '<nav><a href="/">Home</a> | <a href="/a">About</a></nav>'
        f"<p>{PARA1}</p>"
        '<footer>All rights reserved <a href="/p">Privacy</a></footer>'
        f"<header>Masthead {PARA2}</header>"
        f"<aside>{PARA2}</aside><form>{PARA2}</form>")
    m = html_main_text(html)
    assert PARA1 in m
    # chrome subtrees die even when their text is long prose
    assert "Home" not in m and "rights reserved" not in m
    assert "Masthead" not in m and PARA2 not in m


def test_main_link_density_kills_link_farms():
    farm = "".join(f'<li><a href="/{i}">Item number {i} text</a></li>'
                   for i in range(30))
    assert html_main_text(_page(f"<ul>{farm}</ul>")) == ""
    # prose-length items WITHOUT links are kept (it was the link
    # density, not the list markup, that killed the farm)
    plain = "".join(f"<li>Item {i}: {PARA1}</li>" for i in range(3))
    kept = html_main_text(_page(f"<ul>{plain}</ul>"))
    assert f"Item 0: {PARA1}" in kept and f"Item 2: {PARA1}" in kept


def test_main_heading_promoted_above_good_prose():
    m = html_main_text(_page(f"<h1>The Title</h1><p>{PARA1}</p>"))
    assert m.splitlines() == ["The Title", PARA1]
    # an isolated heading with no good prose anywhere dies
    assert html_main_text(_page("<h1>The Title</h1>")) == ""


def test_main_short_context_cascade_both_directions():
    html = _page(
        "<p>intro line</p>"          # short, promoted backward via PARA1
        f"<p>{PARA1}</p>"
        "<p>Short caption.</p>"      # short, promoted forward
        f"<p>{PARA2}</p>"
        "<p>trailing note</p>")      # short, promoted forward
    assert html_main_text(html).splitlines() == [
        "intro line", PARA1, "Short caption.", PARA2, "trailing note"]


def test_main_isolated_short_dies():
    html = _page(
        "<p>lonely stub</p>"
        '<div><a href="/x">all link block all link block all link</a></div>'
        f"<p>{PARA1}</p>")
    m = html_main_text(html)
    # the link block separates the stub from the prose: no promotion path
    assert "lonely stub" not in m and "all link" not in m and PARA1 in m


def test_main_script_style_suppressed_and_threshold_boundary():
    assert html_main_text(_page(f"<script>{PARA1}</script>")) == ""
    exact = "x" * MAIN_MIN_BLOCK_CHARS
    assert html_main_text(_page(f"<p>{exact}</p>")) == exact
    assert html_main_text(_page(f"<p>{exact[:-1]}</p>")) == ""


def test_main_empty_and_bare_text():
    assert html_main_text("") == ""
    # bare long text with no tags is one good block
    assert html_main_text(PARA1) == PARA1


# --- Spark plumbing: the extractor seam + compare card ----------------------

def _crawl_segment(tmp_path):
    from resin_spark.io import warc_segment_bytes

    chrome = ('<nav><a href="/">Home</a> | <a href="/a">About</a> | '
              '<a href="/c">Contact</a></nav>')
    foot = '<footer>All rights reserved <a href="/p">Privacy Policy</a></footer>'
    pages = [
        # article bodies are unique per page — only nav/footer repeat,
        # so the line-level doc-frequency signal flags exactly them
        (f"https://site-a.test/art{i}",
         _page(f"{chrome}<h1>Title {i}</h1><p>Article {i} opens: {PARA1}</p>"
               f"<p>Article {i} continues: {PARA2}</p>{foot}").encode())
        for i in range(4)
    ] + [
        ("https://farm.test/links",
         _page("<ul>" + "".join(
             f'<li><a href="/{i}">Item number {i} here</a></li>'
             for i in range(30)) + "</ul>").encode()),
    ]
    d = tmp_path / "crawl"
    d.mkdir()
    (d / "seg.warc.gz").write_bytes(warc_segment_bytes(pages))
    return str(d)


def test_warc_extractor_seam_end_to_end(spark, tmp_path):
    from resin_spark.io import read_warc

    warc = read_warc(spark, _crawl_segment(tmp_path))
    full = extract.warc_extract_text(warc).orderBy("url").collect()
    main = extract.warc_extract_text(warc, extractor=html_main_text) \
        .orderBy("url").collect()
    # same rows, same deterministic ids — only the text column changes
    assert [r["doc_id"] for r in full] == [r["doc_id"] for r in main]
    by_url = {r["url"]: r for r in main}
    art = by_url["https://site-a.test/art0"]
    assert "Title 0" in art["text"] and PARA1 in art["text"]
    assert "Home" not in art["text"] and "rights reserved" not in art["text"]
    assert by_url["https://farm.test/links"]["text"] == ""
    # every main text is a strict subset (by length) of the full text
    for f, m in zip(full, main):
        assert m["n_chars"] <= f["n_chars"]


def test_main_extraction_removes_boilerplate_mass(spark, tmp_path):
    """The A/B the card was built for: template+keyword char share over
    the SAME crawl drops to zero under the main-content extractor.
    Baseline is html_block_text — the card is line-level, so the
    lossless extractor must emit block boundaries for the repeated-line
    signal to exist at all (html_to_text's single flat line per doc
    can never repeat across docs)."""
    from resin_spark.io import read_warc

    from resin_spark.operators.extract import html_block_text

    warc = read_warc(spark, _crawl_segment(tmp_path))

    def card(extractor):
        docs = extract.warc_extract_text(warc, extractor=extractor)
        return {r["source"]: r
                for r in extract.boilerplate_card(docs).collect()}

    full = card(html_block_text)["warc"]
    main = card(html_main_text)["warc"]
    assert full["template_char_share"] > 0      # nav+footer repeat 4x
    assert full["keyword_char_share"] > 0       # "All rights reserved"
    assert main["template_lines"] == 0 and main["keyword_lines"] == 0


def test_block_text_lossless_vs_main(spark, tmp_path):
    from resin_spark.operators.extract import html_block_text

    html = _page('<nav><a href="/">Home</a></nav>'
                 f"<h1>Title</h1><p>{PARA1}</p><p>tail note</p>")
    blocks = html_block_text(html).splitlines()
    assert blocks == ["Home", "Title", PARA1, "tail note"]
    # main output is always a sub-sequence of the block output
    main_lines = html_main_text(html).splitlines()
    it = iter(blocks)
    assert all(line in it for line in main_lines)


def test_extraction_compare_card(spark, tmp_path):
    from resin_spark.io import read_warc

    warc = read_warc(spark, _crawl_segment(tmp_path))
    rows = {r["host"]: r
            for r in extract.extraction_compare_card(warc).collect()}
    a, farm = rows["site-a.test"], rows["farm.test"]
    assert a["n_docs"] == 4 and farm["n_docs"] == 1
    # article pages keep most of their text; the link farm keeps none
    assert 0.5 < a["main_kept_share"] < 1.0
    assert farm["chars_main"] == 0 and farm["main_kept_share"] == 0.0
    # chars_all equals the LOSSLESS block extractor's output length per
    # host (html_block_text shares html_main_text's skip set — title
    # suppressed both sides — so the share can reach 1.0; ADVICE r8)
    full = extract.warc_extract_text(
        warc, extractor=extract.html_block_text).collect()
    exp_a = sum(r["n_chars"] for r in full if "site-a" in r["url"])
    assert a["chars_all"] == exp_a


def test_compare_card_all_prose_page_reads_one(spark, tmp_path):
    """A titled, chrome-free prose page keeps share exactly 1.0 — the
    regression the html_to_text denominator made impossible."""
    import gzip

    from resin_spark.io import read_warc, warc_response_record

    body = ("<html><head><title>My Title</title></head><body>"
            f"<p>{PARA1}</p><p>{PARA1}</p></body></html>")
    d = tmp_path / "prose"
    d.mkdir()
    (d / "seg.warc.gz").write_bytes(gzip.compress(warc_response_record(
        "https://prose.test/a", body.encode())))
    [row] = extract.extraction_compare_card(read_warc(spark, str(d))).collect()
    assert row["chars_main"] == row["chars_all"] > 0
    assert row["main_kept_share"] == 1.0


# --- hypothesis fuzz (pure Python, structural invariants) -------------------

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _words = st.lists(
        st.sampled_from(["alpha", "beta", "the", "of", "x1", "café",
                         "７漢", "&amp;", "a.b.c", "..."]),
        min_size=0, max_size=40).map(" ".join)
    _tag = st.sampled_from(["p", "div", "li", "h2", "span", "b", "nav",
                            "footer", "td", "br", "a", "script", "title"])

    @st.composite
    def _html(draw):
        n = draw(st.integers(0, 12))
        parts = []
        for _ in range(n):
            tag = draw(_tag)
            txt = draw(_words)
            shape = draw(st.integers(0, 3))
            if shape == 0:
                parts.append(f"<{tag}>{txt}</{tag}>")
            elif shape == 1:          # unclosed
                parts.append(f"<{tag}>{txt}")
            elif shape == 2:          # stray close
                parts.append(f"{txt}</{tag}>")
            else:                     # bare text
                parts.append(txt)
        return "".join(parts)

    @given(_html())
    @settings(max_examples=300, deadline=None)
    def test_fuzz_main_never_crashes_and_is_subsequence(html):
        from resin_spark.operators.extract import (html_block_text,
                                                   html_main_text)

        blocks = html_block_text(html).splitlines()
        main = html_main_text(html).splitlines()
        # main is a sub-sequence of the lossless block lines
        it = iter(blocks)
        assert all(line in it for line in main)
        # no blank lines, no leading/trailing whitespace ever
        for line in blocks + main:
            assert line == line.strip() and line != ""

    @given(_html())
    @settings(max_examples=150, deadline=None)
    def test_fuzz_main_blocks_idempotent_reparse(html):
        """Re-extracting an extractor's own output (plain text, no tags
        beyond what the corpus text happens to contain) is stable: block
        extraction of block output reproduces it."""
        from resin_spark.operators.extract import html_block_text

        once = html_block_text(html)
        if "<" in once or "&" in once:
            return  # corpus text that parses as markup is out of scope
        assert html_block_text(once.replace("\n", "<br>")) == once
except ImportError:  # pragma: no cover - hypothesis is baked in
    pass


# --- charset decode: header > meta prescan > utf-8 --------------------------

def test_decode_meta_charset_prescan():
    from resin_spark.operators.extract import _decode

    latin = '<head><meta charset="iso-8859-1"></head>caf\xe9'.encode("latin-1")
    assert "café" in _decode(latin, b"Content-Type: text/html")
    # the HTTP header's charset WINS over a conflicting meta tag
    utf8 = '<meta charset="iso-8859-1">café'.encode("utf-8")
    assert "café" in _decode(utf8, b"Content-Type: text/html; charset=utf-8")
    # http-equiv form, unquoted value
    he = b'<meta http-equiv="Content-Type" ' \
         b'content="text/html; charset=latin-1">caf\xe9'
    assert "café" in _decode(he, b"")
    # unknown names fall through to utf-8, never raise
    assert _decode("café".encode(), b"charset=bogus-enc") == "caf\xe9"
    # declarations beyond the 1024-byte WHATWG prescan window are ignored
    far = b" " * 1100 + b'<meta charset="latin-1">x'
    assert _decode(far, b"").endswith("x")


def test_decode_bom_outranks_header_and_meta():
    """Per WHATWG a UTF-8/UTF-16 BOM outranks BOTH the Content-Type
    header and the meta prescan (ADVICE r8 / VERDICT r8 nit: a BOM'd
    UTF-16 page used to mojibake through the old precedence)."""
    from resin_spark.operators.extract import _decode

    text = '<meta charset="iso-8859-1">café'
    le = b"\xff\xfe" + text.encode("utf-16-le")
    be = b"\xfe\xff" + text.encode("utf-16-be")
    assert "café" in _decode(le, b"Content-Type: text/html; charset=latin-1")
    assert "café" in _decode(be, b"")
    # UTF-8 BOM: stripped, and wins over a lying latin-1 meta tag
    u8 = b"\xef\xbb\xbf" + text.encode("utf-8")
    out = _decode(u8, b"")
    assert "café" in out and not out.startswith("﻿")
    # no BOM → the old precedence is untouched
    assert "café" in _decode(text.encode("latin-1"), b"")


def test_decode_prescan_meta_tags_only():
    """The prescan matches charset= only INSIDE <meta ...> tags: a
    ?charset= query string in a script/link src must not hijack the
    decode (ADVICE r8 medium), and an unknown meta codec name must not
    shadow a later valid declaration."""
    from resin_spark.operators.extract import _decode

    # charset=gbk in a script src query string — page stays utf-8
    hijack = ('<script src="x.js?charset=iso-8859-1"></script>café'
              ).encode("utf-8")
    assert "café" in _decode(hijack, b"")
    # unknown name in the FIRST meta, valid name in the second
    two = ('<meta charset="x-bogus"><meta charset="iso-8859-1">caf\xe9'
           ).encode("latin-1")
    assert "café" in _decode(two, b"")


def test_decode_end_to_end_meta_charset_page(spark, tmp_path):
    """A crawl page that declares its encoding ONLY in <meta> decodes
    correctly through the full WARC ingest path."""
    import gzip

    from resin_spark.io import read_warc, warc_response_record

    body = ('<html><head><meta charset="iso-8859-1"></head><body>'
            f"<p>Señor café crème: {PARA1}</p></body></html>")
    d = tmp_path / "crawl"
    d.mkdir()
    # content type WITHOUT a charset — the header would win over meta
    (d / "seg.warc.gz").write_bytes(gzip.compress(warc_response_record(
        "https://m.test/p", body.encode("latin-1"),
        content_type="text/html")))
    rows = extract.warc_extract_text(read_warc(spark, str(d))).collect()
    assert len(rows) == 1 and "Señor café crème" in rows[0]["text"]


# --- r11-scheduled fixes: expected POST-fix behavior, skipped until the
# window opens (see the verify skill's r11 opening checklist; the code
# comments at extract._decode and SCALING.md r10 carry the context).
# The r11 builder flips skip -> live TOGETHER with each fix.

import pytest as _pytest


def test_decode_meta_straddling_prescan_boundary_r11():
    from resin_spark.operators.extract import _decode

    # tag starts at ~byte 1000, charset attribute lands past 1024
    pad = b"<!--" + b"x" * 990 + b"-->"
    tag = (b'<meta data-pad="' + b"p" * 40 + b'" charset="iso-8859-1">')
    body = b"<head>" + pad + tag + b"</head>caf\xe9"
    assert body.index(b"<meta") < 1024 < body.index(b"iso-8859-1")
    assert "café" in _decode(body, b"Content-Type: text/html")


def test_isolated_short_cjk_sentence_survives_r11():
    from resin_spark.operators.extract import html_main_text

    # mirrors tests/realpages.py _cjk: the short sentence is isolated
    # behind a link-dense block, so only a lang-aware length gate (or
    # equivalent) can keep it. Flip the realpages known_miss pin to
    # must_keep in the same change.
    long_zh = "委员会审查了更新后的测量结果，认为所提出的方法在所有测试" \
              "制度下都是可靠的，并指出校准步骤消除了早期调查记录的残余" \
              "偏差，这一结论与国际同行的复核意见一致。"
    short_zh = "这是一个完整但简短的中文句子。"
    html = (f"<html><body><p>{long_zh}</p>"
            f"<div><a href='/a'>更多</a> <a href='/b'>档案</a></div>"
            f"<p>{short_zh}</p></body></html>")
    assert short_zh in html_main_text(html)
