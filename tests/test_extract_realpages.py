"""Real-shaped page battery for html_main_text (VERDICT r9 item 5).

The r9 kept-share numbers ran on one synthetic nav+footer template;
this battery asserts the classifier's contract on hand-modeled
real-crawl layouts (tests/realpages.py): per-page KEEP/DROP sentinels,
the three documented miss classes pinned at their current behavior,
and the corpus-level defense-in-depth claim — what the extractor
wrongly keeps (cookie banners, signatures, paywall prompts), the
boilerplate_card signals catch.
"""

from __future__ import annotations

import os

import pytest

from resin_spark.operators import extract
from tests import realpages

pytestmark = pytest.mark.full_suite  # the realpages extraction battery: full tier only (VERDICT r11 item 1)



@pytest.mark.parametrize("page", realpages.pages(),
                         ids=lambda p: p["name"])
def test_page_sentinels(page):
    out = extract.html_main_text(page["html"])
    if page.get("expect_empty"):
        assert out == "", f"{page['name']}: expected the empty verdict"
    for s in page["must_keep"]:
        assert s in out, f"{page['name']}: lost content {s!r}"
    for s in page["must_drop"]:
        assert s not in out, f"{page['name']}: kept chrome {s!r}"
    for s in page.get("invisible_drop", []):
        assert s not in out, f"{page['name']}: leaked invisible {s!r}"
    # documented miss classes, pinned at CURRENT behavior so a silent
    # classifier change is loud (see realpages.py docstrings)
    for s in page["known_miss"]["kept"]:
        assert s in out, f"{page['name']}: known-keep miss changed: {s!r}"
    for s in page["known_miss"]["dropped"]:
        assert s not in out, f"{page['name']}: known-drop miss changed: {s!r}"


def test_block_face_is_lossless_on_real_pages():
    """html_block_text must carry EVERY sentinel (it is the lossless
    denominator of the compare card)."""
    for page in realpages.pages():
        out = extract.html_block_text(page["html"])
        # expect_empty pages' chrome lives in script/noscript, which
        # BOTH faces suppress by design — only visible text is lossless
        drop = [] if page.get("expect_empty") else page["must_drop"]
        for s in (page["must_keep"] + drop + page["known_miss"]["kept"]):
            assert s in out, f"{page['name']}: block face lost {s!r}"
        # invisible sentinels (style/script text) must stay suppressed
        # in the lossless face too — only VISIBLE text is lossless
        for s in page.get("invisible_drop", []):
            assert s not in out, f"{page['name']}: leaked invisible {s!r}"


def _crawl_df(spark, tmpdir: str, pages: list[dict]):
    from resin_spark import io as rio
    recs = []
    counters: dict[str, int] = {}
    for p in pages:
        i = counters.get(p["name"], 0)
        counters[p["name"]] = i + 1
        recs.append((f"https://{p['name'].replace('_', '-')}.example/p{i}",
                     b"HTTP/1.1 200 OK\r\nContent-Type: text/html; "
                     b"charset=utf-8\r\n\r\n" + p["html"].encode()))
    seg = os.path.join(tmpdir, "seg-00000.warc.gz")
    with open(seg, "wb") as fh:
        fh.write(rio.warc_segment_bytes(recs))
    return rio.read_warc(spark, seg)


def test_realpage_corpus_cards(spark, tmp_path):
    """Corpus-level A/B on 133 real-shaped pages (19 layouts x 7
    variants): main extraction drops the chrome mass html_to_text
    carries, and the residual false-keeps are exactly the classes
    boilerplate_card's signals flag (cookie keyword lexicon +
    repeated-line template count)."""
    from pyspark.sql import functions as F

    warc = _crawl_df(spark, str(tmp_path), realpages.variants(7))
    host = F.regexp_extract("url", r"^[a-z0-9+.-]*://([^/?#]*)", 1)

    def card(extractor):
        docs = extract.warc_extract_text(warc, extractor=extractor) \
            .withColumn("source", host)
        return {r["source"]: r.asDict()
                for r in extract.boilerplate_card(docs).collect()}

    all_text = card(extract.html_block_text)
    main = card(extract.html_main_text)

    def share(rows, col):
        tot = sum(r["n_chars"] for r in rows.values())
        flagged = sum((r[col] or 0.0) * r["n_chars"] for r in rows.values())
        return flagged / tot if tot else 0.0

    kw_all = share(all_text, "keyword_char_share")
    kw_main = share(main, "keyword_char_share")
    tm_all = share(all_text, "template_char_share")
    tm_main = share(main, "template_char_share")
    # the lossless face carries real chrome mass; main extraction must
    # remove most of BOTH signals
    assert kw_all > 0.02 and tm_all > 0.10
    assert tm_main < tm_all / 2
    assert kw_main < kw_all
    # defense-in-depth: the cookie-banner false-keep (identical line
    # across 7 variant docs) is caught by BOTH signals corpus-side
    cookie = main["cookie-banner-div.example"]
    assert cookie["keyword_char_share"] > 0
    assert cookie["template_char_share"] > 0
    # same false-keep class on the <dialog> host (r11): the kept
    # banner text hits the keyword lexicon corpus-side too
    dialog = main["dialog-banner.example"]
    assert dialog["keyword_char_share"] > 0
    assert dialog["template_char_share"] > 0
    # the forum signature false-keep repeats across variants => template
    forum = main["forum-thread.example"]
    assert forum["template_lines"] > 0

    # compare card: empty-verdict hosts read 0.0; prose hosts >= 0.5
    cc = {r["host"]: r for r in
          extract.extraction_compare_card(warc).collect()}
    assert cc["link-farm.example"]["chars_main"] == 0
    assert cc["spa-shell.example"]["chars_main"] == 0
    for h in ("news-article.example", "blog-post.example",
              "docs-page.example", "forum-thread.example",
              "inline-links-prose.example"):
        assert cc[h]["main_kept_share"] >= 0.5, (h, cc[h])
    # record the per-host numbers for SCALING.md (printed, not asserted)
    for h in sorted(cc):
        r = cc[h]
        print(f"| {h} | {r['n_docs']} | {r['chars_all']} | "
              f"{r['chars_main']} | {r['main_kept_share']:.3f} |")
