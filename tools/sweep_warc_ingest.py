"""WARC ingest throughput sweep (overtime r6).

Generates a synthetic crawl (member-per-record gzip segments of
templated HTML pages), then times the two ingest stages end-to-end on
local[32]:

  read_warc            — record parse only (payload stays bytes)
  + warc_extract_text  — HTTP split + charset decode + HTMLParser text
  + html_block_text    — same, block-per-line lossless face
  + html_main_text     — jusText-style main-content classification

Reported as MB/s of UNCOMPRESSED WARC bytes and pages/s — the numbers
that size an ingest fleet: segments/hour/executor is wall-clock ÷
these, and the stages are per-file parallel so they scale linearly in
executors until the object store caps reads.

Usage: python tools/sweep_warc_ingest.py [n_segments] [pages_per_seg]
"""

from __future__ import annotations

import gzip
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from resin_spark.io import read_warc  # noqa: E402
from resin_spark.operators.extract import warc_extract_text  # noqa: E402
from resin_spark.session import get_spark  # noqa: E402

_PARA = ("the quick brown fox jumps over the lazy dog while a crawler "
         "collects paragraphs of visible text from rendered pages ")


_CHROME = ('<nav>' + ' | '.join(f'<a href="/s{k}">Section {k}</a>'
                                for k in range(8)) + '</nav>')
_FOOTER = ('<footer>All rights reserved — <a href="/privacy">Privacy '
           'Policy</a> <a href="/tos">Terms of Use</a></footer>')


def _page(seg: int, i: int) -> bytes:
    body = ("<html><head><title>Page %d-%d</title>"
            "<style>p{margin:0}</style><script>var x=%d;</script></head>"
            "<body>%s%s%s</body></html>" % (
                seg, i, i, _CHROME,
                # page-unique prose (seg in the suffix): cross-doc
                # repeated lines must be the nav/footer CHROME only, or
                # the boilerplate A/B below degenerates to 100% template
                "".join(f"<p>{_PARA * 3} #{seg}-{i}-{k}</p>"
                        for k in range(8)),
                _FOOTER))
    payload = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8"
               b"\r\n\r\n" + body.encode())
    head = (f"WARC/1.0\r\nWARC-Type: response\r\n"
            f"WARC-Date: 2026-01-01T00:00:00Z\r\n"
            f"WARC-Target-URI: https://host{seg}.example/p{i}\r\n"
            f"Content-Length: {len(payload)}\r\n\r\n").encode()
    return head + payload + b"\r\n\r\n"


def main() -> None:
    n_seg = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    per_seg = int(sys.argv[2]) if len(sys.argv) > 2 else 400
    d = tempfile.mkdtemp(prefix="warc_sweep_")
    raw_bytes = 0
    for s in range(n_seg):
        recs = [_page(s, i) for i in range(per_seg)]
        raw_bytes += sum(len(r) for r in recs)
        with open(os.path.join(d, f"seg{s:03d}.warc.gz"), "wb") as f:
            for r in recs:
                f.write(gzip.compress(r, compresslevel=1))
    n_pages = n_seg * per_seg
    mb = raw_bytes / 1e6
    print(f"synthetic crawl: {n_seg} segments, {n_pages} pages, "
          f"{mb:.0f} MB uncompressed")

    spark = get_spark("sweep-warc-ingest")
    # Measured (order-swap experiment, r8): the first few Python/Arrow
    # stages in a fresh process ramp 7s -> 1.7s for IDENTICAL work
    # (worker-pool spawn + page cache + interpreter warm-up), so a
    # single-shot timing charges the ramp to whichever extractor runs
    # first. Warm with one full extract pass, then take min-of-2 per
    # stage — the steady-state number a long-running ingest fleet sees.
    warc_extract_text(read_warc(spark, d)).count()

    def timed(make_df, agg=True):
        best, out = float("inf"), None
        for _ in range(2):
            t0 = time.time()
            df = make_df()
            out = (df.selectExpr("count(*)", "sum(n_chars)").first()
                   if agg else (df.count(), None))
            best = min(best, time.time() - t0)
        return best, out

    t1, (n1, _) = timed(lambda: read_warc(spark, d), agg=False)
    t2, (n2, chars) = timed(lambda: warc_extract_text(read_warc(spark, d)))
    assert n1 == n2 == n_pages
    from resin_spark.operators.extract import html_block_text, html_main_text
    t3, (n3, chars_blk) = timed(lambda: warc_extract_text(
        read_warc(spark, d), extractor=html_block_text))
    t4, (n4, chars_main) = timed(lambda: warc_extract_text(
        read_warc(spark, d), extractor=html_main_text))
    assert n3 == n4 == n_pages
    print(f"read_warc (parse only):        {t1:6.2f}s  "
          f"{mb / t1:7.1f} MB/s  {n_pages / t1:8.0f} pages/s")
    print(f"read_warc + extract_text:      {t2:6.2f}s  "
          f"{mb / t2:7.1f} MB/s  {n_pages / t2:8.0f} pages/s  "
          f"({chars / 1e6:.0f} M chars out)")
    print(f"read_warc + html_block_text:   {t3:6.2f}s  "
          f"{mb / t3:7.1f} MB/s  {n_pages / t3:8.0f} pages/s  "
          f"({chars_blk / 1e6:.0f} M chars out)")
    print(f"read_warc + html_main_text:    {t4:6.2f}s  "
          f"{mb / t4:7.1f} MB/s  {n_pages / t4:8.0f} pages/s  "
          f"({chars_main / 1e6:.0f} M chars out, "
          f"kept {chars_main / chars_blk:.3f} of block text)")

    # --- the measured extractor TRADE (VERDICT r8 item 3): how much a
    # 100 TB build saves by main-content extraction, priced by the same
    # cards a production pipeline runs. extraction_compare_card gives
    # per-host kept share; boilerplate_card over block-vs-main corpora
    # gives the template/keyword line-mass each extractor leaves in the
    # corpus downstream gates would otherwise have to catch.
    from resin_spark.operators.extract import (boilerplate_card,
                                               extraction_compare_card)
    warc = read_warc(spark, d)

    def timed_rows(make_df):
        best, rows = float("inf"), None
        for _ in range(2):           # min-of-2, like the stage timings
            t0 = time.time()
            rows = make_df().collect()
            best = min(best, time.time() - t0)
        return best, rows

    t5, cc = timed_rows(lambda: extraction_compare_card(warc))
    tot_all = sum(r["chars_all"] for r in cc)
    tot_main = sum(r["chars_main"] for r in cc)
    print(f"extraction_compare_card:       {t5:6.2f}s  "
          f"{len(cc)} hosts, corpus kept share "
          f"{tot_main / tot_all:.3f}")
    for name, extractor in (("block", html_block_text),
                            ("main", html_main_text)):
        t6, rows = timed_rows(lambda: boilerplate_card(
            warc_extract_text(warc, extractor=extractor)))
        [bc] = rows
        print(f"boilerplate_card[{name:5s}]:      {t6:6.2f}s  "
              f"template_char_share {bc['template_char_share']:.3f}  "
              f"keyword_char_share {bc['keyword_char_share']:.3f}  "
              f"({bc['n_lines']} lines)")
    spark.stop()
    shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
