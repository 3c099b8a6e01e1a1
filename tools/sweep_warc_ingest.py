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
                "".join(f"<p>{_PARA * 3} #{i}-{k}</p>" for k in range(8)),
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
    # warm the JVM/Arrow path on one segment before timing
    read_warc(spark, os.path.join(d, "seg000.warc.gz")).count()
    t0 = time.time()
    n1 = read_warc(spark, d).count()
    t1 = time.time() - t0
    t0 = time.time()
    ext = warc_extract_text(read_warc(spark, d))
    n2, chars = ext.selectExpr("count(*)", "sum(n_chars)").first()
    t2 = time.time() - t0
    assert n1 == n2 == n_pages
    from resin_spark.operators.extract import html_block_text, html_main_text
    t0 = time.time()
    blk = warc_extract_text(read_warc(spark, d), extractor=html_block_text)
    n3, chars_blk = blk.selectExpr("count(*)", "sum(n_chars)").first()
    t3 = time.time() - t0
    t0 = time.time()
    mn = warc_extract_text(read_warc(spark, d), extractor=html_main_text)
    n4, chars_main = mn.selectExpr("count(*)", "sum(n_chars)").first()
    t4 = time.time() - t0
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
    spark.stop()
    shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
