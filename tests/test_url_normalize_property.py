"""Property test: extract.url_normalize (pure column expression) vs an
independent scalar Python model of its documented contract (r10).

The column expression is crawl step 0 at 100 TB (frontier dedup key),
so its regex chain deserves adversarial coverage beyond the hand cases
in test_streaming_io: hypothesis-generated URLs with tracking params
in every position, fragments, mixed-case schemes/authorities, empty
param values, repeated separators, and non-absolute strings.
"""

from __future__ import annotations

import re

import pytest

pytestmark = pytest.mark.full_suite  # a 64k-case scalar property sweep: full tier only (VERDICT r11 item 1)


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st
    HAVE_HYP = True
except ImportError:  # pragma: no cover
    HAVE_HYP = False


def model(url: str) -> str:
    """Scalar mirror of extract.url_normalize's documented steps, in
    the same order the column expression applies them."""
    # strip(' '), not strip(): Spark's F.trim removes ASCII spaces
    # only — a trailing newline survives the engine's trim (first
    # pinned by the \n-bearing strategy rows below).
    c = url.strip(" ")
    m = re.match(r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", c)
    if not m:
        return c
    head = m.group(1)
    rest = c[len(head):]
    # No DOTALL (ADVICE r10): Spark's Java `#.*$` neither matches a
    # fragment across a newline ('.' excludes \n in both engines) nor
    # anchors mid-string ($ = end of input / before a sole trailing
    # \n in both default modes) — the strategy generates \n-bearing
    # paths and fragments to keep this pinned. \r is excluded from the
    # strategy: Java's '.' rejects it while Python's accepts it, a
    # representational divergence the engine contract doesn't promise
    # anything about.
    rest = re.sub(r"#.*$", "", rest)
    rest = re.sub(r"([?&])(utm_[A-Za-z0-9_]*|fbclid|gclid)=[^&#]*",
                  r"\1", rest)
    rest = re.sub(r"\?&+", "?", rest)
    rest = re.sub(r"&{2,}", "&", rest)
    rest = re.sub(r"[?&]+$", "", rest)
    rest = re.sub(r"/$", "", rest)
    return head.lower() + rest


_SCHEMES = st.sampled_from(["http", "HTTP", "https", "HtTpS", "ftp"])
_HOSTS = st.sampled_from(["Example.COM", "a.b.c", "x-y.example",
                          "example.com:8080", ""])
_PATH_BITS = st.sampled_from(["", "/", "/a", "/A/b", "/a/", "/a//b",
                              "/café", "/%7Euser", "/a\nb", "/a\n"])
_PARAMS = st.lists(st.sampled_from(
    ["q=1", "utm_source=news", "utm_=x", "utm_campaign=", "fbclid=abc",
     "gclid=", "a=b", "A=B", "empty=", "x=utm_source", "fbclid2=keep",
     "myutm_a=keep"]), max_size=5)
_FRAGS = st.sampled_from(["", "#", "#frag", "#a?b=utm_c", "#?&",
                          "#fr\nag", "#f\n"])


@st.composite
def urls(draw):
    kind = draw(st.integers(0, 9))
    if kind == 0:
        # non-absolute / junk strings: must pass through trimmed
        return draw(st.sampled_from(
            ["", "   ", "example.com/a?utm_a=1", "not a url",
             "://nohead", "1http://x.com", "mailto:a@b",
             "  /rel/path?utm_b=2#f  "]))
    scheme = draw(_SCHEMES)
    host = draw(_HOSTS)
    path = draw(_PATH_BITS)
    params = draw(_PARAMS)
    frag = draw(_FRAGS)
    q = ("?" + "&".join(params)) if params else draw(
        st.sampled_from(["", "?", "?&"]))
    pad = draw(st.sampled_from(["", " ", "  "]))
    return f"{pad}{scheme}://{host}{path}{q}{frag}{pad}"


@pytest.mark.skipif(not HAVE_HYP, reason="hypothesis not installed")
@settings(max_examples=60, deadline=None)
@given(st.lists(urls(), min_size=1, max_size=24, unique=True))
def test_url_normalize_matches_scalar_model(spark, batch):
    from pyspark.sql import functions as F

    from resin_spark.operators.extract import url_normalize

    df = spark.createDataFrame([(u,) for u in batch], "url string")
    got = [r["n"] for r in
           df.select(url_normalize(F.col("url")).alias("n")).collect()]
    want = [model(u) for u in batch]
    assert got == want, [
        (u, g, w) for u, g, w in zip(batch, got, want) if g != w]
