"""Feature-parity tests for the hashed token embedder.

``scalar_token_vector`` is a line-for-line transliteration of the
reference's TokenizeIntoVectors (StringAnalyzer.cs:614-712 and the
feature helpers it calls); the vectorised batch path must reproduce it
exactly. Also covers the BuildLexicon/ValidateLexicon angle-key
round-trip (StringAnalyzer.cs:35-80, :97-130; LexiconInspector.cs).
"""

from __future__ import annotations

import unicodedata

import numpy as np

from resin_spark.functions import hashing as H

DIMS = 512


def scalar_token_vector(s: str, dims: int = DIMS) -> np.ndarray:
    w = np.zeros(dims)
    L = len(s)
    for i, c in enumerate(s):
        if i >= dims:
            break
        w[i] += ord(c)
    for n in (3, 4, 5):
        for i in range(L - n + 1):
            w[H._fnv1a(s[i:i + n]) % dims] += 1.0
    p = H._fnv1a("bg:") % dims
    for i in range(L - 1):
        key = s[i] + s[i + 1] + chr(i & 0xFF) + chr((i >> 8) & 0xFF)
        w[(p + H._fnv1a(key) % dims) % dims] += 0.75
    p = H._fnv1a("sg1:") % dims
    for i in range(L - 2):
        key = s[i] + s[i + 2] + chr(i & 0xFF) + chr((i >> 8) & 0xFF)
        w[(p + H._fnv1a(key) % dims) % dims] += 0.5
    ps, pe = H._fnv1a("tri:start:") % dims, H._fnv1a("tri:end:") % dims
    if L >= 3:
        w[(ps + H._fnv1a(s[:3]) % dims) % dims] += 0.65
        w[(pe + H._fnv1a(s[-3:]) % dims) % dims] += 0.65
    elif L == 2:
        w[(ps + H._fnv1a(s[0] + s[1] + "_") % dims) % dims] += 0.65
        w[(pe + H._fnv1a("_" + s[0] + s[1]) % dims) % dims] += 0.65
    elif L == 1:
        w[(ps + H._fnv1a(s[0] + "__") % dims) % dims] += 0.65
        w[(pe + H._fnv1a("__" + s[0]) % dims) % dims] += 0.65
    if L > 0:
        w[(H._fnv1a("first:") % dims + H._fnv1a(s[0]) % dims) % dims] += 0.75
        w[(H._fnv1a("last:") % dims + H._fnv1a(s[-1]) % dims) % dims] += 0.75
    b = ("len:0" if L == 0 else "len:1" if L == 1 else "len:2" if L == 2
         else "len:3" if L == 3 else "len:4" if L == 4
         else "len:5-8" if L <= 8 else "len:9-16" if L <= 16 else "len:17+")
    w[H._fnv1a(b) % dims] += 0.5
    vc = "".join(("V" if c.lower() in "aeiouy" else "C") if c.isalpha() else "X"
                 for c in s)
    w[(H._fnv1a("vc:") % dims + H._fnv1a(vc) % dims) % dims] += 0.5
    if L <= 3:
        h = np.uint64(0)
        with np.errstate(over="ignore"):
            for c in s:
                h = np.uint64((h ^ np.uint64(ord(c))) * H.ROLL_SEED)
        w[int(h) % dims] += 0.8
    w[H._fnv1a("case:lower" if s.lower() == s else "case:mixed") % dims] += 0.5
    if s.upper() == s:
        w[H._fnv1a("case:upper") % dims] += 0.5
    if L and s[0].isalpha() and s[0].isupper():
        w[H._fnv1a("case:title") % dims] += 0.5
    puc = H._fnv1a("uc:") % dims
    for c in s:
        cat = H._NET_CATEGORY.get(unicodedata.category(c), 29)
        key = chr(ord("0") + cat % 10) + chr(ord("0") + (cat // 10) % 10)
        w[(puc + H._fnv1a(key) % dims) % dims] += 0.25
    pn = H._fnv1a("feat:number:") % dims
    pg = H._fnv1a("feat:geo:") % dims
    w[(pn + H._fnv1a("is" if H._is_number_token(s) else "not") % dims) % dims] += 0.6
    w[(pg + H._fnv1a("is" if H._is_geo_token(s) else "not") % dims) % dims] += 0.6
    n = np.linalg.norm(w)
    return w / n if n > 0 else w


TOKENS = [
    "hello", "World", "A", "ab", "abc", "HTML", "Tokyo2020", "40.7128",
    "74.0060W", "x", "1,234.5", "café", "ÉCOLE", "+", "Z9",
    "supercalifragilisticexpialidocious", "90N", "181E", "-45.5S",
    # r8 cutover shapes: bare in-range integers, NaN symbol (any case),
    # exponent geo, packed DMS, non-ASCII digits
    "45", "NaN", "nan", "Infinity", "1e2", "404156°N", "٤٥", "12345",
]


def test_vectorised_matches_scalar_reference():
    vec = H.token_vectors(TOKENS, DIMS)
    for i, t in enumerate(TOKENS):
        ref = scalar_token_vector(t)
        assert np.allclose(vec[i], ref, atol=1e-12), f"feature mismatch: {t!r}"


def test_vectors_are_unit_norm():
    vec = H.token_vectors(TOKENS, DIMS)
    norms = np.linalg.norm(vec, axis=1)
    assert np.allclose(norms, 1.0)


def test_net_tryparse_fidelity():
    """double.TryParse(Float|AllowThousands, invariant) corners the old
    regex analog got wrong (r7 reference re-read, StringAnalyzer.cs:
    415-431): invariant parsing is ASCII-digit-only, accepts the
    NaN/Infinity symbols (case-insensitively since .NET Core 3.0 — the
    reference targets net9), trailing decimal points, and ',' between
    any two digits without group-size validation. Live since the r8
    cutover."""
    assert H._is_number_token("NaN")     # invariant NaNSymbol parses
    assert H._is_number_token("Infinity")
    assert H._is_number_token("-Infinity")
    assert H._is_number_token("nan")     # symbols match case-insensitively
    assert H._is_number_token("INFINITY")
    assert not H._is_number_token("inf")  # partial symbol never parses
    assert H._is_number_token("5.")      # trailing point is legal
    assert H._is_number_token(".5")
    assert not H._is_number_token(".")
    assert H._is_number_token("1,2")     # lenient grouping → 12
    assert not H._is_number_token(",5")  # separator before any digit
    assert not H._is_number_token("1,")  # separator must precede a digit
    assert not H._is_number_token("٤٥")  # Nd digits ≠ ASCII digits
    assert not H._is_number_token("1e")  # empty exponent
    assert not H._is_number_token("e5")  # empty mantissa
    assert H._is_number_token("1e5")
    # unchanged verdicts vs the old regex analog
    assert H._is_number_token("42")
    assert H._is_number_token("1,234.5")
    assert H._is_number_token("-3.2e10")
    assert not H._is_number_token("abc")
    assert not H._is_number_token("")


def test_geo_live_token_shapes():
    """The geo shapes that actually survive SplitWords (r7 reference
    re-read, StringAnalyzer.cs:436-592): bare in-range digit runs — the
    reference's own GeoFeature_IncreasesSimilarityForCoordinatePairs
    relies on '40'/'74' (the comma/point-split fragments) being geo —
    hemisphere suffixes incl. 'e'-as-East, exponent forms, and packed
    DMS behind a degree sign ('°' is So, a data char in both
    tokenizers). Live since the r8 cutover."""
    assert H._is_geo_token("45")         # bare integer ≤ 90
    assert H._is_geo_token("180")        # bare integer ≤ 180
    assert not H._is_geo_token("181")
    assert H._is_geo_token("90N")
    assert H._is_geo_token("90e")        # trailing 'e' is East
    assert H._is_geo_token("1e2")        # 100 → lon range
    assert not H._is_geo_token("12e2")   # 1200 → out of range
    assert not H._is_geo_token("٤٥")     # Nd digits don't parse
    assert not H._is_geo_token("NaN")    # NaN fails every range check
    # packed DMS (Case 3b — the live °-form)
    assert H._is_geo_token("404156°N")   # 40°41'56"N
    assert H._is_geo_token("404156°")    # hemisphere optional
    assert H._is_geo_token("1234045°E")  # 7 digits → 123°40'45"E
    assert not H._is_geo_token("994156°N")  # 99.69° > 90 for a latitude
    assert H._is_geo_token("994156°E")   # …but fine as a longitude
    assert not H._is_geo_token("404199°N")  # seconds ≥ 60
    assert not H._is_geo_token("406956°N")  # minutes ≥ 60
    assert not H._is_geo_token("4041°N")  # 4 digits: not a packed form
    assert not H._is_geo_token("°N")     # degree sign at position 0
    # unchanged verdicts vs the old regex analog
    assert H._is_geo_token("40.7128N")
    assert H._is_geo_token("74.0060W")
    assert H._is_geo_token("40.7128")
    assert not H._is_geo_token("91N")
    assert not H._is_geo_token("181E")
    assert not H._is_geo_token("12345")
    # delimited DMS (Case 3a — dead post-split, live for direct callers)
    assert H._is_geo_token("40°42'51\"N")
    assert H._is_geo_token("74°00'21\"W")


def test_angle_key_locality_and_identity():
    """BuildLexicon keys: identical tokens collide, the key is in [-1,1],
    and similar spellings land nearer than unrelated ones."""
    toks = ["transform", "transform", "transforms", "zebra"]
    m = H.token_vectors(toks, DIMS)
    unit = np.full(DIMS, 1.0 / np.sqrt(DIMS))
    keys = m @ unit
    assert keys[0] == keys[1]
    assert np.all((-1.0 <= keys) & (keys <= 1.0))
    assert abs(keys[0] - keys[2]) < abs(keys[0] - keys[3])


def test_lexicon_angle_validates(spark):
    """ValidateLexicon analog: every distinct token's angle key probes
    successfully in the built lexicon (StringAnalyzer.cs:97-130), and
    LexiconInspector.FindMissingAngles-style random probes miss."""
    from resin_spark.io import load_tables
    from resin_spark.operators import textops

    t = load_tables(spark, "/root/testdata/sf0.001")
    lex = textops.lexicon_angle(t).collect()
    assert len(lex) > 0
    keys = np.array([r["angle_key"] for r in lex])
    assert np.all(np.diff(keys) > 0)  # sorted, unique angle keys
    # validate: recompute every stored token's angle — must be present
    stored = [r["token"] for r in lex]
    m = H.token_vectors(stored, DIMS)
    unit = np.full(DIMS, 1.0 / np.sqrt(DIMS))
    # same key derivation as BuildLexicon (StringAnalyzer.cs:55-56):
    # CosAngle(Analyze(vec, unit), unit) over the 10-component signature
    sig = H.analyze_signatures(m, unit)
    recomputed = sig.sum(axis=1) / np.sqrt(DIMS) / np.linalg.norm(sig, axis=1)
    present = np.isin(np.round(recomputed, 12), np.round(keys, 12))
    assert present.all()
    # inspector: uniform random angles should (almost) all be missing
    rng = np.random.RandomState(12345)
    probes = rng.uniform(-1, 1, 200)
    hits = np.isin(np.round(probes, 12), np.round(keys, 12)).sum()
    assert hits == 0


def splitwords_reference(text: str) -> list[str]:
    """Line-for-line transliteration of SplitWords + IsData
    (StringAnalyzer.cs:252-309, :173-177, _validData :16-23): walks
    UTF-16 chars, so non-BMP chars are surrogate halves (Cs, never
    data)."""
    valid = {"Lu", "Ll", "Lt", "Lm", "Lo", "Nd", "Nl", "No",
             "Sc", "Sm", "Sk", "So"}
    units = text.encode("utf-16-le")
    chars = [units[i:i + 2].decode("utf-16-le", "surrogatepass")
             for i in range(0, len(units), 2)]
    words, buf = [], []
    for c in chars:
        cat = unicodedata.category(c)
        if cat in valid:
            if cat == "Sm":
                if buf:
                    words.append("".join(buf))
                    buf = []
                words.append(c)
            else:
                buf.append(c)
        else:
            if buf:
                words.append("".join(buf))
                buf = []
    if buf:
        words.append("".join(buf))
    return words


def test_tokenize_matches_splitwords_reference():
    cases = [
        "hello world",
        "Tokyo2020 + café ÉCOLE",
        "3.14 is pi, 1,234 thousands",     # '.'/',' are Po: digits split
        "a+b=c",                           # Sm standalone: +, =
        "price $9 99¢ 5€",                 # Sc runs with digits
        "emoji \U0001F600 splits",         # non-BMP: surrogate halves
        "x\U0001D54Fy",                    # math alphanumeric is non-BMP
        "汉字 and ひらがな",
        "", "   ", "...",
    ]
    for s in cases:
        assert H._tokenize(s) == splitwords_reference(s), repr(s)


def test_fnv1a_utf16_units():
    # independent scalar over UTF-16 units: emoji = two surrogate halves
    def fnv_units(units):
        h = 14695981039346656037
        for u in units:
            h = ((h ^ u) * 1099511628211) % (1 << 64)
        return h

    s = "a\U0001F600b"
    units = [0x61, 0xD83D, 0xDE00, 0x62]
    assert H._fnv1a(s) == fnv_units(units)
