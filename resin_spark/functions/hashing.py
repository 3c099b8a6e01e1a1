"""Hashed-feature text embedding + string hashes (Arrow-vectorised).

Full feature-family parity with the reference's TokenizeIntoVectors
(reference: src/Resin.TextAnalysis/StringAnalyzer.cs:614-712), per token:

- base positional codepoints      word[i] = code(c_i), i < dims   (:620-627)
- char n-grams n=3..5, w 1.0      HashToIndex(gram)               (:181-194)
- positional bigrams, w 0.75      (p_bg + h(c_i,c_i+1,pos))%dims  (:312-327)
- skip-grams-1, w 0.5             (p_sg1 + h(c_i,c_i+2,pos))%dims (:328-343)
- boundary trigrams, w 0.65       first3/last3 with '_' padding
                                  for len 1..2 tokens             (:345-371)
- first/last char, w 0.75         (p_first + h(c))%dims           (:648-659)
- length buckets, w 0.5           len:0..4, len:5-8, len:9-16,
                                  len:17+                         (:661-674)
- vowel/consonant pattern, w 0.5  V/C/X string hash               (:388-400)
- rolling hash for len<=3, w 0.8  Knuth-multiplicative            (:676-681,402-412)
- case features, w 0.5            case:lower/mixed (+upper/title) (:216-238)
- Unicode-category dist, w 0.25   two-digit .NET category code
                                  per char                        (:240-252)
- numeric + geo hints, w 0.6      feat:number/feat:geo is/not     (:596-611)
- L2 normalisation                                               (:687-696)

All hashing is the reference's FNV-1a-over-code-units HashToIndex
(:196-207), iterated over UTF-16 code units exactly as C# does — the
token stream, window positions, lengths, and FNV inputs all count
units, so supplementary-plane text hashes identically (knuth_hash
below shares the same handling).

Execution shape: a pandas UDF over Arrow batches, where every feature
family is a vectorised numpy pass over the batch-wide token stream
(codepoints + SEP poisoning between tokens) — scatter-added into the
owner (doc or token) matrix. No per-char or per-ngram Python calls in
the corpus path; only per-unique-codepoint table builds and one
pandas-vectorised regex pass for numeric/geo.

Doc-level embedding (embed_text_udf) sums RAW token features then
L2-normalises once — a deliberate adaptation (the reference only
defines per-token vectors); token-level embedding (token_vectors /
angle keys) normalises per token, exactly like the reference.
"""

from __future__ import annotations

import re
import unicodedata

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, DoubleType, LongType

FNV_OFFSET = np.uint64(14695981039346656037)
FNV_PRIME = np.uint64(1099511628211)

KNUTH_INIT = np.uint64(3074457345618258791)
KNUTH_MULT = np.uint64(3074457345618258799)
ROLL_SEED = np.uint64(11400714819323198485)  # Knuth multiplicative (:404)

_SEP = np.uint32(0xFFFFFFFF)  # never a codepoint; poisons cross-token windows

# .NET UnicodeCategory enum value per unicodedata two-letter category
# (System.Globalization.UnicodeCategory ordering).
_NET_CATEGORY = {
    "Lu": 0, "Ll": 1, "Lt": 2, "Lm": 3, "Lo": 4, "Mn": 5, "Mc": 6, "Me": 7,
    "Nd": 8, "Nl": 9, "No": 10, "Zs": 11, "Zl": 12, "Zp": 13, "Cc": 14,
    "Cf": 15, "Cs": 16, "Co": 17, "Pc": 18, "Pd": 19, "Ps": 20, "Pe": 21,
    "Pi": 22, "Pf": 23, "Po": 24, "Sm": 25, "Sc": 26, "Sk": 27, "So": 28,
    "Cn": 29,
}

# --- .NET invariant number parsing (transliterated; live since r8) ----------
#
# The r7 reference re-read found the earlier regex analogs diverged
# from the reference on LIVE token shapes; the faithful transliteration
# below replaced them at the r8 cutover (window contract: string_compare
# rode the r7 driver tail, its r8 rotation slot is when the flip landed).
#
# What the transliteration fixes, per IsNumberToken (StringAnalyzer.cs:
# 415-431) = double.TryParse(NumberStyles.Float|AllowThousands,
# InvariantCulture) and IsLongitudeLatitudeToken (:436-592):
# .NET invariant parsing accepts ONLY ASCII '0'-'9' (never Arabic-Indic
# or other Nd digits Python's float() normalises), accepts the invariant
# special symbols "NaN"/"Infinity", accepts a trailing decimal point
# ("5."), and — with AllowThousands — accepts ',' between ANY two digits
# without validating group sizes ("1,2" parses as 12). Geo Case 2 has NO
# decimal-point requirement (bare digit runs ≤180 ARE geo — the
# reference's own coordinate-pair test relies on the '40'/'74' split
# fragments matching), a trailing 'e' reads as East, exponent forms
# parse ("1e2" = 100 → geo), and packed DMS "404156°N" is live ('°' is
# So, a data char in both tokenizers). The comma/space-pair and
# delimited-DMS branches are dead in BOTH engines ('.', ',', '\'', '"'
# are Po, '+' is Sm standalone, '-' is Pd — none survive SplitWords)
# but are transliterated anyway so direct API callers diverge nowhere.
_NET_WS = "\t\n\x0b\x0c\r "  # the parser's IsWhite set: 0x09-0x0D + 0x20


def _net_parse_float(s: str, allow_thousands: bool = True):
    """double.TryParse(Float[|AllowThousands], invariant) analog:
    returns the parsed float, or None on failure."""
    if not s:
        return None
    i, n = 0, len(s)
    while i < n and s[i] in _NET_WS:
        i += 1
    while n > i and s[n - 1] in _NET_WS:
        n -= 1
    if i >= n:
        return None
    neg = False
    if s[i] in "+-":  # AllowLeadingSign
        neg = s[i] == "-"
        i += 1
    rest = s[i:n]
    # invariant NaNSymbol / (Positive)InfinitySymbol — matched
    # case-insensitively since .NET Core 3.0 (the reference targets net9)
    if rest.lower() == "nan":
        return float("nan")
    if rest.lower() == "infinity":
        return float("-inf") if neg else float("inf")
    int_digits = []
    frac_digits = []
    while i < n:
        c = s[i]
        if "0" <= c <= "9":
            int_digits.append(c)
            i += 1
        elif (c == "," and allow_thousands and int_digits
                and i + 1 < n and "0" <= s[i + 1] <= "9"):
            i += 1  # lenient grouping: ',' between digits, sizes unchecked
        else:
            break
    if i < n and s[i] == ".":
        i += 1
        while i < n and "0" <= s[i] <= "9":
            frac_digits.append(s[i])
            i += 1
    if not int_digits and not frac_digits:
        return None
    exp = ""
    if i < n and s[i] in "eE":
        j = i + 1
        esign = ""
        if j < n and s[j] in "+-":
            esign = s[j]
            j += 1
        ed = []
        while j < n and "0" <= s[j] <= "9":
            ed.append(s[j])
            j += 1
        if not ed:
            return None
        exp = "e" + esign + "".join(ed)
        i = j
    if i != n:
        return None
    lit = ("-" if neg else "") + ("".join(int_digits) or "0") \
        + "." + ("".join(frac_digits) or "0") + exp
    return float(lit)  # float() saturates to ±inf on overflow, like .NET


def _is_number_token(s: str) -> bool:
    """IsNumberToken (StringAnalyzer.cs:415-431). Note 'NaN'/'Infinity'
    ARE numbers to the reference (TryParse succeeds on the invariant
    special symbols, case-insensitively since .NET Core 3.0)."""
    return bool(s) and _net_parse_float(s, allow_thousands=True) is not None


# IsLongitudeLatitudeToken (StringAnalyzer.cs:436-592), full
# transliteration.
_HEMI_CHARS = "NnSsEeWw"


def _try_decimal_hemi(s: str):
    """TryParseDecimalWithHemisphere (StringAnalyzer.cs:441-466):
    (value, hemi) with hemi in {'\\0','N','S','E','W'}, or None."""
    t = s.strip(_NET_WS)
    if not t:
        return None
    hemi = "\0"
    if t[-1] in _HEMI_CHARS:
        hemi = t[-1].upper()
        t = t[:-1].rstrip(_NET_WS)
    v = _net_parse_float(t, allow_thousands=True)
    if v is None:
        return None
    return v, hemi


def _is_geo_token(s: str) -> bool:
    if not s:
        return False

    def lat_ok(v: float, h: str) -> bool:
        return -90.0 <= v <= 90.0 and h in ("\0", "N", "S")

    def lon_ok(v: float, h: str) -> bool:
        return -180.0 <= v <= 180.0 and h in ("\0", "E", "W")

    # Case 1: "lat,lon" / "lat lon" pair (dead post-tokenisation)
    ci = s.find(",")
    if ci >= 0:
        left, right = _try_decimal_hemi(s[:ci]), _try_decimal_hemi(s[ci + 1:])
        if left and right and lat_ok(*left) and lon_ok(*right):
            return True
    else:
        si = s.find(" ")
        if si > 0:
            left, right = _try_decimal_hemi(s[:si]), _try_decimal_hemi(s[si + 1:])
            if left and right and lat_ok(*left) and lon_ok(*right):
                return True

    # Case 2: single coordinate, optional hemisphere. A hemisphere
    # letter RETURNS the range verdict (no DMS fallback); only the
    # hemisphere-less out-of-range case falls through.
    ph = _try_decimal_hemi(s)
    if ph is not None:
        v, hemi = ph
        if hemi in ("N", "S"):
            return -90.0 <= v <= 90.0
        if hemi in ("E", "W"):
            return -180.0 <= v <= 180.0
        if -90.0 <= v <= 90.0 or -180.0 <= v <= 180.0:
            return True

    # Case 3: degree-sign forms
    di = s.find("°")
    if di > 0:
        # 3a: delimited DMS 40°42'51"N (dead: ' and " split tokens)
        deg = _net_parse_float(s[:di], allow_thousands=False)
        if deg is not None:
            likely_lat = 0.0 <= deg <= 90.0
            likely_lon = 0.0 <= deg <= 180.0
            has_min = s.find("'") > di
            has_sec = s.find('"') > di
            if (has_min or has_sec) and (likely_lat or likely_lon):
                last = s[-1]
                if last in "NnSs":
                    return likely_lat
                if last in "EeWw":
                    return likely_lon
                return True
        # 3b: packed DMS DDMMSS°/DDDMMSS° + optional hemisphere (LIVE).
        # char.IsDigit is Unicode Nd — but any non-digit in the packed
        # segment aborts the WHOLE function (the reference's early
        # return), and int.TryParse(NumberStyles.None) then rejects
        # non-ASCII digits.
        packed = s[:di]
        for ch in packed:
            if not unicodedata.category(ch) == "Nd":
                return False
        if len(packed) in (5, 6, 7):
            if not all("0" <= c <= "9" for c in packed):
                return False
            ss_ = int(packed[-2:])
            mm = int(packed[-4:-2])
            dd = int(packed[:-4])
            if not (0 <= mm < 60 and 0 <= ss_ < 60):
                return False
            decimal_degrees = dd + mm / 60.0 + ss_ / 3600.0
            last = s[-1]
            if last in "NnSs":
                return decimal_degrees <= 90.0
            if last in "EeWw":
                return decimal_degrees <= 180.0
            return decimal_degrees <= 180.0  # ≤90 OR ≤180 collapses

    return False


# Hot-path prefilter: a SUPERSET of every token either predicate can
# accept — numbers need an ASCII digit or an (optionally signed,
# any-case) NaN/Infinity symbol; geo needs ASCII digits (° alone never
# suffices).
_NUMGEO_CAND_RE = re.compile(r"[0-9]|nan|infinity", re.IGNORECASE)


def _fnv1a(s: str) -> int:
    """Scalar FNV-1a over UTF-16 code units (HashToIndex's hash,
    pre-modulo) — non-BMP chars contribute two surrogate halves,
    exactly as C#'s char iteration does."""
    with np.errstate(over="ignore"):
        h = FNV_OFFSET
        for u in np.frombuffer(s.encode("utf-16-le"), dtype="<u2"):
            h = np.uint64(h ^ np.uint64(u))
            h = np.uint64(h * FNV_PRIME)
        return int(h)


def _hash_to_index(s: str, dims: int) -> int:
    return _fnv1a(s) % dims


def _fnv1a_windows(win: np.ndarray) -> np.ndarray:
    """Vectorised FNV-1a across rows of a (rows, n) codepoint matrix."""
    h = np.full(win.shape[0], FNV_OFFSET, dtype=np.uint64)
    for j in range(win.shape[1]):
        h = (h ^ win[:, j].astype(np.uint64)) * FNV_PRIME
    return h


# _validData (StringAnalyzer.cs:16-23): all letters, all numbers, and
# the Sc/Sk/So symbol categories run together into words; Sm is data but
# emitted standalone (SplitWords :252-309); everything else separates.
_DATA_CATS = frozenset(
    {"Lu", "Ll", "Lt", "Lm", "Lo", "Nd", "Nl", "No", "Sc", "Sk", "So"}
)
_CHAR_CLASS: dict[str, int] = {}  # 0 separator, 1 data, 2 standalone math


def _char_class(ch: str) -> int:
    cls = _CHAR_CLASS.get(ch)
    if cls is None:
        if ord(ch) > 0xFFFF:
            # C# walks UTF-16 chars: a non-BMP char is two surrogate
            # halves, category Cs — never data, so it splits words
            cls = 0
        else:
            cat = unicodedata.category(ch)
            cls = 2 if cat == "Sm" else (1 if cat in _DATA_CATS else 0)
        _CHAR_CLASS[ch] = cls
    return cls


def _tokenize(text: str) -> list[str]:
    """SplitWords transliteration (StringAnalyzer.cs:252-309 with IsData
    :173-177): case-preserving, full Unicode-category parity. Note the
    consequences the reference's rules imply: '.' and ',' are Po (not
    data), so '3.14' tokenizes as ['3', '14'] and the numeric/geo
    features only ever see the token shapes the reference can produce;
    non-BMP characters split words (see _char_class)."""
    out: list[str] = []
    buf: list[str] = []
    for ch in text or "":
        cls = _char_class(ch)
        if cls == 1:
            buf.append(ch)
        else:
            if buf:
                out.append("".join(buf))
                buf.clear()
            if cls == 2:
                out.append(ch)
    if buf:
        out.append("".join(buf))
    return out


class _FeatureTables:
    """Per-dims precomputed constants (prefix hashes, bucket dims)."""

    def __init__(self, dims: int):
        self.dims = dims
        self.p_bg = _hash_to_index("bg:", dims)
        self.p_sg1 = _hash_to_index("sg1:", dims)
        self.p_tri_start = _hash_to_index("tri:start:", dims)
        self.p_tri_end = _hash_to_index("tri:end:", dims)
        self.p_first = _hash_to_index("first:", dims)
        self.p_last = _hash_to_index("last:", dims)
        self.p_vc = _hash_to_index("vc:", dims)
        self.p_uc = _hash_to_index("uc:", dims)
        buckets = ["len:0", "len:1", "len:2", "len:3", "len:4",
                   "len:5-8", "len:9-16", "len:17+"]
        self.len_dims = np.array([_hash_to_index(b, dims) for b in buckets],
                                 dtype=np.int64)
        # category int (0..29) -> feature dim, via the two-digit encoding
        # catSpan = ['0'+cat%10, '0'+cat//10%10] (StringAnalyzer.cs:243-249)
        self.cat_dims = np.array([
            (self.p_uc + _hash_to_index(
                chr(ord("0") + c % 10) + chr(ord("0") + (c // 10) % 10), dims
            )) % dims
            for c in range(30)
        ], dtype=np.int64)
        self.d_case_lower = _hash_to_index("case:lower", dims)
        self.d_case_mixed = _hash_to_index("case:mixed", dims)
        self.d_case_upper = _hash_to_index("case:upper", dims)
        self.d_case_title = _hash_to_index("case:title", dims)
        p_num = _hash_to_index("feat:number:", dims)
        p_geo = _hash_to_index("feat:geo:", dims)
        h_is, h_not = _hash_to_index("is", dims), _hash_to_index("not", dims)
        self.d_num = np.array([(p_num + h_not) % dims, (p_num + h_is) % dims])
        self.d_geo = np.array([(p_geo + h_not) % dims, (p_geo + h_is) % dims])


_TABLES: dict[int, _FeatureTables] = {}


def _tables(dims: int) -> _FeatureTables:
    if dims not in _TABLES:
        _TABLES[dims] = _FeatureTables(dims)
    return _TABLES[dims]


def _len_bucket(lens: np.ndarray) -> np.ndarray:
    """len -> index into _FeatureTables.len_dims (buckets at :661-674)."""
    out = np.full(lens.shape, 7, dtype=np.int64)          # len:17+
    out[lens <= 16] = 6                                    # len:9-16
    out[lens <= 8] = 5                                     # len:5-8
    for v in (4, 3, 2, 1, 0):
        out[lens == v] = v
    return out


def _char_tables(codes: np.ndarray):
    """Per-unique-codepoint classification tables for this batch."""
    uniq = np.unique(codes)
    uniq = uniq[uniq != _SEP]
    chars = [chr(int(c)) for c in uniq]
    is_alpha = np.array([c.isalpha() for c in chars], dtype=bool)
    is_upper_stable = np.array([c.lower() == c for c in chars], dtype=bool)
    is_lower_stable = np.array([c.upper() == c for c in chars], dtype=bool)
    is_vowel = np.array([c.lower() in "aeiouy" for c in chars], dtype=bool)
    is_ucase = np.array([c.isupper() for c in chars], dtype=bool)
    cat = np.array([_NET_CATEGORY.get(unicodedata.category(c), 29)
                    for c in chars], dtype=np.int64)
    return uniq, is_alpha, is_upper_stable, is_lower_stable, is_vowel, is_ucase, cat


def _lookup(uniq: np.ndarray, table: np.ndarray, codes: np.ndarray,
            default=0):
    """table[searchsorted(uniq, codes)] with SEP-safe default."""
    idx = np.searchsorted(uniq, codes)
    idx = np.clip(idx, 0, len(uniq) - 1)
    out = table[idx]
    bad = uniq[idx] != codes
    if bad.any():
        out = np.where(bad, default, out)
    return out


def accumulate_token_features(tokens: list[str], owners: np.ndarray,
                              n_owners: int, dims: int) -> np.ndarray:
    """Scatter-add every reference feature of every token into its
    owner's row; returns the UNnormalised (n_owners, dims) matrix.

    Owners are doc indices (document embedding) or 0..n_tokens-1
    (per-token vectors). Everything below is batch-wide numpy; the only
    Python loops are over n-gram width (≤5), short masked positions
    (≤ max token length for VC/rolling), and unique codepoints.
    """
    T = _tables(dims)
    mats = np.zeros(n_owners * dims, dtype=np.float64)
    if not tokens:
        return mats.reshape(n_owners, dims)

    # UTF-16 code units, not codepoints: C# strings index by unit, so
    # window positions, lengths, and FNV inputs must all count units
    codes_list = [
        np.frombuffer(t.encode("utf-16-le"), dtype="<u2").astype(np.uint32)
        for t in tokens
    ]
    t_len = np.array([len(c) for c in codes_list], dtype=np.int64)
    n_tok = len(tokens)
    owners = np.asarray(owners, dtype=np.int64)

    sep = np.array([_SEP], dtype=np.uint32)
    stream = np.concatenate([x for c in codes_list for x in (c, sep)])
    t_start = np.concatenate([[0], np.cumsum(t_len + 1)[:-1]])
    # per stream position: owner row + position within its token
    stream_owner = np.repeat(owners, t_len + 1)
    pos_in_tok = np.arange(len(stream), dtype=np.int64) - np.repeat(t_start, t_len + 1)
    not_sep = stream != _SEP

    uniq, is_alpha, up_stable, low_stable, is_vowel, is_ucase, cat = \
        _char_tables(stream)

    with np.errstate(over="ignore"):
        # --- base positional codepoints: word[i] = c_i for i < dims ---
        base_ok = not_sep & (pos_in_tok < dims)
        np.add.at(mats, stream_owner[base_ok] * dims + pos_in_tok[base_ok],
                  stream[base_ok].astype(np.float64))

        # --- char n-grams 3..5, w 1.0: d = h % dims ------------------
        for n in (3, 4, 5):
            if len(stream) < n:
                continue
            win = np.lib.stride_tricks.sliding_window_view(stream, n)
            ok = (win != _SEP).all(axis=1)
            if not ok.any():
                continue
            h = _fnv1a_windows(win[ok])
            idx = (h % np.uint64(dims)).astype(np.int64)
            np.add.at(mats, stream_owner[: len(win)][ok] * dims + idx, 1.0)

        # --- positional bigrams w 0.75 / skip-grams-1 w 0.5 ----------
        # hash inputs: [c_a, c_b, pos & 0xFF, (pos >> 8) & 0xFF]
        for gap, prefix_dim, w in ((1, T.p_bg, 0.75), (2, T.p_sg1, 0.5)):
            if len(stream) < gap + 1:
                continue
            c_a = stream[:-gap]
            c_b = stream[gap:]
            ok = (c_a != _SEP) & (c_b != _SEP)
            if gap == 2:  # middle char must be same token (not SEP)
                ok &= stream[1:-1] != _SEP
            if not ok.any():
                continue
            pos = pos_in_tok[:-gap][ok]
            h = np.full(ok.sum(), FNV_OFFSET, dtype=np.uint64)
            for arr in (c_a[ok].astype(np.uint64), c_b[ok].astype(np.uint64),
                        (pos & 0xFF).astype(np.uint64),
                        ((pos >> 8) & 0xFF).astype(np.uint64)):
                h = (h ^ arr) * FNV_PRIME
            idx = ((h % np.uint64(dims)).astype(np.int64) + prefix_dim) % dims
            np.add.at(mats, stream_owner[:-gap][ok] * dims + idx, w)

        # --- boundary trigrams w 0.65 --------------------------------
        pad = np.uint32(ord("_"))
        for side, prefix_dim in (("start", T.p_tri_start), ("end", T.p_tri_end)):
            tri = np.empty((n_tok, 3), dtype=np.uint32)
            m3, m2, m1 = t_len >= 3, t_len == 2, t_len == 1
            if side == "start":
                for j in range(3):
                    tri[m3, j] = stream[t_start[m3] + j]
                tri[m2, 0] = stream[t_start[m2]]
                tri[m2, 1] = stream[t_start[m2] + 1]
                tri[m2, 2] = pad
                tri[m1, 0] = stream[t_start[m1]]
                tri[m1, 1] = pad
                tri[m1, 2] = pad
            else:
                last = t_start + t_len - 1
                for j in range(3):
                    tri[m3, j] = stream[last[m3] - 2 + j]
                tri[m2, 0] = pad
                tri[m2, 1] = stream[t_start[m2]]
                tri[m2, 2] = stream[t_start[m2] + 1]
                tri[m1, 0] = pad
                tri[m1, 1] = pad
                tri[m1, 2] = stream[last[m1]]
            ok = t_len >= 1
            h = _fnv1a_windows(tri[ok])
            idx = ((h % np.uint64(dims)).astype(np.int64) + prefix_dim) % dims
            np.add.at(mats, owners[ok] * dims + idx, 0.65)

        # --- first/last char w 0.75 ----------------------------------
        t_first = stream[t_start].astype(np.uint64)
        t_last = stream[t_start + t_len - 1].astype(np.uint64)
        hf = ((FNV_OFFSET ^ t_first) * FNV_PRIME % np.uint64(dims)).astype(np.int64)
        hl = ((FNV_OFFSET ^ t_last) * FNV_PRIME % np.uint64(dims)).astype(np.int64)
        np.add.at(mats, owners * dims + (T.p_first + hf) % dims, 0.75)
        np.add.at(mats, owners * dims + (T.p_last + hl) % dims, 0.75)

        # --- length buckets w 0.5 (no prefix composition, :674) ------
        np.add.at(mats, owners * dims + T.len_dims[_len_bucket(t_len)], 0.5)

        # --- vowel/consonant pattern w 0.5 ---------------------------
        # V/C/X per char then FNV over the pattern string, masked loop
        # over positions (max token length iterations, each vectorised).
        vc_codes = np.where(
            _lookup(uniq, is_alpha, stream, False),
            np.where(_lookup(uniq, is_vowel, stream, False),
                     np.uint32(ord("V")), np.uint32(ord("C"))),
            np.uint32(ord("X")),
        )
        maxlen = int(t_len.max())
        h_vc = np.full(n_tok, FNV_OFFSET, dtype=np.uint64)
        for j in range(maxlen):
            act = t_len > j
            cj = vc_codes[t_start[act] + j].astype(np.uint64)
            h_vc[act] = (h_vc[act] ^ cj) * FNV_PRIME
        idx = ((h_vc % np.uint64(dims)).astype(np.int64) + T.p_vc) % dims
        np.add.at(mats, owners * dims + idx, 0.5)

        # --- rolling hash for len<=3, w 0.8 --------------------------
        small = t_len <= 3
        if small.any():
            h_rh = np.zeros(small.sum(), dtype=np.uint64)
            ss, sl = t_start[small], t_len[small]
            for j in range(3):
                act = sl > j
                cj = stream[ss[act] + j].astype(np.uint64)
                h_rh[act] = (h_rh[act] ^ cj) * ROLL_SEED
            idx = (h_rh % np.uint64(dims)).astype(np.int64)
            np.add.at(mats, owners[small] * dims + idx, 0.8)

        # --- case features w 0.5 -------------------------------------
        # all-lower: ToLowerInvariant is identity for every char
        tok_of_pos = np.repeat(np.arange(n_tok), t_len + 1)
        lower_viol = np.zeros(n_tok, dtype=np.int64)
        upper_viol = np.zeros(n_tok, dtype=np.int64)
        up_ok = _lookup(uniq, up_stable, stream, True)
        low_ok = _lookup(uniq, low_stable, stream, True)
        np.add.at(lower_viol, tok_of_pos, (~up_ok & not_sep).astype(np.int64))
        np.add.at(upper_viol, tok_of_pos, (~low_ok & not_sep).astype(np.int64))
        all_lower = lower_viol == 0
        all_upper = upper_viol == 0
        first_alpha = _lookup(uniq, is_alpha, stream[t_start], False)
        first_upper = _lookup(uniq, is_ucase, stream[t_start], False)
        is_title = first_alpha & first_upper
        np.add.at(mats, owners * dims + np.where(
            all_lower, T.d_case_lower, T.d_case_mixed), 0.5)
        if all_upper.any():
            np.add.at(mats, owners[all_upper] * dims + T.d_case_upper, 0.5)
        if is_title.any():
            np.add.at(mats, owners[is_title] * dims + T.d_case_title, 0.5)

        # --- Unicode category distribution w 0.25 per char -----------
        cat_per_char = _lookup(uniq, cat, stream, 29)
        np.add.at(mats, stream_owner[not_sep] * dims
                  + T.cat_dims[cat_per_char[not_sep]], 0.25)

        # --- numeric / geo hints w 0.6 -------------------------------
        # _NUMGEO_CAND_RE is a vectorised SUPERSET prefilter; only
        # plausible tokens reach the exact scalar TryParse analogs.
        ser = pd.Series(tokens)
        is_num = np.zeros(n_tok, dtype=bool)
        is_geo = np.zeros(n_tok, dtype=bool)
        cand = np.nonzero(ser.str.contains(_NUMGEO_CAND_RE).to_numpy(bool))[0]
        for i in cand:
            is_num[i] = _is_number_token(tokens[i])
            is_geo[i] = _is_geo_token(tokens[i])
        np.add.at(mats, owners * dims + T.d_num[is_num.astype(np.int64)], 0.6)
        np.add.at(mats, owners * dims + T.d_geo[is_geo.astype(np.int64)], 0.6)

    return mats.reshape(n_owners, dims)


def token_vectors(tokens: list[str], dims: int = 512) -> np.ndarray:
    """Per-token L2-normalised reference vectors (TokenizeIntoVectors)."""
    n = len(tokens)
    m = accumulate_token_features(tokens, np.arange(n, dtype=np.int64), n, dims)
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    np.divide(m, norms, out=m, where=norms > 0)
    return m


def _embed_batch(texts: pd.Series, dims: int) -> pd.Series:
    """Doc-level embedding: sum of raw token features, L2-normalised once."""
    n_docs = len(texts)
    tokens: list[str] = []
    owners: list[int] = []
    for d, text in enumerate(texts):
        for t in _tokenize(text if isinstance(text, str) else ""):
            tokens.append(t)
            owners.append(d)
    m = accumulate_token_features(
        tokens, np.array(owners, dtype=np.int64), n_docs, dims)
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    np.divide(m, norms, out=m, where=norms > 0)
    return pd.Series(list(m))


def embed_text_udf(dims: int = 512):
    """Returns a pandas UDF: string column → array<double> embedding."""

    @pandas_udf(ArrayType(DoubleType()))
    def embed(texts: pd.Series) -> pd.Series:
        return _embed_batch(texts, dims)

    return embed


def analyze_signatures(m: np.ndarray, u: np.ndarray) -> np.ndarray:
    """Row-wise 10-component Analyze signature vs a reference vector
    (VectorOperations.cs:316-448): cos (gated on dot/norms, clamped),
    acos angle, dot, both norms, euclidean, manhattan, projection onto
    ``u``, nonzero-overlap count, index-set jaccard. ``u`` is dense
    (every component nonzero), so overlap = nnz(row) and
    jaccard = nnz / dims."""
    dims = m.shape[1]
    dot = m @ u
    n1 = np.linalg.norm(m, axis=1)
    n2 = np.linalg.norm(u)
    raw = np.divide(dot, n1 * n2, out=np.zeros_like(dot),
                    where=(dot != 0) & (n1 != 0) & (n2 != 0))
    cos = np.clip(raw, -1.0, 1.0)
    diff = m - u
    euclid = np.linalg.norm(diff, axis=1)
    manhattan = np.abs(diff).sum(axis=1)
    proj = dot / n2 if n2 > 0 else np.zeros_like(dot)
    overlap = (m != 0).sum(axis=1).astype(np.float64)
    jaccard = overlap / dims
    return np.column_stack([cos, np.arccos(cos), dot, n1,
                            np.full_like(dot, n2), euclid, manhattan,
                            proj, overlap, jaccard])


def angle_key_udf(dims: int = 512):
    """Returns a pandas UDF: token column → the reference's lexicon key.

    BuildLexicon (StringAnalyzer.cs:55-56) keys each token by
    ``CosAngle(Analyze(vec, unit), unit)``: Analyze returns a SPARSE
    dims-length vector carrying its 10 components at indices 0..9
    (VectorOperations.cs:437-448), so the key is
    ``sum(components) / (sqrt(dims) · ‖components‖)`` — CosAngle's raw
    ungated division (:305-314; ‖sig‖ > 0 always since norm2 = 1 is a
    component). A locality-sensitive scalar — similar spellings land
    near each other, so range partitioning on it co-locates similar
    tokens, exactly like the reference's angle-sorted page writes."""

    @pandas_udf(DoubleType())
    def angle_key(tokens: pd.Series) -> pd.Series:
        toks = ["" if t is None else str(t) for t in tokens]
        m = token_vectors(toks, dims)
        unit = np.full(dims, 1.0 / np.sqrt(dims))
        sig = analyze_signatures(m, unit)
        return pd.Series(
            sig.sum(axis=1) / np.sqrt(dims) / np.linalg.norm(sig, axis=1)
        )

    return angle_key


@pandas_udf(LongType())
def knuth_hash(texts: pd.Series) -> pd.Series:
    """Reference-exact Knuth string hash, reinterpreted as signed int64.

    C# iterates UTF-16 code units, so non-BMP characters contribute two
    surrogate halves — ``encode('utf-16-le')`` reproduces that exactly.
    The sequential recurrence h ← (h + c)·M unrolls to
    h_n = INIT·M^n + Σ c_i·M^(n-i+1), so each string is one vectorised
    multiply-sum against a precomputed power table (mod 2^64 wraparound).
    """
    with np.errstate(over="ignore"):
        arrs = [
            np.frombuffer((s or "").encode("utf-16-le"), dtype="<u2")
            for s in texts
        ]
        maxlen = max((len(a) for a in arrs), default=0)
        pw = np.empty(maxlen + 1, dtype=np.uint64)
        pw[0] = np.uint64(1)
        for k in range(1, maxlen + 1):
            pw[k] = pw[k - 1] * KNUTH_MULT

        def one(codes: np.ndarray) -> int:
            n = len(codes)
            h = KNUTH_INIT * pw[n] + (codes.astype(np.uint64) * pw[n:0:-1]).sum(
                dtype=np.uint64
            )
            return int(np.int64(h))

        return pd.Series([one(a) for a in arrs])
