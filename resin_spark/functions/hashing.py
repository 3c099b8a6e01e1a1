"""Hashed-feature text embedding + string hashes (Arrow-vectorised).

The reference embeds every token into a 512-dim sparse vector with the
hashing trick — char n-grams (3..5), boundary chars, length buckets —
then L2-normalises (reference:
src/Resin.TextAnalysis/StringAnalyzer.cs:614-701 TokenizeIntoVectors,
182-213 AddCharNGramFeatures/HashToIndex FNV-1a). That construction is
inherently procedural, so this is the one deliberate Python path in the
engine: a pandas UDF over Arrow batches — and the whole batch is
numpy-vectorised: codepoints come from one ``utf-32-le`` reinterpret per
token stream, FNV-1a over every n-gram in the batch is n fused
xor-multiply passes over a sliding-window matrix, and accumulation is a
single ``np.add.at`` into the flattened (batch × dims) matrix. No
per-char or per-ngram Python calls anywhere.

`knuth_hash` reproduces HashOperations.CalculateKnuthHash
(HashOperations.cs:10-19) exactly: it iterates UTF-16 code units (what
a C# ``foreach (char c in s)`` yields, including surrogate halves for
non-BMP input) with uint64 wraparound — closed-form vectorised via
powers of the multiplier.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, DoubleType, LongType

FNV_OFFSET = np.uint64(14695981039346656037)
FNV_PRIME = np.uint64(1099511628211)

KNUTH_INIT = np.uint64(3074457345618258791)
KNUTH_MULT = np.uint64(3074457345618258799)

_SEP = np.uint32(0xFFFFFFFF)  # never a codepoint; poisons cross-token windows


def _fnv1a(s: str) -> int:
    """Scalar FNV-1a over codepoints (kept for tests / feature prehashing)."""
    with np.errstate(over="ignore"):
        h = FNV_OFFSET
        for ch in s:
            h = np.uint64(h ^ np.uint64(ord(ch)))
            h = np.uint64(h * FNV_PRIME)
        return int(h)


def _fnv1a_state(prefix: str) -> np.uint64:
    """FNV-1a state after hashing ``prefix`` (resumable)."""
    with np.errstate(over="ignore"):
        h = FNV_OFFSET
        for ch in prefix:
            h = np.uint64(h ^ np.uint64(ord(ch)))
            h = np.uint64(h * FNV_PRIME)
        return h


_FIRST_STATE = _fnv1a_state("first:")
_LAST_STATE = _fnv1a_state("last:")
_LEN_HASHES = np.array([_fnv1a(f"len:{n}") for n in range(18)], dtype=np.uint64)


def _fnv1a_windows(win: np.ndarray) -> np.ndarray:
    """Vectorised FNV-1a across rows of a (rows, n) codepoint matrix."""
    h = np.full(win.shape[0], FNV_OFFSET, dtype=np.uint64)
    for j in range(win.shape[1]):
        h = (h ^ win[:, j].astype(np.uint64)) * FNV_PRIME
    return h


def _resume_fnv1a(state: np.uint64, codes: np.ndarray) -> np.ndarray:
    """Vectorised one-more-char FNV-1a from a fixed prefix state."""
    return (np.uint64(state) ^ codes.astype(np.uint64)) * FNV_PRIME


def _tokenize(text: str) -> list[str]:
    return [
        t for t in
        "".join(c if c.isalnum() else " " for c in (text or "").lower()).split()
        if t
    ]


def _embed_batch(texts: pd.Series, dims: int) -> pd.Series:
    """Embed a whole Arrow batch with the hashing trick, fully vectorised."""
    n_docs = len(texts)
    mats = np.zeros(n_docs * dims, dtype=np.float64)

    # token stream: codepoints with SEP between tokens, plus per-position doc id
    code_chunks: list[np.ndarray] = []
    doc_chunks: list[np.ndarray] = []
    first_codes: list[np.ndarray] = []
    last_codes: list[np.ndarray] = []
    tok_docs: list[np.ndarray] = []
    tok_lens: list[np.ndarray] = []
    sep = np.array([_SEP], dtype=np.uint32)

    for d, text in enumerate(texts):
        toks = _tokenize(text if isinstance(text, str) else "")
        if not toks:
            continue
        codes = [np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32) for t in toks]
        firsts = np.array([c[0] for c in codes], dtype=np.uint32)
        lasts = np.array([c[-1] for c in codes], dtype=np.uint32)
        lens = np.minimum(np.array([len(c) for c in codes], dtype=np.int64), 17)
        for c in codes:
            code_chunks.append(c)
            code_chunks.append(sep)
        stream_len = sum(len(c) + 1 for c in codes)
        doc_chunks.append(np.full(stream_len, d, dtype=np.int64))
        first_codes.append(firsts)
        last_codes.append(lasts)
        tok_docs.append(np.full(len(toks), d, dtype=np.int64))
        tok_lens.append(lens)

    if not code_chunks:
        return pd.Series([np.zeros(dims).tolist()] * n_docs)

    stream = np.concatenate(code_chunks)
    stream_doc = np.concatenate(doc_chunks)
    t_first = np.concatenate(first_codes)
    t_last = np.concatenate(last_codes)
    t_doc = np.concatenate(tok_docs)
    t_len = np.concatenate(tok_lens)

    with np.errstate(over="ignore"):
        # char n-grams 3..5 (StringAnalyzer.AddCharNGramFeatures), weight 1.0
        for n in (3, 4, 5):
            if len(stream) < n:
                continue
            win = np.lib.stride_tricks.sliding_window_view(stream, n)
            ok = (win != _SEP).all(axis=1)
            if not ok.any():
                continue
            h = _fnv1a_windows(win[ok])
            idx = (h % np.uint64(dims)).astype(np.int64)
            docs = stream_doc[: len(win)][ok]
            np.add.at(mats, docs * dims + idx, 1.0)

        # boundary chars (first:/last: features), weight 0.75
        hf = (_resume_fnv1a(_FIRST_STATE, t_first) % np.uint64(dims)).astype(np.int64)
        hl = (_resume_fnv1a(_LAST_STATE, t_last) % np.uint64(dims)).astype(np.int64)
        np.add.at(mats, t_doc * dims + hf, 0.75)
        np.add.at(mats, t_doc * dims + hl, 0.75)

        # length bucket, weight 0.5
        hn = (_LEN_HASHES[t_len] % np.uint64(dims)).astype(np.int64)
        np.add.at(mats, t_doc * dims + hn, 0.5)

    m = mats.reshape(n_docs, dims)
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    np.divide(m, norms, out=m, where=norms > 0)
    return pd.Series(list(m))


def embed_text_udf(dims: int = 512):
    """Returns a pandas UDF: string column → array<double> embedding."""

    @pandas_udf(ArrayType(DoubleType()))
    def embed(texts: pd.Series) -> pd.Series:
        return _embed_batch(texts, dims)

    return embed


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
