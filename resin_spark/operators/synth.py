"""TokenSynthesizer analog (reference:
src/Resin.TextAnalysis/TokenSynthesizer.cs:1-81).

The reference synthesizes short nonsensical lowercase labels and checks
which of a randomly chosen set of target dimensions their positional
bigram features hash into (FNV-1a over the 4-unit key
[prev, next, pos&0xFF, pos>>8], mod dims — TokenSynthesizer.cs:17-29,
43-62) — debug/adversarial tooling for probing the hashed embedding
space.

Spark shape: ``spark.range(count)`` → one ``mapInPandas`` pass. The C#
version draws every label from ONE serial ``Random(seed)`` stream,
which has no order-independent distributed analog; here each label's
rng is seeded ``seed + label_id`` instead (documented divergence), so
the output is deterministic and identical under any partitioning. The
per-label char loop is Python, but it's 8 chars × count labels of
debug tooling, never a corpus-path operator.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from resin_spark.functions.hashing import FNV_OFFSET, FNV_PRIME

ALPHABET = "abcdefghijklmnopqrstuvwxyz"
N_MIDDLE = 6  # reference builds first + 6 middle chars + last (:44-62)


def bigram_dim(prev: str, nxt: str, pos: int, dims: int) -> int:
    """FNV-1a over the reference's 4-code-unit bigram key, mod dims
    (TokenSynthesizer.cs HashToIndex:17-29 on the key built at :49-53)."""
    h = FNV_OFFSET
    # uint64 wraparound IS the FNV contract; mute numpy's overflow warn
    with np.errstate(over="ignore"):
        for u in (ord(prev), ord(nxt), pos & 0xFF, (pos >> 8) & 0xFF):
            h = np.uint64((h ^ np.uint64(u)) * FNV_PRIME)
    return int(h % np.uint64(dims))


def _one_label(label_id: int, dims: int, seed: int):
    rng = np.random.RandomState(seed + label_id)
    k = 4 + int(rng.randint(4))                      # :74 k = 4 + Next(4)
    targets = [int(x) for x in rng.randint(0, dims, size=k)]
    first = ALPHABET[rng.randint(26)]                # :40-41
    last = ALPHABET[rng.randint(26)]
    chars = [first]
    hits = []
    for pos in range(N_MIDDLE):                      # :45-60
        nxt = ALPHABET[rng.randint(26)]
        d = bigram_dim(chars[-1], nxt, pos, dims)
        chars.append(nxt)
        if d in targets:
            hits.append(d)
    chars.append(last)
    return (label_id, "".join(chars), targets, sorted(set(hits)),
            len(set(hits)))


def synthesize_tokens(spark: SparkSession, count: int = 100,
                      dims: int = 512, seed: int = 12345) -> DataFrame:
    """(label_id, token, target_dims, hit_dims, n_hits) for ``count``
    synthetic labels. token is always 8 lowercase chars; hit_dims are
    the targets actually reached by some positional bigram feature."""

    def gen(batches):
        for pdf in batches:
            rows = [_one_label(int(i), dims, seed) for i in pdf["id"]]
            yield pd.DataFrame(
                rows,
                columns=["label_id", "token", "target_dims", "hit_dims",
                         "n_hits"],
            )

    return spark.range(count).mapInPandas(
        gen,
        "label_id long, token string, target_dims array<int>, "
        "hit_dims array<int>, n_hits int",
    ).orderBy("label_id")
