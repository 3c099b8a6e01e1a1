"""Multimodal column plumbing (SURVEY.md §2 block F).

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata. The Spark-side plumbing — binary Arrow batches through
``mapInPandas``, explicit output schemas, per-batch vectorised work —
is real and tested; the *decode* step is a deterministic fake (media
codecs aren't in this container): metadata is derived from the md5 of
the payload bytes and frame "contents" are byte slices. A real decoder
(PIL / soundfile / pyav) drops into ``_decode_real`` unchanged — the
schema, batching, and partitioning stay identical.

The correctness oracle exploits that the test corpus is ASCII, so
DuckDB's ``md5(substring(text, …))`` hashes the same bytes the Spark
side slices from the binary payload. The Spark path itself is
byte-correct for arbitrary binary input.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Tables = dict[str, DataFrame]

FORMATS = ("jpeg", "png", "webp")
HEX = "0123456789abcdef"

try:  # pragma: no cover - codecs absent in this container
    from PIL import Image  # noqa: F401
    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False


def _decode_real(payload: bytes) -> tuple[int, int]:  # pragma: no cover
    """Real image decode — requires PIL; see module docstring."""
    if not HAVE_PIL:
        raise NotImplementedError(
            "real media decode needs PIL; this container uses the "
            "deterministic fake decode path"
        )
    import io

    from PIL import Image
    with Image.open(io.BytesIO(payload)) as im:
        return im.width, im.height


def with_payload(docs: DataFrame) -> DataFrame:
    """documents → (doc_id, payload: binary). Stand-in media column."""
    return docs.select("doc_id", F.encode(F.col("text"), "UTF-8").alias("payload"))


def binary_meta(t: Tables) -> DataFrame:
    """F1: typed metadata from opaque binary media.

    One ``mapInPandas`` pass: payload bytes → (size, container format,
    width, height, checksum). The fake decode derives width/height from
    the payload's md5 so it is content-determined, byte-exact, and
    engine-checkable. Per-row work is independent → scales linearly;
    no shuffle at all until the final presentation orderBy.
    """
    schema = ("doc_id long, n_bytes long, format string, "
              "width long, height long, checksum string")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sums = [hashlib.md5(b).hexdigest() for b in pdf["payload"]]
            n_bytes = [len(b) for b in pdf["payload"]]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "n_bytes": n_bytes,
                "format": [FORMATS[n % len(FORMATS)] for n in n_bytes],
                "width": [16 + int(s[:6], 16) % 1024 for s in sums],
                "height": [16 + int(s[6:12], 16) % 768 for s in sums],
                "checksum": sums,
            })

    return with_payload(t["documents"]).mapInPandas(gen, schema).orderBy("doc_id")


def _hex_to_int_sql(expr: str) -> str:
    return (
        f"list_reduce(list_transform(string_split({expr}, ''),"
        f" c -> CAST(strpos('{HEX}', c) - 1 AS BIGINT)), (a, b) -> a * 16 + b)"
    )


def binary_meta_oracle() -> str:
    fmts = ", ".join(f"'{f}'" for f in FORMATS)
    return f"""
    SELECT doc_id, octet_length(encode(text)) AS n_bytes,
           [{fmts}][(octet_length(encode(text)) % {len(FORMATS)}) + 1] AS format,
           16 + {_hex_to_int_sql("substr(md5(text), 1, 6)")} % 1024 AS width,
           16 + {_hex_to_int_sql("substr(md5(text), 7, 6)")} % 768 AS height,
           md5(text) AS checksum
    FROM documents ORDER BY doc_id
    """


MAX_FRAMES = 8
FRAME_SPACING = 256
FRAME_LEN = 64


def frame_sample(t: Tables) -> DataFrame:
    """F2: frame sampling from opaque "video" payloads.

    Each payload yields ``min(8, 1 + n_bytes // 256)`` evenly-strided
    frames; a frame is the md5 of its 64-byte slice (a real frame
    decoder would emit pixel tensors through the same batch shape).
    ``mapInPandas`` expands rows 1→N inside the executor — the Spark-side
    analog of frame extraction fan-out; downstream stages see a plain
    (doc_id, frame_idx, frame_off, frame_hash) relation.
    """
    schema = "doc_id long, frame_idx long, frame_off long, frame_hash string"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, offs, hashes = [], [], [], []
            for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
                n = len(b)
                n_frames = min(MAX_FRAMES, 1 + n // FRAME_SPACING)
                stride = n // n_frames
                for i in range(n_frames):
                    off = i * stride
                    ids.append(doc_id)
                    idxs.append(i)
                    offs.append(off)
                    hashes.append(hashlib.md5(b[off:off + FRAME_LEN]).hexdigest())
            yield pd.DataFrame({
                "doc_id": ids, "frame_idx": idxs,
                "frame_off": offs, "frame_hash": hashes,
            })

    return (
        with_payload(t["documents"])
        .mapInPandas(gen, schema)
        .orderBy("doc_id", "frame_idx")
    )


def frame_sample_oracle() -> str:
    return f"""
    WITH sized AS (
        SELECT doc_id, text, octet_length(encode(text)) AS n,
               LEAST({MAX_FRAMES}, 1 + octet_length(encode(text)) // {FRAME_SPACING}) AS n_frames
        FROM documents
    )
    SELECT doc_id, i AS frame_idx, i * (n // n_frames) AS frame_off,
           md5(substring(text, i * (n // n_frames) + 1, {FRAME_LEN})) AS frame_hash
    FROM sized, range({MAX_FRAMES}) t(i)
    WHERE i < n_frames
    ORDER BY doc_id, frame_idx
    """
