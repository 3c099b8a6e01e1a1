"""Columnar key/value semantics (SURVEY.md §2 block B).

The reference models a column as an on-disk set of keys with attached
values (reference: src/Resin.KeyValue/ColumnWriter.cs:1-154,
ColumnReader.cs:1-131, README.md "Key/Value Column Semantics"):

- ``TryPut``       — insert only if the key is new (first write wins);
- ``PutOrAppend``  — keep one key, link values in insertion order;
- ``Get/GetMany``  — value(s) for a key, original first, plus count;
- columns are key-sets → union / intersection / join across columns.

Spark-first mapping: a "column" is a DataFrame ``(key, seq, value)``
where ``seq`` is the insertion order (any monotone column works — an
event id, a file offset, a kafka offset). Set semantics become window
dedup; linked values become an ordered ``collect_list``; lookups become
joins. Each shape costs exactly one shuffle on ``key`` and scales
linearly; no per-key state lives on the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def _valid(column: DataFrame, *cols: str) -> DataFrame:
    """Corrupt-row gate for the key-addressed operators: a KV column's
    key and insertion order are its identity — a null in either is
    ingest corruption, and engines disagree on null grouping/ordering
    (Spark's set ops are null-safe where SQL IN/NOT IN are null-
    hostile; window null ordering is nulls-first vs nulls-last). The
    filters push to the scan as IsNotNull."""
    out = column
    for c in cols:
        out = out.filter(F.col(c).isNotNull())
    return out


def try_put(column: DataFrame, key: str = "key", seq: str = "seq") -> DataFrame:
    """First-wins dedup: the earliest ``seq`` row per key is kept.

    Matches ColumnWriter.TryPut returning false for duplicate keys
    anywhere in the column snapshot (ColumnWriter.cs: TryPut).
    Deterministic when ``(key, seq)`` pairs are unique — an exact
    (key, seq) tie has no defined winner (insertion order IS the
    contract); null key/seq rows are dropped (see :func:`_valid`).
    """
    column = _valid(column, key, seq)
    # first-wins as a map-side-collapsing min_by aggregate, not a rank
    # window (the r5 argmax rewrite): the exchange carries one row per
    # key per mapper instead of the whole column, and no per-key sort
    # runs. Ties on seq stay undefined-winner, same as the window form.
    others = [c for c in column.columns if c != key]
    best = column.groupBy(key).agg(
        F.min_by(F.struct(*others), F.col(seq)).alias("_b"))
    return best.select(*[
        F.col(key) if c == key else F.col(f"_b.{c}")
        for c in column.columns
    ])


def get_many(column: DataFrame, key: str = "key", seq: str = "seq",
             value: str = "value", sep: str = "|") -> DataFrame:
    """Per-key ordered value list + count, mirroring PutOrAppend → GetMany
    (original value first, appends in insertion order;
    ColumnReader.cs: GetMany).

    Values are also emitted concatenated (``sep``-joined) because the
    reference returns the concatenated byte stream. Null VALUES are
    kept in the count but skipped by the concatenation (both engines'
    behavior); null key/seq rows are dropped.
    """
    column = _valid(column, key, seq)
    return (
        column.groupBy(key)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col(seq).alias("s"), F.col(value).alias("v")))
            ).alias("_pairs")
        )
        .select(
            F.col(key),
            F.transform("_pairs", lambda p: p["v"]).alias("values"),
            F.array_join(
                F.transform("_pairs", lambda p: p["v"].cast("string")), sep
            ).alias("concat_values"),
            F.size("_pairs").alias("value_count"),
        )
    )


def set_union(a: DataFrame, b: DataFrame, key: str = "key") -> DataFrame:
    """Distinct union of two columns' key-sets (null keys dropped — a
    key-set has no null member, and Spark's null-safe set ops would
    otherwise diverge from SQL IN/NOT IN null semantics)."""
    return _valid(a, key).select(key).union(
        _valid(b, key).select(key)).distinct()


def set_intersect(a: DataFrame, b: DataFrame, key: str = "key") -> DataFrame:
    return _valid(a, key).select(key).intersect(_valid(b, key).select(key))


def set_except(a: DataFrame, b: DataFrame, key: str = "key") -> DataFrame:
    return _valid(a, key).select(key).distinct().subtract(
        _valid(b, key).select(key))


def key_join(column: DataFrame, keys: DataFrame, key: str = "key",
             broadcast_keys: bool = True) -> DataFrame:
    """Get-by-keys: join a column against a probe key-set.

    A small probe set is broadcast (the common "look up these ids"
    shape); large probes fall back to a shuffled hash join.
    """
    probe = keys.select(key).distinct()
    if broadcast_keys:
        probe = broadcast(probe)
    return column.join(probe, on=key, how="inner")


PAGE_CAPACITY = 8


def paginate(column: DataFrame, key: str = "key", seq: str = "seq",
             capacity: int = PAGE_CAPACITY) -> DataFrame:
    """Page-level column organisation, the logical twin of the
    reference's fixed-capacity page chain (PageWriter.cs — values land
    in the current page until it fills, then a new page is linked;
    OutOfPageStorageException is the full-page signal): each key's
    values, in insertion order, are chunked into pages of ``capacity``;
    the report gives per-(key, page) fill and the per-key page count —
    what a storage auditor reads off the on-disk column.

    Scale: one shuffle on key; the page number is a pure function of
    the per-key row_number (``(rn-1) div capacity``), so the window and
    the groupBy share the same partitioning and AQE plans one exchange.
    Null key/seq rows are dropped (see :func:`_valid`).
    """
    column = _valid(column, key, seq)
    w = Window.partitionBy(key).orderBy(F.col(seq).asc())
    paged = column.withColumn(
        "page_no", ((F.row_number().over(w) - 1) / capacity).cast("long"))
    per_page = (
        paged.groupBy(key, "page_no")
        .agg(
            F.count(F.lit(1)).alias("n_values"),
            F.min(seq).alias("first_seq"),
            F.max(seq).alias("last_seq"),
        )
    )
    pages_per_key = per_page.groupBy(key).agg(
        F.count(F.lit(1)).alias("n_pages"))
    return (
        per_page.join(pages_per_key, key)
        .withColumn("is_full", F.col("n_values") == capacity)
        .orderBy(key, "page_no")
    )
