"""Replicates the driver's Spark-vs-DuckDB correctness comparison so
oracle mismatches surface in local tests before the round gate."""

from __future__ import annotations

import math

import duckdb

SF_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    try:
        con.execute("SET TimeZone='UTC'")
        for t in SF_TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        cur = con.execute(sql)
        cols = [d[0] for d in cur.description]
        rows = cur.fetchall()
        # the driver canonicalizes through pandas — fetch dtypes the same
        # way so HUGEINT-sum artifacts (int values, float64 dtype) fail
        # here instead of at the round gate
        pdtypes = dict(con.execute(sql).fetchdf().dtypes.astype(str))
        return cols, rows, pdtypes
    finally:
        con.close()


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # mirror a value-hash: exact repr, no tolerance
        return repr(v)
    return repr(v)


def compare(spark_df, sql: str, sf_dir: str) -> None:
    """Assert column names, row count, and order-insensitive exact values
    match between a Spark DataFrame and the DuckDB oracle."""
    ocols, orows, opdt = run_oracle(sql, sf_dir)
    srows = spark_df.collect()
    scols = spark_df.columns
    assert sorted(scols) == sorted(ocols), f"schema mismatch: {scols} vs {ocols}"
    # mirror the driver: both sides are rendered through pandas before
    # hashing, so what must agree is the pandas dtype KIND (int vs float)
    # of each column after that rendering — a nullable Spark long and a
    # NULL-bearing oracle int both become float64 (fine); an int64 Spark
    # column against a HUGEINT-sum float64 oracle column does not.
    spdt = dict(spark_df.toPandas().dtypes.astype(str))
    def _kind(dt: str) -> str:
        if dt.startswith(("int", "uint")):
            return "i"
        if dt.startswith("float"):
            return "f"
        return "o"
    for c in scols:
        sk, ok = _kind(spdt[c]), _kind(opdt.get(c, "object"))
        assert sk == ok, (
            f"column {c}: pandas dtype kind mismatch — Spark {spdt[c]} vs "
            f"oracle {opdt.get(c)} (HUGEINT sum? wrap the oracle aggregate "
            f"in CAST(... AS BIGINT))"
        )
    assert len(srows) == len(orows), f"rowcount mismatch: {len(srows)} vs {len(orows)}"

    o_idx = [ocols.index(c) for c in sorted(ocols)]
    s_idx = [scols.index(c) for c in sorted(scols)]
    oset = sorted(tuple(_norm(r[i]) for i in o_idx) for r in orows)
    sset = sorted(tuple(_norm(r[i]) for i in s_idx) for r in srows)
    mism = [(a, b) for a, b in zip(sset, oset) if a != b]
    assert sset == oset, f"value mismatch ({len(mism)} rows), first: {mism[:3]}"
