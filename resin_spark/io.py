"""Sources and sinks.

- ``load_tables``: the ten driver-generated parquet tables.
- ``read_cirrussearch``: Wikipedia cirrussearch dump source with field
  projection and url synthesis — the Spark-first analog of the
  reference's streaming gzip-JSON reader
  (reference: src/Resin.DataSources/WikipediaHelper.cs:10-113,
  WikipediaCirrussearchDataSource.cs:8-22). Spark's json reader handles
  .gz transparently and splits cleanly across executors per file, so no
  hand-rolled decompression loop is needed.
- partitioned parquet/csv/json writers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def load_tables(spark: SparkSession, sf_dir: str,
                names: tuple[str, ...] = TABLE_NAMES) -> dict[str, DataFrame]:
    """Load the benchmark tables from ``sf_dir`` as a dict of DataFrames.

    ``events.ts`` is nanosecond-precision parquet, which Spark reads as a
    long (``nanosAsLong``); it is converted to a timestamp via integer
    ns→µs division — the same truncation DuckDB applies — so timestamp
    semantics agree across engines.
    """
    out = {}
    for name in names:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if name == "events" and dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        out[name] = df
    return out


def register_views(spark: SparkSession, sf_dir: str,
                   names: tuple[str, ...] = TABLE_NAMES) -> None:
    """Register each table as a temp view for spark.sql usage."""
    for name, df in load_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(name)


def read_cirrussearch(spark: SparkSession, path: str, fields: list[str],
                      url_format: str = "https://en.wikipedia.org/wiki/{}") -> DataFrame:
    """Read a Wikipedia cirrussearch JSON(.gz) dump, projecting ``fields``.

    Cirrussearch dumps interleave metadata lines (``{"index": ...}``) with
    document lines; metadata rows are dropped by requiring a title. When
    ``url`` is requested it is synthesised from the title, matching the
    reference's behaviour (WikipediaHelper.cs:37-43).

    Column pruning is pushed into the JSON scan by selecting before any
    action, so at scale executors parse only the projected fields.
    """
    want_url = "url" in fields
    json_fields = [f for f in fields if f != "url"]
    if "title" not in json_fields:
        json_fields = ["title", *json_fields]

    df = spark.read.json(path).select(
        *[F.col(c) for c in json_fields if c != "_corrupt_record"]
    )
    df = df.filter(F.col("title").isNotNull())
    if want_url:
        prefix, suffix = url_format.split("{}", 1)
        df = df.withColumn(
            "url",
            F.concat(F.lit(prefix), F.url_encode(F.col("title")), F.lit(suffix)),
        )
    keep = [c for c in fields if c in df.columns]
    return df.select(*keep)


def write_parquet(df: DataFrame, path: str, partition_by: list[str] | None = None,
                  mode: str = "overwrite") -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("header", "true").csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)
