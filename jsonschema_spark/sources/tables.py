"""Table IO: scans and sinks for validation runs.

The reference has NO storage layer (input is any unmarshalled JSON,
schema.go:121-138; SURVEY.md §2.9 scans/sinks).  The engine's contract
(north rule) is an Iceberg table of transcripts; this module gives one
entry point that prefers an Iceberg catalog table and falls back to
parquet paths (this container ships no Iceberg runtime jars — the
fallback keeps everything testable while the Iceberg path stays the
production default).

Scan-side scale notes:
  * Partition pruning and predicate pushdown come free from Catalyst —
    pass `where` as a STRING predicate so it reaches the source as a
    filter (check `.explain()` for PushedFilters / partition filters).
  * Column pruning: select only the columns the compiled plan
    references (`CompiledSchema.referenced_columns` union check keys).

Sink-side:
  * violations/verdicts append as parquet (or Iceberg `append`) with
    partition columns carried through — the per-partition layout is
    what makes checkpoint resume O(manifest).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_table(
    spark: SparkSession,
    source: str,
    where: str | None = None,
    columns: list[str] | None = None,
) -> DataFrame:
    """Read an input table.

    ``source`` forms:
      * ``iceberg:catalog.db.table`` — Iceberg catalog table (partition
        pruning + snapshot isolation; production path)
      * ``table:name``              — any session-catalog table
      * otherwise                   — a parquet path/glob
    """
    if source.startswith("iceberg:"):
        df = spark.read.format("iceberg").load(source[len("iceberg:"):])
    elif source.startswith("table:"):
        df = spark.read.table(source[len("table:"):])
    else:
        df = spark.read.parquet(source)
    if where:
        df = df.filter(where)  # string predicate -> pushed to the scan
    if columns:
        df = df.select(*columns)
    return df


def read_stream(
    spark: SparkSession, source: str, schema: str, **options
) -> DataFrame:
    """Streaming scan of a file/Iceberg source for continuous
    validation (jsonschema_spark.streaming)."""
    if source.startswith("iceberg:"):
        return (
            spark.readStream.format("iceberg")
            .options(**options)
            .load(source[len("iceberg:"):])
        )
    return spark.readStream.schema(schema).options(**options).parquet(source)


def write_output(
    df: DataFrame,
    sink: str,
    mode: str = "append",
    partition_by: list[str] | None = None,
) -> None:
    """Append verdict/violation rows.

    ``sink`` forms mirror ``read_table``; parquet appends are atomic at
    file granularity which is all the checkpoint manifest needs."""
    if sink.startswith("iceberg:"):
        df.writeTo(sink[len("iceberg:"):]).append()
        return
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(sink)


def sink_exists(spark, sink: str) -> bool:
    """Whether a write_output sink already holds data: catalog lookup
    for iceberg: sinks, Hadoop-FS existence for paths (works for
    file:/hdfs:/s3a: alike — os.path would only see local paths)."""
    if sink.startswith("iceberg:"):
        return spark.catalog.tableExists(sink[len("iceberg:"):])
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(sink)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(p))


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: list[str],
    num_buckets: int,
    sort_by: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist a table bucketed (and optionally sorted) on its join
    key — the co-located-join layout for repeated big joins at corpus
    scale: two tables bucketed on the same key with the same bucket
    count join with NO shuffle on either side (Iceberg's analog is a
    bucket partition transform).  Fact tables that are joined every
    run (e.g. turns ⋈ conv dimensions, violation rows ⋈ fact) pay the
    shuffle once at write time instead of per query."""
    w = df.write.format("parquet").mode(mode).bucketBy(num_buckets, *bucket_by)
    if sort_by:
        w = w.sortBy(*sort_by)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)
