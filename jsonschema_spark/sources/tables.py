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

_ICEBERG_HELP = (
    "the Iceberg Spark runtime is not on this session's classpath. "
    "Production setup: add the published "
    "org.apache.iceberg:iceberg-spark-runtime jar matching your Spark "
    "version (spark.jars.packages) and configure a catalog, e.g. "
    "spark.sql.catalog.<name>=org.apache.iceberg.spark.SparkCatalog. "
    "This container ships no Iceberg jars, so iceberg: sources are "
    "environment-gated here; parquet paths cover the same operators."
)


def iceberg_available(spark: SparkSession) -> bool:
    """True when the Iceberg DataSource is loadable in this JVM."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.source.IcebergSource"
        )
        return True
    except Exception:
        return False


def _require_iceberg(spark: SparkSession) -> None:
    if not iceberg_available(spark):
        raise RuntimeError("iceberg: source requested but " + _ICEBERG_HELP)


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
        _require_iceberg(spark)
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
        _require_iceberg(spark)
        return (
            spark.readStream.format("iceberg")
            .options(**options)
            .load(source[len("iceberg:"):])
        )
    return spark.readStream.schema(schema).options(**options).parquet(source)


_SNAPLOG = "_snapshots.jsonl"


def append_snapshot(df: DataFrame, path: str) -> int:
    """Append ``df`` to a snapshot-logged parquet table and return the
    new snapshot id.

    The local stand-in for an Iceberg append when no Iceberg runtime
    is on the classpath: data lands under ``path/data/snap-<id>/`` and
    a JSON line {id, dir} is appended to ``path/_snapshots.jsonl`` —
    the same lineage shape an Iceberg snapshot log provides, enough
    for ``read_incremental``'s exclusive-start/inclusive-end contract
    to EXECUTE instead of being environment-gated.  Ids are
    monotonically increasing ints (append order)."""
    import json as _json
    import os as _os

    _os.makedirs(path, exist_ok=True)
    log = _os.path.join(path, _SNAPLOG)
    last = 0
    if _os.path.exists(log):
        with open(log) as f:
            for line in f:
                if line.strip():
                    last = max(last, _json.loads(line)["id"])
    snap_id = last + 1
    sub = f"data/snap-{snap_id}"
    df.write.mode("errorifexists").parquet(_os.path.join(path, sub))
    with open(log, "a") as f:
        f.write(_json.dumps({"id": snap_id, "dir": sub}) + "\n")
    return snap_id


def read_incremental(
    spark: SparkSession,
    source: str,
    start_snapshot_id: int,
    end_snapshot_id: int | None = None,
) -> DataFrame:
    """Rows appended AFTER ``start_snapshot_id`` (exclusive) up to
    ``end_snapshot_id`` (inclusive; default: current) — Iceberg's
    documented incremental-scan options (``start-snapshot-id`` /
    ``end-snapshot-id``).  This is the feed for the incremental
    stats/drift stores (operators/incremental.py): each run ingests
    only the new snapshots' data files, so updating a corpus-wide
    StatsStore after an append touches ZERO historical bytes — the
    manifest names exactly the new files.

    Sources: ``iceberg:catalog.db.table`` (production), or a local
    snapshot-logged parquet table written via ``append_snapshot``
    (same bound semantics, executed by listing the log's snapshot
    dirs).  A plain parquet path has no snapshot lineage and fails
    loudly, pointing at the checkpoint/manifest-based partition
    increments (jsonschema_spark.checkpoint)."""
    if source.startswith("iceberg:"):
        _require_iceberg(spark)
        r = spark.read.format("iceberg").option(
            "start-snapshot-id", str(start_snapshot_id)
        )
        if end_snapshot_id is not None:
            r = r.option("end-snapshot-id", str(end_snapshot_id))
        return r.load(source[len("iceberg:"):])
    import json as _json
    import os as _os

    log = _os.path.join(source, _SNAPLOG)
    if not _os.path.exists(log):
        raise ValueError(
            "read_incremental needs snapshot lineage: an iceberg: table "
            "or a snapshot-logged parquet dir (append_snapshot); for "
            "plain parquet layouts use jsonschema_spark.checkpoint's "
            "manifest-based partition increments instead"
        )
    dirs = []
    with open(log) as f:
        for line in f:
            if not line.strip():
                continue
            rec = _json.loads(line)
            if rec["id"] > start_snapshot_id and (
                end_snapshot_id is None or rec["id"] <= end_snapshot_id
            ):
                dirs.append(_os.path.join(source, rec["dir"]))
    if not dirs:
        # empty increment with the table's schema (from any snapshot)
        with open(log) as f:
            first = _json.loads(f.readline())
        base = spark.read.parquet(_os.path.join(source, first["dir"]))
        return base.limit(0)
    return spark.read.parquet(*dirs)


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
        _require_iceberg(df.sparkSession)
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


def write_jsonl_shards(
    df: DataFrame,
    path: str,
    max_rows_per_shard: int | None = None,
    partition_by: list[str] | None = None,
    shards: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Export a DataFrame as sharded JSONL — the SFT-corpus handoff
    format (one JSON object per line; each output file is one shard a
    downstream trainer streams independently).

    * ``max_rows_per_shard`` caps rows per file via Spark's
      ``maxRecordsPerFile`` — enforced at write time WITHOUT a
      repartition: each task rolls to a new file at the cap, so shard
      sizing never adds a shuffle.
    * ``shards`` optionally repartitions to exactly that many tasks
      first (deterministic round-robin) when a fixed shard COUNT
      matters more than avoiding the one shuffle.
    * ``partition_by`` lays shards out under key=value directories
      (e.g. split=train/val) — partition pruning for the reader.

    Writers stay text-faithful: Spark's JSON writer emits UTF-8 with
    \\n line separators; nulls are omitted per JSON-lines convention.
    """
    if max_rows_per_shard is not None and max_rows_per_shard <= 0:
        raise ValueError("max_rows_per_shard must be positive")
    if shards is not None:
        if shards <= 0:
            raise ValueError("shards must be positive")
        df = df.repartition(shards)
    w = df.write.mode(mode)
    if max_rows_per_shard is not None:
        w = w.option("maxRecordsPerFile", max_rows_per_shard)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.json(path)
