"""Sources & sinks.

The reference dispatches on a client URL to one of four storage
backends (``Timeseries(client, ...)`` factory, kairos/timeseries.py:
266-297 + BACKENDS registry :1043-1066). Here the same idea maps to
Spark data sources: a ``store://`` URL picks the physical layer for the
long-format table, and generic readers cover file formats the reference
never had (its only "formats" were Redis/Mongo/SQL/Cassandra layouts —
SURVEY.md §2.3/§2.4).

Scale notes:
- the long table partitions by ``interval`` (small, fixed cardinality)
  so every query's interval-equality predicate prunes whole partitions;
  within files, parquet min/max stats on ``i_time`` skip row groups for
  bucket-range scans (the reference's key-scheme equivalent, §4).
- ``write_long_table`` sorts within partitions by (name, i_time) before
  writing so those stats are tight (the poor man's Z-order; on Delta
  use OPTIMIZE ZORDER).
"""

from __future__ import annotations

from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession

_FORMATS = {"parquet", "orc", "json", "csv"}


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema=None,
    **options,
) -> DataFrame:
    """Format-dispatched reader. Always pass ``schema`` for csv/json in
    production paths — inference is a full extra scan at 100 TB."""
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {sorted(_FORMATS)}")
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        options.setdefault("header", "true")
    return reader.options(**options).format(fmt).load(path)


def write_long_table(
    df: DataFrame,
    path: str,
    mode: str = "append",
    fmt: str = "parquet",
    target_partitions: int | None = None,
) -> None:
    """Append long-format rows partitioned by interval, sorted within
    partitions by (name, i_time) for tight parquet min/max stats."""
    out = df
    if target_partitions:
        out = out.repartition(target_partitions, "interval", "name")
    out = out.sortWithinPartitions("interval", "name", "i_time")
    out.write.mode(mode).partitionBy("interval").format(fmt).save(path)


class ParquetStoreHandle:
    """Resolved store handle: scheme + root path."""

    def __init__(self, scheme: str, path: str):
        self.scheme = scheme
        self.path = path

    def __repr__(self):
        return f"ParquetStoreHandle({self.scheme}://{self.path})"


def open_store(url: str) -> ParquetStoreHandle:
    """kairos-style URL dispatch for the long-table store:
    ``parquet:///abs/path``, ``memory://`` (tests), ``delta:///path``
    (same layout; requires delta-spark at runtime)."""
    parsed = urlparse(url)
    scheme = parsed.scheme or "parquet"
    if scheme not in ("parquet", "memory", "delta"):
        raise ValueError(f"unsupported store scheme {scheme!r}")
    return ParquetStoreHandle(scheme, parsed.path)


def write_bucketed_long_table(
    df: DataFrame,
    table: str,
    path: str,
    buckets: int = 32,
    key: str = "name",
) -> None:
    """Bucketed variant of the long-table sink: hash-bucket by ``key``
    and sort files by ``(key, i_time)``.

    This is the co-located layout for read-mostly deployments: every
    ``groupBy(name, ...)`` aggregation and every self-/cross-join of
    two tables bucketed the same way runs with ZERO exchanges — the
    bucket files ARE the shuffle output, paid once at write time. At
    100 TB that converts the per-query name-shuffle (the engine's only
    read-path shuffle) into a write-time cost amortized over every
    subsequent query. On Delta the same role is played by OPTIMIZE
    ZORDER/clustering; plain Spark bucketing needs a catalog table,
    hence ``saveAsTable`` with an explicit path.
    """
    (
        df.write.bucketBy(buckets, key)
        .sortBy(key, "i_time")
        .option("path", path)
        .saveAsTable(table)
    )


def compact_long_table(
    spark: SparkSession,
    path: str,
    target_partitions: int = 1,
    fmt: str = "parquet",
) -> dict:
    """Compact a long-table directory in place: rewrite each
    ``interval=`` partition into ``target_partitions`` files, sorted by
    ``(name, i_time)`` so parquet min/max stats are tight again.

    Streaming ingest appends one file set per micro-batch — after a day
    of 10 s triggers a partition holds ~8,640 file groups and scan
    planning degrades (the classic small-file problem). Compaction is
    the batch companion job: read, re-sort, rewrite, swap. The swap is
    local-filesystem rename (staging dir then replace) — on object
    stores / production runs use Delta ``OPTIMIZE`` instead, which does
    this transactionally; the read/sort/rewrite shape is identical.

    Returns ``{"files_before": int, "files_after": int}``.
    """
    import pathlib
    import shutil

    root = pathlib.Path(path)

    def _data_files(p):
        return [
            f for f in p.rglob("*")
            if f.is_file() and not f.name.startswith(("_", "."))
        ]

    before = len(_data_files(root))
    df = spark.read.format(fmt).load(path)
    staging = str(root.with_name(root.name + ".__compact__"))
    try:
        (
            df.repartition(target_partitions, "interval")
            .sortWithinPartitions("interval", "name", "i_time")
            .write.mode("overwrite")
            .partitionBy("interval")
            .format(fmt)
            .save(staging)
        )
    except BaseException:
        # failed compaction write: original untouched; drop the staging dir
        shutil.rmtree(staging, ignore_errors=True)
        raise
    backup = str(root.with_name(root.name + ".__old__"))
    shutil.move(str(root), backup)
    try:
        shutil.move(staging, str(root))
    except BaseException:
        # crash-safety: a failure between the two moves must not leave the
        # table directory missing — clear any partially-created target
        # first (shutil.move into an existing dir would NEST the backup
        # inside it), then restore the original from backup
        shutil.rmtree(str(root), ignore_errors=True)
        shutil.move(backup, str(root))
        shutil.rmtree(staging, ignore_errors=True)
        raise
    shutil.rmtree(backup)
    after = len(_data_files(root))
    return {"files_before": before, "files_after": after}
