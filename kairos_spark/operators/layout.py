"""Data-layout operators: space-filling-curve keys for multi-column
locality.

A single sort column gives perfect pruning on one dimension and none
on the other; a Z-order (Morton) key interleaves the bits of two
dimensions so rows close in EITHER dimension land close in the sort
order — the layout trick behind Delta/Iceberg Z-ordering, here as an
explicit column expression you can sort/bucket/range-partition by.
Writing the long table sorted by a (name, time) Morton key keeps both
per-name scans AND time-range scans pruning well at 100 TB, where a
lexicographic (name, time) sort only serves the first.

Everything is integer bit math in whole-stage codegen — no UDFs, no
shuffle; the stats operator adds one hash aggregate over the derived
bucket."""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, functions as F

from kairos_spark.operators.text import _round6_ratio


def morton_z(x: Column, y: Column, bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of two non-negative integer
    columns into a 2*bits-bit Morton (Z-order) key: x occupies the even
    output bits, y the odd. Callers clamp/bucket their dimensions into
    [0, 2^bits) first (e.g. ``% 65536``)."""
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i))
        terms.append(F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    return reduce(lambda a, b: a + b, terms).cast("long")


def zorder_stats(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    step_sec: int = 3600,
    bits: int = 16,
    bucket_shift: int = 22,
) -> DataFrame:
    """Locality audit of a (key, time-bucket) Morton layout: compute
    the Z key for every row, coarsen it to a file-sized range
    (``z >> bucket_shift`` — each bucket is a contiguous run of the
    Z curve, i.e. one file/row-group under a Z-sorted write), and
    report per bucket how many rows, distinct keys, and distinct time
    buckets it holds plus the time span. Tight per-bucket key/time
    ranges = both dimensions prune; this is how you CHECK a layout
    choice instead of guessing it.

    Scale shape: the Z key is a map-side projection; the only shuffle
    is the per-bucket aggregate (2^(2*bits - bucket_shift) groups max,
    partial-aggregated)."""
    x = (F.col(key_col) % (1 << bits)).cast("long")
    y = (
        F.floor(F.unix_timestamp(F.col(ts_col)) / step_sec).cast("long") % (1 << bits)
    )
    z = morton_z(x, y, bits)
    return (
        df.select(
            F.shiftright(z, bucket_shift).cast("long").alias("z_bucket"),
            F.col(key_col).alias("__k"),
            F.floor(F.unix_timestamp(F.col(ts_col)) / step_sec)
            .cast("long")
            .alias("__h"),
        )
        .groupBy("z_bucket")
        .agg(
            F.count("*").alias("n_rows"),
            F.count_distinct("__k").alias("n_keys"),
            F.count_distinct("__h").alias("n_hours"),
            (F.max("__h") - F.min("__h")).alias("hour_span"),
        )
    )


def zonemap_prune_audit(
    df: DataFrame,
    sort_col: str,
    id_col: str,
    chunk_rows: int = 64,
    lo: float = 0.0,
    hi: float = 0.0,
) -> DataFrame:
    """Zone-map (min/max statistics) pruning effectiveness audit: chunk
    the table two ways — natural order (by ``id_col``, standing in for
    ingestion order) and sorted by ``sort_col`` — compute each chunk's
    [min, max] of ``sort_col``, and count the chunks a range predicate
    ``lo <= x <= hi`` could SKIP. This is the number that justifies a
    layout rewrite: parquet/Delta/Iceberg file skipping only prunes
    when the sort key clusters values into files, and this audit
    measures exactly how much a re-sort would buy for a given
    predicate before anyone pays for the rewrite. Returns one row per
    layout: (layout, n_chunks, n_pruned, prune_rate).

    Scale shape: each layout needs one global row_number to simulate
    chunk assignment (at real scale the chunk id comes free from the
    file layout itself — the window here is audit plumbing), then a
    chunk-grain min/max aggregation. Chunk stats, not rows, drive the
    final counts."""
    from pyspark.sql.window import Window

    base = df.select(
        F.col(sort_col).cast("double").alias("__x"), F.col(id_col).alias("__id")
    )
    rows = None
    for layout, order in (
        ("natural", [F.col("__id")]),
        ("sorted", [F.col("__x"), F.col("__id")]),
    ):
        chunk = F.floor(
            (F.row_number().over(Window.orderBy(*order)) - 1) / chunk_rows
        ).cast("long")
        stats = (
            base.select("__x", chunk.alias("__c"))
            .groupBy("__c")
            .agg(F.min("__x").alias("__lo"), F.max("__x").alias("__hi"))
        )
        agg = stats.agg(
            F.lit(layout).alias("layout"),
            F.count("*").cast("long").alias("n_chunks"),
            F.sum(
                F.when((F.col("__hi") < lo) | (F.col("__lo") > hi), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_pruned"),
        ).select(
            "layout",
            "n_chunks",
            "n_pruned",
            _round6_ratio(F.col("n_pruned"), F.col("n_chunks")).alias(
                "prune_rate"
            ),
        )
        rows = agg if rows is None else rows.union(agg)
    return rows
