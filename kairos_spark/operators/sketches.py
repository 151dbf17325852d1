"""Cardinality sketches: bounded-state distinct counting.

At 100 TB an exact ``count_distinct`` shuffles every distinct value; a
sketch keeps O(k) state per group, merges with elementwise min, and
costs one map-side-combinable aggregate — the same state contract as
HyperLogLog but built from the repo's md5 double-hash family
(dedup.MINHASH_PRIME), so it is deterministic, seed-free, and exactly
reproducible by the DuckDB oracle INCLUDING the estimation error.

Estimator: with k independent permutations h_i, E[min h_i(S)] =
P/(n+1) for n distinct values uniform on [0, P). Summing the k integer
minima S_k = Σ min_i (exact in int64 — 64 values < 2^44 each) gives
n̂ = k·P/S_k − 1, a single double division so both engines compute the
identical rounded value. Relative error ~ 1/√k.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from kairos_spark.operators.dedup import MINHASH_PRIME, _md5_long


def minhash_distinct_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """Per-group sketch as ``sketch: array<long>[k]`` (the k minima).
    Mergeable: union two sketch tables and take elementwise min
    (``zip_with(a, b, least)``) — the property that lets partial
    sketches roll up across partitions, days, or clusters."""
    v = F.col(value_col).cast("string")
    hashed = df.select(
        *group_cols,
        _md5_long(v).alias("__a"),
        _md5_long(v, 11).alias("__b"),
    )
    mins = hashed.groupBy(*group_cols).agg(
        *[
            F.min((F.col("__a") + i * F.col("__b")) % F.lit(MINHASH_PRIME)).alias(f"__m{i}")
            for i in range(k)
        ]
    )
    return mins.select(
        *group_cols, F.array(*[F.col(f"__m{i}") for i in range(k)]).alias("sketch")
    )


def sketch_estimate(sketch: Column, k: int = 64) -> Column:
    """Distinct-count estimate from a sketch column. The minima sum is
    exact integer math; the single division keeps the float behavior
    identical across engines."""
    s = F.aggregate(sketch, F.lit(0).cast("long"), lambda acc, m: acc + m)
    return F.round(F.lit(float(k) * MINHASH_PRIME) / s.cast("double") - 1.0, 6)


def merge_sketches(a: Column, b: Column) -> Column:
    """Elementwise-min merge of two sketches (sketch union semantics)."""
    return F.zip_with(a, b, lambda x, y: F.least(x, y))


def distinct_estimate(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """Per-group estimated distinct count alongside the sketch."""
    sk = minhash_distinct_sketch(df, group_cols, value_col, k)
    return sk.select(
        *group_cols, sketch_estimate(F.col("sketch"), k).alias("est_distinct")
    )
