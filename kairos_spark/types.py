"""Per-series-type aggregation layer.

The reference implements five series types, each with three merge
operators (`_condense`, `_join`, `_process_row`) and a `_transform`
dispatcher (kairos/timeseries.py:757-1041). Because this engine stores
RAW appends (one row per inserted value) rather than materialized
containers, *condense*, *join* and interval-grain reads are all the same
operation — re-aggregating raw rows at a coarser grain — so each type
here declares:

- ``container_agg(df, keys, order)`` — rows → one container row per key
  group (the shape ``get``/``series`` return without a transform);
- ``transform_exprs(step_size)`` — named aggregate Column expressions
  over raw rows (the shape returned WITH a transform);
- ``empty`` — the python value an empty bucket yields (gap-fill).

Everything is builtin-function Spark (JVM, whole-stage codegen); no
Python UDFs in any hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

VALUE = "value"
SEQ = "insert_seq"


def _sorted_values(order_cols: list[str]):
    """collect_list with deterministic order: collect structs of
    (order..., value), array_sort (struct sort = lexicographic on
    fields), then project the value back out."""
    struct = F.struct(*[F.col(c) for c in order_cols], F.col(VALUE).alias("__v"))
    return F.transform(F.array_sort(F.collect_list(struct)), lambda s: s["__v"])


class TypeOps:
    """Base: shared transform names mean/count/min/max/sum/rate."""

    name: str = ""
    empty = None
    named_transforms = ("mean", "count", "min", "max", "sum", "rate")

    def container_agg(self, df: DataFrame, keys: list[str], order: list[str]) -> DataFrame:
        raise NotImplementedError

    def transform_exprs(self, step_size) -> dict:
        raise NotImplementedError

    def transform_expr(self, name: str, step_size):
        exprs = self.transform_exprs(step_size)
        if name not in exprs:
            raise ValueError(f"transform {name!r} not supported for type {self.name!r}")
        return exprs[name]


class SeriesOps(TypeOps):
    """Ordered list of raw values per bucket (kairos/timeseries.py:792-843).

    Transform quirks preserved: min/max of an empty bucket are 0, mean of
    empty is 0 (timeseries.py:805-814) — expressed with coalesce so
    gap-filled buckets match the reference."""

    name = "series"
    empty: list = []

    def container_agg(self, df, keys, order):
        return df.groupBy(*keys).agg(_sorted_values(order).alias(VALUE))

    def transform_exprs(self, step_size):
        return {
            "mean": F.coalesce(F.avg(VALUE), F.lit(0.0)),
            "count": F.count(VALUE),
            "min": F.coalesce(F.min(VALUE), F.lit(0)),
            "max": F.coalesce(F.max(VALUE), F.lit(0)),
            "sum": F.coalesce(F.sum(VALUE), F.lit(0)),
            "rate": F.count(VALUE) / step_size,
        }


class HistogramOps(TypeOps):
    """{value: occurrence-count} per bucket (kairos/timeseries.py:845-904).

    From raw rows the weighted transforms collapse to plain aggregates
    (e.g. weighted mean Σk·v/Σv == avg over raw occurrences).
    'rate' is map-valued ({k: count/step}, timeseries.py:872-873) and
    needs the two-phase ``rate_map`` path instead of a single expression.
    """

    name = "histogram"
    empty: dict = {}

    def container_agg(self, df, keys, order):
        counted = df.groupBy(*keys, VALUE).agg(F.count("*").alias("__n"))
        return counted.groupBy(*keys).agg(
            F.map_from_entries(
                F.array_sort(F.collect_list(F.struct(F.col(VALUE), F.col("__n"))))
            ).alias(VALUE)
        )

    def transform_exprs(self, step_size):
        return {
            "mean": F.coalesce(F.avg(VALUE), F.lit(0.0)),
            "count": F.count(VALUE),
            "min": F.coalesce(F.min(VALUE), F.lit(0)),
            "max": F.coalesce(F.max(VALUE), F.lit(0)),
            "sum": F.coalesce(F.sum(VALUE), F.lit(0)),
        }

    def rate_map(self, df, keys, step_size):
        """Map-valued rate: {value: count/step_size} per key group."""
        counted = df.groupBy(*keys, VALUE).agg((F.count("*") / step_size).alias("__r"))
        return counted.groupBy(*keys).agg(
            F.map_from_entries(
                F.array_sort(F.collect_list(F.struct(F.col(VALUE), F.col("__r"))))
            ).alias(VALUE)
        )

    def percentiles(self, df, keys, ps):
        """Exact weighted percentiles over the histogram (inverse CDF /
        type-1 quantile): the smallest key whose cumulative occurrence
        count reaches ceil(p × total). Integer-only arithmetic, so the
        result is engine-exact — no interpolation ambiguity.

        Scale shape: occurrences collapse to one row per (keys, value)
        FIRST (partial agg before the shuffle); the cumulative window
        then runs over distinct values per group — bounded by histogram
        cardinality, never raw row count."""
        from pyspark.sql.window import Window

        counted = df.groupBy(*keys, VALUE).agg(F.count("*").alias("__n"))
        w = Window.partitionBy(*keys).orderBy(VALUE)
        cum = counted.withColumn("__cum", F.sum("__n").over(w)).withColumn(
            "__tot", F.sum("__n").over(Window.partitionBy(*keys))
        )
        aggs = [
            F.min(
                F.when(
                    F.col("__cum") >= F.ceil(F.lit(p) * F.col("__tot")), F.col(VALUE)
                )
            ).alias(f"p{int(round(p * 100)):02d}")
            for p in ps
        ]
        return cum.groupBy(*keys).agg(*aggs)


class CountOps(TypeOps):
    """Running counter per bucket; insert defaults to +1, negatives
    decrement (kairos/timeseries.py:906-946). Only named transform is
    'rate' (timeseries.py:917-920)."""

    name = "count"
    empty = 0
    named_transforms = ("rate",)

    def container_agg(self, df, keys, order):
        return df.groupBy(*keys).agg(F.coalesce(F.sum(VALUE), F.lit(0)).alias(VALUE))

    def transform_exprs(self, step_size):
        return {"rate": F.coalesce(F.sum(VALUE), F.lit(0)) / step_size}


class GaugeOps(TypeOps):
    """Last written value wins (kairos/timeseries.py:948-988). Named
    transforms are identity no-ops (timeseries.py:957-964).

    Join/condense order sensitivity: the winner is the last value by the
    caller-provided ``order`` columns (insert order; for multi-name
    reads, name-argument order — timeseries.py:981-988). The reference's
    gauge ``_condense`` drops falsy values (``filter(None, ...)``,
    timeseries.py:976) — reproduced by ``condense_agg`` so a 0 written
    late in an interval does not shadow an earlier real reading."""

    name = "gauge"
    # reference _type_no_value is 0, not None (kairos/timeseries.py:953-955
    # — "TODO: resolve this disconnect with redis backend" notwithstanding,
    # the functional suite asserts 0 for an empty single-name get)
    empty = 0
    named_transforms = ()

    def container_agg(self, df, keys, order):
        order_expr = F.struct(*[F.col(c) for c in order])
        return df.groupBy(*keys).agg(F.max_by(VALUE, order_expr).alias(VALUE))

    def condense_agg(self, df, keys, order):
        order_expr = F.struct(*[F.col(c) for c in order])
        kept = df.where(F.col(VALUE).isNotNull() & (F.col(VALUE).cast("string") != "0"))
        return kept.groupBy(*keys).agg(F.max_by(VALUE, order_expr).alias(VALUE))

    def transform_exprs(self, step_size):
        return {}


class SetOps(TypeOps):
    """Distinct values per bucket (kairos/timeseries.py:990-1041).
    Numeric transforms run over DISTINCT members; count is exact
    cardinality (timeseries.py:998-1016)."""

    name = "set"
    empty: frozenset = frozenset()

    def container_agg(self, df, keys, order):
        # Two-phase distinct, not a direct collect_set: a direct
        # groupBy(keys).collect_set ships EVERY duplicate occurrence of a
        # hot bucket to one task. Phase 1 groups by (keys, value) — the
        # value component spreads a hot bucket across partitions and
        # map-side partial aggregation drops duplicates before the
        # shuffle; phase 2 collects only the distinct members.
        distinct = df.groupBy(*keys, VALUE).agg(F.lit(1).alias("__d")).drop("__d")
        return distinct.groupBy(*keys).agg(F.array_sort(F.collect_list(VALUE)).alias(VALUE))

    def transform_exprs(self, step_size):
        distinct_sum = F.sum_distinct(F.col(VALUE))
        distinct_n = F.count_distinct(F.col(VALUE))
        return {
            "mean": F.coalesce(distinct_sum / distinct_n, F.lit(0.0)),
            "count": distinct_n,
            "min": F.coalesce(F.min(VALUE), F.lit(0)),
            "max": F.coalesce(F.max(VALUE), F.lit(0)),
            "sum": F.coalesce(distinct_sum, F.lit(0)),
            "rate": distinct_n / step_size,
        }


TYPES: dict[str, TypeOps] = {
    ops.name: ops for ops in (SeriesOps(), HistogramOps(), CountOps(), GaugeOps(), SetOps())
}


def type_ops(name: str) -> TypeOps:
    if name not in TYPES:
        raise ValueError(f"unknown series type {name!r}; one of {sorted(TYPES)}")
    return TYPES[name]
