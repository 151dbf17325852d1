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
    """Base: shared transform names mean/count/min/max/sum/rate.

    The ``py_*`` methods are driver-side ports of the reference's
    native container operators (``_process_row`` / ``_condense`` /
    ``_join``, kairos/timeseries.py:757-1041). They exist for the
    customized-read hooks (``fetch`` / ``process_row`` / callable
    condense-collapse-join, README.rst:623-749): once a custom callable
    enters the read path the containers live driver-side, so the native
    fallbacks must too. The cluster-scale path never calls these — it
    re-aggregates raw rows JVM-side via ``container_agg``."""

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

    def py_process_row(self, data, read_func):
        """Native cast + read_func application for one container."""
        raise NotImplementedError

    def py_condense(self, data: dict):
        """Collapse one interval's {r_ts: container} into one container."""
        raise NotImplementedError

    def py_join(self, rows: list):
        """Join per-name containers of one time slot."""
        raise NotImplementedError


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

    def py_process_row(self, data, read_func):
        # kairos/timeseries.py:823-826
        return [read_func(v) for v in data] if read_func else data

    def py_condense(self, data):
        # kairos/timeseries.py:828-834 (reduce(operator.add))
        out = []
        for v in data.values():
            out.extend(v)
        return out

    def py_join(self, rows):
        # kairos/timeseries.py:836-843
        out = []
        for row in rows:
            if row:
                out.extend(row)
        return out


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

    def py_process_row(self, data, read_func):
        # kairos/timeseries.py:878-883 (keys through read_func, counts int)
        return {
            (read_func(k) if read_func else k): int(v) for k, v in data.items()
        }

    def py_condense(self, data):
        # kairos/timeseries.py:885-893
        out: dict = {}
        for hist in data.values():
            for k, v in hist.items():
                out[k] = v + out.get(k, 0)
        return out

    def py_join(self, rows):
        # kairos/timeseries.py:895-904
        out: dict = {}
        for row in rows:
            if row:
                for k, v in row.items():
                    out[k] = v + out.get(k, 0)
        return out


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

    def py_process_row(self, data, read_func):
        # kairos/timeseries.py:928-929 (read_func not applied to counts)
        return int(data) if data else 0

    def py_condense(self, data):
        # kairos/timeseries.py:931-937
        return sum(data.values()) if data else 0

    def py_join(self, rows):
        # kairos/timeseries.py:939-946
        return sum(row for row in rows if row)


class GaugeOps(TypeOps):
    """Last written value wins (kairos/timeseries.py:948-988). Named
    transforms are identity no-ops (timeseries.py:957-964).

    Join/condense order sensitivity: the winner is the last value by the
    caller-provided ``order`` columns (insert order; for multi-name
    reads, name-argument order — timeseries.py:981-988). The reference's
    gauge ``_condense`` drops falsy values (``filter(None, ...)``,
    timeseries.py:976) — reproduced by the facade's ``_nonfalsy``
    condense path (kairos_spark/timeseries.py) so a 0 written
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

    def transform_exprs(self, step_size):
        return {}

    def py_process_row(self, data, read_func):
        # kairos/timeseries.py:966-969 (read_func sees '' for falsy)
        if read_func:
            return read_func(data or "")
        return data

    def py_condense(self, data):
        # kairos/timeseries.py:971-979: last non-falsy value, else None
        kept = [v for v in data.values() if v]
        return kept[-1] if kept else None

    def py_join(self, rows):
        # kairos/timeseries.py:981-988: last truthy row wins
        out = None
        for row in rows:
            if row:
                out = row
        return out


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

    def py_process_row(self, data, read_func):
        # kairos/timeseries.py:1021-1024
        if read_func:
            return {read_func(d) for d in data}
        return set(data)

    def py_condense(self, data):
        # kairos/timeseries.py:1026-1032 (reduce(operator.ior))
        out: set = set()
        for v in data.values():
            out |= v
        return out

    def py_join(self, rows):
        # kairos/timeseries.py:1034-1041
        out: set = set()
        for row in rows:
            if row:
                out |= row
        return out


TYPES: dict[str, TypeOps] = {
    ops.name: ops for ops in (SeriesOps(), HistogramOps(), CountOps(), GaugeOps(), SetOps())
}


def type_ops(name: str) -> TypeOps:
    if name not in TYPES:
        raise ValueError(f"unknown series type {name!r}; one of {sorted(TYPES)}")
    return TYPES[name]
