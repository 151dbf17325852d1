"""Relational join strategies the reference lacks entirely
(SURVEY.md §2.4: "No hash/sort-merge/broadcast/nested-loop/theta/
semi/anti/as-of joins exist in the reference") but that any engine
serving its workloads at scale needs: banded range joins and the
semi/anti filters.

Scale shape (100 TB):
- A naive band predicate ``abs(l.ts - r.ts) <= band`` is a theta join
  — Spark can only plan it as BroadcastNestedLoopJoin (O(|L|·|R|)
  comparisons and a broadcast of a whole side). ``banded_range_join``
  rewrites it to an EQUALITY join on (key, time_bucket) by flooring
  both sides to ``band``-width buckets and exploding the right side
  into the 3 buckets its band window can overlap. Catalyst then plans
  a plain shuffled hash join: candidates per row = the right rows in
  ±1 bucket of the same key, i.e. output-proportional work instead of
  cross-product work. The residual exact predicate filters the
  candidates. This is the standard interval-bucketing strategy
  (Spark's own range-join hints on Databricks, Flink's interval join).
- The explode is ×3 on ONE side only; choose the smaller/sparser
  stream as ``right``.
- Semi/anti joins are built-in (``how='left_semi'/'left_anti'``) and
  included here as thin, named wrappers so the query pack exercises
  them explicitly; both shuffle only the join keys of the filter side
  and never widen rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def banded_range_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    band_sec: float,
    left_ts: str = "ts",
    right_ts: str = "ts",
) -> DataFrame:
    """Inner-join rows of ``left`` to rows of ``right`` with equal
    ``key_cols`` and ``|left_ts - right_ts| <= band_sec``.

    Returns left columns + right columns (right's renamed with ``r_``
    prefix where they collide). Equality keys = (key, floor(ts/band)),
    right exploded to bucket-1..bucket+1, so every qualifying pair
    matches on exactly one bucket value — no dedup needed.
    """
    band = float(band_sec)
    lsec = F.col(left_ts).cast("double")
    rsec = F.col(right_ts).cast("double")

    lcols = set(left.columns)
    # rename targets must be free across BOTH sides (a right frame that
    # already contains r_<c> would otherwise produce duplicate output
    # columns) — suffix underscores until unique
    taken = lcols | set(right.columns)
    renames = {}
    for c in right.columns:
        if c in lcols and c not in key_cols:
            target = f"r_{c}"
            while target in taken:
                target += "_"
            renames[c] = target
            taken.add(target)
    r = right.select(
        *[F.col(k) for k in key_cols],
        *[F.col(c).alias(renames.get(c, c)) for c in right.columns if c not in key_cols],
    )
    r_ts_name = renames.get(right_ts, right_ts)
    r = r.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(r_ts_name).cast("double") / band) - 1,
                F.floor(F.col(r_ts_name).cast("double") / band) + 1,
            )
        ),
    )
    l = left.withColumn("__bucket", F.floor(lsec / band))
    joined = l.join(r, on=key_cols + ["__bucket"], how="inner").drop("__bucket")
    return joined.where(
        F.abs(F.col(left_ts).cast("double") - F.col(r_ts_name).cast("double")) <= band
    )


def semi_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """Rows of ``left`` with at least one match in ``right`` (EXISTS).
    Output schema = left schema; right is only a filter."""
    return left.join(right, on=on, how="left_semi")


def anti_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """Rows of ``left`` with no match in ``right`` (NOT EXISTS)."""
    return left.join(right, on=on, how="left_anti")
