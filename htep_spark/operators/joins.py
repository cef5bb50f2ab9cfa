"""As-of join: each left row matched to the most recent right row at or
before its timestamp, per key.

The task brief names as-of join as a canonical operator Spark's built-ins
lack (SURVEY §2.7 gap list — the reference has no temporal joins at all;
this is a Spark-native extension like the streaming stages). Implemented
as a composition of existing DataFrame ops — the union/sort/last-value
pattern — NOT a Pandas UDF:

- tag both sides, ``unionByName`` (right payload columns null on left
  rows and vice versa),
- one hash partition by key + sort by ``(ts, tag)`` (right sorts first at
  equal ts → ties are inclusive, matching DuckDB's ``ASOF JOIN ...
  ON l.ts >= r.ts``),
- ``last(payload, ignorenulls=True)`` over the running window carries the
  latest right payload forward,
- filter back to left rows.

Shuffle shape at 10^12 rows: ONE exchange on the by-key (both inputs
co-partitioned), then a per-partition sort — same cost class as a
sort-merge join, no per-row Python anywhere. Skewed keys are group skew:
bound them upstream (salt by time bucket) if one key dominates; for the
event workload keys are users/sessions — naturally high cardinality.

``tolerance`` (seconds) nulls out matches older than the horizon —
the pandas ``merge_asof(tolerance=...)`` semantics.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["asof_join", "range_join"]


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    by: Sequence[str] = (),
    bucket_sec: int = 3600,
) -> DataFrame:
    """Interval-containment join (``start <= point <= end`` per key) via
    time-bucket expansion — the other temporal operator the task brief
    names that Spark's equi-join machinery lacks.

    Scale path: a naive inequality join is a per-key cross product. Here
    each interval explodes into the ``bucket_sec``-wide epoch buckets it
    covers and each point maps to its single bucket — the join becomes an
    EQUI-join on ``(by…, bucket)`` with an exact containment post-filter.
    Shuffle is O(points + Σ interval_spans/bucket) instead of O(points ×
    intervals-per-key); pick ``bucket_sec`` near the median interval
    length so expansion stays O(1) per interval. Timestamps are compared
    at full precision; only the bucketing quantizes."""
    by = list(by)
    pb = points.withColumn(
        "_bucket", F.floor(F.unix_timestamp(F.col(point_col)) / bucket_sec)
    )
    ib = (
        intervals.withColumn(
            "_bs", F.floor(F.unix_timestamp(F.col(start_col)) / bucket_sec)
        )
        .withColumn("_be", F.floor(F.unix_timestamp(F.col(end_col)) / bucket_sec))
        .withColumn("_bucket", F.explode(F.sequence("_bs", "_be")))
        .drop("_bs", "_be")
    )
    return (
        pb.join(ib, [*by, "_bucket"])
        .filter(
            (F.col(point_col) >= F.col(start_col))
            & (F.col(point_col) <= F.col(end_col))
        )
        .drop("_bucket")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: Sequence[str] = ("user_id",),
    tolerance_sec: Optional[int] = None,
    suffix: str = "_r",
) -> DataFrame:
    """Left rows + the most recent right row with ``r.on <= l.on`` per
    ``by`` key (inclusive ties). Right payload columns are appended with
    ``suffix``; unmatched (or out-of-tolerance) rows carry nulls."""
    by = list(by)
    payload = [c for c in right.columns if c not in by and c != on]
    # suffixed right-payload names must not collide with left columns —
    # a duplicate name would make downstream resolution ambiguous
    clash = sorted(
        {f"{c}{suffix}" for c in [on, *payload]} & {*left.columns, "_tag"}
    )
    if clash or "_tag" in left.columns:
        raise ValueError(
            f"asof_join: suffixed right column(s) {clash} collide with left "
            f"columns (or the internal '_tag'); pass a different suffix="
        )
    r = right.select(
        *by,
        F.col(on).alias(on),
        F.lit(0).alias("_tag"),
        F.col(on).alias(f"{on}{suffix}"),
        *[F.col(c).alias(f"{c}{suffix}") for c in payload],
    )
    l_cols = left.columns
    l = left.select(
        "*",
        F.lit(1).alias("_tag"),
        F.lit(None).cast(r.schema[f"{on}{suffix}"].dataType).alias(f"{on}{suffix}"),
        *[
            F.lit(None).cast(r.schema[f"{c}{suffix}"].dataType).alias(f"{c}{suffix}")
            for c in payload
        ],
    )
    merged = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("_tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = [f"{on}{suffix}"] + [f"{c}{suffix}" for c in payload]
    filled = merged.select(
        *l_cols,
        "_tag",
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in carried],
    ).filter(F.col("_tag") == 1)
    if tolerance_sec is not None:
        in_tol = (
            F.col(f"{on}{suffix}").isNotNull()
            & (
                F.unix_timestamp(F.col(on)) - F.unix_timestamp(F.col(f"{on}{suffix}"))
                <= tolerance_sec
            )
        )
        filled = filled.select(
            *l_cols,
            *[F.when(in_tol, F.col(c)).otherwise(F.lit(None)).alias(c) for c in carried],
        )
    else:
        filled = filled.select(*l_cols, *carried)
    return filled
