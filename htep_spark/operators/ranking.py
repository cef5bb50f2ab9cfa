"""Exact global ranking at scale — the distributed order statistic every
data-curation pipeline eventually needs (top-p selection, percentile
bucketing, CCNet-style perplexity terciles).

The naive Spark form — ``row_number() OVER (ORDER BY score)`` with no
partition key — collapses the whole dataset into ONE task and dies at
scale. The scale-honest exact construction used here:

1. ``repartitionByRange`` on the full sort key (score + deterministic
   tie-breakers) + ``sortWithinPartitions`` — Spark's range partitioner
   guarantees every row in partition *i* sorts before every row in
   partition *i+1*. The frame is then ``localCheckpoint``-ed (eager):
   range boundaries come from SAMPLING, so the two downstream jobs must
   read ONE materialization — re-executing the exchange per job could
   re-sample different boundaries and mis-rank boundary rows (review-r04
   finding; same lineage-pinning pattern as ``connected_components``);
2. ``monotonically_increasing_id`` over the materialized sorted
   partitions encodes (partition, local position); one tiny aggregation
   collects per-partition ``(count, min_id)`` — #partitions scalars to
   the driver, the same 1-small-action class as k-means/BM25 stats;
3. the per-partition prefix offsets broadcast-join back:
   ``global_rank = offset + (_mid - min_id) + 1``. No window function —
   a window partitioned by partition id would plan a SECOND full-data
   hash exchange.

Cost: one range exchange + one in-partition sort, materialized once and
read by both jobs, plus a scalar agg and a broadcast join — the same
class as any distributed sort, with no single-task bottleneck.
Determinism: ties are broken by explicit columns, so the rank is a pure
function of the data on any cluster size (the driver oracle reproduces it
with a plain ``row_number()`` — small data has no scale constraint).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["exact_global_rank", "q_lm_tercile", "sql_lm_tercile"]


def exact_global_rank(
    df: DataFrame,
    order_col: str,
    tie_cols: Sequence[str] = (),
    n_partitions: int = 0,
) -> DataFrame:
    """Append ``global_rank`` (1-based, ordered by ``order_col`` then
    ``tie_cols``) without a single-partition window."""
    keys = [F.col(order_col)] + [F.col(t) for t in tie_cols]
    n_parts = n_partitions or df.sparkSession.sparkContext.defaultParallelism
    parted = (
        df.repartitionByRange(n_parts, *keys)
        .sortWithinPartitions(*keys)
        .withColumn("_pid", F.spark_partition_id())
        .withColumn("_mid", F.monotonically_increasing_id())
        # ONE materialization: both downstream jobs read these exact
        # partitions — never a re-sampled range exchange (module doc #1)
        .localCheckpoint(eager=True)
    )
    stats = sorted(
        (r["_pid"], r["cnt"], r["mn"])
        for r in parted.groupBy("_pid")
        .agg(F.count("*").alias("cnt"), F.min("_mid").alias("mn"))
        .collect()
    )  # #partitions scalars — the one driver action
    offsets, acc = [], 0
    for pid, cnt, mn in stats:
        offsets.append((pid, acc, mn))
        acc += cnt
    spark = df.sparkSession
    off_df = F.broadcast(
        spark.createDataFrame(offsets, "_pid int, _offset long, _mn long")
    )
    return (
        parted.join(off_df, "_pid")
        .withColumn(
            "global_rank",
            F.col("_offset") + (F.col("_mid") - F.col("_mn")) + 1,
        )
        # the total is already known from the offsets action — expose it as
        # a literal so callers never reach for a count() OVER () window
        # (which plans an Exchange SinglePartition, the exact bottleneck
        # this operator exists to avoid)
        .withColumn("global_count", F.lit(acc).cast("long"))
        .drop("_pid", "_offset", "_mn", "_mid")
    )


# --------------------------------------------------------------------------
# CCNet-style perplexity bucketing (Wenzek et al. 2020): rank documents by
# their corpus-LM score and split into head/middle/tail terciles — the
# canonical "keep the head, drop the tail" curation signal. Built from
# q_lm_score (already hash-checked) + exact_global_rank; the oracle is a
# plain window row_number over the same 6dp-rounded scores with the same
# (score, doc_id) tie-break.
# --------------------------------------------------------------------------

_TERCILES = ("head", "middle", "tail")


def q_lm_tercile(spark, sf_dir: str) -> DataFrame:
    from ..driver_queries import q_lm_score

    scored = q_lm_score(spark, sf_dir)  # doc_id, mean_logp (rounded 6dp)
    ranked = exact_global_rank(
        scored, "mean_logp", tie_cols=("doc_id",)
    )
    bucket = F.floor(
        3 * (F.col("global_rank") - 1) / F.col("global_count")
    ).cast("int")
    tercile = F.element_at(
        F.array(*[F.lit(t) for t in reversed(_TERCILES)]), bucket + 1
    )
    return ranked.select(
        "doc_id",
        "mean_logp",
        F.col("global_rank").cast("long").alias("global_rank"),
        tercile.alias("tercile"),
    )


def _sql_lm_tercile() -> str:
    from ..driver_queries import SQL_LM_SCORE

    cases = " ".join(
        f"WHEN {i} THEN '{t}'" for i, t in enumerate(reversed(_TERCILES))
    )
    return f"""
WITH scored AS ({SQL_LM_SCORE}),
ranked AS (
  SELECT doc_id, mean_logp,
         row_number() OVER (ORDER BY mean_logp NULLS FIRST, doc_id)
           AS global_rank,
         count(*) OVER () AS n
  FROM scored
)
SELECT doc_id, mean_logp, CAST(global_rank AS BIGINT) AS global_rank,
       CASE CAST(floor(3.0 * (global_rank - 1) / n) AS INT) {cases} END
         AS tercile
FROM ranked
"""


def sql_lm_tercile() -> str:
    """Public oracle-SQL builder (function, not constant — SQL_LM_SCORE
    lives in driver_queries, which imports this module's query: the same
    lazy pattern as ``bpe.sql_bpe_train``)."""
    return _sql_lm_tercile()
