"""Physical-layout evidence: conv_id bucketing eliminates the rollup shuffle.

The 10^12-turn table is laid out with ``bucket(N, conv_id)`` (SURVEY.md §4,
Iceberg transform; parquet ``bucketBy`` here). The per-conversation grouped
stage then needs **no exchange** — the only shuffle the job would otherwise
have disappears at the scan.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from htep_spark.schema import TRANSCRIPT_SCHEMA
from htep_spark.sources.io import synthesize_transcripts_pdf, write_bucketed_transcripts


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    # warehouse dir is a static conf — use the session default, drop after
    df = spark.createDataFrame(
        synthesize_transcripts_pdf(200, n_convs=10), TRANSCRIPT_SCHEMA
    )
    write_bucketed_transcripts(df, "transcripts_bucketed", n_buckets=8)
    yield spark.table("transcripts_bucketed")
    spark.sql("DROP TABLE IF EXISTS transcripts_bucketed")


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_groupby_has_no_exchange(spark, bucketed):
    rollup = bucketed.groupBy("conv_id").agg(
        F.count("*").alias("n_turns"),
        F.min("turn_idx").alias("min_turn"),
        F.max("turn_idx").alias("max_turn"),
    )
    plan = _physical_plan(rollup)
    assert "Exchange" not in plan, plan
    # results still correct
    rows = {r["conv_id"]: r for r in rollup.collect()}
    assert rows["conv-000000"]["n_turns"] == 40  # mega-conversation (20%)
    assert all(r["min_turn"] == 0 for r in rows.values())


def test_unbucketed_groupby_needs_exchange(spark, bucketed):
    # same aggregation over a non-bucketed copy shuffles — the contrast proof
    plain = spark.createDataFrame(
        synthesize_transcripts_pdf(200, n_convs=10), TRANSCRIPT_SCHEMA
    )
    plan = _physical_plan(plain.groupBy("conv_id").count())
    assert "Exchange" in plan


def test_bucketed_self_join_has_no_shuffle_join(spark, bucketed):
    a = bucketed.select("conv_id", "turn_idx")
    b = bucketed.select("conv_id", F.col("turn_idx").alias("t2"))
    joined = a.join(b, "conv_id")
    plan = _physical_plan(joined)
    # co-located join: sort-merge without a shuffle on either side
    assert "Exchange hashpartitioning" not in plan, plan
