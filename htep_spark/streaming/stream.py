"""Structured Streaming variant of the extraction pipeline.

The reference has no streaming (SURVEY.md §2.7) — this is the Spark-native
extension for continuously-arriving transcript turns: same per-turn
extraction UDF over a stream, plus a watermarked sliding aggregation of
extraction metrics (late turns tolerated up to the watermark).

The per-turn operator chain is stateless, so the hot path needs no state
store; the windowed metrics stage uses standard watermark + window state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.extract import extract_turn_udf

__all__ = ["stream_extraction", "stream_windowed_metrics"]


def stream_extraction(stream_df: DataFrame) -> DataFrame:
    """streaming transcripts → streaming extraction results (stateless)."""
    return stream_df.select(
        "conv_id",
        "turn_idx",
        "ts",
        extract_turn_udf(F.col("text")).alias("result"),
    )


def stream_windowed_metrics(
    stream_df: DataFrame,
    window_duration: str = "10 minutes",
    watermark: str = "5 minutes",
) -> DataFrame:
    """Watermarked tumbling-window rollup of extraction metrics."""
    extracted = stream_extraction(stream_df)
    return (
        extracted.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_duration).alias("win"))
        .agg(
            F.count("*").alias("n_turns"),
            F.sum(F.col("result.metrics.failed").cast("int")).alias("n_failed"),
            F.sum("result.metrics.n_corrections").alias("n_corrections"),
            F.sum(
                (F.size("result.matched_drugs") > 0).cast("int")
            ).alias("n_drug_turns"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "n_turns",
            "n_failed",
            "n_corrections",
            "n_drug_turns",
        )
    )
