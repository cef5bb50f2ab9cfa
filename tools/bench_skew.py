"""Skew sensitivity of the per-conversation rollup (SURVEY.md §7.3).

Builds an extreme-skew corpus (one conversation holding 90% of all turns),
runs the salted two-stage rollup at the default bucket size vs an
effectively-unsalted bucket (2^31), and times both. Appends the result to
``BENCH/BASELINE.md``. At sandbox scale the absolute numbers are small; the
point is the *mechanism*: the salted plan's stage-1 groups are bounded at
``bucket_size`` regardless of conversation size, so the same plan holds at
10^6-turn conversations where the unsalted single group would dominate a
straggler task.
"""

from __future__ import annotations

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> None:
    n_turns = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000

    from htep_spark.plans.pipeline import per_conversation_metrics
    from htep_spark.sources.io import get_spark, synthesize_transcripts

    spark = get_spark("skew", cores=32, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    transcripts = synthesize_transcripts(
        spark, n_turns, n_convs=64, mega_share=0.9, partitions=64
    )
    # time the grouped stage only: reuse extracted metrics columns by
    # substituting cheap literals for the extraction result
    from pyspark.sql import functions as F

    light = transcripts.select(
        "conv_id",
        "turn_idx",
        F.named_struct(
            F.lit("metrics"),
            F.named_struct(
                F.lit("failed"), F.lit(False),
                F.lit("n_corrections"), F.lit(1),
                F.lit("blocks_kept"), F.lit(1),
                F.lit("blocks_dropped"), F.lit(0),
            ),
            F.lit("matched_drugs"), F.array(F.lit("aspirin")),
        ).alias("result"),
    ).cache()
    light.count()

    results = {}
    for label, bucket in (("salted_10k", 10_000), ("unsalted", 1 << 31)):
        per_conversation_metrics(light, bucket_size=bucket).collect()  # warm
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            per_conversation_metrics(light, bucket_size=bucket).collect()
            best = min(best, time.time() - t0)
        results[label] = round(best, 3)
        print(label, results[label], "s")

    with open(os.path.join(ROOT, "BENCH", "BASELINE.md"), "a") as f:
        f.write(
            "\n## Skew sensitivity (extreme: one conversation = 90% of "
            f"{n_turns} turns, 32 cores, best of 3)\n\n"
            f"- salted rollup (bucket 10k): {results['salted_10k']}s\n"
            f"- unsalted rollup (single mega-group): {results['unsalted']}s\n"
            "- The salted plan bounds every stage-1 group at bucket_size, so "
            "its task-time distribution is flat regardless of conversation "
            "size; the unsalted plan concentrates the mega-conversation in "
            "one task (a straggler that grows linearly with conversation "
            "length — at 10^6+-turn conversations it dominates the stage).\n"
        )
    print("appended to BENCH/BASELINE.md")
    spark.stop()


if __name__ == "__main__":
    main()
