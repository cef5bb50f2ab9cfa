"""Dump .explain("formatted") plans for declared queries into plans/r07/.

Usage: python tools/dump_plans.py <suffix> <name1,name2,...>
  suffix: "before" or "after" (file becomes plans/r07/<name>_<suffix>.txt)
  names:  QUERIES keys, or the specials extract_transcripts / conv_metrics /
          conv_rollup / extract_full (the bench's pipeline surfaces).

Evidence artifacts for OPTIMIZATION_r07.md (guide §1: capture the plan
shape — Exchange count, join strategy, PushedFilters, Arrow/BatchEvalPython
nodes — before and after every change).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r07")


def explain_formatted(df) -> str:
    return df.sparkSession._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def build(name: str, spark):
    from htep_spark.driver_queries import QUERIES

    if name == "extract_transcripts":
        from htep_spark.plans.pipeline import run_extraction
        from htep_spark.sources.io import synthesize_transcripts

        return run_extraction(synthesize_transcripts(spark, 20_000, partitions=8))
    if name == "conv_metrics":
        from htep_spark.plans.pipeline import per_conversation_metrics, run_extraction
        from htep_spark.sources.io import synthesize_transcripts

        return per_conversation_metrics(
            run_extraction(synthesize_transcripts(spark, 20_000, partitions=8))
        )
    if name == "conv_rollup":
        import __spark_entry__ as entrymod

        return entrymod._conv_rollup(spark, SF_DIR)
    if name == "extract_full":
        import __spark_entry__ as entrymod

        return entrymod._flagship(spark, SF_DIR)
    if name == "minhash_lsh_fast":
        from htep_spark.operators.dedup import q_minhash_lsh_fast

        return q_minhash_lsh_fast(spark, SF_DIR)
    if name == "winnow_bench":
        from htep_spark.operators.text_analysis import q_winnow_fingerprints

        return q_winnow_fingerprints(spark, SF_DIR)
    return QUERIES[name][0](spark, SF_DIR)


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2].split(",")
    from htep_spark.sources.io import get_spark

    spark = get_spark("plan-dump", cores=4, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(OUT_DIR, exist_ok=True)
    for name in names:
        df = build(name, spark)
        path = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(explain_formatted(df))
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
