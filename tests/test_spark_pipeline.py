"""The load-bearing invariant (SURVEY.md §5, north_star):

``spark_pipeline(turns) == [reference(t) for t in turns]`` byte-for-byte per
turn under stable ``(conv_id, turn_idx)`` ordering — plus the per-
conversation grouped stages (salted metrics, order validation) and the
checkpoint/resume protocol.
"""

from __future__ import annotations

import math
import os

import pytest
from pyspark.sql import functions as F

from htep_spark.plans.checkpoint import run_with_checkpoint
from htep_spark.plans.pipeline import per_conversation_metrics, run_extraction, validate_turn_order
from htep_spark.reference import extract_turn
from htep_spark.schema import TRANSCRIPT_SCHEMA
from htep_spark.sources.io import synthesize_transcripts, synthesize_transcripts_pdf

N_TURNS = 240


@pytest.fixture(scope="module")
def transcripts_pdf():
    return synthesize_transcripts_pdf(N_TURNS, n_convs=12)


@pytest.fixture(scope="module")
def transcripts(spark, transcripts_pdf):
    return spark.createDataFrame(transcripts_pdf, schema=TRANSCRIPT_SCHEMA).cache()


def _normalize(value):
    """Recursively convert Spark Rows/arrays to plain Python for equality."""
    if hasattr(value, "asDict"):
        return {k: _normalize(v) for k, v in value.asDict().items()}
    if isinstance(value, list):
        return [_normalize(v) for v in value]
    if isinstance(value, dict):
        return {k: _normalize(v) for k, v in value.items()}
    if isinstance(value, float) and math.isnan(value):
        return None
    return value


def test_spark_equals_oracle_byte_for_byte(spark, transcripts, transcripts_pdf):
    result = (
        run_extraction(transcripts)
        .orderBy("conv_id", "turn_idx")
        .collect()
    )
    expected = transcripts_pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert len(result) == len(expected)
    for row, (_, exp) in zip(result, expected.iterrows()):
        assert row["conv_id"] == exp["conv_id"]
        assert row["turn_idx"] == exp["turn_idx"]
        oracle = extract_turn(exp["text"])
        got = _normalize(row["result"])
        # struct-wise comparison with exact string equality per field
        assert got == _normalize(oracle), (
            f"mismatch at {row['conv_id']}/{row['turn_idx']}"
        )


def test_distributed_synthesis_matches_driver_synthesis(spark, transcripts_pdf):
    dist = (
        synthesize_transcripts(spark, N_TURNS, n_convs=12, partitions=7)
        .orderBy("conv_id", "turn_idx")
        .toPandas()
    )
    exp = transcripts_pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert dist["text"].tolist() == exp["text"].tolist()
    assert dist["conv_id"].tolist() == exp["conv_id"].tolist()


def test_per_conversation_metrics_and_salting(spark, transcripts):
    extracted = run_extraction(transcripts)
    # tiny salt bucket forces multi-bucket merge even on small fixtures
    metrics = per_conversation_metrics(extracted, bucket_size=5).collect()
    by_conv = {m["conv_id"]: m for m in metrics}
    # conv-000000 is the mega conversation (~20% of turns)
    assert by_conv["conv-000000"]["n_turns"] == 48
    assert all(m["ordered_ok"] for m in metrics)
    total = sum(m["n_turns"] for m in metrics)
    assert total == N_TURNS
    assert validate_turn_order(extracted, bucket_size=5)


def test_order_validation_catches_gaps(spark, transcripts):
    from pyspark.sql import functions as F

    broken = transcripts.filter(
        ~((F.col("conv_id") == "conv-000001") & (F.col("turn_idx") == 3))
    )
    assert not validate_turn_order(run_extraction(broken), bucket_size=5)


def test_checkpoint_resume(spark, transcripts_pdf, tmp_path):
    input_dir = str(tmp_path / "input")
    out_dir = str(tmp_path / "out")
    manifest_dir = str(tmp_path / "manifest")
    # write input as several parquet files (work units)
    df = spark.createDataFrame(transcripts_pdf, schema=TRANSCRIPT_SCHEMA)
    df.repartition(4).write.mode("overwrite").parquet(input_dir)

    first = run_with_checkpoint(spark, input_dir, out_dir, manifest_dir, "run-a")
    assert first["processed"] >= 4
    assert first["skipped"] == 0

    # resume: everything already done → nothing reprocessed
    second = run_with_checkpoint(spark, input_dir, out_dir, manifest_dir, "run-b")
    assert second["processed"] == 0
    assert second["skipped"] == first["processed"]

    # output completeness: all turns present exactly once
    out = spark.read.parquet(out_dir + "/part-*")
    assert out.count() == len(transcripts_pdf)
    manifest = spark.read.parquet(manifest_dir)
    assert manifest.filter("status = 'done'").count() == first["processed"]
    assert manifest.agg({"n_turns": "sum"}).collect()[0][0] == len(transcripts_pdf)


def test_compact_output(spark, transcripts_pdf, tmp_path):
    """Small-files compaction: row-set preserved exactly, file count drops
    to the bin-packed group count, plan/manifest deterministic, oversized
    parts pass through, re-run idempotent."""
    from htep_spark.plans.compact import compact_output, plan_groups

    src = str(tmp_path / "many_parts")
    dst = str(tmp_path / "compacted")
    df = spark.createDataFrame(transcripts_pdf, schema=TRANSCRIPT_SCHEMA)
    df.repartition(8).write.mode("overwrite").parquet(src)

    part_sizes = [
        os.path.getsize(os.path.join(src, f))
        for f in os.listdir(src)
        if f.endswith(".parquet")
    ]
    assert len(part_sizes) == 8
    target = sum(part_sizes) // 3  # force ~3-4 groups
    groups = plan_groups(src, target)
    assert 1 < len(groups) < 8
    assert plan_groups(src, target) == groups  # deterministic plan
    # tiny target: every file its own group (oversized pass-through)
    assert len(plan_groups(src, 1)) == 8

    result = compact_output(spark, src, dst, target_bytes=target)
    assert result["n_files_in"] == 8
    assert result["n_groups"] == len(groups)
    assert result["n_rows"] == len(transcripts_pdf)
    out = spark.read.parquet(dst)
    assert out.count() == len(transcripts_pdf)
    # row-set equality, not just counts
    key = F.concat_ws("#", "conv_id", "turn_idx")
    assert (
        sorted(r[0] for r in out.select(key).collect())
        == sorted(r[0] for r in df.select(key).collect())
    )
    # one data file per group
    n_parts = sum(
        1
        for root, _d, names in os.walk(dst)
        for n in names
        if n.endswith(".parquet") and not n.startswith(".")
    )
    assert n_parts == len(groups)
    # idempotent re-run (overwrite per group)
    again = compact_output(spark, src, dst, target_bytes=target)
    assert again["n_rows"] == result["n_rows"]
    assert spark.read.parquet(dst).count() == len(transcripts_pdf)
    # no Hive partition-column inference: compacted schema == the input's
    # on-disk schema (parquet drops nullable=False on both sides equally)
    assert spark.read.parquet(dst).schema == spark.read.parquet(src).schema
    # re-plan with fewer groups must remove stale group dirs, not
    # duplicate rows (review r04 finding)
    big = compact_output(spark, src, dst, target_bytes=sum(part_sizes) * 2)
    assert big["n_groups"] == 1
    assert spark.read.parquet(dst).count() == len(transcripts_pdf)


def test_extraction_plan_is_narrow(spark, transcripts):
    """The hot path must stay shuffle-free with pruned input columns."""
    plan = (
        run_extraction(transcripts.select("*"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan
    assert "ArrowEvalPython" in plan


def test_job_entrypoint_checkpoint_and_resume(spark, transcripts_pdf, tmp_path):
    import job

    input_dir = str(tmp_path / "jin")
    out_dir = str(tmp_path / "jout")
    spark.createDataFrame(transcripts_pdf, schema=TRANSCRIPT_SCHEMA).repartition(
        3
    ).write.parquet(input_dir)
    rc = job.main(
        ["--input", input_dir, "--output", out_dir, "--conv-metrics"]
    )
    assert rc == 0
    out = spark.read.parquet(out_dir + "/part-*")
    assert out.count() == len(transcripts_pdf)
    metrics = spark.read.parquet(out_dir + "_conv_metrics")
    assert metrics.filter("NOT ordered_ok").count() == 0
    # second invocation resumes: nothing reprocessed
    rc = job.main(["--input", input_dir, "--output", out_dir])
    assert rc == 0
    from htep_spark.plans.checkpoint import plan_units

    manifest = spark.read.parquet(out_dir + "_manifest")
    assert manifest.count() == len(plan_units(input_dir))  # each unit once


def test_conversation_rollup(spark, transcripts):
    from htep_spark.operators.conversation import conversation_rollup

    records = {
        r["conv_id"]: r
        for r in conversation_rollup(run_extraction(transcripts)).collect()
    }
    assert len(records) == 12
    mega = records["conv-000000"]
    assert mega["n_turns"] == 48
    assert mega["all_drugs"]  # clinical payloads guarantee drug mentions
    assert mega["max_urgency"] in ("routine", "high", "urgent")
    assert mega["patient_name"]  # earliest non-null patient wins
    # determinism across runs
    again = {
        r["conv_id"]: r
        for r in conversation_rollup(run_extraction(transcripts)).collect()
    }
    assert {k: v.asDict() for k, v in records.items()} == {
        k: v.asDict() for k, v in again.items()
    }


def test_sql_function_registration(spark, transcripts):
    from htep_spark.functions.register import register_all

    register_all(spark)
    transcripts.createOrReplaceTempView("transcripts_v")
    row = spark.sql(
        "SELECT htep_fusion('he 0K l1') AS f, "
        "htep_extract(text).document_type AS dt, "
        "htep_simhash(text) AS sh "
        "FROM transcripts_v WHERE turn_idx = 0 LIMIT 1"
    ).collect()[0]
    assert row["f"] == "he OK ll"
    assert row["dt"] is not None
    assert isinstance(row["sh"], int)


def test_checkpoint_crash_between_data_and_manifest(spark, transcripts_pdf, tmp_path):
    """Crash simulation: a unit whose output was written but whose manifest
    row never committed must be re-processed idempotently on resume."""
    import shutil

    from htep_spark.plans.checkpoint import plan_units, run_with_checkpoint

    input_dir = str(tmp_path / "cin")
    out_dir = str(tmp_path / "cout")
    manifest_dir = str(tmp_path / "cmanifest")
    df = spark.createDataFrame(transcripts_pdf, schema=TRANSCRIPT_SCHEMA)
    df.repartition(3).write.parquet(input_dir)

    first = run_with_checkpoint(spark, input_dir, out_dir, manifest_dir, "run-a")
    total = spark.read.parquet(out_dir + "/part-*").count()

    # simulate the crash window: drop ONE manifest row (rewrite without it)
    units = plan_units(input_dir)
    victim = units[0]["partition_id"]
    manifest = spark.read.parquet(manifest_dir)
    kept = manifest.filter(manifest.partition_id != victim).collect()
    shutil.rmtree(manifest_dir)
    if kept:
        spark.createDataFrame(kept, manifest.schema).write.parquet(manifest_dir)

    second = run_with_checkpoint(spark, input_dir, out_dir, manifest_dir, "run-b")
    assert second["processed"] == 1  # only the victim re-ran
    # idempotent: same totals, no duplicates
    assert spark.read.parquet(out_dir + "/part-*").count() == total
    assert (
        spark.read.parquet(manifest_dir).filter("status='done'").count()
        == first["processed"]
    )
