"""Driver-contract guards: entry() smoke, queries/oracle key consistency."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod


def test_queries_and_oracles_consistent():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert qs, "queries() must not be empty"
    # every oracle belongs to a query
    assert set(oracles) <= set(qs)
    # the SQL-expressible core is oracled
    for name in (
        "fusion", "sections", "urgency", "classify", "dict_match",
        "vitals_fields", "text_stats", "fingerprint", "dedup_exact",
        "ngram_jaccard", "ann_cosine", "embed_near_dup", "sessionize",
        "events_hourly", "lang_id", "cer", "sentences", "deid_dates",
        "simhash", "winnow_fingerprints", "dedup_keepers", "classify_segments",
        "minhash_lsh", "dedup_keepers_minhash", "winnow_overlap",
    ):
        assert name in oracles, name
    # rows-only operators present
    for name in (
        "extract_full", "beam_decode", "block_parse", "conv_rollup", "deid",
        "ann_lsh", "ann_ivf", "conv_metrics", "paragraph_decode",
    ):
        assert name in qs


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.limit(5).collect()
    assert len(rows) > 0
    assert {"conv_id", "turn_idx", "document_type", "urgency"} <= set(df.columns)


def test_flagship_finds_clinical_content(spark):
    from pyspark.sql import functions as F

    df = entrymod._flagship(spark, "/root/testdata/sf0.001")
    hits = df.filter(F.length("matched_drugs") > 0).count()
    assert hits > 0  # clinical prelude guarantees non-vacuous extraction


def test_all_driver_queries_canonicalizer_safe(spark):
    """The driver sorts+hashes results with pandas, which cannot hash list
    cells — every driver-facing query must emit only atomic column types.

    Schema-only (lazy plan build), so this covers all queries cheaply."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    for name, fn in entrymod.queries().items():
        df = fn(spark, "/root/testdata/sf0.001")
        for f in df.schema.fields:
            assert not isinstance(f.dataType, (ArrayType, MapType, StructType)), (
                f"{name}.{f.name} has non-atomic type {f.dataType.simpleString()}"
            )


def test_scalar_field_query_matches_kernel(spark):
    """`extract_fields_scalar`'s lookahead-free relational rewrites must
    agree field-for-field with the Python kernel's lookahead-bounded
    patterns (`extract_regex_fields`) on every PII-prelude document —
    the equivalence proof VERDICT r02 #6 asked for."""
    from htep_spark.driver_queries import PII_SNIPPETS, q_extract_fields_scalar
    from htep_spark.functions.extract_fields import extract_regex_fields

    sf_dir = "/root/testdata/sf0.001"
    rows = {r["doc_id"]: r for r in q_extract_fields_scalar(spark, sf_dir).collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    ).collect()
    assert len(rows) == len(docs)
    fired = set()
    for d in docs:
        ctext = PII_SNIPPETS[d["doc_id"] % len(PII_SNIPPETS)] + "\n" + d["text"]
        want = extract_regex_fields(ctext)
        got = rows[d["doc_id"]]
        assert got["date_found"] == want["date"], d["doc_id"]
        assert got["patient_name"] == want["patient_name"], d["doc_id"]
        assert got["doctor_name"] == want["doctor_name"], d["doc_id"]
        assert got["hospital"] == want["hospital"], d["doc_id"]
        assert got["gender"] == want["gender"], d["doc_id"]
        for k in ("date", "patient_name", "doctor_name", "hospital", "gender"):
            if want[k] is not None:
                fired.add(k)
    # the PII prelude must make every field non-vacuous somewhere
    assert fired == {"date", "patient_name", "doctor_name", "hospital", "gender"}
