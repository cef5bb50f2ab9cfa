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
        "classify", "dict_match",
        "vitals_fields",
        "ngram_jaccard", "ann_cosine", "embed_near_dup", "sessionize",
        "lang_id", "sentences",
        "simhash", "dedup_keepers", "classify_segments",
        "minhash_lsh", "dedup_keepers_minhash", "winnow_overlap",
        "greedy_decode", "beam_replace", "deid_spans", "deid_mask",
        "repetition_stats", "bpe_train", "embed_keepers", "lm_heldout",
        # round-6 rotation (VERDICT r05 #1): the twelve born-overflow
        # round-5 oracles now IN the dict (displaced siblings — fusion,
        # sections, urgency, measurements, text_stats, fingerprint,
        # dedup_exact, cer, events_hourly, sample_hash, domain_mix,
        # lm_tercile — keep replaying via DRIVER_CAP_OVERFLOW)
        "fuzzy_ratio", "bpe_encode", "dup_spans", "contamination",
        "mixture_plan", "approx_distinct", "bloom_probe", "count_min",
        "curation_funnel", "char_entropy", "token_quantiles",
        "difflib_match",
    ):
        assert name in oracles, name
    # displaced entries stay oracle-paired in QUERIES (replayed by
    # tools/check_oracles.py) even though the driver dict holds them out
    from htep_spark.driver_queries import QUERIES

    for name in entrymod.DRIVER_CAP_OVERFLOW:
        assert name in QUERIES and QUERIES[name][1] is not None, name
    # rows-only operators present (beam_decode/deid folded into the
    # beam_replace / deid_spans+deid_mask oracles in round 4)
    for name in (
        "extract_full", "block_parse", "conv_rollup",
        "ann_lsh", "ann_ivf", "conv_metrics", "paragraph_decode",
    ):
        assert name in qs
    # the driver records at most 50 query rows (CORRECTNESS_r03 recorded 50
    # of 51) — keep the inventory within that so every entry gets a row
    assert len(qs) <= 50, f"{len(qs)} queries() keys; driver caps at 50"


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

    Schema-only (lazy plan build), so this covers all queries cheaply.
    Overflow oracles (DRIVER_CAP_OVERFLOW) are included: they may rotate
    into the driver dict in a future round and must already be safe."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    from htep_spark.driver_queries import QUERIES

    surface = dict(entrymod.queries())
    for name in entrymod.DRIVER_CAP_OVERFLOW:
        surface[name] = QUERIES[name][0]
    for name, fn in surface.items():
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


def test_deid_surface_still_works(spark):
    """`deid` was folded out of queries() in round 4 (its detectors are
    hash-checked by deid_spans/deid_mask) — the combined Spark surface
    itself must keep working: spans of several kinds plus masked text."""
    df = entrymod._deid(spark, "/root/testdata/sf0.001")
    rows = df.collect()
    assert len(rows) > 0
    kinds = {r["kind"] for r in rows if r["kind"] is not None}
    assert {"DATE", "ID", "PHONE"} <= kinds
    assert any(r["masked_text"] and "[" in r["masked_text"] for r in rows)


def test_beam_replace_gate_margin():
    """Cross-engine safety of the beam_replace confidence gates: per-char
    confidences are bitwise-identical in both engines (same integer k →
    `0.35 + k/100.0`), so min-gates can never disagree; the only
    order-sensitive quantity is mean_conf (list_sum vs Python sum, error
    ~1e-13 for <=40 doubles). Assert every word's mean clears the 0.80
    threshold by far more than that on all three corpora."""
    import hashlib
    import re

    import pyarrow.parquet as pq

    from htep_spark.operators.decode import _corrupt_prelude_terms

    cd, cdis, ed = _corrupt_prelude_terms()
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        tbl = pq.read_table(
            f"/root/testdata/{sf}/documents.parquet", columns=["doc_id", "text"]
        )
        seen: set[str] = set()
        worst = 1.0
        for doc_id, text in zip(
            tbl["doc_id"].to_pylist(), tbl["text"].to_pylist()
        ):
            words = [cd[doc_id % 16], cdis[doc_id % 16], ed[doc_id % 16]]
            words += re.findall("[A-Z]+", text.upper())[:2]
            for w in words:
                if w in seen:
                    continue
                seen.add(w)
                cs = [
                    0.35
                    + (
                        int(
                            hashlib.md5(
                                f"{ch}|{w}|{i}".encode()
                            ).hexdigest()[:15],
                            16,
                        )
                        % 64
                    )
                    / 100.0
                    for i, ch in enumerate(w)
                ]
                worst = min(worst, abs(sum(cs) / len(cs) - 0.80))
        assert worst > 1e-9, f"{sf}: mean-gate margin {worst} too small"


def test_beam_replace_branches_nonvacuous():
    """A green oracle proves nothing for branches that never fire: the
    corrupted-term prelude must make lexicon replacement actually happen
    (both applied and kept-raw outcomes, plus exact hits) in the DuckDB
    side of the oracle at driver scale."""
    import duckdb

    from htep_spark.operators.decode import _sql_beam_replace

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.01/documents.parquet')"
    )
    q = _sql_beam_replace()
    reasons = dict(
        con.execute(
            f"SELECT coalesce(replacement_reason, '<none>'), count(*) "
            f"FROM ({q}) GROUP BY 1"
        ).fetchall()
    )
    assert reasons.get("low-confidence-lexicon-fallback", 0) > 0
    assert reasons.get("high-confidence-kept-raw", 0) > 0
    exact = con.execute(
        f"SELECT count(*) FROM ({q}) WHERE distance = 0"
    ).fetchone()[0]
    assert exact > 0
    applied = con.execute(
        f"SELECT count(*) FROM ({q}) WHERE replacement_applied = 1"
    ).fetchone()[0]
    assert applied > 0
