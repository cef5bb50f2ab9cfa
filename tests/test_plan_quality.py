"""Physical-plan quality gates: pushdown, pruning, broadcast joins.

The 100 TB story depends on these plan shapes, not just on small-SF
correctness — a scan that reads every column for a two-column projection
or a shuffle join against a 200-row dimension table is wrong at scale
regardless of output equality.
"""

from __future__ import annotations


def test_parquet_scan_pushdown_and_pruning(spark):
    """Catalyst must push filters into the parquet scan and prune columns:
    a filtered 2-column projection over documents should show PushedFilters
    and a ReadSchema restricted to the projected columns."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    q = docs.filter(F.col("doc_id") < 100).select("doc_id", "n_chars")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "LessThan(doc_id,100)" in plan, plan
    # ReadSchema carries only the pruned columns, never `text`
    read_schema = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "doc_id" in read_schema and "n_chars" in read_schema
    assert "text" not in read_schema, read_schema


def test_broadcast_join_for_small_dims(spark):
    """dict_match's term table must broadcast, never shuffle-join."""
    from htep_spark.driver_queries import q_dict_match

    plan = (
        q_dict_match(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_extraction_scan_prunes_unused_columns(spark):
    """The flagship extraction reads transcripts: its parquet scan must not
    materialize columns the pipeline never touches."""
    from pyspark.sql import functions as F

    from htep_spark.plans.pipeline import run_extraction

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    transcripts = docs.select(
        F.concat(F.lit("c"), F.col("doc_id")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        F.col("text"),
        F.lit("").alias("tool"),
        F.lit(None).cast("timestamp").alias("ts"),
    )
    out = run_extraction(transcripts).select("conv_id", "result.document_type")
    plan = out._jdf.queryExecution().executedPlan().toString()
    read_schema = next(l for l in plan.splitlines() if "ReadSchema" in l)
    # only doc_id + text feed this projection; source/n_chars must be pruned
    assert "source" not in read_schema and "n_chars" not in read_schema, read_schema


def test_aqe_handles_skewed_join(spark):
    """AQE skew-join handling must be on and the runtime plan adaptive: a
    heavily-skewed key join still completes with bounded task sizes (AQE
    splits the skewed partition at runtime)."""
    from pyspark.sql import functions as F

    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"
    left = spark.range(200_000).select(
        F.when(F.col("id") % 100 < 99, F.lit(0)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("v"),
    )
    right = spark.range(64).select(F.col("id").alias("k"), F.lit("dim").alias("d"))
    # force a shuffle join so the skewed side actually shuffles
    joined = left.hint("merge").join(right, "k")
    n = joined.count()
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "AdaptiveSparkPlan" in plan, plan.splitlines()[0]
    # 99 of every 100 ids collapse to k=0 (matching dim k=0); the passthrough
    # ids (id%100==99) are all >63 and match nothing
    assert n == 198_000


def test_ann_lsh_expr_plan_stays_jvm_side(spark):
    """The expr signature backend must compile to pure column expressions:
    no Python evaluation node anywhere in the LSH candidate/re-rank plan
    (the numpy backend is the explicit opt-in that adds ArrowEvalPython)."""
    from pyspark.sql import functions as F

    from htep_spark.operators.similarity import ann_lsh_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = ann_lsh_topk(emb, queries, k=3)  # expr default
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan, "Python eval node in expr-mode ANN plan"
    numpy_out = ann_lsh_topk(emb, queries, k=3, signature_mode="numpy")
    numpy_plan = numpy_out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" in numpy_plan  # sanity: the opt-in really differs


def test_conv_metrics_order_partial_aggregation(spark):
    """Both stages of the salted ordering rollup must hash-aggregate with
    map-side partial aggregation (partial_* before each exchange), and the
    scan must prune to the two referenced columns."""
    from htep_spark.driver_queries import _q_conv_metrics_order

    df = _q_conv_metrics_order(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "partial_count" in plan and "partial_min" in plan, plan[:2000]
    read_schema = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "text" not in read_schema and "n_chars" not in read_schema


def test_temporal_join_plans_avoid_cross_products(spark):
    """asof_join must be window-over-union (single keyed exchange, no join
    operator at all); range_join must be an equi-join on (key, bucket) —
    neither may plan a cartesian/nested-loop product."""
    from datetime import datetime

    from htep_spark.operators.joins import asof_join, range_join

    T = datetime
    left = spark.createDataFrame(
        [(1, T(2024, 1, 1, 10, 0), 10)], ["user_id", "ts", "v"]
    )
    right = spark.createDataFrame(
        [(1, T(2024, 1, 1, 9, 0), 77)], ["user_id", "ts", "rid"]
    )
    aplan = asof_join(left, right)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in aplan and "NestedLoop" not in aplan
    assert "Window" in aplan and "Union" in aplan
    # no join node: the as-of is pure union + window
    assert "SortMergeJoin" not in aplan and "BroadcastHashJoin" not in aplan

    intervals = spark.createDataFrame(
        [(1, T(2024, 1, 1, 9, 0), T(2024, 1, 1, 11, 0), "I")],
        ["user_id", "s", "e", "iv"],
    )
    rplan = (
        range_join(left, intervals, point_col="ts", start_col="s", end_col="e",
                   by=("user_id",))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in rplan and "NestedLoop" not in rplan
    assert "Join" in rplan  # a real equi-join on (user_id, bucket)


def test_round4_operator_plan_shapes(spark):
    """Round-4 operators keep their scale-sane plans: sample_hash is a
    pure scan→filter→project (no exchange, pruned 2-column scan);
    repetition_stats does ONE hash exchange on doc_id reused by the lead
    window, the bigram count aggregate, and the rank-1 window (Spark plans
    the row_number<=1 filter as WindowGroupLimit, no second exchange)."""
    from htep_spark.driver_queries import q_repetition_stats, q_sample_hash

    sf = "/root/testdata/sf0.001"
    splan = q_sample_hash(spark, sf)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in splan, splan
    read_schema = next(l for l in splan.splitlines() if "ReadSchema" in l)
    assert "text" not in read_schema, read_schema

    rdf = q_repetition_stats(spark, sf)
    rplan = rdf._jdf.queryExecution().executedPlan().toString()
    n_exchanges = rplan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, f"{n_exchanges} exchanges\n{rplan}"
    assert "WindowGroupLimit" in rplan, rplan


def test_exact_global_rank_has_no_single_partition_window(spark):
    """The whole point of exact_global_rank: a globally-ordered rank with
    NO Exchange SinglePartition anywhere in the plan (the naive
    row_number-over-unpartitioned-window collapses the dataset into one
    task)."""
    from htep_spark.operators.ranking import q_lm_tercile

    plan = (
        q_lm_tercile(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange SinglePartition" not in plan, plan
    # the range sort ran ONCE inside the localCheckpoint materialization
    # job; the final plan reads the checkpointed partitions and adds only
    # a broadcast exchange — no second full-data shuffle of any kind
    assert "Scan ExistingRDD" in plan, plan
    assert "Exchange hashpartitioning" not in plan, plan
    assert "BroadcastExchange" in plan, plan
    # the held-out variant rides the same construction — same gate
    from htep_spark.operators.ranking import q_lm_heldout

    hplan = (
        q_lm_heldout(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange SinglePartition" not in hplan, hplan
    assert "Scan ExistingRDD" in hplan, hplan
    # rank-selected quantiles: same construction, same gate
    from htep_spark.driver_queries import q_token_quantiles

    qplan = (
        q_token_quantiles(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange SinglePartition" not in qplan, qplan


def test_mixture_plan_no_window(spark):
    """ADVICE r05: q_mixture_plan's corpus totals formerly used an
    empty-partition window (Exchange SinglePartition over the per-source
    rows, WindowExec warning during replay). They are now a 1-row
    map-side-combinable aggregate broadcast back via crossJoin — the plan
    must contain NO window operator at all; the only single-partition
    exchange permitted is the one feeding the 1-row global aggregate
    (partial-agg rows, one per partition — not data rows)."""
    from htep_spark.driver_queries import q_mixture_plan

    plan = (
        q_mixture_plan(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan, plan
    # plan application: the derived rates join back as a broadcast
    assert "BroadcastExchange" in plan, plan


def test_round6_operator_plan_shapes(spark):
    """url_domains must stay entirely JVM-side (string expressions only —
    no Python in the plan), join its per-domain rollup as a broadcast, and
    shuffle the corpus exactly once (the rollup aggregation). block_keep is
    one narrow Arrow projection (scan → exchange → UDF → explode), no
    shuffle of parsed rows, no joins."""
    from htep_spark.driver_queries import QUERIES

    plan = (
        QUERIES["url_domains"][0](spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan, plan
    assert "BroadcastExchange" in plan, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "CartesianProduct" not in plan, plan

    bplan = (
        QUERIES["block_keep"][0](spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert bplan.count("ArrowEvalPython") == 1, bplan
    assert "Exchange hashpartitioning" not in bplan, bplan
    assert "CartesianProduct" not in bplan, bplan

    # domain_quota: the rank<=Q filter must rewrite into WindowGroupLimit
    # (top-Q per domain without materializing full ranks), all JVM-side
    qplan = (
        QUERIES["domain_quota"][0](spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in qplan, qplan
    assert "EvalPython" not in qplan, qplan


def test_dup_spans_plan_shape(spark):
    """dup_spans' scale claim: token-linear explode + two hash aggregations
    + equi-joins — NO cartesian product, NO single-partition exchange, and
    the window-hash computation stays JVM-side (no Python UDF in the
    plan)."""
    from htep_spark.driver_queries import q_dup_spans

    plan = (
        q_dup_spans(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan, plan
    assert "Exchange SinglePartition" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan


def test_dup_longest_plan_is_shuffle_free(spark):
    """dup_longest's scale claim (docstring): a doc-local problem solved
    worker-locally — scan → JVM tokenize → mapInPandas with ZERO
    exchanges of any kind, and exactly one Python stage (the bisection
    kernel). line_dedup's corpus-global claim rides along: no cartesian
    product, no single-partition exchange."""
    from htep_spark.driver_queries import q_dup_longest, q_line_dedup

    plan = (
        q_dup_longest(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan
    assert plan.count("MapInPandas") == 1, plan

    lplan = (
        q_line_dedup(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in lplan, lplan
    assert "Exchange SinglePartition" not in lplan, lplan
    assert "EvalPython" not in lplan and "MapInPandas" not in lplan, lplan


def test_pagerank_iterations_never_rescan_corpus(spark):
    """pagerank's scale claim (docstring): ONE bounded corpus pass (the
    <= N^2-row (src, dst) groupBy) feeds a driver-side power iteration
    (round 7); the returned frame is a local table plus the final
    projection, so the plan contains ZERO FileScans, ZERO Exchanges, no
    cartesian product, and no Python stage."""
    from htep_spark.driver_queries import q_pagerank

    plan = (
        q_pagerank(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "FileScan" not in plan, plan
    assert "Exchange" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "EvalPython" not in plan and "MapInPandas" not in plan, plan


def test_hits_iterations_never_rescan_corpus(spark):
    """hits shares pagerank's scale claim (round 7): one bounded corpus
    pass, driver-side half-iterations, local-table result — the returned
    plan contains ZERO FileScans, ZERO Exchanges, no cartesian product,
    and no Python stage."""
    from htep_spark.driver_queries import q_hits

    plan = (
        q_hits(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "FileScan" not in plan, plan
    assert "Exchange" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "EvalPython" not in plan and "MapInPandas" not in plan, plan


def test_tpch_regional_revenue_plan_shape(spark):
    """The Q5-shape plan must be the one you'd want at 100 TB: every
    dimension (customer/supplier/nation/region) joins as a
    BroadcastHashJoin, the fact-fact lineitem⋈orders join is NOT a
    cartesian product, the o_orderdate range filter reaches the orders
    scan as a pushed filter, and the lineitem scan's ReadSchema is
    pruned to the four referenced columns."""
    from htep_spark.driver_queries import q_tpch_regional_revenue

    plan = (
        q_tpch_regional_revenue(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("BroadcastHashJoin") >= 4, plan
    assert "CartesianProduct" not in plan, plan
    assert "EvalPython" not in plan, plan
    # date range pushed down to the orders scan
    assert "PushedFilters: [IsNotNull(o_orderdate), GreaterThanOrEqual(o_orderdate" in plan, plan
    # lineitem scan pruned: never reads l_comment-class baggage like
    # l_tax/l_returnflag for this query
    import re

    m = re.search(r"ReadSchema: struct<(l_[^>]*)>", plan)
    assert m, plan
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert cols == {
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    }, cols


def test_tpch_pricing_plan_shape(spark):
    """The Q1-shape plan: shipdate filter pushed to the scan, partial
    (map-side) aggregation before the exchange, no Python stage."""
    from htep_spark.driver_queries import q_tpch_pricing

    plan = (
        q_tpch_pricing(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThan(l_shipdate" in plan, plan
    # partial (map-side) + final aggregate pair — the combine happens
    # before the exchange (WholeStageCodegen spans only materialize in
    # the post-execution AQE final plan, so they are not asserted here)
    assert "partial_sum" in plan, plan
    assert plan.count("HashAggregate") >= 2, plan
    assert "EvalPython" not in plan, plan


def test_tpch_shipping_plan_shape(spark):
    """The Q3-shape plan: both opposing date filters pushed to their
    scans (orders < cutoff, lineitem > cutoff), the segment dim a
    BroadcastHashJoin, the top-N a TakeOrderedAndProject (never a
    single-partition window/sort), no cartesian, no Python."""
    from htep_spark.driver_queries import q_tpch_shipping

    plan = (
        q_tpch_shipping(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "EvalPython" not in plan, plan
    assert "PushedFilters: [IsNotNull(o_orderdate), LessThan(o_orderdate" in plan, plan
    assert "PushedFilters: [IsNotNull(l_shipdate), GreaterThan(l_shipdate" in plan, plan


def test_tpch_big_orders_plan_shape(spark):
    """The Q18-shape plan: the qualifying-order set is a partial
    (map-side) aggregation before its exchange; the customer dim
    broadcasts; no cartesian, no Python, and the lineitem ReadSchema is
    pruned to exactly (l_orderkey, l_quantity)."""
    import re

    from htep_spark.driver_queries import q_tpch_big_orders

    plan = (
        q_tpch_big_orders(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "partial_sum" in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "EvalPython" not in plan, plan
    m = re.search(r"ReadSchema: struct<(l_[^>]*)>", plan)
    assert m, plan
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert cols == {"l_orderkey", "l_quantity"}, cols


def test_k_core_iterations_never_rescan_corpus(spark):
    """k_core follows the pagerank discipline (round 7): one bounded
    corpus pass (distinct u<v edge set), driver-side peel rounds,
    local-table result — ZERO FileScans, ZERO Exchanges, no cartesian
    product, no Python stage; the 12 peel rounds never re-touch the
    corpus."""
    from htep_spark.driver_queries import q_k_core

    plan = (
        q_k_core(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "FileScan" not in plan, plan
    assert "Exchange" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_assoc_rules_plan_shape(spark):
    """assoc_rules' pair generation must be a real equi-join on doc_id
    (basket-width-bounded blowup), never a cartesian product; the
    marginal joins broadcast; no Python stage; no window function."""
    from htep_spark.driver_queries import q_assoc_rules

    plan = (
        q_assoc_rules(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "EvalPython" not in plan, plan
    assert "WindowExec" not in plan and "RunningWindowFunction" not in plan, (
        plan
    )


def test_active_users_plan_has_no_window(spark):
    """active_users' sliding distinct-count must be the contribution-
    explode plan: an Explode/Generate over the deduped frame and
    map-side-combinable counts — NO window function anywhere (a
    COUNT(DISTINCT) OVER frame is unsupported and a per-day window
    would be the wrong plan at scale), no cartesian, no Python."""
    from htep_spark.driver_queries import q_active_users

    plan = (
        q_active_users(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Generate explode" in plan, plan
    assert "Window" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_pca_power_single_corpus_scan(spark):
    """pca_power pins the centered matrix and every round's state vector,
    so the returned plan re-reads the embeddings file at most once (the
    mean join) — the 8 iterations never re-scan; no Python stage."""
    from htep_spark.driver_queries import q_pca_power

    plan = (
        q_pca_power(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("FileScan") <= 1, plan
    assert "EvalPython" not in plan, plan


def test_stage_udf_pruning(spark):
    """Round-7 split-UDF surface (guide §4.1): consumers that read only a
    slice of the extraction struct must NOT evaluate the stage UDFs for the
    fields they never touch. conv_metrics reads core-group fields only →
    exactly one ArrowEvalPython (extract_core_udf); the flagship slice
    (document_type/urgency/matched/corrected/n_segments) must drop the
    fields/entities/deid kernels; the full struct runs every group."""
    from pyspark.sql import functions as F

    from htep_spark.plans.pipeline import per_conversation_metrics, run_extraction
    from htep_spark.sources.io import synthesize_transcripts

    tr = synthesize_transcripts(spark, 200, partitions=2)

    def udf_names(df):
        import re

        plan = df._jdf.queryExecution().executedPlan().toString()
        return set(re.findall(r"(\w+_udf)", plan))

    cm = udf_names(per_conversation_metrics(run_extraction(tr)))
    assert cm == {"extract_core_udf"}, cm

    flagship_slice = run_extraction(tr).select(
        "conv_id",
        "result.document_type",
        "result.urgency",
        F.array_join(F.array_sort("result.matched_drugs"), "|").alias("d"),
        "result.corrected_text",
        F.col("result.metrics.n_segments"),
    )
    fl = udf_names(flagship_slice)
    assert fl == {"extract_core_udf", "classify_udf", "segments_udf"}, fl

    full = udf_names(run_extraction(tr))
    assert full == {
        "extract_core_udf",
        "segments_udf",
        "fields_udf",
        "classify_udf",
        "entities_udf",
        "deid_udf",
    }, full


def test_bm25_no_single_partition_window(spark):
    """VERDICT r06 #2: bm25's global top-K must be a distributed
    TakeOrderedAndProject, never an unpartitioned row_number window that
    sorts the corpus-proportional scored frame in one task. (The rank
    window that remains runs over a frame already bounded at
    BM25_TOP_DOCS rows by the limit.)"""
    from htep_spark.driver_queries import q_bm25

    plan = (
        q_bm25(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan, plan
    assert "Exchange SinglePartition" not in plan, plan
