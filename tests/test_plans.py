"""Physical-plan assertions: the optimizations we claim must show up in
.explain output — filter pushdown to parquet, column pruning, broadcast for
the RI join, whole-stage codegen on the batched agg, no Python eval in the
hot path."""

import pytest
from pyspark.sql import functions as F


def _formatted(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_filter_pushdown_and_column_pruning(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    q = df.filter(F.col("l_quantity") > 40).select("l_orderkey", "l_quantity")
    plan = _formatted(q)
    assert "PushedFilters" in plan and "GreaterThan(l_quantity" in plan
    # ReadSchema carries only the referenced columns
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_orderkey" in read_schema and "l_quantity" in read_schema
    assert "l_comment" not in read_schema and "l_extendedprice" not in read_schema


def test_batched_agg_is_whole_stage_codegen_single_scan(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    q = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("o_orderstatus").isin("O", "F"), 0).otherwise(1)).alias("inv"),
        F.max("o_orderdate").alias("mx"),
    )
    plan = _formatted(q)
    # map-side partial aggregation + one scan shared by all metrics
    assert "partial_count" in plan and "partial_sum" in plan and "partial_max" in plan
    import re
    assert len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M)) == 1
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    q.collect()
    executed = q._jdf.queryExecution().executedPlan().toString()
    assert "*(1)" in executed  # whole-stage-codegen stage marker


def test_referential_integrity_broadcasts_parent_keys(spark):
    from datacontract_cli_spark.operators.refintegrity import orphan_rows
    child = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    parent = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    # default: no hint — the optimizer still picks broadcast for a small parent
    q = orphan_rows(child, "l_orderkey", parent, "o_orderkey")
    plan = _formatted(q)
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    # the 100 TB child side is never exchanged
    assert "Exchange hashpartitioning(l_orderkey" not in plan


def test_referential_integrity_no_forced_broadcast_on_large_parent(spark):
    """The broadcast must come from optimizer statistics, not a hard hint:
    when the caller says the parent key set is NOT broadcast-safe
    (broadcast_parent=False) no BroadcastHashJoin may appear, and the default
    plan must not carry an unconditional broadcast hint that would override
    AQE at 100x parent cardinality (round-1 verdict, 'What's wrong' #2)."""
    from datacontract_cli_spark.operators.refintegrity import orphan_rows
    child = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    parent = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    q = orphan_rows(child, "l_orderkey", parent, "o_orderkey", broadcast_parent=False)
    plan = _formatted(q)
    assert "BroadcastHashJoin" not in plan and "LeftAnti" in plan
    # the logical plan of the DEFAULT path must not contain a broadcast hint;
    # hints survive into the analyzed plan as UnresolvedHint/ResolvedHint
    q_default = orphan_rows(child, "l_orderkey", parent, "o_orderkey")
    logical = q_default._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in logical and "UnresolvedHint" not in logical
    q_forced = orphan_rows(child, "l_orderkey", parent, "o_orderkey", broadcast_parent=True)
    logical_forced = q_forced._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" in logical_forced or "UnresolvedHint" in logical_forced


def test_engine_predicates_stay_jvm_side(spark):
    """The compiled missing/invalid conditions must not introduce Python
    evaluation nodes."""
    from datacontract_cli_spark.checks.spec import CheckSpec, MetricType
    from datacontract_cli_spark.engine.predicates import invalid_condition

    df = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    spec = CheckSpec(key="k", category="q", type="t", name="n", model="m",
                     metric=MetricType.INVALID_COUNT, field="c_name",
                     valid_regex="^Customer#[0-9]+$", valid_max_length=25)
    cond = invalid_condition(df, "c_name", spec)
    q = df.agg(F.sum(F.when(cond, 1).otherwise(0)))
    plan = _formatted(q)
    assert "EvalPython" not in plan
    q.collect()
    assert "*(1)" in q._jdf.queryExecution().executedPlan().toString()


def test_window_topk_uses_take_ordered_or_window(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    q = df.orderBy(F.desc("o_totalprice")).limit(5)
    plan = _formatted(q)
    assert "TakeOrderedAndProject" in plan  # no global sort for top-k


def test_merged_validation_union_reuses_exchange(spark):
    """The merged agg+duplicates query with its samples branch must share
    ONE wide shuffle between the metrics fold and the dup-sample top-k
    (executor.py _run_agg_with_duplicates). The invariant that makes this
    work: the samples branch keeps every aggregate column alive above its
    limit — dropping them lets column pruning diverge the two scans and
    the exchange is no longer reused (scan + shuffle run twice)."""
    from datacontract_cli_spark.sources.transcripts import synthesize_transcripts

    df = synthesize_transcripts(spark, n_convs=300, turns_per_conv=4,
                                defect_rate=0.2)
    rc, m = "__rc__", "__m__"
    exprs = [F.count(F.lit(1)).alias(rc),
             F.count(F.when(F.col("role").isNull(), 1)).alias(m)]
    grouped = df.groupBy("conv_id", "turn_idx").agg(*exprs)
    fold = (grouped.agg(F.coalesce(F.sum(rc), F.lit(0)).alias(rc),
                        F.coalesce(F.sum(m), F.lit(0)).alias(m),
                        F.coalesce(F.sum(F.when(F.col(rc) > 1, 1)), F.lit(0))
                        .alias("dup"))
            .withColumn("__kind__", F.lit("fold")))
    samples = (grouped.filter(F.col(rc) > 1)
               .orderBy("conv_id", "turn_idx").limit(5)
               .select(F.to_json(F.struct("conv_id", "turn_idx")).alias("__skey__"),
                       F.col(rc).alias("__sdup__"),
                       F.col(m),  # keeps pruning identical across branches
                       F.lit("dup").alias("__kind__")))
    combined = fold.unionByName(samples, allowMissingColumns=True)
    combined.collect()
    executed = combined._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in executed, executed
