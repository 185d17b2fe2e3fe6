"""Physical-plan regression guards.

Correctness is the oracle gate's job; these tests pin the *plan
properties* that matter at 100 TB so a refactor cannot silently
regress them: filters reaching the parquet scan, column pruning,
dimension broadcasts, whole-stage codegen, and the absence of
cartesian products in the bucketed dedup/ANN paths.
"""

from __future__ import annotations

import pytest

from clearcare_data_pipeline_spark.queries import all_queries

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def queries():
    return all_queries()


def _plan(spark, queries, name: str) -> str:
    df = queries[name](spark, SF)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def test_q1_filter_pushdown(spark, queries):
    # (AQE formatted mode hides WholeStageCodegen spans pre-execution,
    # so codegen presence is not assertable here; pushdown is.)
    plan = _plan(spark, queries, "q1_pricing_summary")
    assert "LessThanOrEqual(l_shipdate" in plan


def test_q6_column_pruning(spark, queries):
    plan = _plan(spark, queries, "q6_forecast_revenue")
    # The lineitem scan must not read columns the query never touches.
    read_schemas = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read_schemas, plan
    for line in read_schemas:
        assert "l_returnflag" not in line
        assert "l_partkey" not in line


def test_q5_broadcasts_dimensions(spark, queries):
    plan = _plan(spark, queries, "q5_regional_revenue")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_minhash_lsh_no_cartesian(spark, queries):
    plan = _plan(spark, queries, "doc_minhash_lsh")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ngram_jaccard_no_cartesian(spark, queries):
    plan = _plan(spark, queries, "doc_ngram_jaccard")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_emb_near_dup_no_cartesian(spark, queries):
    # r9: the plane matrix rides a ONE-ROW broadcast table (same
    # pattern as the IVF codebook), so each side of the bucket
    # self-join attaches one single-row BroadcastNestedLoopJoin (the
    # formatted plan prints each twice: tree + detail). The pair join
    # itself must stay a keyed hash join and nothing may be a
    # cartesian product.
    plan = _plan(spark, queries, "emb_near_dup_pairs")
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 4
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan


def test_charges_cleaned_scan_is_columnar_parquet(spark, queries):
    # The charges family reads the one-time derivation checkpoint as a
    # plain splittable parquet scan (not a cached/replayed plan).
    plan = _plan(spark, queries, "charges_cleaned")
    assert "Scan parquet" in plan


def test_q11_broadcasts_and_no_cartesian(spark, queries):
    # Scalar total joins back as a 1-row broadcast, supplier dim broadcast
    plan = _plan(spark, queries, "q11_important_parts")
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_q16_anti_join_broadcast(spark, queries):
    plan = _plan(spark, queries, "q16_supplier_part_counts")
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_q20_semi_join(spark, queries):
    plan = _plan(spark, queries, "q20_excess_stock_suppliers")
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan


def test_q21_no_nested_loop(spark, queries):
    plan = _plan(spark, queries, "q21_waiting_suppliers")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_decontamination_keyed_joins_only(spark, queries):
    plan = _plan(spark, queries, "doc_decontamination")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_dq_report_single_scan_for_row_checks(spark, queries):
    # Row checks fold into one aggregate over one lineitem scan; the
    # uniqueness branch adds its own keyed agg — but never a per-check scan.
    import re

    plan = _plan(spark, queries, "dq_lineitem_report")
    scans = set(re.findall(r"\((\d+)\) Scan parquet", plan))
    assert len(scans) <= 2, plan


def test_histogram_prunes_to_single_column(spark, queries):
    plan = _plan(spark, queries, "lineitem_price_histogram")
    read_schemas = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read_schemas
    for line in read_schemas:
        assert "l_extendedprice" in line
        assert "l_partkey" not in line


def test_join_hints_steer_strategy(spark):
    """The tuning surface a perf engineer reaches for first: hints must
    override the optimizer's default pick."""
    from clearcare_data_pipeline_spark.sources.tables import load_table

    li = load_table(spark, SF, "lineitem")
    supp = load_table(spark, SF, "supplier")

    merged = li.join(supp.hint("merge"), li.l_suppkey == supp.s_suppkey)
    assert "SortMergeJoin" in merged._jdf.queryExecution().executedPlan().toString()

    bcast = li.join(supp.hint("broadcast"), li.l_suppkey == supp.s_suppkey)
    assert "BroadcastHashJoin" in bcast._jdf.queryExecution().executedPlan().toString()

    shuffle_hash = li.join(supp.hint("shuffle_hash"), li.l_suppkey == supp.s_suppkey)
    assert "ShuffledHashJoin" in shuffle_hash._jdf.queryExecution().executedPlan().toString()
