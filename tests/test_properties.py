"""Property tests (SURVEY.md §5 item 3) — hypothesis over the cleaning
semantics, checked through the real Spark expressions in one batch per
test (collect the whole example set at once; per-example Spark jobs
would be pathologically slow)."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from clearcare_data_pipeline_spark.functions.cleaning import (
    clean_price_expr,
    normalize_modifiers_expr,
    normalize_text_expr,
    scrub_invalid_token_expr,
)
from clearcare_data_pipeline_spark.schema import PRICE_PLACEHOLDER

money_noise = st.text(alphabet='0123456789$%,". -xyz', min_size=0, max_size=18)
free_text = st.text(
    alphabet=st.characters(codec="ascii", exclude_characters="\x00"), min_size=0, max_size=30
)


def _run_batch(spark, expr_builder, values: list[str]):
    df = spark.createDataFrame([(v,) for v in values], "x string")
    return [r["v"] for r in df.select(expr_builder(F.col("x")).alias("v")).collect()]


@settings(max_examples=30, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(money_noise, min_size=1, max_size=50))
@pytest.mark.slow
def test_price_cleaning_invariants(spark, values):
    out = _run_batch(spark, clean_price_expr, values)
    for v in out:
        # cleaned prices are NULL or strictly positive and never the placeholder
        assert v is None or (v > 0 and v != float(PRICE_PLACEHOLDER))


@settings(max_examples=30, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(free_text, min_size=1, max_size=50))
@pytest.mark.slow
def test_scrub_idempotent(spark, values):
    once = _run_batch(spark, scrub_invalid_token_expr, values)
    twice = _run_batch(spark, scrub_invalid_token_expr, [v if v is not None else "" for v in once])
    assert once == twice


@settings(max_examples=30, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(free_text, min_size=1, max_size=50))
@pytest.mark.slow
def test_text_normalization_idempotent(spark, values):
    from clearcare_data_pipeline_spark.schema import WHITESPACE_CHARS

    once = _run_batch(spark, normalize_text_expr, values)
    twice = _run_batch(spark, normalize_text_expr, [v if v is not None else "" for v in once])
    assert once == twice
    for v in once:
        # normalized: lower-cased, stripped of the engine's \s set
        assert v == v.strip(WHITESPACE_CHARS).lower()
        assert v != "nan"


@settings(max_examples=30, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.text(alphabet="abtc 2659|,GZ", min_size=0, max_size=20), min_size=1, max_size=50))
@pytest.mark.slow
def test_modifier_normalization_invariants(spark, values):
    out = _run_batch(spark, normalize_modifiers_expr, values)
    for v in out:
        assert "|" not in v
        assert " " not in v
        assert v == v.upper()


def test_quarantine_partition_is_exact(spark):
    """Every quarantined row violates >=1 rule; every clean row violates
    none; the two sides partition the input."""
    from clearcare_data_pipeline_spark.pipeline import clean_charges
    from clearcare_data_pipeline_spark.plans.rules import RULE_NAMES, split_clean_quarantine, tag_violations
    from clearcare_data_pipeline_spark.sources.charges import charges_from_lineitem

    tagged = tag_violations(clean_charges(charges_from_lineitem(spark, "/root/testdata/sf0.001")))
    tagged = tagged.persist()
    clean, quarantine = split_clean_quarantine(tagged)
    total = tagged.count()
    n_clean, n_quar = clean.count(), quarantine.count()
    assert n_clean + n_quar == total
    assert quarantine.where(F.col("rules_violated") == "").count() == 0
    # every tag in rules_violated is a real rule name
    tags = (
        quarantine.select(F.explode(F.split("rules_violated", ",")).alias("t")).distinct().collect()
    )
    assert {r["t"] for r in tags} <= set(RULE_NAMES)


def test_dedup_output_has_no_duplicates(spark):
    from clearcare_data_pipeline_spark.pipeline import clean_charges
    from clearcare_data_pipeline_spark.schema import CANONICAL_COLUMNS
    from clearcare_data_pipeline_spark.sources.charges import charges_from_lineitem

    cleaned = clean_charges(charges_from_lineitem(spark, "/root/testdata/sf0.001"))
    n = cleaned.count()
    assert cleaned.select(*CANONICAL_COLUMNS).distinct().count() == n


def test_wide_regroup_key_is_unique(spark):
    import os

    from clearcare_data_pipeline_spark.sources.extract_wide import extract_wide

    fix = os.path.join(os.path.dirname(__file__), "fixtures", "wide.csv")
    charges = extract_wide(spark, fix).charges
    total = charges.count()
    assert charges.select("code", "code_type", "payer_name", "plan_name").distinct().count() == total


# --- merge_upsert invariants ---------------------------------------------

_kv_lists = st.lists(
    st.tuples(st.integers(min_value=0, max_value=8), st.integers(min_value=-100, max_value=100)),
    min_size=0,
    max_size=12,
)


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(_kv_lists, _kv_lists)
@pytest.mark.slow
def test_merge_upsert_invariants(spark, target_rows, update_rows):
    from clearcare_data_pipeline_spark.operators.merge import merge_upsert

    # unique keys per side (merge's contract)
    t = {k: v for k, v in target_rows}
    u = {k: v for k, v in update_rows}
    target = spark.createDataFrame([(k, v) for k, v in t.items()] or [(None, None)], "k int, v int").where(
        F.col("k").isNotNull()
    )
    updates = spark.createDataFrame([(k, v) for k, v in u.items()] or [(None, None)], "k int, v int").where(
        F.col("k").isNotNull()
    )
    got = {r.k: r.v for r in merge_upsert(target, updates, ["k"]).collect()}
    expected = {**t, **u}
    assert got == expected


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.integers(min_value=-50, max_value=50), min_size=1, max_size=40))
@pytest.mark.slow
def test_quality_row_check_counts(spark, values):
    from clearcare_data_pipeline_spark.operators.quality import row_check_report

    df = spark.createDataFrame([(v,) for v in values], "x int")
    rep = {r.check_name: r for r in row_check_report(df, {"pos": F.col("x") > 0}).collect()}
    expect_viol = sum(1 for v in values if not v > 0)
    assert rep["pos"].n_rows == len(values)
    assert rep["pos"].n_violations == expect_viol
    assert rep["pos"].passed == (expect_viol == 0)
