"""Unit tests for the cleaning column functions (SURVEY.md §2.2/§2.3)."""

from __future__ import annotations

import pytest


from pyspark.sql import functions as F

from clearcare_data_pipeline_spark.functions.cleaning import (
    clean_price_expr,
    code_format_valid_expr,
    modifiers_to_array_expr,
    normalize_code_type_expr,
    normalize_modifiers_expr,
    normalize_text_expr,
    scrub_invalid_token_expr,
)


def _one(spark, expr, **cols):
    schema = ", ".join(f"{k} string" for k in cols)
    df = spark.createDataFrame([tuple(cols.values())], schema)
    return df.select(expr.alias("v")).first()["v"]


def test_price_money_noise(spark):
    assert _one(spark, clean_price_expr(F.col("x")), x='$1,234.56') == 1234.56
    assert _one(spark, clean_price_expr(F.col("x")), x='"85%"') == 85.0
    assert _one(spark, clean_price_expr(F.col("x")), x=" 42 ") == 42.0


def test_price_coerce_to_null(spark):
    assert _one(spark, clean_price_expr(F.col("x")), x="garbage") is None
    assert _one(spark, clean_price_expr(F.col("x")), x="") is None
    assert _one(spark, clean_price_expr(F.col("x")), x=None) is None


@pytest.mark.slow
def test_price_placeholder_and_nonpositive(spark):
    assert _one(spark, clean_price_expr(F.col("x")), x="999999999") is None
    assert _one(spark, clean_price_expr(F.col("x")), x="0") is None
    assert _one(spark, clean_price_expr(F.col("x")), x="-5") is None
    # estimated_amount is exempt (cleaning_utils.py:93-95)
    assert _one(spark, clean_price_expr(F.col("x"), exempt=True), x="999999999") == 999999999.0
    assert _one(spark, clean_price_expr(F.col("x"), exempt=True), x="-10") == -10.0


@pytest.mark.slow
def test_scrub_invalid_tokens(spark):
    for tok in ["N/A", "n/a", "NA", "not applicable", "Not Applicable", " na "]:
        assert _one(spark, scrub_invalid_token_expr(F.col("x")), x=tok) == ""
    assert _one(spark, scrub_invalid_token_expr(F.col("x")), x="nature") == "nature"


def test_normalize_text(spark):
    assert _one(spark, normalize_text_expr(F.col("x")), x="  Fee Schedule ") == "fee schedule"
    assert _one(spark, normalize_text_expr(F.col("x")), x="nan") == ""


def test_normalize_modifiers(spark):
    assert _one(spark, normalize_modifiers_expr(F.col("x")), x="26, tc|59") == "26,TC,59"
    assert _one(spark, normalize_modifiers_expr(F.col("x")), x=None) is None


def test_modifiers_to_array(spark):
    assert _one(spark, modifiers_to_array_expr(F.col("x")), x="26, tc| 59,,") == ["26", "tc", "59"]


def test_code_type_normalization(spark):
    assert _one(spark, normalize_code_type_expr(F.col("x")), x="ms-drg") == "DRG"
    assert _one(spark, normalize_code_type_expr(F.col("x")), x="ICD-10-CM") == "ICD"
    assert _one(spark, normalize_code_type_expr(F.col("x")), x="LOCAL") is None


@pytest.mark.slow
def test_code_format_validation(spark):
    valid = [
        ("12345", "CPT"), ("A1234", "HCPCS"), ("99213", "HCPCS"),
        ("0123456789", "NDC"), ("123", "DRG"), ("D1234", "CDT"),
        ("1234", "APC"), ("E11.4", "ICD"),
        ("", "CPT"), (None, "CPT"),  # blank/NULL code bypasses validation
    ]
    invalid = [
        ("1234", "CPT"), ("W1234", "HCPCS"), ("123456789", "NDC"),
        ("12", "DRG"), ("X1234", "CDT"), ("12345", "APC"),
        ("E1", "ICD"), ("E11.4567", "ICD"), ("12345", None),
    ]
    expr = code_format_valid_expr(F.col("code"), F.col("code_type"))
    for code, ctype in valid:
        assert _one(spark, expr, code=code, code_type=ctype) is True, (code, ctype)
    for code, ctype in invalid:
        assert _one(spark, expr, code=code, code_type=ctype) is not True, (code, ctype)
