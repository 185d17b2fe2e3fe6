"""Shared machinery for the raw-MRF extractors (SURVEY.md §2.1/§2.4).

All three physical layouts (tall CSV, wide CSV, nested JSON) normalize
into the canonical 22-column all-string charges table. CSV layouts
carry a 2-line metadata preamble (row 1 = keys, row 2 = values) before
the real header (tall_format_csv_extractor.pyc:66-71).
"""

from __future__ import annotations

import csv
import io

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from clearcare_data_pipeline_spark.schema import (
    ALLOWED_CODE_TYPES,
    CANONICAL_COLUMNS,
)
from clearcare_data_pipeline_spark.functions.cleaning import normalize_code_type_expr


def read_preamble(spark: SparkSession, path: str) -> dict[str, str]:
    """S3: 2-line metadata preamble -> dict (driver-side; 2 rows)."""
    first_two = spark.sparkContext.textFile(path).take(2)
    rows = list(csv.reader(io.StringIO("\n".join(first_two))))
    if len(rows) < 2:
        return {}
    return dict(zip(rows[0], (rows[1] + [""] * len(rows[0]))[: len(rows[0])]))


def read_csv_after_preamble(spark: SparkSession, path: str) -> DataFrame:
    """S2/S4: scan the CSV body that starts at line 3 (header line).

    Spark CSV has no skip-rows option, so the file is line-indexed and
    the 2 preamble lines dropped before parsing. Assumes no embedded
    newlines inside quoted fields (the same line-based assumption the
    reference's ``pd.read_csv(skiprows=2)`` makes). At production
    scale the extract stage would strip preambles on landing instead.
    """
    lines = spark.sparkContext.textFile(path)
    body = lines.zipWithIndex().filter(lambda t: t[1] >= 2).map(lambda t: t[0])
    df = spark.read.option("header", True).csv(body)
    # P3: blank-fill; P1: header normalize is NOT applied here — raw
    # source column names (with '|') are semantic for the extractors.
    return df.na.fill("")


def code_slot_structs(num_slots: int = 4) -> Column:
    """X1 helper: array of (code, raw_type) structs from code|i cols."""
    return F.array(
        *[
            F.struct(
                F.col(f"`code|{i}`").alias("code"),
                F.col(f"`code|{i}|type`").alias("raw_type"),
            )
            for i in range(1, num_slots + 1)
        ]
    )


def explode_code_slots(df: DataFrame, available_cols: list[str]) -> DataFrame:
    """X1: one output row per valid (code, type) slot; blank slots
    skipped; raw type normalized (F7) and gated to the allowed set
    (R3). Adds ``code``, ``code_type``, ``code_type_raw`` columns.
    Slots absent from the source schema contribute nothing."""
    slots = [
        F.struct(
            F.col(f"`code|{i}`").alias("code"),
            F.col(f"`code|{i}|type`").alias("raw_type"),
        )
        for i in range(1, 5)
        if f"code|{i}" in available_cols and f"code|{i}|type" in available_cols
    ]
    df = df.withColumn("_slot", F.explode(F.array(*slots)))
    df = df.where((F.col("_slot.code") != "") & (F.col("_slot.raw_type") != ""))
    df = df.withColumn("code", F.col("_slot.code")).withColumn(
        "code_type_raw", F.col("_slot.raw_type")
    )
    df = df.withColumn("code_type", normalize_code_type_expr(F.col("code_type_raw")))
    return df.drop("_slot")


def gate_allowed_types(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """R3: split (kept, unknown-type) on the normalized code type."""
    kept = df.where(F.col("code_type").isin(ALLOWED_CODE_TYPES))
    unknown = df.where(~F.col("code_type").isin(ALLOWED_CODE_TYPES) | F.col("code_type").isNull())
    return kept, unknown


def finalize_canonical(df: DataFrame, hospital_name: str = "", zip_code: str = "") -> DataFrame:
    """Project to the canonical 22 columns in order, filling the
    registry-sourced identity columns and defaulting absences to ''."""
    out = df
    if "hospital_name" not in out.columns:
        out = out.withColumn("hospital_name", F.lit(hospital_name))
    if "zip_code" not in out.columns:
        out = out.withColumn("zip_code", F.lit(zip_code))
    for c in CANONICAL_COLUMNS:
        if c not in out.columns:
            out = out.withColumn(c, F.lit("").cast(StringType()))
    return out.select(*CANONICAL_COLUMNS)
