"""End-to-end cleaning/validation pipeline over the canonical table.

The Spark analog of the reference's chunked cleaning stage
(``clean_large_file_in_chunks``, cleaning_utils.py:140-248) — except
the chunk loop disappears: partitioned execution replaces chunking, and
the whole stage is one lazy plan with two materialization forks
(clean sink, quarantine sink) plus a single-pass metrics aggregate.

Stage order mirrors the reference exactly (SURVEY.md §3 step 4):
header-normalize -> inject missing cols -> price typing (F1) ->
invalid-token scrub (R1) -> text normalization (F2) -> modifier
normalization (F3) -> algorithm flag (F4) -> code-format filter (R2) ->
global dedup (D1; the reference's chunk-local dedup is an artifact —
global is the declared intent, SURVEY.md §7) -> 10 conditional rules ->
clean/quarantine split (R4) -> transparency score (A11).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from clearcare_data_pipeline_spark.functions.cleaning import (
    clean_price_fields,
    ensure_columns,
    flag_invalid_algorithm,
    normalize_code_type,
    normalize_headers,
    normalize_modifiers,
    normalize_text_fields,
    scrub_invalid_tokens,
    validate_code_format,
)
from clearcare_data_pipeline_spark.plans.metrics import transparency_score, violation_counts
from clearcare_data_pipeline_spark.plans.rules import RULE_NAMES, split_clean_quarantine, tag_violations
from clearcare_data_pipeline_spark.schema import CANONICAL_COLUMNS


def clean_charges(
    df: DataFrame, *, normalize_types: bool = True, validate: bool = True, dedup: bool = True
) -> DataFrame:
    """The full cleaning transform chain; returns the cleaned canonical
    table (typed prices, normalized text/modifiers/code types, invalid
    code formats filtered, exact duplicates dropped)."""
    df = normalize_headers(df)
    df = ensure_columns(df, CANONICAL_COLUMNS)
    if normalize_types:
        df = normalize_code_type(df)
    df = clean_price_fields(df)
    df = scrub_invalid_tokens(df, [c for c in CANONICAL_COLUMNS if c not in
                                   {"negotiated_price", "negotiated_percentage", "gross_charge",
                                    "discounted_cash_price", "min_price", "max_price",
                                    "estimated_amount"}])
    df = normalize_text_fields(df)
    df = normalize_modifiers(df)
    df = flag_invalid_algorithm(df)
    if validate:
        df = validate_code_format(df)
    if dedup:
        # Global dedup over the canonical columns only (helper columns
        # like code_type_raw would otherwise block duplicate matches).
        # Helper columns survive as the group minimum so the retained
        # row is deterministic and engine-independent (dropDuplicates'
        # pick is arbitrary; the DuckDB oracle mirrors this exactly).
        helpers = [c for c in df.columns if c not in set(CANONICAL_COLUMNS)]
        if helpers:
            df = df.groupBy(*CANONICAL_COLUMNS).agg(*[F.min(c).alias(c) for c in helpers])
        else:
            df = df.distinct()
    return df


@dataclass
class CleaningResult:
    clean: DataFrame
    quarantine: DataFrame
    score: float
    rule_counts: dict[str, int] = field(default_factory=dict)
    clean_rows: int = 0
    quarantined_rows: int = 0
    algorithm_format_issues: int = 0


def run_cleaning_pipeline(df: DataFrame) -> CleaningResult:
    """Clean -> tag -> split -> score. Persists the tagged plan across
    its three consumers (clean sink, quarantine sink, metrics) so the
    source is scanned once."""
    tagged = tag_violations(clean_charges(df)).persist()
    try:
        metrics = violation_counts(tagged).collect()[0].asDict()
        clean, quarantine = split_clean_quarantine(tagged)
        clean = clean.drop("code_type_raw", "negotiated_algorithm_invalid")
        rule_counts = {r: int(metrics.get(r) or 0) for r in RULE_NAMES}
        quarantined = int(metrics["quarantined_rows"])
        clean_rows = int(metrics["total_rows"]) - quarantined
        score = transparency_score(clean_rows, rule_counts)
        return CleaningResult(
            clean=clean,
            quarantine=quarantine,
            score=score,
            rule_counts=rule_counts,
            clean_rows=clean_rows,
            quarantined_rows=quarantined,
            algorithm_format_issues=int(metrics.get("algorithm_format_issues") or 0),
        )
    finally:
        # Plans returned in the result keep the persisted lineage; the
        # caller materializes them before this session ends.
        pass


def score_summary(df: DataFrame, *, already_clean: bool = False) -> DataFrame:
    """One-row DataFrame version of the score computation (A11) —
    fully declarative so it can run inside a larger plan (and be
    oracle-checked in SQL)."""
    tagged = tag_violations(df if already_clean else clean_charges(df))
    agg = tagged.agg(
        F.count(F.lit(1)).alias("total_rows"),
        F.count(F.when(F.col("rules_violated") != "", F.lit(1))).alias("quarantined_rows"),
        *[F.sum(F.col(r).cast("long")).alias(r) for r in RULE_NAMES],
    )
    total_viol = None
    for r in RULE_NAMES:
        c = F.coalesce(F.col(r), F.lit(0))
        total_viol = c if total_viol is None else (total_viol + c)
    return agg.select(
        (F.col("total_rows") - F.col("quarantined_rows")).alias("clean_rows"),
        F.col("quarantined_rows"),
        total_viol.alias("total_violations"),
        F.round(
            F.greatest(
                F.lit(0.0),
                F.lit(1.0)
                - total_viol
                / ((F.col("total_rows") - F.col("quarantined_rows") + total_viol) * F.lit(10.0)),
            ),
            6,
        ).alias("transparency_score"),
    )
