"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the full charges cleaning +
validation pipeline) on sf0.001. ``queries()`` / ``oracle_sql()``
expose every implemented operator from SURVEY.md §2 with DuckDB twins
for the correctness gate.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: derive the raw charges table, run the full cleaning +
    10-rule validation pipeline, return the clean canonical table."""
    from clearcare_data_pipeline_spark.pipeline import clean_charges
    from clearcare_data_pipeline_spark.plans.rules import split_clean_quarantine, tag_violations
    from clearcare_data_pipeline_spark.schema import CANONICAL_COLUMNS
    from clearcare_data_pipeline_spark.sources.charges import charges_from_lineitem

    raw = charges_from_lineitem(spark, "/root/testdata/sf0.001")
    tagged = tag_violations(clean_charges(raw))
    clean, _quarantine = split_clean_quarantine(tagged)
    return clean.select(*CANONICAL_COLUMNS)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator (SURVEY.md §2 + Milestone 3)."""
    from clearcare_data_pipeline_spark.queries import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query, over the pre-registered views."""
    from clearcare_data_pipeline_spark.queries import all_oracles

    return all_oracles()
