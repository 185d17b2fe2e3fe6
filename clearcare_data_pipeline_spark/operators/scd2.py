"""Slowly-changing-dimension type 2 from a change stream.

Turns an append-only CDC feed (key, change timestamp, attributes)
into validity-interval records: each change row becomes a version with
``valid_from`` = its timestamp, ``valid_to`` = the next change's
timestamp for the same key (NULL while current), plus an
``is_current`` flag and a ``version`` ordinal.

One window shuffle keyed on the business key — the scale floor for
interval derivation. Ties on the timestamp are broken by the caller's
tiebreak columns so versions are deterministic (same discipline as
queries/eventsops.py sessionization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_intervals(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    order = [F.col(ts_col)] + [F.col(c) for c in tiebreak_cols or []]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        df.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead(ts_col).over(w))
        .withColumn("is_current", F.col("valid_to").isNull())
        .withColumn("version", F.row_number().over(w))
    )
