"""Grouped-map pandas operators (``applyInPandas``).

The per-group pandas DataFrame in/out shape — for transforms that
need whole-group context in Python (here: per-user z-scoring of event
values, the classic normalization-before-modeling step). Kernels are
closures so cloudpickle ships them by value to the workers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

Z_SCHEMA = "user_id long, event_id long, value double, zscore double"


def per_user_zscores(events: DataFrame) -> DataFrame:
    """Per-user z-score of ``value`` (ddof=0; single-event users get
    zscore 0.0). One Arrow batch per user group."""

    def kernel(pdf):
        import pandas as pd

        std = float(pdf["value"].std(ddof=0))
        mean = float(pdf["value"].mean())
        z = (pdf["value"] - mean) / std if std > 0 else pdf["value"] * 0.0
        return pd.DataFrame(
            {
                "user_id": pdf["user_id"],
                "event_id": pdf["event_id"],
                "value": pdf["value"],
                "zscore": z,
            }
        )

    return events.select("user_id", "event_id", "value").groupBy("user_id").applyInPandas(kernel, Z_SCHEMA)
