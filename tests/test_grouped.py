"""Grouped-map applyInPandas operator test (vs independent pandas)."""

from __future__ import annotations

import pandas as pd
import pytest

from clearcare_data_pipeline_spark.operators.grouped import per_user_zscores
from clearcare_data_pipeline_spark.sources.tables import load_table


def test_per_user_zscores_match_pandas(spark):
    events = load_table(spark, "/root/testdata/sf0.001", "events")
    got = per_user_zscores(events).toPandas().set_index("event_id").sort_index()

    ref = events.select("user_id", "event_id", "value").toPandas()
    def z(g):
        s = g["value"].std(ddof=0)
        g = g.copy()
        g["zscore"] = (g["value"] - g["value"].mean()) / s if s > 0 else 0.0
        return g
    exp = ref.groupby("user_id", group_keys=False)[["user_id", "event_id", "value"]].apply(z)
    exp = exp.set_index("event_id").sort_index()

    assert len(got) == len(exp)
    assert got["zscore"].to_numpy() == pytest.approx(exp["zscore"].to_numpy(), abs=1e-9)
    # z-scores are standardized within each user
    by_user = got.groupby("user_id")["zscore"]
    assert by_user.mean().abs().max() < 1e-9
