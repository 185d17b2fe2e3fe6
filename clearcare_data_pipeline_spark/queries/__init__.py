"""Query registry: every operator exposed as (spark, sf_dir) -> DataFrame
plus a DuckDB oracle SQL twin for the driver's correctness gate."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


def all_queries() -> dict[str, QueryFn]:
    from clearcare_data_pipeline_spark.queries import (
        advanced,
        charges,
        eventsops,
        extractors,
        relational,
        similarity,
        stats,
        textops,
        textops2,
        tpch_extra,
        tpch_extra2,
        tpch_extra3,
    )

    out: dict[str, QueryFn] = {}
    for mod in (relational, tpch_extra, tpch_extra2, tpch_extra3, advanced, stats, charges, textops, textops2, similarity, eventsops, extractors):
        out.update(mod.QUERIES)
    return out


def all_oracles() -> dict[str, str]:
    from clearcare_data_pipeline_spark.queries import (
        advanced,
        charges,
        eventsops,
        extractors,
        relational,
        similarity,
        stats,
        textops,
        textops2,
        tpch_extra,
        tpch_extra2,
        tpch_extra3,
    )

    out: dict[str, str] = {}
    for mod in (relational, tpch_extra, tpch_extra2, tpch_extra3, advanced, stats, charges, textops, textops2, similarity, eventsops, extractors):
        out.update(mod.ORACLES)
    return out
