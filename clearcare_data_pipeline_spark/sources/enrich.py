"""Registry enrichment (SURVEY.md §2 J2/J3, S9/S10, F8-F10).

* HTTP sources (CMS provider API, Leapfrog scrape) are driver-side
  adapters that return DataFrames, with a parquet cache fallback
  (C3, hospital_enricher.py:126-137). Network access is optional —
  offline, the cache is authoritative.
* The enrichment join is exact-first on the slugified campus_id
  (broadcast hash join — the dimension side is tiny), then a fuzzy
  top-1 similarity join for the misses (J3): difflib
  ``SequenceMatcher.ratio`` >= 0.9, exact reference semantics via an
  Arrow-batched pandas UDF over a candidate cross join of the
  (small) unmatched x CMS key sets.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

from clearcare_data_pipeline_spark.functions.text import slugify, zip5

# CMS columns pulled into the registry (hospital_enricher.py:160-164)
CMS_ENRICHMENT_COLS = {
    "hospital_type": "hospital_type",
    "citytown": "city",
    "countyparish": "county",
    "telephone_number": "telephone_num",
    "hospital_overall_rating": "cms_rating",
}

FUZZY_CUTOFF = 0.9


def make_difflib_ratio_udf():
    """Exact ``difflib.SequenceMatcher.ratio`` (reference J3 parity);
    Arrow-batched so the Python cost is per-candidate-pair, amortized.
    Built as a closure so cloudpickle ships the kernel by value and
    workers need no importable copy of this package."""

    @pandas_udf(DoubleType())
    def difflib_ratio(a: pd.Series, b: pd.Series) -> pd.Series:
        from difflib import SequenceMatcher as SM

        return pd.Series(
            [SM(None, x or "", y or "").ratio() for x, y in zip(a.tolist(), b.tolist())]
        )

    return difflib_ratio


def fetch_cms_hospitals(
    spark: SparkSession,
    cache_path: str,
    *,
    url: str | None = None,
    limit: int = 50000,
) -> DataFrame:
    """S9: CMS provider-data POST with cache fallback (C3)."""
    if url is not None:
        try:  # pragma: no cover - no network in test container
            import requests

            resp = requests.post(url, json={"query": {"limit": limit}}, timeout=60)
            resp.raise_for_status()
            records = resp.json()["results"]
            df = spark.createDataFrame(pd.DataFrame(records).astype(str))
            df.write.mode("overwrite").parquet(cache_path)
            return df
        except Exception:
            pass
    return spark.read.parquet(cache_path)


def prepare_cms_keys(cms: DataFrame) -> DataFrame:
    """F8/F9 on the CMS side: slug campus key + 5-digit zip."""
    return cms.withColumn("campus_id", slugify(F.col("facility_name"))).withColumn(
        "zip5", zip5(F.col("zip_code"))
    )


def enrich_registry(registry: DataFrame, cms: DataFrame) -> tuple[DataFrame, DataFrame]:
    """J2 exact + J3 fuzzy enrichment.

    Returns (enriched registry, unmatched rows). Exact path is a
    broadcast hash join on campus_id; misses go through the difflib
    top-1 candidate join (both sides are dimension-scale, so the
    cross join is bounded; at data scale this would be LSH-banded
    first — see operators/dedup.py).
    """
    cms_keyed = prepare_cms_keys(cms)
    cms_cols = [F.col(src).alias(dst) for src, dst in CMS_ENRICHMENT_COLS.items()]
    cms_small = cms_keyed.select("campus_id", *cms_cols).dropDuplicates(["campus_id"])

    # overwrite any pre-existing enrichment columns on the registry side
    registry = registry.drop(*[c for c in CMS_ENRICHMENT_COLS.values() if c in registry.columns])
    exact = registry.join(F.broadcast(cms_small), "campus_id", "left")
    matched = exact.where(F.col("hospital_type").isNotNull())
    missed = exact.where(F.col("hospital_type").isNull()).select(registry.columns)

    if missed.isEmpty():
        return matched, missed

    # J3: fuzzy top-1 over unmatched x cms keys
    cand = missed.select("campus_id").crossJoin(
        F.broadcast(cms_small.select(F.col("campus_id").alias("cms_campus_id")))
    )
    scored = cand.withColumn("ratio", make_difflib_ratio_udf()(F.col("campus_id"), F.col("cms_campus_id")))
    w = Window.partitionBy("campus_id").orderBy(F.desc("ratio"), F.asc("cms_campus_id"))
    best = (
        scored.withColumn("rn", F.row_number().over(w))
        .where((F.col("rn") == 1) & (F.col("ratio") >= FUZZY_CUTOFF))
        .select("campus_id", "cms_campus_id")
    )
    fuzzy = (
        missed.join(F.broadcast(best), "campus_id", "inner")
        .join(
            F.broadcast(cms_small.withColumnRenamed("campus_id", "cms_campus_id")),
            "cms_campus_id",
            "left",
        )
        .drop("cms_campus_id")
        .select(matched.columns)
    )
    still_missed = missed.join(best, "campus_id", "left_anti")
    return matched.unionByName(fuzzy), still_missed
