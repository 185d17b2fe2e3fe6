"""Leapfrog safety-grade source adapter (SURVEY.md §2 S10).

The reference scrapes the Leapfrog hospital-grade site per (city,
state) with BeautifulSoup and a 1 s rate limit
(hospital_enricher.py:71-115). Here the adapter is a driver-side
source returning a DataFrame:

* fetching is injectable (``fetcher``) and network-optional — offline,
  a parquet cache is authoritative (same C3 fallback as the CMS
  source);
* HTML parsing uses the stdlib ``html.parser`` (no bs4 dependency in
  this container) against the reference's card structure
  (``.itemWrapper`` blocks with name / address / grade fields);
* the registry-side keys (campus_id slug, zip) are derived with the
  same column functions used everywhere else.
"""

from __future__ import annotations

import time
from collections.abc import Callable
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clearcare_data_pipeline_spark.functions.text import slugify, zip_from_address

LEAPFROG_COLUMNS = ["hospital_name", "address", "grade", "grade_term", "city", "state", "url"]


class _CardParser(HTMLParser):
    """Extracts hospital cards: <div class="itemWrapper"> containing
    elements classed hospitalName / hospitalAddress / letterGrade
    (grade term in a data-term attribute or gradeTerm class)."""

    def __init__(self) -> None:
        super().__init__()
        self.cards: list[dict[str, str]] = []
        self._card_depth = 0  # div nesting depth inside the open card
        self._field: str | None = None
        self._current: dict[str, str] = {}
        self._href: str = ""

    def handle_starttag(self, tag, attrs):
        a = dict(attrs)
        classes = (a.get("class") or "").split()
        if "itemWrapper" in classes and tag == "div":
            self._card_depth = 1
            self._current = {}
            self._href = ""
            return
        if not self._card_depth:
            return
        if tag == "div":
            self._card_depth += 1
        if tag == "a" and a.get("href"):
            self._href = a["href"]
        for cls, field in [
            ("hospitalName", "hospital_name"),
            ("hospitalAddress", "address"),
            ("letterGrade", "grade"),
            ("gradeTerm", "grade_term"),
        ]:
            if cls in classes:
                self._field = field

    def handle_data(self, data):
        if self._card_depth and self._field and data.strip():
            self._current[self._field] = self._current.get(self._field, "") + data.strip()

    def handle_endtag(self, tag):
        if self._field:
            self._field = None
        if self._card_depth and tag == "div":
            self._card_depth -= 1
            if self._card_depth == 0 and self._current.get("hospital_name"):
                self._current["url"] = self._href
                self.cards.append(self._current)


def parse_leapfrog_html(html: str) -> list[dict[str, str]]:
    p = _CardParser()
    p.feed(html)
    return p.cards


def scrape_leapfrog(
    spark: SparkSession,
    cache_path: str,
    *,
    cities: list[tuple[str, str]] | None = None,
    fetcher: Callable[[str, str], str] | None = None,
    sleep_between_requests: float = 1.0,
) -> DataFrame:
    """S10: per-(city, state) fetch -> card parse -> DataFrame, with
    parquet-cache fallback when no fetcher is available (offline)."""
    if fetcher is None or not cities:
        return spark.read.parquet(cache_path)
    rows: list[dict[str, str]] = []
    for i, (city, state) in enumerate(cities):
        html = fetcher(city, state)
        for card in parse_leapfrog_html(html):
            card.update({"city": city, "state": state})
            rows.append({c: card.get(c, "") for c in LEAPFROG_COLUMNS})
        if i + 1 < len(cities) and sleep_between_requests:
            time.sleep(sleep_between_requests)  # reference rate limit (config.yaml:10)
    df = spark.createDataFrame(pd.DataFrame(rows, columns=LEAPFROG_COLUMNS))
    df.write.mode("overwrite").parquet(cache_path)
    return df


def leapfrog_registry_rows(leapfrog: DataFrame) -> DataFrame:
    """Derive registry-side keys from scraped cards: campus_id slug,
    healthcare_system (first name token, hospital_enricher.py:101),
    trailing zip from the address."""
    return leapfrog.select(
        F.col("hospital_name"),
        slugify(F.col("hospital_name")).alias("campus_id"),
        F.split(F.col("hospital_name"), r"\s+").getItem(0).alias("healthcare_system"),
        F.col("address").alias("hospital_address"),
        zip_from_address(F.col("address")).alias("zip_code"),
        F.col("grade").alias("leapfrog_grade"),
        F.col("grade_term").alias("leapfrog_grade_term"),
        F.col("url").alias("leapfrog_grade_url"),
        "city",
        "state",
    )
