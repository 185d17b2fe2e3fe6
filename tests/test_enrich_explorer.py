"""Enrichment join (J2/J3) + explorer/sampler (S7/S8) tests."""

from __future__ import annotations

import pytest

import os

from pyspark.sql import Row

from clearcare_data_pipeline_spark.sources.enrich import (
    enrich_registry,
    fetch_cms_hospitals,
    prepare_cms_keys,
)
from clearcare_data_pipeline_spark.sources.explorer import sample_mrf, schema_tree

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


def _cms(spark):
    rows = [
        Row(
            facility_name="Saint Mary Hospital",
            zip_code="123456789",
            hospital_type="Acute Care",
            citytown="Springfield",
            countyparish="Greene",
            telephone_number="555-1234",
            hospital_overall_rating="4",
        ),
        Row(
            facility_name="General Hospital of Springfield",
            zip_code="54321",
            hospital_type="Critical Access",
            citytown="Springfield",
            countyparish="Greene",
            telephone_number="555-9999",
            hospital_overall_rating="3",
        ),
    ]
    return spark.createDataFrame(rows)


def _registry(spark):
    return spark.createDataFrame(
        [
            Row(campus_id="saint_mary", hospital_name="Saint Mary Hospital"),
            # near-miss slug: fuzzy join target (ratio >= 0.9)
            Row(campus_id="general_springfields", hospital_name="General Hospital"),
            Row(campus_id="totally_unknown_place", hospital_name="Nowhere"),
        ]
    )


def test_prepare_cms_keys_slug_and_zip(spark):
    keyed = {r["facility_name"]: r for r in prepare_cms_keys(_cms(spark)).collect()}
    assert keyed["Saint Mary Hospital"]["campus_id"] == "saint_mary"
    assert keyed["Saint Mary Hospital"]["zip5"] == "12345"
    assert keyed["General Hospital of Springfield"]["campus_id"] == "general_springfield"


@pytest.mark.slow
def test_enrich_exact_and_fuzzy(spark):
    enriched, unmatched = enrich_registry(_registry(spark), _cms(spark))
    rows = {r["campus_id"]: r for r in enriched.collect()}
    # exact join
    assert rows["saint_mary"]["hospital_type"] == "Acute Care"
    assert rows["saint_mary"]["cms_rating"] == "4"
    # fuzzy join: 'general_springfields' ~ 'general_springfield' (ratio > 0.9)
    assert rows["general_springfields"]["hospital_type"] == "Critical Access"
    # unmatched logged, not enriched
    assert [r["campus_id"] for r in unmatched.collect()] == ["totally_unknown_place"]


def test_cms_cache_fallback(spark, tmp_path):
    cache = str(tmp_path / "cms_cache.parquet")
    _cms(spark).write.parquet(cache)
    df = fetch_cms_hospitals(spark, cache)  # no url -> cache path
    assert df.count() == 2


def test_schema_tree(spark):
    tree = schema_tree(spark, f"{FIX}/mrf.json")
    assert "- hospital_name (string)" in tree
    assert "- standard_charge_information (array)" in tree
    assert "- payers_information (array)" in tree


def test_sample_mrf(spark):
    s = sample_mrf(spark, f"{FIX}/mrf.json", n_charge_items=2, n_modifiers=1)
    assert s["hospital_name"] == "General Hospital"
    assert s["license_information"]["license_number"] == "ABC-123"
    assert len(s["standard_charge_information"]) == 2  # sliced from 3
    assert len(s["modifier_information"]) == 1  # sliced from 2


_LEAPFROG_HTML = """
<html><body>
<div class="itemWrapper">
  <a href="/h/mercy-general"><span class="hospitalName">Mercy General Hospital</span></a>
  <div class="hospitalAddress">1 Care Way, Springfield, ST 12345</div>
  <span class="letterGrade">A</span><span class="gradeTerm">Spring 2024</span>
</div>
<div class="itemWrapper">
  <a href="/h/st-judes"><span class="hospitalName">St. Jude's Medical Center</span></a>
  <div class="hospitalAddress">2 Hope Blvd, Springfield, ST 54321-9876</div>
  <span class="letterGrade">B</span><span class="gradeTerm">Spring 2024</span>
</div>
</body></html>
"""


def test_leapfrog_parse_and_keys(spark, tmp_path):
    from clearcare_data_pipeline_spark.sources.leapfrog import (
        leapfrog_registry_rows,
        parse_leapfrog_html,
        scrape_leapfrog,
    )

    cards = parse_leapfrog_html(_LEAPFROG_HTML)
    assert [c["hospital_name"] for c in cards] == ["Mercy General Hospital", "St. Jude's Medical Center"]
    assert cards[0]["grade"] == "A" and cards[0]["url"] == "/h/mercy-general"

    cache = str(tmp_path / "leapfrog.parquet")
    df = scrape_leapfrog(
        spark, cache, cities=[("Springfield", "ST")],
        fetcher=lambda city, state: _LEAPFROG_HTML, sleep_between_requests=0,
    )
    reg = {r["campus_id"]: r for r in leapfrog_registry_rows(df).collect()}
    assert reg["mercy_general"]["zip_code"] == "12345"
    assert reg["st_judes"]["zip_code"] == "54321"
    assert reg["mercy_general"]["healthcare_system"] == "Mercy"
    assert reg["st_judes"]["leapfrog_grade"] == "B"
    # cache fallback path (no fetcher)
    assert scrape_leapfrog(spark, cache).count() == 2


def test_batch_explore_logs_failures(spark):
    from pyspark.sql import Row

    from clearcare_data_pipeline_spark.sources.explorer import batch_explore

    reg = spark.createDataFrame([
        Row(campus_id="ok", healthcare_system="Sys", path=f"{FIX}/mrf.json"),
        Row(campus_id="broken", healthcare_system="Sys", path="/nonexistent.json"),
        Row(campus_id="other", healthcare_system="Other", path=f"{FIX}/mrf.json"),
    ])
    out = batch_explore(spark, reg, lambda r: r["path"], healthcare_system="Sys")
    assert set(out) == {"ok", "broken"}
    assert "hospital_name" in out["ok"]
    assert isinstance(out["broken"], dict) and "error" in out["broken"]
