"""Golden tests for the three raw-MRF extractors (SURVEY.md §2.4 X1/X2)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from clearcare_data_pipeline_spark.sources.extract_json import extract_json
from clearcare_data_pipeline_spark.sources.extract_tall import extract_tall
from clearcare_data_pipeline_spark.sources.extract_wide import extract_wide
from clearcare_data_pipeline_spark.schema import CANONICAL_COLUMNS

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


def _by(rows, **kv):
    out = [r for r in rows if all(r[k] == v for k, v in kv.items())]
    return out


# --- tall ---------------------------------------------------------------


def test_tall_metadata_preamble(spark):
    res = extract_tall(spark, f"{FIX}/tall.csv")
    assert res.metadata["hospital_name"] == "General Hospital"
    assert res.metadata["version"] == "2.0.0"
    assert res.metadata["hospital_address"] == "123 Main St, Springfield ST 12345"


def test_tall_canonical_shape(spark):
    res = extract_tall(spark, f"{FIX}/tall.csv")
    assert res.charges.columns == CANONICAL_COLUMNS
    rows = res.charges.collect()
    # 8 data rows with >=1 valid slot; MRI row has 2 slots; LOCAL slot
    # dropped but its second slot (CPT) kept => 9 emitted rows
    assert len(rows) == 9


def test_tall_code_slot_explode(spark):
    rows = extract_tall(spark, f"{FIX}/tall.csv").charges.collect()
    mri = _by(rows, description="MRI brain")
    assert {(r["code"], r["code_type"]) for r in mri} == {("70551", "CPT"), ("0070551", "NDC")}
    # both slot-rows carry the same payer/prices
    assert {r["negotiated_price"] for r in mri} == {"950"}


def test_tall_payer_split_and_type_normalization(spark):
    res = extract_tall(spark, f"{FIX}/tall.csv")
    rows = res.charges.collect()
    office = _by(rows, code="99213")[0]
    assert office["payer_name"] == "Aetna"
    assert office["payer_id"] == "AET001"
    knee = _by(rows, code="470")[0]
    assert knee["code_type"] == "DRG"  # MS-DRG normalized
    nopid = _by(rows, code="99212")[0]
    assert nopid["payer_name"] == "Humana" and nopid["payer_id"] == ""
    unknown = {r["raw_code_type"]: r["n"] for r in res.unknown_types.collect()}
    assert unknown == {"LOCAL": 1}


def test_tall_hospital_identity_from_preamble(spark):
    rows = extract_tall(spark, f"{FIX}/tall.csv", zip_code="12345").charges.collect()
    assert all(r["hospital_name"] == "General Hospital" for r in rows)
    assert all(r["zip_code"] == "12345" for r in rows)


# --- wide ---------------------------------------------------------------


def test_wide_regroup_keys(spark):
    res = extract_wide(spark, f"{FIX}/wide.csv")
    rows = res.charges.collect()
    keys = {(r["code"], r["code_type"], r["payer_name"], r["plan_name"]) for r in rows}
    assert keys == {
        ("99213", "CPT", "Aetna", "PPO"),
        ("99213", "CPT", "BlueCross", "HMO"),
        ("70551", "CPT", "Aetna", "PPO"),
        ("70551", "CPT", "BlueCross", "HMO"),
        ("70551", "CPT", "United", "POS"),
        ("0070551", "NDC", "Aetna", "PPO"),
        ("0070551", "NDC", "BlueCross", "HMO"),
        ("0070551", "NDC", "United", "POS"),
        ("470", "DRG", "Aetna", "PPO"),
    }


def test_wide_last_write_wins(spark):
    """'Dup key row' collides with 'Office visit' on (99213,CPT,Aetna,PPO):
    the later row's values win (reference dict-overwrite semantics)."""
    rows = extract_wide(spark, f"{FIX}/wide.csv").charges.collect()
    r = _by(rows, code="99213", payer_name="Aetna")[0]
    assert r["negotiated_price"] == "125.75"
    assert r["negotiated_methodology"] == "per diem"
    assert r["gross_charge"] == "210"
    assert r["description"] == "Dup key row"


def test_wide_field_shapes_and_notes_merge(spark):
    rows = extract_wide(spark, f"{FIX}/wide.csv").charges.collect()
    # >=4-part field-last shape: standard_charge|United|POS|negotiated_algorithm
    united = _by(rows, code="70551", payer_name="United")[0]
    assert united["negotiated_algorithm"] == "pct of billed"
    assert united["estimated_amount"] == "925"
    assert united["negotiated_methodology"] == "other"
    # F11 generic ⊕ payer note
    bc_office = _by(rows, code="99213", payer_name="BlueCross")[0]
    assert bc_office["additional_notes"] == "generic note"
    aetna_office = _by(rows, code="99213", payer_name="Aetna")[0]
    assert "second note" in aetna_office["additional_notes"]


def test_wide_blank_cells_skipped(spark):
    rows = extract_wide(spark, f"{FIX}/wide.csv").charges.collect()
    # Knee row has only the Aetna dollar cell -> no BlueCross/United keys
    knee = _by(rows, code="470")
    assert len(knee) == 1 and knee[0]["payer_name"] == "Aetna"
    assert knee[0]["negotiated_price"] == "18500"


# --- json ---------------------------------------------------------------


def test_json_explode_chain(spark):
    res = extract_json(spark, f"{FIX}/mrf.json")
    rows = res.charges.collect()
    assert res.metadata["hospital_name"] == "General Hospital"
    # office: 1 code x 2 payers; insulin: 2 codes x 1 payer; no-payer item: 1 code x 1 (outer)
    assert len(rows) == 5
    office_aetna = _by(rows, code="99213", payer_name="Aetna")[0]
    assert office_aetna["negotiated_price"] == "120.5"
    assert office_aetna["gross_charge"] == "200.0"
    assert office_aetna["additional_notes"] == "aetna note"


def test_json_code_slots_and_drug_info(spark):
    rows = extract_json(spark, f"{FIX}/mrf.json").charges.collect()
    insulin = _by(rows, description="Insulin 10ml")
    assert {(r["code"], r["code_type"]) for r in insulin} == {("0012345678", "NDC"), ("J1815", "HCPCS")}
    assert all(r["drug_unit"] == "10" and r["drug_type"] == "ML" for r in insulin)


def test_json_outer_payers_and_type_norm(spark):
    rows = extract_json(spark, f"{FIX}/mrf.json").charges.collect()
    nop = _by(rows, code="470")[0]
    assert nop["code_type"] == "DRG"
    assert nop["payer_name"] == "" and nop["negotiated_price"] == ""
    assert nop["gross_charge"] == "20000.0"


def test_extracted_tall_feeds_cleaning(spark):
    """End-to-end: extract -> clean -> tag; extracted output is valid
    canonical input for the cleaning stage."""
    from clearcare_data_pipeline_spark.pipeline import run_cleaning_pipeline

    res = extract_tall(spark, f"{FIX}/tall.csv", zip_code="12345")
    result = run_cleaning_pipeline(res.charges)
    # 9 extracted; the 7-digit '0070551' NDC fails R2 format validation
    assert result.clean_rows + result.quarantined_rows == 8
    assert 0.0 <= result.score <= 1.0
