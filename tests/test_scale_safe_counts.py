"""The scale-safe COUNT forms of the two sf10-excluded pair-listing
queries (VERDICT r10 #3) must agree exactly with the listings they
replace: same pairs, collapsed to keyed aggregates BEFORE the
quadratic join so output (and oracle cost) stays bounded at sf10+."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from clearcare_data_pipeline_spark.queries import relational, textops

SF = "/root/testdata/sf0.001"


@pytest.mark.slow
def test_simhash_near_dup_counts_match_listing(spark):
    listing = (
        textops.q_doc_simhash_near_dups(spark, SF)
        .groupBy("hamming").count()
    )
    counts = textops.q_doc_simhash_near_dup_counts(spark, SF)
    got = {r["hamming"]: r["n_pairs"] for r in counts.collect()}
    want = {r["hamming"]: r["count"] for r in listing.collect()}
    assert got == want
    assert counts.columns == ["hamming", "n_pairs"]


def test_part_name_linkage_counts_match_listing_total(spark):
    total_listing = relational.q_part_name_linkage(spark, SF).count()
    counts = relational.q_part_name_linkage_counts(spark, SF)
    total_counts = counts.agg(F.sum("n_pairs").alias("t")).collect()[0]["t"]
    assert total_listing == total_counts
    # every block key the listing could emit is a real (brand, word)
    rows = counts.collect()
    assert all(r["n_pairs"] > 0 for r in rows)
    assert len(rows) == counts.select("p_brand", "first_word").distinct().count()


def test_part_name_linkage_counts_match_listing_per_block(spark):
    """Per-(p_brand, first_word) agreement, mirroring the per-hamming
    check in the simhash test (ADVICE r11 #5): a block-attribution bug
    (e.g. wrong group keys on the within-name branch) passes the
    grand-total check but not this one. The listing doesn't carry the
    block key, so recover it by joining left_id back to part — both
    pair members share the block by construction of the join."""
    from clearcare_data_pipeline_spark.sources.tables import load_table

    part = load_table(spark, SF, "part").select(
        F.col("p_partkey").alias("left_id"),
        "p_brand",
        F.split(F.col("p_name"), " ").getItem(0).alias("first_word"),
    )
    listing_blocks = (
        relational.q_part_name_linkage(spark, SF)
        .join(part, "left_id")
        .groupBy("p_brand", "first_word")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )
    want = {
        (r["p_brand"], r["first_word"]): r["n_pairs"]
        for r in listing_blocks.collect()
    }
    got = {
        (r["p_brand"], r["first_word"]): r["n_pairs"]
        for r in relational.q_part_name_linkage_counts(spark, SF).collect()
    }
    assert got == want
