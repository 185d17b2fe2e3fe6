"""Scale-class registry (VERDICT r11 #4): the sf10 runnable set is
derived from ``queries.scale_class()``, never a hand-written exclusion
list — these tests pin that the map stays total and self-consistent
as the registry grows."""

from __future__ import annotations

import pytest

from clearcare_data_pipeline_spark import queries as qreg


def test_every_registry_entry_has_a_class():
    classes = {"prod", "quadratic_listing"}
    for name in qreg.all_queries():
        sc = qreg.scale_class(name)
        assert sc["class"] in classes, (name, sc)


def test_non_prod_entries_are_registered_and_receipted():
    reg = qreg.all_queries()
    for name, sc in qreg._NON_PROD_SCALE_CLASS.items():
        assert name in reg, f"tagged but unregistered: {name}"
        assert sc.get("receipt"), f"non-prod entry without receipt: {name}"
        companion = sc.get("companion")
        assert companion in reg, f"companion missing from registry: {companion}"
        assert qreg.scale_class(companion)["class"] == "prod"


def test_known_quadratic_listings_tagged():
    assert qreg.scale_class("doc_simhash_near_dups")["class"] == "quadratic_listing"
    assert qreg.scale_class("part_name_linkage")["class"] == "quadratic_listing"
    assert qreg.scale_class("doc_simhash_near_dup_counts")["class"] == "prod"
    assert qreg.scale_class("part_name_linkage_counts")["class"] == "prod"


def test_runnable_queries_derivation():
    all_names = list(qreg.all_queries())
    assert qreg.runnable_queries() == all_names
    sf10 = qreg.runnable_queries({"quadratic_listing"})
    assert set(all_names) - set(sf10) == {
        "doc_simhash_near_dups",
        "part_name_linkage",
    }
    assert len(sf10) == len(all_names) - 2


def test_unknown_name_raises():
    with pytest.raises(KeyError):
        qreg.scale_class("not_a_query")
