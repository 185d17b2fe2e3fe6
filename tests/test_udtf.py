"""Python UDTF lateral join (operators/udtf_ops.py)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clearcare_data_pipeline_spark.operators.udtf_ops import explode_sentences  # noqa: E402


def test_udtf_sentence_explosion(spark):
    docs = spark.createDataFrame(
        [(1, "First one. Second two! Third?"), (2, "Only sentence"), (3, "")],
        ["doc_id", "text"],
    )
    rows = explode_sentences(spark, docs).collect()
    got = {(r.doc_id, r.sent_no): r.sentence for r in rows}
    assert got == {
        (1, 0): "First one",
        (1, 1): "Second two",
        (1, 2): "Third",
        (2, 0): "Only sentence",
    }
