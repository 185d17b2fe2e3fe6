"""Chunking + PII masking operator edge cases (gate covers the bulk)."""

import pytest
from pyspark.sql import functions as F

from clearcare_data_pipeline_spark.operators.chunking import chunk_documents, mask_pii


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunk_overlap_and_tail(spark):
    text = " ".join(f"w{i}" for i in range(10))
    out = chunk_documents(
        _docs(spark, [(1, text)]), chunk_tokens=4, overlap=2
    ).collect()
    got = [(r["chunk_id"], r["start_token"], r["n_tokens"], r["chunk_text"]) for r in out]
    # Start s=8 is suppressed: "w8 w9" is fully inside chunk 3's
    # coverage (8 + overlap 2 >= 10) — no duplicate tail text.
    assert got == [
        (0, 0, 4, "w0 w1 w2 w3"),
        (1, 2, 4, "w2 w3 w4 w5"),
        (2, 4, 4, "w4 w5 w6 w7"),
        (3, 6, 4, "w6 w7 w8 w9"),
    ]


def test_chunk_tail_kept_when_it_adds_tokens(spark):
    # n=11: start s=8 covers w8..w10 and w10 is new -> kept, partial.
    text = " ".join(f"w{i}" for i in range(11))
    out = chunk_documents(
        _docs(spark, [(1, text)]), chunk_tokens=4, overlap=2
    ).collect()
    got = [(r["chunk_id"], r["start_token"], r["n_tokens"]) for r in out]
    assert got[-1] == (4, 8, 3)
    # every token is covered exactly by the union of chunks
    covered = set()
    for r in out:
        covered.update(range(r["start_token"], r["start_token"] + r["n_tokens"]))
    assert covered == set(range(11))


def test_chunk_no_fully_contained_tail(spark):
    # ADVICE example shape: n < chunk_tokens but a second start lands
    # inside the first chunk's overlap -> exactly one chunk emitted.
    text = " ".join(f"t{i}" for i in range(97))
    out = chunk_documents(
        _docs(spark, [(1, text)]), chunk_tokens=128, overlap=32
    ).collect()
    assert [(r["chunk_id"], r["start_token"], r["n_tokens"]) for r in out] == [(0, 0, 97)]


def test_chunk_empty_and_whitespace_docs(spark):
    out = chunk_documents(
        _docs(spark, [(1, ""), (2, "   "), (3, "one")]), chunk_tokens=4, overlap=1
    ).collect()
    assert [(r["doc_id"], r["chunk_text"]) for r in out] == [(3, "one")]


def test_chunk_rejects_bad_overlap(spark):
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(_docs(spark, [(1, "a b")]), chunk_tokens=4, overlap=4)


def test_mask_pii_patterns(spark):
    rows = [
        (1, "mail me at jo.doe+tag@sub.example.org today"),
        (2, "call +1 555-123-4567 or 555-1234"),
        (3, "ssn 123-45-6789 on file"),
        (4, "nothing sensitive here"),
    ]
    got = {r["doc_id"]: r["text"] for r in mask_pii(_docs(spark, rows)).collect()}
    assert got[1] == "mail me at <EMAIL> today"
    assert "<PHONE>" in got[2]
    assert got[3] == "ssn <ID> on file"
    assert got[4] == "nothing sensitive here"


def test_hash_split_is_stable_and_roughly_proportional(spark):
    from clearcare_data_pipeline_spark.operators.sampling import hash_split

    docs = spark.range(2000).select(F.col("id").alias("doc_id"))
    a = {r["doc_id"]: r["split"] for r in hash_split(docs).collect()}
    b = {r["doc_id"]: r["split"] for r in hash_split(docs.repartition(7)).collect()}
    assert a == b  # membership is partitioning-independent
    train = sum(1 for v in a.values() if v == "train")
    assert 0.85 < train / len(a) < 0.95


def test_stratified_sample_proportions(spark):
    from clearcare_data_pipeline_spark.operators.sampling import stratified_sample

    df = spark.range(4000).select(
        F.col("id"), (F.col("id") % 2 == 0).cast("string").alias("s")
    )
    out = stratified_sample(df, "s", {"true": 0.5, "false": 0.1})
    got = {r["s"]: r["n"] for r in out.groupBy("s").agg(F.count("*").alias("n")).collect()}
    assert 800 < got["true"] < 1200
    assert 100 < got["false"] < 320
