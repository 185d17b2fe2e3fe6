"""Self-trained trigram-LM perplexity (operators/textstats.py).

Hand-computed corpus: with docs "a b a b a" and "a b c",
trigram counts are c(a,b,a)=2, c(b,a,b)=1, c(a,b,c)=1 and prefix
counts c(a,b)=3, c(b,a)=1, so
  doc 1: lp = [ln(2/3), ln(1/1), ln(2/3)], avg = 2*ln(2/3)/3
  doc 2: lp = [ln(1/3)], perplexity = exp(-ln(1/3)) = 3.
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clearcare_data_pipeline_spark.operators.textstats import (  # noqa: E402
    trigram_lm_perplexity,
    trigram_occurrences,
)


def _docs(spark):
    return spark.createDataFrame(
        [(1, "a b a b a"), (2, "a b c"), (3, "x y")],
        ["doc_id", "text"],
    )


def test_trigram_occurrences_counts_and_short_doc_dropped(spark):
    occ = trigram_occurrences(_docs(spark)).collect()
    by_doc: dict[int, list] = {}
    for r in occ:
        by_doc.setdefault(r.doc_id, []).append((r.w1, r.w2, r.w3))
    assert sorted(by_doc[1]) == [("a", "b", "a"), ("a", "b", "a"), ("b", "a", "b")]
    assert by_doc[2] == [("a", "b", "c")]
    assert 3 not in by_doc  # 2 tokens -> no trigrams


def test_perplexity_matches_hand_computation(spark):
    rows = {r.doc_id: r for r in trigram_lm_perplexity(_docs(spark)).collect()}
    assert set(rows) == {1, 2}
    assert rows[1].n_trigrams == 3
    assert rows[2].n_trigrams == 1
    expect1 = 2.0 * math.log(2.0 / 3.0) / 3.0
    assert abs(rows[1].avg_logprob - round(expect1, 6)) < 1e-9
    assert abs(rows[2].perplexity - 3.0) < 1e-6
    assert abs(rows[1].perplexity - round(math.exp(-expect1), 6)) < 1e-9


def test_keyed_join_path_matches_broadcast_path(spark):
    a = {
        r.doc_id: r
        for r in trigram_lm_perplexity(_docs(spark), broadcast_model=True).collect()
    }
    b = {
        r.doc_id: r
        for r in trigram_lm_perplexity(_docs(spark), broadcast_model=False).collect()
    }
    assert a.keys() == b.keys()
    for k in a:
        assert a[k] == b[k]


def test_broadcast_auto_switch(spark):
    """broadcast_model=None broadcasts small models and routes large
    vocabularies to the keyed join (VERDICT r6 #5)."""
    from clearcare_data_pipeline_spark.operators.textstats import (
        doc_trigram_counts,
        score_trigram_counts,
        trigram_lm_model_from_counts,
    )

    doctri = doc_trigram_counts(_docs(spark))
    model = trigram_lm_model_from_counts(doctri)

    small = score_trigram_counts(doctri, model)  # vocab << default cap
    assert "Broadcast" in small._jdf.queryExecution().executedPlan().toString()

    big = score_trigram_counts(doctri, model, broadcast_row_cap=1)
    assert "BroadcastHashJoin" not in big._jdf.queryExecution().executedPlan().toString()
    key = lambda r: (r["doc_id"], r["n_trigrams"], r["avg_logprob"])
    assert sorted(map(key, small.collect())) == sorted(map(key, big.collect()))


def test_streaming_scoring_matches_batch(spark, tmp_path):
    """Two microbatches of docs scored against a static model come out
    identical to batch scoring of the same docs."""
    import json

    from clearcare_data_pipeline_spark.operators.textstats import (
        doc_trigram_counts,
        score_trigram_counts,
        trigram_lm_model_from_counts,
    )
    from clearcare_data_pipeline_spark.streaming.lmscore import (
        run_lm_scoring_stream,
    )

    train = spark.createDataFrame(
        [(100, "a b a b a"), (101, "a b c a b c"), (102, "b a b a b")],
        ["doc_id", "text"],
    )
    model = trigram_lm_model_from_counts(doc_trigram_counts(train)).localCheckpoint()

    inp = tmp_path / "docs_in"
    inp.mkdir()
    (inp / "b1.json").write_text(json.dumps({"doc_id": 1, "text": "a b a b"}))
    (inp / "b2.json").write_text(
        json.dumps({"doc_id": 2, "text": "a b c"})
        + "\n"
        + json.dumps({"doc_id": 3, "text": "z z z z"})  # fully out-of-model
    )
    stream = (
        spark.readStream.schema("doc_id LONG, text STRING")
        .option("maxFilesPerTrigger", "1")
        .json(str(inp))
    )
    q = run_lm_scoring_stream(
        stream,
        model,
        str(tmp_path / "scored"),
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)

    got = {
        r.doc_id: (r.n_trigrams, r.avg_logprob, r.perplexity)
        for r in spark.read.parquet(str(tmp_path / "scored")).collect()
    }
    batch_docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c"), (3, "z z z z")], ["doc_id", "text"]
    )
    want = {
        r.doc_id: (r.n_trigrams, r.avg_logprob, r.perplexity)
        for r in score_trigram_counts(doc_trigram_counts(batch_docs), model).collect()
    }
    assert got == want
    assert 3 not in got  # out-of-model doc yields no row (inner join)
    assert set(got) == {1, 2}
