"""duplicated_span_coverage semantics (operators/spans.py) on
constructed corpora: interval union, the distinct-doc rule, short-doc
emission, and agreement with a brute-force per-token oracle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clearcare_data_pipeline_spark.operators.spans import (
    duplicated_span_coverage,
    positional_grams,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id: string, text: string")


def _tokens(text):
    return [t for t in text.strip().split() if t]


def _brute_coverage(rows, n=8, min_docs=2):
    """Per-token oracle: mark every token index inside any n-window
    whose n-gram appears in >= min_docs distinct docs."""
    grams = {}
    toks = {d: _tokens(t) for d, t in rows}
    for d, ts in toks.items():
        for i in range(len(ts) - n + 1):
            grams.setdefault(" ".join(ts[i:i + n]), set()).add(d)
    out = {}
    for d, ts in toks.items():
        covered, positions = set(), 0
        for i in range(len(ts) - n + 1):
            if len(grams[" ".join(ts[i:i + n])]) >= min_docs:
                positions += 1
                covered.update(range(i, i + n))
        if positions:
            out[d] = (len(ts), positions, len(covered))
    return out


def _run(spark, rows, n=8, min_docs=2):
    got = duplicated_span_coverage(_docs(spark, rows), n=n, min_docs=min_docs).collect()
    return {r["doc_id"]: (r["n_tokens"], r["dup_positions"], r["covered_tokens"])
            for r in got}


WORDS = "w%d"


def _text(idxs):
    return " ".join(WORDS % i for i in idxs)


def test_shared_span_coverage_and_island_union(spark):
    # doc a and doc b share tokens 0..9 (three overlapping 8-grams in
    # each); the union of windows [0,8) [1,9) [2,10) is 10 tokens
    shared = list(range(10))
    rows = [
        ("a", _text(shared + [100, 101, 102])),
        ("b", _text([200, 201] + shared)),
    ]
    got = _run(spark, rows)
    assert got == _brute_coverage(rows)
    assert got["a"] == (13, 3, 10)
    assert got["b"] == (12, 3, 10)


def test_disjoint_islands_do_not_merge(spark):
    # two shared 8-spans separated by unique filler: coverage is 16,
    # not a merged 8+gap+8 span
    s1, s2 = list(range(8)), list(range(50, 58))
    rows = [
        ("a", _text(s1 + [300 + i for i in range(5)] + s2)),
        ("b", _text(s1 + [400 + i for i in range(9)] + s2)),
    ]
    got = _run(spark, rows)
    assert got == _brute_coverage(rows)
    assert got["a"][2] == 16
    assert got["b"][2] == 16


def test_intra_doc_repetition_is_not_corpus_duplication(spark):
    # doc repeats its own 8-gram twice but shares nothing with others:
    # min_docs counts DISTINCT docs, so no row for it
    span = list(range(8))
    rows = [
        ("self_rep", _text(span + [500] + span)),
        ("other", _text(range(600, 620))),
    ]
    got = _run(spark, rows)
    assert got == {}
    assert got == _brute_coverage(rows)


def test_short_docs_emit_no_grams(spark):
    rows = [("tiny", _text(range(7))), ("tiny2", _text(range(7)))]
    assert positional_grams(_docs(spark, rows)).count() == 0
    assert _run(spark, rows) == {}


def test_identical_docs_fully_covered(spark):
    body = list(range(20))
    rows = [("a", _text(body)), ("b", _text(body)), ("c", _text(range(700, 730)))]
    got = _run(spark, rows)
    assert got == _brute_coverage(rows)
    # 13 positions, union covers all 20 tokens
    assert got["a"] == (20, 13, 20)
    assert got["b"] == (20, 13, 20)
    assert "c" not in got


@pytest.mark.parametrize("seed", [0, 1])
def test_random_corpus_matches_brute_oracle(spark, seed):
    import random

    rng = random.Random(seed)
    vocab = 40  # small vocabulary so 8-gram collisions actually occur
    rows = []
    for d in range(12):
        n = rng.randint(5, 60)
        rows.append((f"d{d}", _text(rng.randrange(vocab) for _ in range(n))))
    # plant one guaranteed shared span
    shared = [rng.randrange(vocab) for _ in range(9)]
    rows.append(("p1", _text(shared)))
    rows.append(("p2", _text([39] + shared + [38])))
    got = _run(spark, rows)
    want = _brute_coverage(rows)
    assert got == want
    assert "p1" in got and "p2" in got


def test_null_text_counts_zero_tokens_in_stats(spark):
    """r13 (ADVICE r12): a NULL-text document must contribute 0 to
    total_tokens, not Spark's non-ANSI size(NULL) = -1. Exercises the
    q_doc_dup_span_stats aggregation path directly on a frame with a
    NULL text row."""
    from clearcare_data_pipeline_spark.operators.textstats import words_expr

    docs = spark.createDataFrame(
        [("a", "s1", "x " * 20), ("b", "s1", None)],
        "doc_id: string, source: string, text: string",
    )
    n_tokens = (
        F.when(F.col("text").isNull(), F.lit(0))
        .otherwise(F.size(words_expr(F.col("text"))))
        .alias("n_tokens")
    )
    got = {
        r["source"]: r["total"]
        for r in docs.select("source", n_tokens)
        .groupBy("source")
        .agg(F.sum("n_tokens").cast("long").alias("total"))
        .collect()
    }
    assert got == {"s1": 20}


def test_exact_n_token_doc_fully_covered(spark):
    """r13 boundary pin: a document of EXACTLY n tokens emits exactly
    one gram and, when duplicated, is fully covered (n_tokens =
    dup_positions * n = covered)."""
    n = 8
    shared = [f"s{i}" for i in range(n)]
    rows = [("a", " ".join(shared)), ("b", " ".join(shared + ["zq1"]))]
    got = _run(spark, rows, n=n)
    assert got["a"] == (n, 1, n)
    assert got["b"] == (n + 1, 1, n)  # only b's pos-0 gram is shared
    assert got == _brute_coverage(rows, n=n)


def test_islands_touching_at_exact_n_boundary(spark):
    """r13 boundary pin: duplicated positions p and p+n (islands that
    TOUCH, zero overlap) must contribute n tokens each — the lead()
    scan sees gap == n, least(n, n) = n, no merge and no double
    count."""
    n = 8
    s = [f"s{i}" for i in range(n)]
    t = [f"t{i}" for i in range(n)]
    rows = [
        ("a", " ".join(s + t)),  # dup grams at pos 0 and pos n only
        ("b", " ".join(s)),      # shares s-gram with a
        ("c", " ".join(t)),      # shares t-gram with a
    ]
    got = _run(spark, rows, n=n)
    assert got["a"] == (2 * n, 2, 2 * n)
    assert got == _brute_coverage(rows, n=n)


def test_islands_overlapping_by_one_token(spark):
    """r13 boundary pin: duplicated positions p and p+n-1 (maximal
    overlap of 1 token) cover 2n-1 tokens, not 2n — the first island
    is clipped to next_pos - pos = n-1."""
    n = 8
    u = [f"u{i}" for i in range(2 * n - 1)]
    rows = [
        ("a", " ".join(u)),          # dup grams at pos 0 and pos n-1
        ("b", " ".join(u[:n])),      # shares the pos-0 gram
        ("c", " ".join(u[n - 1:])),  # shares the pos-(n-1) gram
    ]
    got = _run(spark, rows, n=n)
    assert got["a"] == (2 * n - 1, 2, 2 * n - 1)
    assert got == _brute_coverage(rows, n=n)


# --- r13: trim policy (trim_duplicated_spans) ---------------------------


def _brute_trim(rows, n=8, min_docs=2):
    """Per-token oracle for the trim policy: cut every covered token,
    keep the rest, re-join with single spaces. One row per doc."""
    grams = {}
    toks = {d: _tokens(t or "") for d, t in rows}
    for d, ts in toks.items():
        for i in range(len(ts) - n + 1):
            grams.setdefault(" ".join(ts[i:i + n]), set()).add(d)
    out = {}
    for d, ts in toks.items():
        covered = set()
        for i in range(len(ts) - n + 1):
            if len(grams[" ".join(ts[i:i + n])]) >= min_docs:
                covered.update(range(i, i + n))
        kept = [t for i, t in enumerate(ts) if i not in covered]
        out[d] = (len(ts), len(kept), len(ts) - len(kept), " ".join(kept))
    return out


def _run_trim(spark, rows, n=8, min_docs=2):
    from clearcare_data_pipeline_spark.operators.spans import trim_duplicated_spans

    got = trim_duplicated_spans(_docs(spark, rows), n=n, min_docs=min_docs).collect()
    return {r["doc_id"]: (r["n_tokens"], r["kept_tokens"],
                          r["removed_tokens"], r["trimmed_text"]) for r in got}


def test_trim_cuts_middle_island_keeps_flanks(spark):
    n = 8
    s = [f"s{i}" for i in range(n)]
    pre, post = ["u1", "u2", "u3"], ["v1", "v2"]
    rows = [("a", " ".join(pre + s + post)), ("b", " ".join(s))]
    got = _run_trim(spark, rows, n=n)
    assert got["a"] == (13, 5, 8, "u1 u2 u3 v1 v2")
    assert got["b"] == (8, 0, 8, "")
    assert got == _brute_trim(rows, n=n)


def test_trim_touching_islands_cut_as_one_contiguous_range(spark):
    """Islands at pos 0 and pos n touch: the union [0, 2n) must be cut
    whole — no phantom token survives at the boundary."""
    n = 8
    s = [f"s{i}" for i in range(n)]
    t = [f"t{i}" for i in range(n)]
    rows = [("a", " ".join(s + t)), ("b", " ".join(s)), ("c", " ".join(t))]
    got = _run_trim(spark, rows, n=n)
    assert got["a"] == (2 * n, 0, 2 * n, "")
    assert got == _brute_trim(rows, n=n)


def test_trim_untouched_and_short_docs_pass_through_normalized(spark):
    """Docs with no duplicated spans keep every token; short and NULL
    docs keep their row with zero counts. trimmed_text is the token
    re-join for everyone (whitespace-normalized by design)."""
    rows = [("a", "alpha  beta\tgamma"), ("b", "tiny"), ("c", None)]
    got = _run_trim(spark, rows)
    assert got["a"] == (3, 3, 0, "alpha beta gamma")
    assert got["b"] == (1, 1, 0, "tiny")
    assert got["c"] == (0, 0, 0, "")


@pytest.mark.parametrize("seed", [7, 23, 99])
def test_trim_random_corpus_matches_brute_oracle(spark, seed):
    import random

    rng = random.Random(seed)
    vocab = 40
    rows = []
    for d in range(12):
        n = rng.randint(5, 60)
        rows.append((f"d{d}", _text(rng.randrange(vocab) for _ in range(n))))
    shared = [rng.randrange(vocab) for _ in range(9)]
    rows.append(("p1", _text(shared)))
    rows.append(("p2", _text([39] + shared + [38])))
    got = _run_trim(spark, rows)
    want = _brute_trim(rows)
    assert got == want
