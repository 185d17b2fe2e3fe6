"""Inter-document duplicated-span coverage (round 12).

The exact-substring dedup signal from "Deduplicating Training Data
Makes Language Models Better" (Lee et al., 2022 — public paper), at
fixed n-gram resolution so it distributes: a token position is
"duplicated" when the n-gram starting there also appears in at least
``min_docs - 1`` OTHER documents; a document's duplicated-span
coverage is the fraction of its tokens inside the union of those
n-gram windows. Training pipelines drop or trim documents whose
coverage exceeds a threshold — this operator computes the signal, it
does not decide the policy.

Why fixed-n instead of the paper's suffix array: a suffix array is a
global sequential structure (the paper builds it on one machine over
a concatenated corpus); fixed-n loses maximal-match lengths but every
stage becomes a keyed DataFrame op, which is the 100 TB shape:

  tokens -> positional n-grams (per-row array expr, no shuffle)
         -> md5 gram keys (32-byte keys instead of n-token strings)
         -> duplicated grams: ONE keyed agg (count distinct docs)
         -> hits: ONE keyed equi-join back
         -> coverage: per-doc window (gap-and-island union of
            fixed-length intervals), ONE partition-by-doc sort

Every stage is linear in corpus token count. Unlike the
contamination pair join (operators/dedup.py cross_corpus_
contamination), a hub n-gram appearing in millions of documents
costs its OCCURRENCE count here, never occurrences² — there is no
pair enumeration, so no max_df cap is needed for safety.

Reference basis: the reference repo has no corpus-dedup analytics at
all (757-line single-node pandas ETL); this is beyond-reference
surface for the LLM-pipeline family, same as operators/dedup.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from clearcare_data_pipeline_spark.operators.textstats import words_expr

DUP_SPAN_N = 8       # matches the decontamination shingle width
DUP_SPAN_MIN_DOCS = 2


def positional_grams(
    df: DataFrame,
    n: int = DUP_SPAN_N,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_tokens, pos, g): md5 of the n-token gram starting at
    0-based token ``pos``, one row per position — positions are the
    point of this operator, so no array_distinct (contrast
    dedup.shingles_expr, which dedups because set-membership is all
    MinHash needs). Tokens are staged in their own projection first —
    Catalyst does not hoist lambda-invariant subtrees, so an inline
    split would re-tokenize once per position (r7 lesson, see
    shingles_expr). Docs shorter than n tokens emit nothing: they
    cannot contain a duplicated n-span."""
    staged = df.select(
        F.col(id_col).alias("doc_id"), words_expr(F.col(text_col)).alias("_toks")
    ).select("doc_id", "_toks", F.size("_toks").alias("n_tokens"))
    grams = F.transform(
        F.sequence(F.lit(0), F.col("n_tokens") - n),
        lambda i: F.struct(
            i.alias("pos"),
            F.md5(F.array_join(F.slice("_toks", i + 1, n), " ")).alias("g"),
        ),
    )
    return (
        staged.where(F.col("n_tokens") >= n)
        .select("doc_id", "n_tokens", F.explode(grams).alias("pg"))
        .select("doc_id", "n_tokens", F.col("pg.pos").alias("pos"), F.col("pg.g").alias("g"))
    )


def _grams_by_key(
    df: DataFrame, n: int, id_col: str, text_col: str
) -> DataFrame:
    """Positional grams for the two span consumers (the duplicated-
    gram aggregate and the hits equi-join).

    r13 optimization note — measured and deliberately NOT shared: an
    explicit repartition("g") was tried so both consumers would reuse
    one Exchange, but the consumers' column pruning differs (the
    aggregate needs (g, doc_id), the join needs all four columns) and
    ColumnPruning pushes the narrower Project BELOW the repartition,
    splitting the exchanges again — runtime ReusedExchange stayed 0
    while the dup leg LOST its map-side partial aggregation. A
    localCheckpoint of the corpus-token-sized gram frame also lost
    (same-JVM A/B medians at sf0.1: original 2.215 s, repartition
    2.225 s, checkpoint 2.441 s). The duplicated tokenize+md5 below
    the two legs is reused at the scan exchange by AQE's runtime
    stage cache; what remains duplicated is cheaper than either
    alternative at every measured point."""
    return positional_grams(df, n, id_col, text_col)


def duplicated_span_coverage(
    df: DataFrame,
    n: int = DUP_SPAN_N,
    min_docs: int = DUP_SPAN_MIN_DOCS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document duplicated-span coverage: (doc_id, n_tokens,
    dup_positions, covered_tokens) for documents with at least one
    inter-document duplicated n-gram; covered_tokens is the size of
    the UNION of the n-token windows at duplicated positions.

    The union is gap-and-islands over sorted positions: each
    duplicated position covers min(n, next_pos - pos) new tokens
    (n for the last one) — fixed-length intervals make the classic
    island scan a single lead() window, no iterative merging.

    ``min_docs`` counts DISTINCT documents: an n-gram repeated only
    within one document is intra-doc repetition (doc_repetition_stats'
    signal), not corpus duplication."""
    grams = _grams_by_key(df, n, id_col, text_col)
    dup = (
        grams.groupBy("g")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .where(F.col("nd") >= min_docs)
        .select("g")
    )
    hits = grams.join(dup, "g").select("doc_id", "n_tokens", "pos")
    nxt = F.lead("pos").over(Window.partitionBy("doc_id").orderBy("pos"))
    covered = hits.select(
        "doc_id",
        "n_tokens",
        F.least(F.lit(n), F.coalesce(nxt - F.col("pos"), F.lit(n))).alias("cov"),
    )
    return covered.groupBy("doc_id", "n_tokens").agg(
        F.count(F.lit(1)).alias("dup_positions"),
        F.sum("cov").cast("long").alias("covered_tokens"),
    )


def duplicated_islands(
    df: DataFrame,
    n: int = DUP_SPAN_N,
    min_docs: int = DUP_SPAN_MIN_DOCS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Maximal duplicated islands per document: (doc_id, island_start,
    island_end) token ranges [start, end) — the union of the n-token
    windows at duplicated positions, merged where they overlap or
    touch. Fixed-length sorted intervals make island detection a
    single lag() comparison: a new island starts exactly when
    ``pos - prev_pos > n`` (``== n`` means the windows touch and the
    removed text range is contiguous)."""
    grams = _grams_by_key(df, n, id_col, text_col)
    dup = (
        grams.groupBy("g")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .where(F.col("nd") >= min_docs)
        .select("g")
    )
    hits = grams.join(dup, "g").select("doc_id", "pos")
    w = Window.partitionBy("doc_id").orderBy("pos")
    flagged = hits.withColumn(
        "new_isl",
        F.when(F.col("pos") - F.lag("pos").over(w) > n, F.lit(1)).otherwise(F.lit(0)),
    ).withColumn("isl", F.sum("new_isl").over(w))
    return flagged.groupBy("doc_id", "isl").agg(
        F.min("pos").alias("island_start"),
        (F.max("pos") + n).alias("island_end"),
    ).select("doc_id", "island_start", "island_end")


def trim_duplicated_spans(
    df: DataFrame,
    n: int = DUP_SPAN_N,
    min_docs: int = DUP_SPAN_MIN_DOCS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The trim POLICY on the duplicated-span signal (Lee et al. 2022
    §4 act on what duplicated_span_coverage measures): emit the corpus
    with every maximal duplicated island CUT, keeping the remainder.
    One row per input document:

      (doc_id, n_tokens, kept_tokens, removed_tokens, trimmed_text)

    ``trimmed_text`` is the kept tokens re-joined with single spaces —
    token-stream-normalized for ALL documents (also the untouched
    ones), so downstream tokenization is insensitive to original
    whitespace. Documents trimmed to nothing keep their row with
    kept_tokens = 0; NULL/short texts pass through with 0 tokens.

    Scale shape: islands per doc are few (bounded by n_tokens / n);
    the keep-filter is a per-doc array HOF against the broadcast-small
    island list OF THAT DOC (carried on the row by one keyed
    aggregation + one left join) — no shuffle beyond the signal
    computation itself, everything JVM-side."""
    islands = duplicated_islands(df, n, min_docs, id_col, text_col)
    per_doc = islands.groupBy("doc_id").agg(
        F.collect_list(F.struct("island_start", "island_end")).alias("_isl")
    )
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.coalesce(words_expr(F.col(text_col)), F.array()).alias("_toks"),
    )
    joined = toks.join(per_doc, "doc_id", "left").select(
        "doc_id",
        "_toks",
        F.coalesce(
            "_isl", F.array().cast("array<struct<island_start:int,island_end:int>>")
        ).alias("_isl"),
    )
    # filter-with-index: token i survives unless inside any island
    kept = F.filter(
        "_toks",
        lambda t, i: ~F.exists(
            "_isl",
            lambda s: (i >= s["island_start"]) & (i < s["island_end"]),
        ),
    )
    return joined.select(
        "doc_id",
        F.size("_toks").cast("long").alias("n_tokens"),
        F.size(kept).cast("long").alias("kept_tokens"),
        (F.size("_toks") - F.size(kept)).cast("long").alias("removed_tokens"),
        F.array_join(kept, " ").alias("trimmed_text"),
    )
