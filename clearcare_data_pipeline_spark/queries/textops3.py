"""Duplicated-span coverage queries (operators/spans.py) over the
``documents`` table — the exact-substring corpus-dedup signal at
fixed n-gram resolution, per document and rolled up per source.

New module (not textops/textops2) deliberately: the code-closure
provenance check (provenance.py) invalidates preserved gate entries
per MODULE, so new queries land in fresh files and leave the sf10
artifact's existing closures untouched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clearcare_data_pipeline_spark.queries._textsql import WORDS_SQL
from clearcare_data_pipeline_spark.operators.spans import (
    DUP_SPAN_MIN_DOCS,
    DUP_SPAN_N,
    duplicated_span_coverage,
    trim_duplicated_spans,
)
from clearcare_data_pipeline_spark.operators.textstats import words_expr
from clearcare_data_pipeline_spark.sources.tables import load_table


def q_doc_dup_span_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated-span coverage: for every document
    containing at least one 8-gram that also appears in another
    document, the number of duplicated positions and the token count
    of the UNION of their 8-token windows. The per-doc trim/drop
    signal of exact-substring dedup (Lee et al. 2022), computed with
    keyed ops only — see operators/spans.py for the 100 TB argument
    (linear in corpus tokens; hub grams cost occurrences, never
    occurrences²). Output is linear in document count: prod scale
    class."""
    docs = load_table(spark, sf_dir, "documents")
    return duplicated_span_coverage(docs, n=DUP_SPAN_N, min_docs=DUP_SPAN_MIN_DOCS)


def q_doc_dup_span_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus duplication burden per source: total documents/tokens
    against documents-with-duplicated-spans and their covered tokens
    — the dashboard aggregate a dedup pass is judged by (what
    fraction of each source is exact-duplicated content). All-integer
    output, one row per source at any scale."""
    docs = load_table(spark, sf_dir, "documents")
    cov = duplicated_span_coverage(docs, n=DUP_SPAN_N, min_docs=DUP_SPAN_MIN_DOCS)
    # NULL text must count 0 tokens in BOTH engines: Spark's
    # non-ANSI size(NULL) is -1 (would be summed into total_tokens),
    # DuckDB's len(NULL) is NULL (skipped by sum) — guard explicitly
    # rather than inherit either engine's default.
    per_doc = docs.select(
        "doc_id",
        "source",
        F.when(F.col("text").isNull(), F.lit(0))
        .otherwise(F.size(words_expr(F.col("text"))))
        .alias("n_tokens"),
    ).join(cov.select("doc_id", "dup_positions", "covered_tokens"), "doc_id", "left")
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count("covered_tokens").alias("docs_with_dups"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.coalesce(F.sum("covered_tokens"), F.lit(0)).cast("long").alias("covered_tokens"),
        F.coalesce(F.sum("dup_positions"), F.lit(0)).cast("long").alias("dup_positions"),
    )


def q_doc_dup_span_trimmed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The trim POLICY applied to the whole corpus (r13, Lee et al.
    2022 §4): every maximal duplicated island cut, remainder kept —
    one row per document with original/kept/removed token counts and
    the trimmed text (token-normalized single-space join). Output is
    linear in document count: prod scale class."""
    docs = load_table(spark, sf_dir, "documents")
    return trim_duplicated_spans(docs, n=DUP_SPAN_N, min_docs=DUP_SPAN_MIN_DOCS)


# DuckDB twins. Same tokenizer as the decontamination oracle; grams
# carry their 0-based position; the interval union is the identical
# least(n, lead(pos) - pos) island scan.
def _coverage_cte() -> str:
    n, md = DUP_SPAN_N, DUP_SPAN_MIN_DOCS
    words = WORDS_SQL
    return f"""
tok AS (
  SELECT doc_id, w, len(w) AS n_tokens
  FROM (SELECT doc_id, {words} AS w FROM documents)
),
posx AS (
  SELECT doc_id, n_tokens, w,
         unnest(range(0, n_tokens - {n} + 1)) AS pos
  FROM tok WHERE n_tokens >= {n}
),
grams AS (
  SELECT doc_id, n_tokens, pos,
         md5(array_to_string(w[pos + 1 : pos + {n}], ' ')) AS g
  FROM posx
),
dup AS (
  SELECT g FROM grams GROUP BY g HAVING count(DISTINCT doc_id) >= {md}
),
hits AS (
  SELECT doc_id, n_tokens, pos FROM grams JOIN dup USING (g)
),
cov AS (
  SELECT doc_id, n_tokens,
         least({n}, coalesce(lead(pos) OVER (PARTITION BY doc_id ORDER BY pos) - pos, {n})) AS c
  FROM hits
),
per_doc AS (
  SELECT doc_id, n_tokens,
         count(*) AS dup_positions,
         sum(c) AS covered_tokens
  FROM cov GROUP BY doc_id, n_tokens
)"""


def _per_doc_oracle() -> str:
    return f"""
WITH {_coverage_cte()}
SELECT doc_id, n_tokens, dup_positions, covered_tokens FROM per_doc
"""


def _stats_oracle() -> str:
    words = WORDS_SQL
    return f"""
WITH {_coverage_cte()},
all_docs AS (
  SELECT doc_id, source, coalesce(len({words}), 0) AS n_tokens FROM documents
)
SELECT a.source,
       count(*) AS n_docs,
       count(p.covered_tokens) AS docs_with_dups,
       sum(a.n_tokens) AS total_tokens,
       coalesce(sum(p.covered_tokens), 0) AS covered_tokens,
       coalesce(sum(p.dup_positions), 0) AS dup_positions
FROM all_docs a LEFT JOIN per_doc p USING (doc_id)
GROUP BY a.source
"""


def _trimmed_oracle() -> str:
    """Interval-subtraction replay of trim_duplicated_spans: islands
    by the identical lag() scan, then a per-token anti-join against
    island ranges — restricted to AFFECTED docs so the oracle's token
    explosion is bounded by trim volume, not corpus size; untouched
    docs take the direct token re-join."""
    n, md = DUP_SPAN_N, DUP_SPAN_MIN_DOCS
    words = WORDS_SQL
    return f"""
WITH tok AS (
  SELECT doc_id, {words} AS w FROM documents
),
posx AS (
  SELECT doc_id, w, unnest(range(0, len(w) - {n} + 1)) AS pos
  FROM tok WHERE len(w) >= {n}
),
grams AS (
  SELECT doc_id, pos, md5(array_to_string(w[pos + 1 : pos + {n}], ' ')) AS g
  FROM posx
),
dup AS (
  SELECT g FROM grams GROUP BY g HAVING count(DISTINCT doc_id) >= {md}
),
hits AS (SELECT doc_id, pos FROM grams JOIN dup USING (g)),
flagged AS (
  SELECT doc_id, pos,
         CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > {n}
              THEN 1 ELSE 0 END AS ni
  FROM hits
),
numbered AS (
  SELECT doc_id, pos,
         sum(ni) OVER (PARTITION BY doc_id ORDER BY pos) AS isl
  FROM flagged
),
islands AS (
  SELECT doc_id, min(pos) AS s, max(pos) + {n} AS e
  FROM numbered GROUP BY doc_id, isl
),
affected AS (SELECT DISTINCT doc_id FROM islands),
tp AS (
  SELECT t.doc_id, unnest(t.w) AS tok, generate_subscripts(t.w, 1) - 1 AS i
  FROM tok t JOIN affected USING (doc_id)
),
kept AS (
  SELECT tp.doc_id, tp.tok, tp.i FROM tp
  WHERE NOT EXISTS (
    SELECT 1 FROM islands il
    WHERE il.doc_id = tp.doc_id AND tp.i >= il.s AND tp.i < il.e
  )
),
agg AS (
  SELECT doc_id, count(*) AS kept_n,
         string_agg(tok, ' ' ORDER BY i) AS trimmed
  FROM kept GROUP BY doc_id
)
SELECT d.doc_id,
  CAST(coalesce(len(t.w), 0) AS BIGINT) AS n_tokens,
  CAST(CASE WHEN aff.doc_id IS NOT NULL THEN coalesce(a.kept_n, 0)
            ELSE coalesce(len(t.w), 0) END AS BIGINT) AS kept_tokens,
  CAST(coalesce(len(t.w), 0)
       - CASE WHEN aff.doc_id IS NOT NULL THEN coalesce(a.kept_n, 0)
              ELSE coalesce(len(t.w), 0) END AS BIGINT) AS removed_tokens,
  CASE WHEN aff.doc_id IS NOT NULL THEN coalesce(a.trimmed, '')
       ELSE coalesce(array_to_string(t.w, ' '), '') END AS trimmed_text
FROM documents d
LEFT JOIN tok t USING (doc_id)
LEFT JOIN affected aff USING (doc_id)
LEFT JOIN agg a USING (doc_id)
"""


QUERIES = {
    "doc_dup_span_coverage": q_doc_dup_span_coverage,
    "doc_dup_span_stats": q_doc_dup_span_stats,
    "doc_dup_span_trimmed": q_doc_dup_span_trimmed,
}

ORACLES = {
    "doc_dup_span_coverage": _per_doc_oracle(),
    "doc_dup_span_stats": _stats_oracle(),
    "doc_dup_span_trimmed": _trimmed_oracle(),
}
