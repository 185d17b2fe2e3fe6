"""Document chunking and PII masking — training-data prep operators.

Both are pure column-expression operators (no UDFs, whole-stage
codegen, shuffle-free): chunking turns each document into overlapping
token-window rows ready for embedding/tokenization, masking scrubs
contact-like substrings before a corpus leaves the pipeline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from clearcare_data_pipeline_spark.operators.textstats import words_expr


def chunk_documents(
    df: DataFrame,
    *,
    chunk_tokens: int = 128,
    overlap: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split each document into overlapping token windows.

    Output: one row per (doc, chunk) with ``chunk_id`` (0-based),
    ``start_token``, ``n_tokens`` and the re-joined ``chunk_text``.
    Stride = chunk_tokens - overlap; a final partial window is kept
    only when it contributes tokens beyond the previous chunk's
    coverage: a start ``s > 0`` whose window is fully inside the prior
    chunk (``s + overlap >= n``, since the prior chunk ends at
    ``s + overlap``) would emit pure duplicate training text, so it is
    dropped — every token still appears in some chunk. Pure per-row
    fan-out — the plan is scan -> project -> posexplode, no shuffle at
    all, so it scales linearly with corpus bytes.
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    stride = chunk_tokens - overlap
    # Tokens staged as a projection column: the per-start lambdas read
    # the array (and its size) repeatedly, and Catalyst does not hoist
    # lambda-invariant subtrees (r7 lesson, textstats.hashed_tf_expr) —
    # an inline split would re-tokenize once per candidate start.
    toks = F.col("_toks")
    n = F.size(toks)
    starts = F.filter(
        F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(stride)),
        lambda s: (s == F.lit(0)) | (s + F.lit(overlap) < n),
    )
    chunks = F.filter(
        F.transform(
            starts,
            lambda s: F.struct(
                s.alias("start"),
                F.least(F.lit(chunk_tokens), n - s).alias("len"),
                F.array_join(F.slice(toks, s + 1, chunk_tokens), " ").alias("txt"),
            ),
        ),
        lambda c: c["len"] > 0,
    )
    staged = df.select(
        F.col(id_col).alias("doc_id"),
        words_expr(F.col(text_col)).alias("_toks"),
    )
    return staged.select(
        "doc_id",
        F.posexplode(chunks).alias("chunk_id", "c"),
    ).select(
        "doc_id",
        "chunk_id",
        F.col("c.start").cast("int").alias("start_token"),
        F.col("c.len").cast("int").alias("n_tokens"),
        F.col("c.txt").alias("chunk_text"),
    )


# Conservative contact-like patterns; callers chain more as needed.
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\+?\d{3}[-. ]\d{3,4}[-. ]\d{4}"
_SSN_RE = r"\d{3}-\d{2}-\d{4}"


def mask_pii_expr(text: Column) -> Column:
    """Replace email / phone / SSN-shaped substrings with typed tags.
    Order matters: SSNs are masked before phone shapes so the narrower
    pattern wins."""
    out = F.regexp_replace(text, _EMAIL_RE, "<EMAIL>")
    out = F.regexp_replace(out, _SSN_RE, "<ID>")
    out = F.regexp_replace(out, _PHONE_RE, "<PHONE>")
    return out


def mask_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn(text_col, mask_pii_expr(F.col(text_col)))


def pii_mask_sql(col: str) -> str:
    """DuckDB mirror of mask_pii_expr. SQL single-quoted strings pass
    backslashes through verbatim, so the Python raw patterns interpolate
    unchanged; the 'g' flag = replace-all, which is Spark's default."""
    out = f"regexp_replace({col}, '{_EMAIL_RE}', '<EMAIL>', 'g')"
    out = f"regexp_replace({out}, '{_SSN_RE}', '<ID>', 'g')"
    out = f"regexp_replace({out}, '{_PHONE_RE}', '<PHONE>', 'g')"
    return out
