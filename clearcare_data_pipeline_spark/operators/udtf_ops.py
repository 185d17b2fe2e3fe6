"""Python UDTF (Spark 4 user-defined table function) demonstration.

One lateral-join capable table function: sentence explosion with
per-sentence ordinals. UDTFs run row-at-a-time in Python — the slow
path by this repo's own rules — so the production equivalent of this
exact operator is the pure-column-expression split in
operators/chunking.py; the UDTF exists to cover the API surface a
user migrating custom table functions needs (including TABLE()
lateral syntax), not to be the hot path.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf

_SENT_RE = re.compile(r"[.!?]+\s+|[.!?]+$")


@udtf(returnType="sent_no int, sentence string")
class SplitSentences:
    """Yield (ordinal, sentence) rows for one document's text."""

    def eval(self, text: str):  # noqa: ANN001 - UDTF protocol
        if not text:
            return
        parts = [p.strip() for p in _SENT_RE.split(text)]
        for i, p in enumerate(p for p in parts if p):
            yield i, p


def explode_sentences(spark: SparkSession, docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Lateral-join the UDTF against each document row."""
    spark.udtf.register("split_sentences", SplitSentences)
    docs.createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        f"SELECT d.doc_id, s.sent_no, s.sentence "
        f"FROM _udtf_docs d, LATERAL split_sentences(d.{text_col}) s"
    )
