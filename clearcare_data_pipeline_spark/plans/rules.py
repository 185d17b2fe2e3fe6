"""The 10 CMS conditional validation rules as named Column predicates.

Re-expressed from the reference rule masks
(``apply_conditional_rules``, cleaning_utils.py:21-54; SURVEY.md §3).
A TRUE predicate means *violation*. The tagging plan computes every
rule exactly once in a single projection; the clean/quarantine split is
two filters over the same tagged plan (one pass each, no Python).

"Present" semantics — a DECLARED DIVERGENCE from the reference (like
D1 chunk-local dedup, SURVEY.md §7): a price field (DOUBLE after F1)
is present when non-NULL; a text field is present when non-NULL and
non-blank after trimming. The reference instead tests ``.notna()``
AFTER ``normalize_text_fields``'s ``astype(str)``, which makes text
fields never-NaN — so its rules 1/5/9 can never fire on text absence
(a latent bug masked by the cast). This engine implements the rules'
documented *intent* (blank text = absent); the DuckDB oracle mirrors
these same predicates, so the gate validates dialect parity of the
intent semantics, not bug-for-bug reference parity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from clearcare_data_pipeline_spark.schema import PRICE_FIELDS

RULE_NAMES: list[str] = [f"rule_{i}" for i in range(1, 11)]


def _text_present(name: str) -> Column:
    c = F.col(name)
    return c.isNotNull() & (F.trim(c) != "")


def _num_present(name: str) -> Column:
    return F.col(name).isNotNull()


def rule_predicates() -> dict[str, Column]:
    """rule name -> violation predicate over the cleaned canonical table."""
    payer = _text_present("payer_name")
    plan = _text_present("plan_name")
    methodology = _text_present("negotiated_methodology")
    code = _text_present("code")
    code_type = _text_present("code_type")
    desc = _text_present("description")
    notes = _text_present("additional_notes")
    modifiers = _text_present("modifiers")
    drug_unit = _text_present("drug_unit")
    drug_type = _text_present("drug_type")
    algorithm = _text_present("negotiated_algorithm")

    neg_price = _num_present("negotiated_price")
    neg_pct = _num_present("negotiated_percentage")
    gross = _num_present("gross_charge")
    cash = _num_present("discounted_cash_price")
    min_p = _num_present("min_price")
    max_p = _num_present("max_price")
    est = _num_present("estimated_amount")

    any_price = F.lit(False)
    for p in PRICE_FIELDS:
        any_price = any_price | _num_present(p)

    return {
        # 1: a negotiated/gross figure without full payer context
        "rule_1": (neg_price | neg_pct | gross) & ~(payer & plan & methodology),
        # 2: any price without a billing code + type
        "rule_2": any_price & ~(code & code_type),
        # 3: code XOR code type
        "rule_3": code != code_type,
        # 4: methodology 'other' must be explained in notes
        "rule_4": (F.trim(F.col("negotiated_methodology")) == "other") & ~notes,
        # 5: described item with no charge figure at all
        "rule_5": desc & ~gross & ~cash & ~neg_price & ~neg_pct & ~algorithm,
        # 6: negotiated price without min/max bounds
        "rule_6": neg_price & ~(min_p & max_p),
        # 7: percentage/algorithm pricing without an estimated amount
        "rule_7": ~neg_price & (neg_pct | algorithm) & ~est,
        # 8: NDC rows must carry drug unit + type
        "rule_8": (F.trim(F.col("code_type")) == "NDC") & ~(drug_unit & drug_type),
        # 9: modifier-only rows need context
        "rule_9": modifiers & ~desc & ~neg_price & ~neg_pct & ~algorithm & ~notes,
        # 10: drug unit XOR drug type
        "rule_10": drug_unit != drug_type,
    }


def tag_violations(df: DataFrame) -> DataFrame:
    """Add one BOOLEAN column per rule plus ``rules_violated``
    (comma-joined tags, '' when clean) — computed in one projection so
    Catalyst shares subexpressions across the count/split consumers.

    ``rules_violated`` is built with ``concat_ws`` (which skips NULL
    operands) rather than the equivalent
    ``array_join(array_compact(array(...)))``: ``array_compact`` is a
    higher-order function, and HOFs never enter whole-stage codegen —
    the whole 10-predicate tree re-evaluated per row through the
    interpreted expression walker (``CreateArray.eval`` /
    ``ArrayFilter.eval``, boxed accessors, linear child-list walks).
    Measured at sf1: the interpreted form ran 1.1 s or 6.1 s per scan
    depending on per-process JIT luck over the shared interpreter
    methods; the concat_ws form stays inside codegen and is stable.
    Same output either way: both join the fired rule names with ','
    and yield '' for a clean row.
    """
    preds = rule_predicates()
    df = df.withColumns({name: pred for name, pred in preds.items()})
    tags = [F.when(F.col(name), F.lit(name)) for name in RULE_NAMES]
    return df.withColumn("rules_violated", F.concat_ws(",", *tags))


def split_clean_quarantine(tagged: DataFrame) -> tuple[DataFrame, DataFrame]:
    """R4: (clean, quarantine) from a ``tag_violations`` output.

    Callers that consume both sides should ``.persist()`` the tagged
    plan first — this is the one fork where naive Spark would otherwise
    scan the source twice (SURVEY.md §4).
    """
    is_clean = F.col("rules_violated") == ""
    clean = tagged.where(is_clean).drop(*RULE_NAMES, "rules_violated")
    quarantine = tagged.where(~is_clean).drop(*RULE_NAMES)
    return clean, quarantine
