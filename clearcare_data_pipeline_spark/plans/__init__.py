"""Query plans: validation-rule predicate library and devlog metrics."""

from clearcare_data_pipeline_spark.plans.rules import (  # noqa: F401
    RULE_NAMES,
    rule_predicates,
    split_clean_quarantine,
    tag_violations,
)
