"""Scalar / column-expression function library (all JVM-side builtins)."""

from clearcare_data_pipeline_spark.functions.cleaning import (  # noqa: F401
    clean_price_fields,
    flag_invalid_algorithm,
    normalize_code_type,
    normalize_headers,
    normalize_modifiers,
    normalize_text_fields,
    scrub_invalid_tokens,
    validate_code_format,
)
from clearcare_data_pipeline_spark.functions.text import (  # noqa: F401
    notes_concat,
    slugify,
    split_payer_name_id,
    squeeze_whitespace,
    zip_from_address,
)
