"""Raw-MRF exploration utilities (SURVEY.md §2 S7/S8).

* ``schema_tree``: structure discovery for an unknown JSON MRF — the
  Spark-native form of the reference's ijson prefix-event walk
  (json_explorer.py:6-18): infer the schema from a read, pretty-print
  the key tree with types.
* ``sample_mrf``: head-sample of a raw MRF (json_sampler.py:18-33) —
  7 metadata keys with a "Not Found" default plus bounded slices of
  the nested arrays.
"""

from __future__ import annotations

import json

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DataType, StructType

_SAMPLE_META_KEYS = [
    "hospital_name",
    "hospital_location",
    "hospital_address",
    "last_updated_on",
    "version",
    "license_information",
    "affirmation",
]


def _walk(dt: DataType, name: str, indent: int, lines: list[str]) -> None:
    pad = "  " * indent
    if isinstance(dt, StructType):
        if name:
            lines.append(f"{pad}- {name} (struct)")
        for f in dt.fields:
            _walk(f.dataType, f.name, indent + (1 if name else 0), lines)
    elif isinstance(dt, ArrayType):
        lines.append(f"{pad}- {name} (array)")
        _walk(dt.elementType, "[]", indent + 1, lines)
    else:
        lines.append(f"{pad}- {name} ({dt.simpleString()})")


def schema_tree(spark: SparkSession, path: str) -> str:
    """S7: deduped, indented ``- key (type)`` tree of a JSON MRF."""
    schema = spark.read.option("multiLine", True).json(path).schema
    lines: list[str] = []
    _walk(schema, "", 0, lines)
    return "\n".join(lines)


def sample_mrf(
    spark: SparkSession,
    path: str,
    *,
    n_charge_items: int = 100,
    n_modifiers: int = 50,
) -> dict:
    """S8: head-sample — metadata keys (default "Not Found") + bounded
    slices of standard_charge_information / modifier_information."""
    doc = spark.read.option("multiLine", True).json(path)
    cols = set(doc.columns)

    def _jsonable(name: str):
        # to_json only accepts struct/array/map; scalars pass through
        dt = doc.schema[name].dataType
        col = F.col(name)
        return F.to_json(col) if isinstance(dt, (StructType, ArrayType)) else col.cast("string")

    selections = [
        (_jsonable(k) if k in cols else F.lit(None)).alias(k) for k in _SAMPLE_META_KEYS
    ]
    for arr, limit in [
        ("standard_charge_information", n_charge_items),
        ("modifier_information", n_modifiers),
    ]:
        sel = (
            F.to_json(F.slice(F.col(arr), 1, limit)) if arr in cols else F.lit(None)
        ).alias(arr)
        selections.append(sel)
    row = doc.select(*selections).first()

    out: dict = {}
    for k in _SAMPLE_META_KEYS:
        raw = row[k]
        if raw is None:
            out[k] = "Not Found"
        else:
            try:
                out[k] = json.loads(raw)
            except (ValueError, TypeError):
                out[k] = raw
    for arr in ["standard_charge_information", "modifier_information"]:
        raw = row[arr]
        out[arr] = json.loads(raw) if raw is not None else []
    return out


def batch_explore(
    spark: SparkSession,
    registry,
    raw_path_for,
    *,
    healthcare_system: str | None = None,
) -> dict[str, str | dict]:
    """C2 batch driver (batch_json_explorer.py:30-51): run structure
    discovery over every campus of a healthcare system, logging
    failures and continuing. ``raw_path_for(campus_row) -> path``."""
    rows = registry.collect()
    if healthcare_system is not None:
        rows = [r for r in rows if (r["healthcare_system"] or "") == healthcare_system]
    results: dict[str, str | dict] = {}
    for row in rows:
        campus = row["campus_id"]
        try:
            results[campus] = schema_tree(spark, raw_path_for(row))
        except Exception as e:  # log-and-continue, per the reference
            results[campus] = {"error": f"{type(e).__name__}: {e}"}
    return results
