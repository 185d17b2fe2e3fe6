"""Deterministic synthetic charges table derived from ``lineitem``.

The driver's correctness gate compares Spark queries against DuckDB on
the same parquet tables (BASELINE.md t2). There is no materialized
``charges_raw`` table, so we derive one deterministically from
``lineitem`` with a single SQL text written in the dialect subset both
Spark SQL and DuckDB parse identically — guaranteeing both engines see
byte-identical raw charges before the cleaning operators under test run.

The derivation intentionally injects every noise class from
FIXTURES.md §1: ``$``/``%`` money noise, the 999999999 placeholder,
non-positive prices, garbage numerics, ``N/A`` tokens, case/space slop,
raw code-type variants needing normalization (``MS-DRG``, ``icd-10``),
unknown types, blank codes/types (rule-3 XOR cases), drug unit/type
mismatches (rule-10), pipe/comma modifier slop, and exact duplicate
rows (every k % 97 == 0 row is emitted twice) for the dedup operators.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile
import time

from pyspark.sql import DataFrame, SparkSession

from clearcare_data_pipeline_spark.sources.tables import load_table

# Shared Spark-SQL/DuckDB dialect. `{lineitem}` is the relation name.
_CHARGES_SQL_TEMPLATE = """
WITH base AS (
  SELECT
    l_orderkey * 7 + l_linenumber             AS k,
    l_partkey                                 AS pk,
    l_suppkey                                 AS sk,
    CAST(FLOOR(l_extendedprice) AS BIGINT)    AS price_int,
    CAST(FLOOR(l_discount * 100) AS BIGINT)   AS disc_int,
    CAST(FLOOR(l_quantity) AS BIGINT)         AS qty_int
  FROM {lineitem}
),
proj AS (
  SELECT
    k,
    'Hospital ' || CAST(sk AS STRING)         AS hospital_name,
    CAST(10000 + pk % 89999 AS STRING)        AS zip_code,
    CASE WHEN k % 11 = 0 THEN ''
         WHEN k % 7 = 0 THEN 'XX'
         ELSE CASE k % 10
           WHEN 0 THEN lpad(CAST(pk % 100000 AS STRING), 5, '0')
           WHEN 1 THEN 'A' || lpad(CAST(pk % 10000 AS STRING), 4, '0')
           WHEN 2 THEN 'E11.' || CAST(pk % 10 AS STRING)
           WHEN 3 THEN lpad(CAST(pk % 1000 AS STRING), 3, '0')
           WHEN 4 THEN 'D' || lpad(CAST(pk % 10000 AS STRING), 4, '0')
           WHEN 5 THEN lpad(CAST(pk AS STRING), 10, '0')
           WHEN 6 THEN lpad(CAST(pk % 10000 AS STRING), 4, '0')
           WHEN 7 THEN 'J' || lpad(CAST(pk % 1000 AS STRING), 3, '0')
           WHEN 8 THEN 'L' || CAST(pk AS STRING)
           ELSE lpad(CAST(pk % 100000 AS STRING), 5, '0')
         END
    END                                       AS code,
    CASE k % 10
      WHEN 0 THEN 'CPT'    WHEN 1 THEN 'hcpcs' WHEN 2 THEN 'ICD'
      WHEN 3 THEN 'MS-DRG' WHEN 4 THEN 'CDT'   WHEN 5 THEN 'NDC'
      WHEN 6 THEN 'APC'    WHEN 7 THEN 'icd-10'
      WHEN 8 THEN 'LOCAL'  ELSE ''
    END                                       AS code_type,
    CASE WHEN k % 13 = 0 THEN 'N/A'
         WHEN k % 19 = 0 THEN 'not applicable'
         WHEN k % 17 = 0 THEN ''
         ELSE 'Procedure ' || CAST(pk AS STRING)
    END                                       AS description,
    CASE WHEN k % 10 = 5 AND k % 3 <> 0 THEN CAST(qty_int AS STRING)
         WHEN k % 23 = 0 THEN '5'
         ELSE ''
    END                                       AS drug_unit,
    CASE WHEN k % 10 = 5 AND k % 4 <> 0 THEN 'ML'
         WHEN k % 29 = 0 THEN 'GR'
         ELSE ''
    END                                       AS drug_type,
    CASE k % 6
      WHEN 0 THEN 'Aetna'
      WHEN 1 THEN '  Blue Cross Blue Shield '
      WHEN 2 THEN 'CIGNA'
      WHEN 3 THEN 'UnitedHealthcare'
      WHEN 4 THEN ''
      ELSE 'Medicare'
    END                                       AS payer_name,
    CASE k % 6
      WHEN 0 THEN 'AET001'
      WHEN 1 THEN 'BCBS'
      WHEN 3 THEN 'UHC'
      ELSE ''
    END                                       AS payer_id,
    CASE k % 5
      WHEN 0 THEN 'PPO' WHEN 1 THEN 'HMO' WHEN 2 THEN ''
      WHEN 3 THEN ' POS  ' ELSE 'EPO'
    END                                       AS plan_name,
    CASE k % 6
      WHEN 0 THEN '$' || CAST(price_int AS STRING)
      WHEN 1 THEN CAST(price_int AS STRING)
      WHEN 2 THEN '999999999'
      WHEN 3 THEN '0'
      WHEN 4 THEN 'N/A'
      ELSE ''
    END                                       AS negotiated_price,
    CASE k % 4
      WHEN 0 THEN CAST(disc_int AS STRING) || '%'
      WHEN 1 THEN CAST(disc_int AS STRING)
      ELSE ''
    END                                       AS negotiated_percentage,
    CASE k % 8
      WHEN 0 THEN 'percent of billed charges'
      WHEN 1 THEN '12345'
      WHEN 2 THEN '$ 99 %'
      ELSE ''
    END                                       AS negotiated_algorithm,
    CASE k % 5
      WHEN 0 THEN 'Fee Schedule'
      WHEN 1 THEN 'percent of total billed charges'
      WHEN 2 THEN 'Other'
      WHEN 3 THEN 'case rate'
      ELSE ''
    END                                       AS negotiated_methodology,
    CASE k % 3
      WHEN 0 THEN '$' || CAST(price_int + 100 AS STRING)
      WHEN 1 THEN CAST(price_int + 100 AS STRING)
      ELSE ''
    END                                       AS gross_charge,
    CASE WHEN k % 4 = 0 THEN CAST(price_int - 50 AS STRING) ELSE '' END
                                              AS discounted_cash_price,
    CASE WHEN k % 2 = 0 THEN CAST(price_int - 200 AS STRING) ELSE '' END
                                              AS min_price,
    CASE WHEN k % 3 = 0 THEN CAST(price_int + 200 AS STRING) ELSE '' END
                                              AS max_price,
    CASE k % 5
      WHEN 0 THEN '999999999'
      WHEN 1 THEN '-10'
      WHEN 2 THEN '$' || CAST(price_int AS STRING)
      ELSE ''
    END                                       AS estimated_amount,
    CASE k % 4
      WHEN 0 THEN 'Inpatient'
      WHEN 1 THEN 'outpatient '
      WHEN 2 THEN 'OUTPATIENT'
      ELSE ''
    END                                       AS setting,
    CASE WHEN k % 9 = 0 THEN 'See policy ' || CAST(sk AS STRING)
         WHEN k % 9 = 1 THEN 'n/a'
         ELSE ''
    END                                       AS additional_notes,
    CASE k % 7
      WHEN 0 THEN '26, tc'
      WHEN 1 THEN '59|TC'
      WHEN 2 THEN 'gz'
      WHEN 3 THEN '26 50'
      ELSE ''
    END                                       AS modifiers
  FROM base
)
SELECT hospital_name, zip_code, code, code_type, description, drug_unit,
       drug_type, payer_name, payer_id, plan_name, negotiated_price,
       negotiated_percentage, negotiated_algorithm, negotiated_methodology,
       gross_charge, discounted_cash_price, min_price, max_price,
       estimated_amount, setting, additional_notes, modifiers
FROM (
  SELECT p.* FROM proj p
  CROSS JOIN (SELECT 0 AS dup_i UNION ALL SELECT 1 AS dup_i) d
  WHERE d.dup_i = 0 OR p.k % 97 = 0
)
"""
# Planted-dup shape note (r8): the duplicated k%97 slice used to be a
# self-UNION ALL (`proj UNION ALL proj WHERE k%97=0`). Referencing proj
# twice made it multiply-referenced, which (a) forced the DuckDB oracle
# to MATERIALIZE the whole 42.8M-row x 22-string-column projection —
# ~65 GB of temp spill at sf10, more than this machine's free disk, the
# death of the r7 sf10 charges verify segment — and (b) cost Spark two
# lineitem scans + two projection passes, since an uncached CTE is
# inlined per consumer there too. The 2-row multiplier CROSS JOIN emits
# the identical multiset (every row once, the k%97 slice twice) from
# ONE reference: DuckDB pipelines the whole derivation with zero
# corpus-sized materialization, Spark plans one scan + a broadcast
# 2-row join. Same lesson at 100 TB: express row multiplication as a
# small-side join, never as a self-union of a fact-sized relation.


def charges_sql(lineitem_relation: str = "lineitem") -> str:
    """The derivation SQL against a named lineitem relation — used
    verbatim by the DuckDB oracle (as a CTE body) and by Spark."""
    return _CHARGES_SQL_TEMPLATE.format(lineitem=lineitem_relation)


# per-process memo of materialized derivations: sf_dir -> parquet path
_CHECKPOINTS: dict[str, str] = {}


def _cache_root() -> str:
    """Cross-process stage-checkpoint cache directory.

    Defaults under the system temp dir so repeated bench/test runs on
    the same machine reuse warm derivations instead of rebuilding them
    (VERDICT r3 ask #1: ``derivation_sec`` ~0 on a warm cache). Override
    with ``SPARK_GRAFT_CACHE_DIR``; set it to a fresh dir to force cold.

    The default is per-user (``clearcare_stage_cache-<uid>``, mode
    0o700) so on a shared machine another user can neither squat the
    path nor pre-plant a digest-predictable directory that would poison
    the correctness gate (ADVICE r4).
    """
    explicit = os.environ.get("SPARK_GRAFT_CACHE_DIR")
    if explicit:
        root = explicit
        os.makedirs(root, exist_ok=True)
    else:
        uid = os.getuid() if hasattr(os, "getuid") else "u"
        root = os.path.join(tempfile.gettempdir(), f"clearcare_stage_cache-{uid}")
        os.makedirs(root, mode=0o700, exist_ok=True)
        st = os.stat(root)
        if hasattr(os, "getuid") and st.st_uid != os.getuid():
            raise RuntimeError(
                f"stage cache root {root!r} is owned by uid {st.st_uid}, "
                "not the current user; refusing to trust cached entries "
                "(set SPARK_GRAFT_CACHE_DIR to a private directory)"
            )
    _sweep_stale_tmp(root)
    return root


def _sweep_stale_tmp(root: str, max_age_sec: float = 86400.0) -> None:
    """Opportunistically remove ``*.tmp-*`` build directories leaked by
    crashed writers (ADVICE r4): anything older than a day cannot belong
    to a live build on this machine."""
    try:
        now = time.time()
        for name in os.listdir(root):
            if ".tmp-" not in name:
                continue
            full = os.path.join(root, name)
            try:
                if now - os.stat(full).st_mtime > max_age_sec:
                    shutil.rmtree(full, ignore_errors=True)
            except OSError:
                continue
    except OSError:
        pass


def _source_fingerprint(sf_dir: str) -> str:
    """Fingerprint of the lineitem parquet the derivation reads
    (file names + sizes + mtimes) so a regenerated testdata dir
    invalidates the cache."""
    target = os.path.join(sf_dir, "lineitem.parquet")
    parts: list[str] = []
    # st_mtime_ns, not whole-second st_mtime: a dataset regenerated
    # within the same second with size-preserving edits must still
    # invalidate the cache (ADVICE r4).
    if os.path.isdir(target):
        for name in sorted(os.listdir(target)):
            st = os.stat(os.path.join(target, name))
            parts.append(f"{name}:{st.st_size}:{st.st_mtime_ns}")
    elif os.path.isfile(target):
        st = os.stat(target)
        parts.append(f"{os.path.basename(target)}:{st.st_size}:{st.st_mtime_ns}")
    return ";".join(parts)


def stage_cache_path(kind: str, sf_dir: str, version_key: str) -> str:
    """Deterministic cache location keyed by (stage kind, sf dir,
    generator version, input fingerprint). Any change to the generator
    source or the input parquet yields a new directory, so stale
    results can never be served."""
    # Canonicalize before keying: a relative and an absolute spelling
    # of the same dataset must hit the same cache entry (observed: a
    # relative ".localdata/sf10" rebuilt a 2.5 GB extract stage that
    # already existed under its absolute-path key).
    sf_dir = os.path.realpath(sf_dir)
    digest = hashlib.sha256(
        (version_key + "\x00" + _source_fingerprint(sf_dir)).encode()
    ).hexdigest()[:16]
    slug = sf_dir.strip("/").replace("/", "_")
    return os.path.join(_cache_root(), f"{kind}-{slug}-{digest}")


def ensure_stage_cached(path: str, build) -> str:
    """Materialize ``build(tmp_path)`` into ``path`` exactly once.

    Concurrency-safe via write-to-temp + atomic ``os.rename``: a
    half-written directory is never visible under ``path``, and a race
    loser just discards its temp copy. A directory present WITHOUT a
    ``_SUCCESS`` marker (crashed non-atomic writer, or a Spark conf
    that suppresses the marker) is treated as stale: it is removed and
    replaced by the fresh build rather than returned (ADVICE r4). The
    temp build dir is removed even when ``build`` raises."""
    if os.path.isdir(path) and os.path.exists(os.path.join(path, "_SUCCESS")):
        return path
    tmp = f"{path}.tmp-{os.getpid()}"
    try:
        build(tmp)
        try:
            os.rename(tmp, path)
        except OSError:
            if os.path.exists(os.path.join(path, "_SUCCESS")):
                # another process won the race with a complete copy
                pass
            else:
                # stale/incomplete directory squatting the path —
                # replace it with the known-good fresh build. The
                # rmtree->rename window can race a concurrent repairer
                # or builder (ADVICE r5): re-apply the same
                # accept-a-complete-winner rule instead of raising.
                shutil.rmtree(path, ignore_errors=True)
                try:
                    os.rename(tmp, path)
                except OSError:
                    if not os.path.exists(os.path.join(path, "_SUCCESS")):
                        raise
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return path


def charges_from_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark side of the shared derivation (all-string canonical table).

    The derivation is materialized once per session as a parquet
    checkpoint and all consumers scan that file. This is the
    extract->clean stage boundary, which the reference materializes as
    the extracted CSV (SURVEY.md §3). The checkpoint (a) lets every
    downstream query/stage share one derivation pass, (b) gives the
    cleaning chain a splittable, parallel scan with real predicate
    pushdown and column pruning, and (c) stops the optimizer
    substituting the 22 derivation CASE trees into downstream
    validation predicates (observed: a 45 KB substituted filter pushed
    below the scan's repartition, serializing the pipeline onto one
    task). In the production pipeline this boundary is etl.py's
    extracted-parquet checkpoint.

    The checkpoint persists across processes in a content-keyed cache
    (the key hashes the derivation SQL and the lineitem parquet
    fingerprint), so repeated bench runs at the same sf pay the
    derivation exactly once per (generator version, dataset) instead
    of once per process.
    """
    if sf_dir not in _CHECKPOINTS:
        path = stage_cache_path("extract", sf_dir, _CHARGES_SQL_TEMPLATE)

        def _build(tmp: str) -> None:
            load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
            spark.sql(charges_sql("lineitem")).write.mode("overwrite").parquet(tmp)

        _CHECKPOINTS[sf_dir] = ensure_stage_cached(path, _build)
    return spark.read.parquet(_CHECKPOINTS[sf_dir])
