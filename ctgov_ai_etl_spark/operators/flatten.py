"""Nested-study flatten operator (reference R5 + R6).

Reproduces the observable semantics of the reference's
``transform_study_data`` (/root/reference/etl.py:178-229): select 10
leaf fields from 5 nested modules, default missing values to the
``'N/A'`` sentinel, and derive ``start_year`` with the exact string
rule of /root/reference/etl.py:199-201 — dashed date → prefix before
the first dash; undashed (e.g. bare ``"2013"``) or missing → 'N/A'.

Spark-first: one vectorized ``select`` over a nested StructType —
the reference's per-row driver loop (etl.py:502-505) vanishes into
whole-stage codegen, and Catalyst prunes the unread parts of the
struct at the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

NA = "N/A"

# flat column -> dotted path inside the raw-study struct
# (paths navigated by /root/reference/etl.py:188-215)
FIELD_PATHS: dict[str, str] = {
    "nct_id": "protocolSection.identificationModule.nctId",
    "brief_title": "protocolSection.identificationModule.briefTitle",
    "official_title": "protocolSection.identificationModule.officialTitle",
    "overall_status": "protocolSection.statusModule.overallStatus",
    "study_type": "protocolSection.designModule.studyType",
    "start_date": "protocolSection.statusModule.startDateStruct.date",
    "gender": "protocolSection.eligibilityModule.sex",
    "brief_summary": "protocolSection.descriptionModule.briefSummary",
    "detailed_description": "protocolSection.descriptionModule.detailedDescription",
    "criteria": "protocolSection.eligibilityModule.eligibilityCriteria",
}

# Consumed by the extended engine only; the reference declares these in
# its CSV header but never computes them (etl.py:450-451 vs 217-229).
EXTENDED_FIELD_PATHS: dict[str, str] = {
    "minimum_age": "protocolSection.eligibilityModule.minimumAge",
    "maximum_age": "protocolSection.eligibilityModule.maximumAge",
}


def flatten_fields(extended: bool = False) -> str:
    """The server-side projection (comma-joined dotted paths, the
    CTGov v2 ``fields`` syntax) covering exactly what
    :func:`flatten_studies` reads — pass as the REST source's
    ``fields`` option so the API returns ~10 leaves per study instead
    of the full document (sources/rest.py; the transfer-volume
    analogue of parquet column pruning)."""
    paths = dict(FIELD_PATHS)
    if extended:
        paths |= EXTENDED_FIELD_PATHS
    return ",".join(paths.values())


def _na(col: Column) -> Column:
    return F.coalesce(col, F.lit(NA))


def start_year_col(start_date: Column) -> Column:
    """Exact reference rule (/root/reference/etl.py:199-201):
    ``start_date.split('-')[0]`` iff the value is non-missing AND
    contains a dash; otherwise 'N/A' (verified in SURVEY.md §1.2:
    bare "2013" yields 'N/A', "2013-05" yields "2013")."""
    return F.when(
        (start_date != NA) & start_date.contains("-"),
        F.split_part(start_date, F.lit("-"), F.lit(1)),
    ).otherwise(F.lit(NA))


def flatten_studies(raw: DataFrame, extended: bool = False) -> DataFrame:
    """raw-study struct rows (column ``study``) → flat 11-column frame.

    With ``extended=True`` also extracts minimum_age / maximum_age —
    the columns the reference's sink declares but never fills (R18).
    """
    cols = [_na(F.col(f"study.{p}")).alias(name) for name, p in FIELD_PATHS.items()]
    if extended:
        cols += [
            _na(F.col(f"study.{p}")).alias(name)
            for name, p in EXTENDED_FIELD_PATHS.items()
        ]
    flat = raw.select(*cols)
    return flat.withColumn("start_year", start_year_col(F.col("start_date")))
