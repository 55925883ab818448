"""PII detection / redaction column expressions.

Training-data curation redacts (or drops) personally-identifiable
strings before a corpus ships.  The reference has no PII pass — this
is one of the LLM-data-pipeline operators the brief adds beyond the
reference surface (same family as dedup / quality scoring).

All patterns are restricted to syntax that Java's regex (Spark) and
RE2 (DuckDB) interpret identically — character classes, bounded
repetition, ``\\b`` word boundaries; no lookaround, no backrefs — so
the DuckDB oracle replays detection and redaction bit-for-bit.  Pure
built-in expressions: map-side, codegen'd, zero shuffle, UDF-free.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Pattern table shared by the Spark expressions and the generated
# oracle SQL (single source of truth; order = redaction order).
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\+1-[0-9]{3}-[0-9]{4}", "<PHONE>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
)


def pii_count(text: Column, pattern: str) -> Column:
    """Number of non-overlapping matches of ``pattern`` in ``text``."""
    # F.lit keeps the pattern out of the SQL parser (no escape mangling).
    return F.regexp_count(text, F.lit(pattern))


def pii_redact(text: Column) -> Column:
    """Replace every PII match with its tag, in ``PII_PATTERNS`` order
    (earlier redactions can't create later matches: tags contain no
    ``@``, digits, or dots)."""
    out = text
    for _, pattern, tag in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, tag)
    return out


def pii_counts(text: Column) -> dict[str, Column]:
    """One match-count column per PII kind, keyed by kind name."""
    return {kind: pii_count(text, pattern) for kind, pattern, _ in PII_PATTERNS}
