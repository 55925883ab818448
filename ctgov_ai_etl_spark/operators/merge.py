"""Keyed merge (upsert) — the table-maintenance half of an ETL engine:
apply a batch of updates/inserts to a target by key (SCD type 1:
updates win, history overwritten).

The reference rebuilds its whole output list per run (etl.py:505-518
— full re-extract, no incremental path); a Spark engine gets
incrementality with one anti-join:

    merged = target ⟕anti updates  ∪  updates

which is the copy-on-write merge every lakehouse table format
(Delta/Iceberg/Hudi MERGE INTO) lowers to. At 100 TB the anti-join
shuffles both sides on the key unless the update batch broadcasts
(the common case — daily deltas are small; AQE promotes it at
runtime), and a real deployment partitions the target by a key prefix
or date so the rewrite touches only affected files (partition
pruning does file-level MoR for free).
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame


def merge_upsert(
    target: DataFrame, updates: DataFrame, keys: Iterable[str]
) -> DataFrame:
    """Rows of ``updates`` replace same-key rows of ``target``;
    update rows with no matching key are appended.  Schemas must
    match by name.  If ``updates`` carries duplicate keys the
    duplicates survive (resolve upstream — deterministic engines
    should not pick silently)."""
    keys = list(keys)
    kept = target.join(updates.select(*keys), keys, "left_anti")
    return kept.unionByName(updates)
