"""CDC merge (upsert + delete) -- the lakehouse ingestion primitive.

A naive MERGE full-outer-joins base and updates on the key: a big-big
shuffle of the ENTIRE base table for every incremental batch.  The CDC
batch is almost always orders of magnitude smaller than the base, so this
implements the rewrite-only-what-changed plan instead:

    merged = (base ANTI-JOIN update_keys) UNION (updates minus tombstones)

The anti-join broadcasts the update KEYS (key columns only -- a few bytes
per changed row), so the 100 TB base is scanned once, never shuffled, and
every surviving base row streams straight to the output.  Updated rows,
inserted rows, and deletes all fall out of the same two-branch plan:
matched keys leave via the anti-join, their replacement rows (or nothing,
for tombstones) arrive via the union.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    delete_col: str | None = None,
    hint_small_updates: bool = True,
) -> DataFrame:
    """Row-level MERGE: rows of ``updates`` replace base rows with the same
    key (full-row overwrite, standard MERGE semantics), unmatched update
    rows insert, and rows flagged true in ``delete_col`` (if given) are
    tombstones -- their keys vanish from the result.

    ``updates`` must carry the base schema (plus the optional tombstone
    flag).  ``hint_small_updates`` broadcast-hints the key anti-join (the
    normal CDC shape); pass False for rare base-sized batches and let AQE
    choose.

    PRECONDITION: ``updates`` must be unique per key.  Standard MERGE
    raises when multiple source rows match one target key; this rewrite
    instead passes every such row through the union, silently emitting
    duplicates.  Compact the CDC batch to last-write-wins per key (e.g. a
    row_number over an ordering column) before calling.
    """
    value_cols = [c for c in base.columns if c not in key_cols]
    if delete_col is not None:
        live = updates.where(~F.coalesce(F.col(delete_col), F.lit(False))).drop(delete_col)
    else:
        live = updates
    touched_keys = updates.select(*key_cols).distinct()
    if hint_small_updates:
        touched_keys = F.broadcast(touched_keys)
    kept = base.join(touched_keys, key_cols, "left_anti")
    return kept.unionByName(live.select(*key_cols, *value_cols))
