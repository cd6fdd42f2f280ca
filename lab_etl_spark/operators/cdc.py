"""Change-data-capture MERGE emulation over plain parquet lake tables.

Delta/Iceberg expose ``MERGE INTO`` as a table-format primitive; on raw
parquet the same semantics are a single full-outer join against the change
batch (keyed on the business key) plus per-row action resolution:

    matched   + op='U'  -> updated row (op=NULL is treated as 'U')
    matched   + op='D'  -> dropped
    matched   + op='I'  -> treated as update (idempotent upsert re-delivery)
    unmatched change 'I' -> inserted row
    unmatched change 'U' -> upsert-style insert (late insert seen as update)
    unmatched change 'D' -> no-op (delete of a row that never arrived)
    unmatched base       -> kept as-is

One shuffle on the key for each side; at 100 TB the change batch is
typically orders of magnitude smaller than the base, so AQE picks a
broadcast or shuffled-hash join on its own — no hint needed, and the base
table is never collected or rewritten driver-side.

Reference parity note: lab-etl has no mutation surface (it re-parses files
idempotently — see SURVEY.md §2A sinks); MERGE is part of the §2B lakehouse
extension the driver mandates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: change-operation column values understood by merge_upsert
OP_UPDATE, OP_DELETE, OP_INSERT = "U", "D", "I"


def merge_upsert(
    base: DataFrame,
    changes: DataFrame,
    key: str,
    op_col: str = "op",
) -> DataFrame:
    """Apply a change batch to ``base`` and return the merged table.

    ``changes`` must carry the key column, ``op_col`` (U/D/I), and the same
    payload columns as ``base``; for U/I rows the payload holds the new
    values (payload of D rows is ignored).  Column set of the result equals
    ``base.columns``.  Change rows with a NULL key are DROPPED: a NULL
    business key can't address any base row, and before this filter such a
    row satisfied the base-only keep branch after the full-outer join and
    leaked into the result as an all-NULL row.
    """
    payload = [c for c in base.columns if c != key]
    b = base.select(
        F.col(key).alias("_bk"), *[F.col(c).alias(f"_b_{c}") for c in payload]
    )
    c = changes.filter(F.col(key).isNotNull()).select(
        F.col(key).alias("_ck"),
        F.col(op_col).alias("_op"),
        *[F.col(col).alias(f"_c_{col}") for col in payload],
    )
    joined = b.join(c, b._bk == c._ck, "full_outer")
    # null-safe delete test: a malformed change row with op=NULL must act
    # as an upsert, not silently satisfy neither branch and vanish the
    # base row (three-valued logic made `_op != 'D'` NULL, i.e. falsy)
    not_delete = ~F.col("_op").eqNullSafe(OP_DELETE)
    keep = (
        # base row with no change, or change row that isn't a pure delete
        (F.col("_ck").isNull())
        | (F.col("_ck").isNotNull() & not_delete)
    )
    take_change = F.col("_ck").isNotNull() & not_delete
    cols = [F.coalesce("_bk", "_ck").alias(key)] + [
        F.when(take_change, F.col(f"_c_{col}"))
        .otherwise(F.col(f"_b_{col}"))
        .alias(col)
        for col in payload
    ]
    return joined.filter(keep).select(*cols)
