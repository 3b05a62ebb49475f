"""Ray Data operator hygiene helpers.

Ray 2.49's handling of EMPTY blocks breaks hash joins in three distinct
ways (each verified with a minimal repro on this box):

- ``map_batches`` does not call the UDF on empty blocks — it passes a
  ZERO-COLUMN block through instead, so a rename/cast/coerce UDF never
  sees them;
- ``Dataset.rename_columns`` leaves empty blocks with their OLD column
  names;
- ``Dataset.repartition(n)`` with fewer rows than partitions fabricates
  zero-column filler blocks.

Any of those on the right side of ``Dataset.join`` crashes the Acero
key lookup inside ``HashShuffleAggregator.finalize`` with
``ArrowInvalid: No match or multiple matches for key field reference``
(the aggregator concatenates the received right-side blocks, and a
zero-column or stale-schema block yields a table without the key).
The bug is data-dependent — it needs an empty block to exist, which at
small scale depends on how many read/map tasks the CPU count splits the
input into — so it surfaces as a flake.

:func:`fit_for_join` is the one-call vaccine: pin the schema and drop
empty blocks without moving any row through the driver.
"""
from __future__ import annotations

from typing import Iterable

import pyarrow as pa


def nonempty_block_refs(ds) -> list:
    """Object refs of the dataset's non-empty blocks (metadata check only —
    no block is fetched to the driver)."""
    bundle = ds.materialize()._plan.execute()
    return [r for r, m in zip(bundle.block_refs, bundle.metadata) if m.num_rows]


def fit_for_join(ds, schema: pa.Schema):
    """Return ``ds`` as a dataset whose every block is non-empty and cast
    to ``schema`` — the safe shape for either side of ``Dataset.join``.

    Blocks stay in the object store (``from_arrow_refs`` is zero-copy);
    only an empty dataset costs a driver-side empty table.  The cast runs
    per block via ``map_batches`` AFTER empties are dropped, so the UDF is
    guaranteed to run on every block.
    """
    import ray.data as rd

    refs = nonempty_block_refs(ds)
    if not refs:
        return rd.from_arrow(schema.empty_table())
    names = list(schema.names)

    def pin(t: pa.Table) -> pa.Table:
        return t.select(names).cast(schema)

    return rd.from_arrow_refs(refs).map_batches(pin, batch_format="pyarrow")


def concat_batches(batches: Iterable[pa.Table], schema: pa.Schema) -> pa.Table:
    """``pa.concat_tables`` tolerant of an empty iterator and of the
    zero-column empty blocks Ray emits (see module docstring)."""
    parts = [b for b in batches if b.num_rows]
    if not parts:
        return schema.empty_table()
    return pa.concat_tables(p.select(schema.names).cast(schema) for p in parts)


def salted_join(left, right, on: str, right_on: str | None = None,
                join_type: str = "inner", num_partitions: int = 8,
                salt: int = 8):
    """Skew-defeating hash join: when one join key is hot (a head domain,
    a null-ish sentinel, a viral url), a plain hash join sends EVERY row
    of that key to one aggregator and the stage serializes.  Salting
    splits the hot key across ``salt`` partitions:

    - each LEFT row gets a deterministic salt in [0, salt) derived from
      its position within its batch (any assignment works — correctness
      needs only that each left row carries exactly ONE salt value);
    - the RIGHT side is replicated ``salt`` times, once per salt value,
      so every (key, salt) cell still finds its full right match set;
    - the join runs on the composite (key, salt) key, bounding the
      largest partition by hot_key_rows / salt.

    Supports inner and left_outer (each left row joins the one replica
    set carrying its salt, so multiplicity and null semantics are
    unchanged).  Cost: right side storage and shuffle x ``salt`` — use it
    when right is the SMALL side and left is skewed, the standard regime.
    Result row set is identical to the unsalted join (asserted in
    tests/test_rayops.py).
    """
    import numpy as np
    import ray.data as rd  # noqa: F401  (kept for parity with callers)

    if join_type not in ("inner", "left_outer"):
        raise ValueError(f"salted_join supports inner/left_outer, "
                         f"not {join_type!r}")
    right_key = right_on or on

    def add_salt(t: pa.Table) -> pa.Table:
        s = np.arange(t.num_rows, dtype=np.int64) % salt
        return t.append_column("__salt", pa.array(s))

    def replicate(t: pa.Table) -> pa.Table:
        parts = []
        for s in range(salt):
            parts.append(t.append_column(
                "__rsalt", pa.array(
                    np.full(t.num_rows, s, dtype=np.int64))))
        return pa.concat_tables(parts)

    lsalted = left.map_batches(add_salt, batch_format="pyarrow")
    rsalted = right.map_batches(replicate, batch_format="pyarrow")
    joined = lsalted.join(rsalted, join_type=join_type,
                          num_partitions=num_partitions,
                          on=(on, "__salt"), right_on=(right_key, "__rsalt"))

    def strip(t: pa.Table) -> pa.Table:  # lazy — no plan execution here
        return t.drop_columns(
            [c for c in ("__salt", "__rsalt") if c in t.column_names])

    return joined.map_batches(strip, batch_format="pyarrow")
