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
