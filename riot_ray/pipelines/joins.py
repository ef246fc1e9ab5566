"""Public join operators for enrichment pipelines.

Two shapes, matching the two scale regimes (the same size logic the dedup
verify tails use internally via ``_attach_pair_payload``):

* ``broadcast_join`` — the dimension-table join: the small side is put in
  the object store ONCE (``ray.put``) and every map task does a vectorized
  sorted-key lookup per batch.  Zero shuffle of the big side; the small
  side must fit in worker memory (millions of rows, not billions).
* ``hash_join`` — both sides large: ONE sort-shuffle
  ``groupby(part).map_groups`` over the tagged union of the two sides
  (public wrapper over the engine's ``_hash_join``, which the dedup verify
  stages already trust; Ray 2.49's ``Dataset.join`` crashes on empty hash
  partitions).

Both are inner joins keyed on a single column, with the right side UNIQUE
on its key; ``broadcast_join(how="left")`` keeps unmatched left rows with
null payloads.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _small_side(right, right_on: str, payload: dict[str, str]):
    """(sorted keys ndarray, {out_name: pa.Array aligned to keys})."""
    if not isinstance(right, pa.Table):
        raise TypeError(
            "broadcast_join's small side must be a pyarrow Table "
            "(load dimension tables with pq.read_table; use hash_join "
            "when the right side is too big to hold in memory)"
        )
    keys = right[right_on].to_numpy(zero_copy_only=False)
    order = np.argsort(keys, kind="stable")
    if len(np.unique(keys)) != len(keys):
        raise ValueError(f"right side not unique on {right_on}")
    cols = {}
    take = pa.array(order, pa.int64())
    for src, out in payload.items():
        col = right[src]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        cols[out] = col.take(take)
    return keys[order], cols


def broadcast_join(
    big,
    small: pa.Table,
    left_on: str,
    right_on: str,
    payload: dict[str, str] | None = None,
    how: str = "inner",
):
    """Join a streaming Dataset against a small in-memory dimension table.

    ``small``: pyarrow Table (load it with ``pq.read_table`` — a dimension
    table never needs a Dataset).  ``payload`` maps right column -> output
    column (default: every non-key right column under its own name).
    The small side ships to the object store once; each batch resolves its
    keys with one ``np.searchsorted`` — no shuffle, no per-row Python."""
    import ray

    if how not in ("inner", "left"):
        raise ValueError(how)
    if payload is None:
        payload = {c: c for c in small.column_names if c != right_on}
    keys_sorted, cols = _small_side(small, right_on, payload)
    ref = ray.put((keys_sorted, cols))

    def join_batch(batch: pa.Table) -> pa.Table:
        from .sampling import lookup_sorted

        keys_s, payload_cols = ray.get(ref)
        lk = batch[left_on].to_numpy(zero_copy_only=False)
        pos, hit = lookup_sorted(keys_s, lk)
        if how == "inner":
            sel = np.flatnonzero(hit)
            out = batch.filter(pa.array(hit))
            idx = pa.array(pos[sel], pa.int64())
            for name, col in payload_cols.items():
                out = out.append_column(name, col.take(idx))
            return out
        # left: null payload where missed (take indices use None, not a
        # clamped 0, so an EMPTY dimension table yields all-null columns
        # instead of an out-of-bounds take)
        out = batch
        idx = pa.array(pos, pa.int64(), mask=~hit)  # null index -> null value
        for name, col in payload_cols.items():
            out = out.append_column(name, col.take(idx))
        return out

    return big.map_batches(join_batch, batch_format="pyarrow")


def hash_join(
    left,
    right,
    left_on: str,
    right_on: str,
    payload: dict[str, str] | None = None,
    num_partitions: int | None = None,
    left_schema: pa.Schema | None = None,
    right_schema: pa.Schema | None = None,
):
    """Distributed inner hash-join for two large Datasets (right unique on
    its key).  One sort-shuffle over the tagged union of both sides; only
    (key, payload) columns of the right side move.

    Pass ``left_schema``/``right_schema`` when the datasets are lazy
    transformed pipelines — ``Dataset.schema()`` on an unexecuted plan runs
    it once just to peek a row; each schema here is probed AT MOST once and
    forwarded so the underlying join never re-probes."""
    from .dedup import _hash_join, _join_parts

    if right_schema is None:
        rs = right.schema()
        right_schema = pa.schema(list(zip(rs.names, rs.types)))
    if payload is None:
        payload = {c: c for c in right_schema.names if c != right_on}
    if left_schema is None:
        ls = left.schema()
        left_schema = pa.schema(list(zip(ls.names, ls.types)))
    return _hash_join(
        left, right, left_on, right_on, payload, _join_parts(num_partitions),
        left_schema=left_schema, right_schema=right_schema,
    )
