"""Index export views: decode segment files back into relational tables.

Used by the driver-contract queries (__ray_entry__.py) and debugging: the
inverted index's packed blocks are streamed back out as plain
(term, doc_id, tf) rows so DuckDB oracles can check the whole build
pipeline end-to-end.  Everything is map_batches over the segment parquet
files — the decode streams block-by-block; the only broadcast is the
doc->doc_id forward mapping (ray.put once).
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .codecs import decode_varbyte


def _forward_map(index_dir: str):
    files = sorted(glob.glob(os.path.join(index_dir, "forward", "part=*.parquet")))
    if not files:
        return np.empty(0, np.uint64), np.empty(0, object)
    t = pq.read_table(files, columns=["doc", "doc_id"])
    doc = t["doc"].to_numpy(zero_copy_only=False).astype(np.uint64)
    order = np.argsort(doc)
    ids = np.asarray(t["doc_id"].to_pylist(), dtype=object)[order]
    return doc[order], ids


def _empty_dataset(schema: "pa.Schema"):
    import ray.data as rd

    return rd.from_arrow(schema.empty_table())


def _live_lookup(doc_sorted, id_sorted, tomb, docs):
    """Map segment doc u64s to doc_id strings; docs absent from the forward
    table (mid-compaction crash window) or tombstoned are DROPPED, matching
    what serving would return.  Returns (keep_mask, ids)."""
    if len(doc_sorted) == 0:
        # empty forward table (e.g. mid-compaction crash window): every
        # segment doc is dropped — id_sorted is empty and must not be indexed
        return np.zeros(len(docs), bool), np.empty(len(docs), dtype=object)
    rows = np.searchsorted(doc_sorted, docs)
    rows_c = np.minimum(rows, len(doc_sorted) - 1)
    present = doc_sorted[rows_c] == docs
    if tomb.size:
        present &= ~np.isin(docs, tomb)
    return present, id_sorted[rows_c]


def postings_dataset(index_dir: str):
    """Dataset of (term:string, doc_id:string, tf:int64) over all shards —
    LIVE docs only (tombstoned/forward-missing docs are excluded, matching
    serving)."""
    import ray
    import ray.data as rd

    from .updates import load_tombstones

    schema = pa.schema(
        [("term", pa.string()), ("doc_id", pa.string()), ("tf", pa.int64())]
    )
    from .store import glob_segments, segments_dataset

    files = glob_segments(os.path.join(index_dir, "segments", "shard=*"), "blocks")
    if not files:
        return _empty_dataset(schema)
    fwd_ref = ray.put((*_forward_map(index_dir), load_tombstones(index_dir)))

    def decode(batch: pa.Table) -> pa.Table:
        doc_sorted, id_sorted, tomb = ray.get(fwd_ref)
        terms_out, ids_out, tf_out = [], [], []
        terms = batch["term"].to_pylist()
        for i in range(batch.num_rows):
            docs = np.cumsum(
                decode_varbyte(batch["docs_vb"][i].as_py()), dtype=np.uint64
            )
            tfs = np.frombuffer(batch["tfs_f32"][i].as_py(), dtype="<f4")
            keep, ids = _live_lookup(doc_sorted, id_sorted, tomb, docs)
            terms_out.append(np.full(int(keep.sum()), terms[i], dtype=object))
            ids_out.append(ids[keep])
            # round, don't truncate: pretokenized Frequency overrides are
            # floats (riot's KeywordIndex.Frequency); this export view keeps
            # the integer-tf assumption but must not round 2.9999 down to 2
            tf_out.append(np.floor(tfs + 0.5).astype(np.int64)[keep])
        if not terms_out:
            return schema.empty_table()
        return pa.table(
            {
                "term": pa.array(np.concatenate(terms_out), pa.string()),
                "doc_id": pa.array(np.concatenate(ids_out), pa.string()),
                "tf": pa.array(np.concatenate(tf_out), pa.int64()),
            }
        )

    return segments_dataset(files, columns=["term", "n", "docs_vb", "tfs_f32"]).map_batches(
        decode, batch_format="pyarrow"
    )


def docmeta_dataset(index_dir: str):
    """Dataset of (doc_id:string, token_len:int64) — live docs only."""
    import ray
    import ray.data as rd

    from .updates import load_tombstones

    schema = pa.schema([("doc_id", pa.string()), ("token_len", pa.int64())])
    from .store import glob_segments, segments_dataset

    files = glob_segments(os.path.join(index_dir, "segments", "shard=*"), "docmeta")
    if not files:
        return _empty_dataset(schema)
    fwd_ref = ray.put((*_forward_map(index_dir), load_tombstones(index_dir)))

    def attach(batch: pa.Table) -> pa.Table:
        doc_sorted, id_sorted, tomb = ray.get(fwd_ref)
        doc = batch["doc"].to_numpy(zero_copy_only=False).astype(np.uint64)
        keep, ids = _live_lookup(doc_sorted, id_sorted, tomb, doc)
        return pa.table(
            {
                "doc_id": pa.array(ids[keep], pa.string()),
                "token_len": pa.array(
                    batch["token_len"].to_numpy(zero_copy_only=False).astype(np.int64)[keep],
                    pa.int64(),
                ),
            }
        )

    return segments_dataset(files).map_batches(attach, batch_format="pyarrow")


def termstats_dataset(index_dir: str):
    """Dataset of (term:string, df:int64)."""
    import ray.data as rd

    d = os.path.join(index_dir, "termstats")
    files = [os.path.join(d, f) for f in sorted(os.listdir(d)) if f.endswith(".parquet")]

    def cast(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "term": batch["term"].cast(pa.string()),
                "df": batch["df"].cast(pa.int64()),
            }
        )

    return rd.read_parquet(files).map_batches(cast, batch_format="pyarrow")
