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
    t = pq.read_table(files, columns=["doc", "doc_id"])
    doc = t["doc"].to_numpy(zero_copy_only=False).astype(np.uint64)
    order = np.argsort(doc)
    ids = np.asarray(t["doc_id"].to_pylist(), dtype=object)[order]
    return doc[order], ids


def postings_dataset(index_dir: str):
    """Dataset of (term:string, doc_id:string, tf:int64) over all shards."""
    import ray
    import ray.data as rd

    fwd_ref = ray.put(_forward_map(index_dir))
    files = sorted(
        glob.glob(os.path.join(index_dir, "segments", "shard=*", "blocks.parquet"))
    )

    def decode(batch: pa.Table) -> pa.Table:
        doc_sorted, id_sorted = ray.get(fwd_ref)
        terms_out, ids_out, tf_out = [], [], []
        terms = batch["term"].to_pylist()
        for i in range(batch.num_rows):
            docs = np.cumsum(
                decode_varbyte(batch["docs_vb"][i].as_py()), dtype=np.uint64
            )
            tfs = np.frombuffer(batch["tfs_f32"][i].as_py(), dtype="<f4")
            rows = np.searchsorted(doc_sorted, docs)
            terms_out.append(np.full(len(docs), terms[i], dtype=object))
            ids_out.append(id_sorted[rows])
            tf_out.append(tfs.astype(np.int64))
        if not terms_out:
            return pa.table(
                {"term": pa.array([], pa.string()), "doc_id": pa.array([], pa.string()),
                 "tf": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "term": pa.array(np.concatenate(terms_out), pa.string()),
                "doc_id": pa.array(np.concatenate(ids_out), pa.string()),
                "tf": pa.array(np.concatenate(tf_out), pa.int64()),
            }
        )

    return rd.read_parquet(files, columns=["term", "n", "docs_vb", "tfs_f32"]).map_batches(
        decode, batch_format="pyarrow"
    )


def docmeta_dataset(index_dir: str):
    """Dataset of (doc_id:string, token_len:int64)."""
    import ray
    import ray.data as rd

    fwd_ref = ray.put(_forward_map(index_dir))
    files = sorted(
        glob.glob(os.path.join(index_dir, "segments", "shard=*", "docmeta.parquet"))
    )

    def attach(batch: pa.Table) -> pa.Table:
        doc_sorted, id_sorted = ray.get(fwd_ref)
        doc = batch["doc"].to_numpy(zero_copy_only=False).astype(np.uint64)
        rows = np.searchsorted(doc_sorted, doc)
        return pa.table(
            {
                "doc_id": pa.array(id_sorted[rows], pa.string()),
                "token_len": pa.array(
                    batch["token_len"].to_numpy(zero_copy_only=False).astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    return rd.read_parquet(files).map_batches(attach, batch_format="pyarrow")


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
