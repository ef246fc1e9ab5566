"""Index updates: remove (tombstones), compaction, incremental add.

The reference mutates its in-memory maps per document (RemoveDoc broadcast
tombstones + batched removeCache sweep, /root/reference/engine.go:429-463,
core/indexer.go:258-366; re-add replaces via the docsState machine,
core/indexer.go:135-159).  The batch-engine analog:

* ``remove_docs`` — append doc u64s to ``tombstones/*.parquet``.  Serving
  applies them as an anti-filter (ShardData.set_tombstones) and subtracts
  the removed docs' lengths from the global BM25 stats; no segment rewrite.
* ``compact`` — rewrite only the forward parts / segment shards that
  contain tombstoned docs (per-partition rewrite, never the whole index),
  re-deriving postings from the forward table through the same tokenize +
  BuildShard path as the original build; surviving docs keep their u64 ids
  so untouched shards stay valid.  Clears the tombstone set.
* ``add_docs`` — riot's addCache analog: new rows are routed to their
  hash part, keep-last-deduped against the part's existing docs (a re-added
  doc_id tombstones its old u64 and gets a fresh one appended after the
  part's max seq), the touched forward parts are rewritten atomically and
  only the affected shards are rebuilt.

All three are Ray Data jobs over just the touched partitions.
"""

from __future__ import annotations

import glob
import json
import os
import re
import time
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd

from .build import STATS_FILE, IndexWriter, load_stats
from .config import PART_SHIFT, EngineOpts, shard_of_part
from .stages.prepare import derive_doc_id, make_prepare_fn
from .stages.segments import shard_dir


def _tomb_dir(index_dir: str) -> str:
    return os.path.join(index_dir, "tombstones")


def _forward_parts(index_dir: str) -> list[str]:
    return sorted(glob.glob(os.path.join(index_dir, "forward", "part=*.parquet")))


def _part_of(path: str) -> int:
    return int(re.search(r"part=(\d+)", path).group(1))


def load_tombstones(index_dir: str) -> np.ndarray:
    d = _tomb_dir(index_dir)
    files = sorted(glob.glob(os.path.join(d, "*.parquet")))
    if not files:
        return np.empty(0, dtype=np.uint64)
    t = pq.read_table(files, columns=["doc"])
    return np.unique(t["doc"].to_numpy(zero_copy_only=False).astype(np.uint64))


def _write_tombstones(index_dir: str, docs: np.ndarray) -> str:
    d = _tomb_dir(index_dir)
    os.makedirs(d, exist_ok=True)
    name = f"gen-{uuid.uuid4().hex}.parquet"
    tmp = os.path.join(d, "." + name)
    pq.write_table(pa.table({"doc": pa.array(docs, pa.uint64())}), tmp)
    final = os.path.join(d, name)
    os.replace(tmp, final)
    return final


def remove_docs(index_dir: str, doc_ids: list[str]) -> dict:
    """Tombstone docs by doc_id string.  Distributed lookup of doc u64s:
    the (small) removal set is broadcast into a map_batches filter over the
    forward table — no shuffle."""
    want = set(doc_ids)
    if not want:
        return {"n_removed": 0}

    def find(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch["doc_id"], value_set=pa.array(sorted(want)))
        return batch.filter(mask).select(["doc"])

    files = _forward_parts(index_dir)
    found = (
        rd.read_parquet(files, columns=["doc", "doc_id"])
        .map_batches(find, batch_format="pyarrow")
        .to_arrow_refs()
    )
    import ray

    tables = [t for t in ray.get(found) if t.num_rows]
    docs = (
        np.unique(
            np.concatenate(
                [t["doc"].to_numpy(zero_copy_only=False).astype(np.uint64) for t in tables]
            )
        )
        if tables
        else np.empty(0, dtype=np.uint64)
    )
    if docs.size:
        _write_tombstones(index_dir, docs)
    return {"n_removed": int(docs.size)}


def compact(index_dir: str, tokenizer_factory=None) -> dict:
    """Apply tombstones physically: rewrite only the forward parts and
    segment shards containing dead docs, then refresh termstats + stats.
    Cheap analog of riot's removeCache sweep (core/indexer.go:258-366) —
    per-partition, resumable, leaves untouched partitions byte-identical."""
    t0 = time.time()
    tomb = load_tombstones(index_dir)
    stats = load_stats(index_dir)
    opts = EngineOpts.from_json_dict(stats["opts"])
    if tomb.size == 0:
        return {"n_removed": 0, "parts_rewritten": 0, "shards_rebuilt": 0}
    if not opts.store_content:
        raise ValueError(
            "compact requires an index built with store_content=True: dead "
            "shards are re-tokenized from the forward table, which holds no "
            "content in this index (tombstone serving still works)"
        )

    dead_parts = np.unique((tomb >> np.uint64(PART_SHIFT)).astype(np.int64))
    dead_shards = sorted(
        {shard_of_part(int(p), opts.num_parts, opts.num_shards) for p in dead_parts}
    )
    touched_files = [
        f for f in _forward_parts(index_dir) if _part_of(f) in set(dead_parts.tolist())
    ]

    # 1) rewrite touched forward parts minus dead docs (atomic per part)
    tomb_ref = tomb

    def drop_dead(batch: pa.Table) -> pa.Table:
        doc = batch["doc"].to_numpy(zero_copy_only=False).astype(np.uint64)
        keep = ~np.isin(doc, tomb_ref, assume_unique=False)
        return batch.filter(pa.array(keep))

    for f in touched_files:  # few parts; each rewrite is independent
        t = drop_dead(pq.read_table(f))
        tmp = f + f".tmp-{uuid.uuid4().hex}"
        pq.write_table(t, tmp)
        os.replace(tmp, f)

    # 2) rebuild shards owning those parts, from the (now clean) forward table
    w = IndexWriter(index_dir, opts, tokenizer_factory=tokenizer_factory)
    fp = f"compact-{uuid.uuid4().hex[:12]}"
    shard_files: dict[int, list[str]] = {s: [] for s in dead_shards}
    for f in _forward_parts(index_dir):
        s = shard_of_part(_part_of(f), opts.num_parts, opts.num_shards)
        if s in shard_files:
            shard_files[s].append(f)

    fwd_cols = ["doc", opts.content_col]
    for c in (opts.tokens_col, opts.labels_col, opts.token_len_col):
        if c:
            fwd_cols.append(c)
    files = sorted(x for fs in shard_files.values() for x in fs)
    rebuilt: set = set()
    if files:
        fwd = rd.read_parquet(files, columns=fwd_cols)
        postings = w.apply_tokenize(fwd)
        seg = w.build_segments(postings, fp)
        # an all-dead shard contributes no postings: the groupby can come
        # back empty with no schema at all
        if len(seg) and "shard" in seg.columns:
            rebuilt = {int(x) for x in seg["shard"]}
    # a shard whose docs ALL died produces no postings group — its stale
    # segment dir must go, or serving would read postings for docs that no
    # longer exist in the forward table
    for s in dead_shards:
        if s in rebuilt:
            continue
        sdir = shard_dir(w.segments_dir, s)
        if os.path.exists(sdir):
            import shutil

            shutil.rmtree(sdir)

    # 3) refresh global termstats + stats from all shard outputs
    _refresh_stats(index_dir, w, opts, stats, fp)

    # 4) clear tombstones
    for f in glob.glob(os.path.join(_tomb_dir(index_dir), "*.parquet")):
        os.remove(f)
    return {
        "n_removed": int(tomb.size),
        "parts_rewritten": len(touched_files),
        "shards_rebuilt": len(dead_shards),
        "wall_s": round(time.time() - t0, 3),
    }


def add_docs(index_dir: str, source, tokenizer_factory=None) -> dict:
    """Incremental indexing (riot addCache analog).  ``source`` is a parquet
    path or Dataset with the original input schema.  New/updated docs are
    hash-routed to their part; each touched part is rewritten (keep-last on
    doc_id — a re-added doc_id replaces the old row and gets a fresh u64
    appended after the part's max seq, mirroring the docsState replace at
    /root/reference/core/indexer.go:135-159); touched shards are rebuilt."""
    t0 = time.time()
    stats = load_stats(index_dir)
    opts = EngineOpts.from_json_dict(stats["opts"])
    if not opts.store_content:
        raise ValueError(
            "add_docs requires an index built with store_content=True: the "
            "touched shards are re-tokenized from the forward table, which "
            "holds no content in this index"
        )
    w = IndexWriter(index_dir, opts, tokenizer_factory=tokenizer_factory)

    ds = source if isinstance(source, rd.Dataset) else rd.read_parquet(source)
    prepared = ds.map_batches(make_prepare_fn(opts), batch_format="pyarrow")

    # touched parts (small driver-side set — one column off the new rows)
    import ray

    part_tables = ray.get(prepared.select_columns(["part"]).to_arrow_refs())
    part_arrays = [
        t["part"].to_numpy(zero_copy_only=False) for t in part_tables if t.num_rows
    ]
    if not part_arrays:
        return {"n_added": 0, "n_replaced": 0, "parts_touched": 0,
                "shards_rebuilt": 0, "wall_s": round(time.time() - t0, 3)}
    touched = np.unique(np.concatenate(part_arrays))
    touched_set = set(int(p) for p in touched)
    existing_files = [f for f in _forward_parts(index_dir) if _part_of(f) in touched_set]

    # union existing part rows (__gen=0, doc known) with incoming (__gen=1):
    # the merge group fn is then a PURE function of its group — safe under
    # Ray task retry/re-execution (no read-modify-write of mutable files).
    def _tag_new(batch: pa.Table) -> pa.Table:
        batch = batch.append_column("__gen", pa.array(np.ones(batch.num_rows, np.int8)))
        return batch.append_column(
            "doc", pa.array(np.zeros(batch.num_rows, np.uint64), pa.uint64())
        )

    new_tagged = prepared.map_batches(_tag_new, batch_format="pyarrow")
    schema_cols = new_tagged.schema().names
    if existing_files:
        have = set(pq.read_schema(existing_files[0]).names) | {"part", "__gen"}
        missing = [c for c in have - set(schema_cols) if c not in ("part", "__gen")]
        if missing:
            raise ValueError(
                f"add_docs source lacks column(s) {sorted(missing)} present in "
                "the existing forward table — merging would silently drop "
                "them from rewritten parts"
            )

    def _tag_existing(batch: pa.Table) -> pa.Table:
        doc = batch["doc"].to_numpy(zero_copy_only=False).astype(np.uint64)
        part = (doc >> np.uint64(PART_SHIFT)).astype(np.int32)
        batch = batch.append_column("part", pa.array(part, pa.int32()))
        batch = batch.append_column("__gen", pa.array(np.zeros(batch.num_rows, np.int8)))
        return batch.select(schema_cols)

    merged_src = new_tagged
    if existing_files:
        old_tagged = rd.read_parquet(existing_files).map_batches(
            _tag_existing, batch_format="pyarrow"
        )
        merged_src = new_tagged.union(old_tagged)

    merger = _MergePart(opts, w.forward_dir)
    manifest = (
        merged_src.groupby("part").map_groups(merger, batch_format="pyarrow").to_pandas()
    )
    touched_parts = sorted(int(p) for p in manifest["part"])
    retired = np.concatenate(
        [np.asarray(x, dtype=np.uint64) for x in manifest["retired_docs"]]
    ) if len(manifest) else np.empty(0, np.uint64)
    if retired.size:
        _write_tombstones(index_dir, np.unique(retired))

    touched_shards = sorted(
        {shard_of_part(p, opts.num_parts, opts.num_shards) for p in touched_parts}
    )
    files = [
        f
        for f in _forward_parts(index_dir)
        if shard_of_part(_part_of(f), opts.num_parts, opts.num_shards) in touched_shards
    ]
    fwd_cols = ["doc", opts.content_col]
    for c in (opts.tokens_col, opts.labels_col, opts.token_len_col):
        if c:
            fwd_cols.append(c)
    fp = f"add-{uuid.uuid4().hex[:12]}"
    fwd = rd.read_parquet(files, columns=fwd_cols)
    postings = w.apply_tokenize(fwd)
    w.build_segments(postings, fp)

    # shards were rebuilt from tombstone-free forward parts; clear any
    # tombstones covering ONLY retired docs in touched shards (they are
    # physically gone), keep others
    _refresh_stats(index_dir, w, opts, stats, fp)
    # retired docs are physically absent from the rebuilt shards; the
    # tombstones we just wrote would double-subtract -> drop them again
    if retired.size:
        remaining = load_tombstones(index_dir)
        keep = remaining[~np.isin(remaining, np.unique(retired))]
        for f in glob.glob(os.path.join(_tomb_dir(index_dir), "*.parquet")):
            os.remove(f)
        if keep.size:
            _write_tombstones(index_dir, keep)
    return {
        "n_added": int(manifest["n_added"].sum()),
        "n_replaced": int(retired.size),
        "parts_touched": len(touched_parts),
        "shards_rebuilt": len(touched_shards),
        "wall_s": round(time.time() - t0, 3),
    }


class _MergePart:
    """Group fn for add_docs.  The group carries BOTH the part's existing
    forward rows (__gen=0, doc assigned) and the incoming rows (__gen=1):
    a pure function of the group — idempotent under Ray task retries; the
    only side effect is the atomic tmp+rename of the derived part file."""

    def __init__(self, opts: EngineOpts, forward_dir: str):
        self.opts = opts
        self.forward_dir = forward_dir
        self.__name__ = "MergePart"

    def __call__(self, group: pa.Table) -> pa.Table:
        opts = self.opts
        part = int(group["part"][0].as_py())
        gen = group["__gen"].to_numpy(zero_copy_only=False)
        doc = group["doc"].to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = np.asarray(group["doc_id"].to_pylist(), dtype=object)

        old_mask = gen == 0
        max_seq = (
            int((doc[old_mask] & np.uint64((1 << PART_SHIFT) - 1)).max())
            if old_mask.any()
            else -1
        )
        # keep-last: order by (doc_id, gen, seq) — an incoming row beats the
        # existing row of the same doc_id; within incoming, seq_col decides
        seq = (
            group[opts.seq_col].to_numpy(zero_copy_only=False)
            if opts.seq_col and opts.seq_col in group.column_names
            else np.arange(group.num_rows, dtype=np.int64)
        )
        order = np.lexsort((seq, gen, ids))
        sorted_ids = ids[order]
        is_last = np.r_[sorted_ids[1:] != sorted_ids[:-1], True]
        kept = order[is_last]
        dropped = order[~is_last]
        retired = doc[dropped][gen[dropped] == 0]  # existing rows replaced
        n_added = int((gen[kept] == 1).sum())

        out = group.take(pa.array(np.sort(kept)))
        o_gen = gen[np.sort(kept)]
        o_doc = doc[np.sort(kept)].copy()
        # fresh u64s for surviving incoming rows, appended after max_seq
        new_rows = np.flatnonzero(o_gen == 1)
        o_doc[new_rows] = (np.uint64(part) << np.uint64(PART_SHIFT)) | (
            np.arange(len(new_rows), dtype=np.uint64) + np.uint64(max_seq + 1)
        )
        out = out.drop_columns(["doc", "__gen", "part"])
        out = out.append_column("doc", pa.array(o_doc, pa.uint64()))
        if not opts.store_content and opts.content_col in out.column_names:
            out = out.drop_columns([opts.content_col])

        os.makedirs(self.forward_dir, exist_ok=True)
        final = os.path.join(self.forward_dir, f"part={part:05d}.parquet")
        tmp = os.path.join(self.forward_dir, f".tmp-{part:05d}-{uuid.uuid4().hex}.parquet")
        pq.write_table(out, tmp)
        os.replace(tmp, final)
        return pa.table(
            {
                "part": pa.array([part], pa.int32()),
                "n_added": pa.array([n_added], pa.int64()),
                "retired_docs": pa.array([retired.tolist()], pa.list_(pa.uint64())),
            }
        )


def _refresh_stats(index_dir: str, w: IndexWriter, opts: EngineOpts, old_stats: dict, fp: str):
    """Recompute global df table + corpus stats from current shard files."""
    w._build_termstats()

    n_docs, total_len, n_postings = 0, 0.0, 0
    for man in sorted(glob.glob(os.path.join(w.segments_dir, "shard=*", "manifest.json"))):
        with open(man) as f:
            m = json.load(f)
        n_docs += m["n_docs"]
        total_len += m["total_token_len"]
        n_postings += m["n_postings"]
    stats = dict(old_stats)
    stats.update(
        n_docs=n_docs,
        total_token_len=total_len,
        n_postings=n_postings,
        fingerprint=fp,
        generations=old_stats.get("generations", [0]) + [fp],
    )
    with open(os.path.join(index_dir, STATS_FILE), "w") as f:
        json.dump(stats, f, indent=1)
