"""Checkpoint/resume: per-partition lineage (north rule).

A re-run with the same fingerprint skips completed shards; destroying one
shard (simulated mid-build crash) rebuilds ONLY that shard and reproduces
byte-identical query results.
"""

import os
import shutil

import pyarrow.parquet as pq

from riot_ray.build import IndexWriter
from riot_ray.config import EngineOpts
from riot_ray.corpus import write_corpus
from riot_ray.engine import LocalSearcher
from riot_ray.types import RankOpts, SearchReq


def _results(index_dir):
    s = LocalSearcher(index_dir)
    out = []
    for text in ("parse batch", "merge", "def import"):
        resp = s.search(SearchReq(text=text, rank_opts=RankOpts(max_outputs=10)))
        out.append([(h.doc_id, round(h.bm25, 6)) for h in resp.docs])
    return out


def test_resume_skips_completed_and_rebuilds_lost(ray_session, tmp_path):
    src = write_corpus(str(tmp_path / "src" / "c.parquet"), 200, seed=9)
    opts = EngineOpts(mode="code", num_parts=8, num_shards=4, block_size=64)
    w = IndexWriter(str(tmp_path / "idx"), opts)

    s1 = w.build(src)
    assert s1["shards_skipped"] == 0
    baseline = _results(w.index_dir)
    blocks_before = {
        i: pq.read_table(os.path.join(w.segments_dir, f"shard={i:05d}", "blocks.parquet"))
        for i in range(4)
    }

    # full re-run: everything skipped
    s2 = w.build(src)
    assert s2["shards_skipped"] == 4
    assert s2["n_docs"] == s1["n_docs"]

    # crash simulation: lose one shard, re-run -> only that shard rebuilds
    shutil.rmtree(os.path.join(w.segments_dir, "shard=00002"))
    s3 = w.build(src)
    assert s3["shards_skipped"] == 3
    assert s3["n_docs"] == s1["n_docs"]
    assert _results(w.index_dir) == baseline
    for i in range(4):
        after = pq.read_table(
            os.path.join(w.segments_dir, f"shard={i:05d}", "blocks.parquet")
        )
        assert after.equals(blocks_before[i]), f"shard {i} changed"


def test_changed_input_invalidates(ray_session, tmp_path):
    src1 = write_corpus(str(tmp_path / "a" / "c.parquet"), 100, seed=1)
    src2 = write_corpus(str(tmp_path / "b" / "c.parquet"), 100, seed=2)
    opts = EngineOpts(mode="code", num_parts=4, num_shards=2)
    w = IndexWriter(str(tmp_path / "idx"), opts)
    w.build(src1)
    s = w.build(src2)  # different source path -> different fingerprint
    assert s["shards_skipped"] == 0


def test_scheduling_knobs_do_not_invalidate_resume(ray_session, tmp_path):
    """Tuning scheduling-only knobs (batch size, concurrency, per-task CPUs)
    must not change the build fingerprint — resume still skips."""
    src = write_corpus(str(tmp_path / "s" / "c.parquet"), 80, seed=5)
    o1 = EngineOpts(mode="code", num_parts=4, num_shards=2)
    w1 = IndexWriter(str(tmp_path / "idx"), o1)
    w1.build(src)
    o2 = EngineOpts(mode="code", num_parts=4, num_shards=2,
                    tokenize_batch_size=512, tokenize_concurrency=2,
                    shard_build_num_cpus=2.0)
    s2 = IndexWriter(str(tmp_path / "idx"), o2).build(src)
    assert s2["shards_skipped"] == 2


def test_modified_input_same_path_invalidates(ray_session, tmp_path):
    """Rewriting the source file in place must invalidate resume (the
    fingerprint covers file size+mtime, not just the path)."""
    import pyarrow.parquet as pq

    from riot_ray.corpus import make_corpus

    src = str(tmp_path / "c.parquet")
    pq.write_table(make_corpus(60, seed=1), src)
    opts = EngineOpts(mode="code", num_parts=4, num_shards=2)
    w = IndexWriter(str(tmp_path / "idx"), opts)
    w.build(src)
    pq.write_table(make_corpus(80, seed=2), src)  # same path, new content
    s2 = w.build(src)
    assert s2["shards_skipped"] == 0
    assert s2["n_docs"] == 80


def test_rebuild_removes_stale_outputs(ray_session, tmp_path):
    """Building a different corpus into the same index_dir must not leak the
    old build's forward parts or segment shards into the new index."""
    import glob

    from riot_ray.corpus import make_corpus
    from riot_ray.engine import LocalSearcher
    from riot_ray.types import SearchReq

    idx = str(tmp_path / "idx")
    srcA = write_corpus(str(tmp_path / "a.parquet"), 120, seed=1)
    IndexWriter(idx, EngineOpts(mode="code", num_parts=8, num_shards=4)).build(srcA)
    # second build: fewer parts/shards -> old part/shard ids would linger
    srcB = write_corpus(str(tmp_path / "b.parquet"), 20, seed=2)
    st = IndexWriter(idx, EngineOpts(mode="code", num_parts=2, num_shards=1)).build(srcB)
    assert st["n_docs"] == 20
    assert len(glob.glob(os.path.join(idx, "forward", "part=*.parquet"))) <= 2
    assert len(glob.glob(os.path.join(idx, "segments", "shard=*"))) == 1
    s = LocalSearcher(idx)
    resp = s.search(SearchReq(text="parse"))
    assert all(int(h.doc) < (2 << 40) for h in resp.docs)
    n, _ = s._global()
    assert n == 20
