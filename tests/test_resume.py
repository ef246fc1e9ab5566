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


def test_build_survives_driver_sigkill(tmp_path):
    """Hard-crash durability: SIGKILL the build driver once the first shard
    manifest lands, then resume in a fresh process — the final index must
    equal a clean build's (stats + per-shard fingerprints), with completed
    shards skipped rather than rebuilt.  (The other resume tests simulate a
    crash by deleting outputs; this one actually kills a running build,
    leaving whatever tmp state the victim had in flight.)

    Runs its own Ray clusters in subprocesses — independent of the session
    fixture."""
    import glob
    import json
    import signal
    import subprocess
    import sys
    import time

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = r"""
import sys, ray
ray.init(address="local", num_cpus=2, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext; DataContext.get_current().enable_progress_bars = False
from riot_ray.build import IndexWriter
from riot_ray.config import EngineOpts
from riot_ray.corpus import write_corpus
import os
src = sys.argv[1]
if not os.path.exists(src):
    write_corpus(src, 4000, seed=13)
opts = EngineOpts(mode="code", num_parts=8, num_shards=8, block_size=64)
st = IndexWriter(sys.argv[2], opts).build(src)
print("STATS " + str(st["n_postings"]) + " " + str(st["shards_skipped"]))
ray.shutdown()
"""
    src = str(tmp_path / "src" / "code.parquet")
    victim_dir = str(tmp_path / "index_killed")
    clean_dir = str(tmp_path / "index_clean")

    def run(index_dir, kill_on_first_shard=False):
        p = subprocess.Popen(
            [sys.executable, "-c", script, src, index_dir],
            cwd=repo, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
            text=True,
        )
        if not kill_on_first_shard:
            out, _ = p.communicate(timeout=300)
            assert p.returncode == 0, out
            return out
        # poll for the first completed shard manifest, then SIGKILL
        deadline = time.time() + 300
        while time.time() < deadline:
            if p.poll() is not None:
                break  # build finished before we could kill: still a valid run
            if glob.glob(os.path.join(index_dir, "segments", "shard=*", "manifest.json")):
                p.send_signal(signal.SIGKILL)
                break
            time.sleep(0.05)
        p.wait(timeout=60)
        return None

    run(victim_dir, kill_on_first_shard=True)
    out_resumed = run(victim_dir)  # resume over the crash debris
    out_clean = run(clean_dir)     # clean reference build

    n_res, skipped = out_resumed.split("STATS ")[1].split()
    n_cln, _ = out_clean.split("STATS ")[1].split()
    assert n_res == n_cln
    # at least the shard whose manifest triggered the kill must be skipped
    # (unless the victim finished entirely before the signal landed)
    assert int(skipped) >= 1 or not os.path.exists(victim_dir)
    # per-shard manifests identical (fingerprint + postings counts)
    def manifests(d):
        out = {}
        for m in sorted(glob.glob(os.path.join(d, "segments", "shard=*", "manifest.json"))):
            with open(m) as f:
                j = json.load(f)
            out[os.path.basename(os.path.dirname(m))] = (
                j.get("fingerprint"), j.get("n_postings"), j.get("n_docs")
            )
        return out
    assert manifests(victim_dir) == manifests(clean_dir)
