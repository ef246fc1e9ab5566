"""`python -m riot_ray.job` — the `ray job submit` entrypoint surface."""

import io
import os
import json
from contextlib import redirect_stdout

from riot_ray.job import cmd_build, cmd_search, make_parser


def test_parser_shapes():
    p = make_parser()
    a = p.parse_args(["build", "--source", "a.parquet", "b.parquet",
                      "--index", "/tmp/x", "--num-shards", "8"])
    assert a.source == ["a.parquet", "b.parquet"] and a.num_shards == 8
    s = p.parse_args(["search", "--index", "/tmp/x", "--query", "q1", "q2"])
    assert s.k == 10 and s.actors == 0
    v = p.parse_args(["serve", "--index", "/tmp/x",
                      "--member", "http://n1", "--member", "http://n2"])
    assert v.member == ["http://n1", "http://n2"] and v.port == 8080


def test_build_then_search_roundtrip(ray_session, corpus_index, tmp_path):
    p = make_parser()
    idx = str(tmp_path / "index")
    out = io.StringIO()
    with redirect_stdout(out):
        rc = cmd_build(p.parse_args([
            "build", "--source", corpus_index["src"], "--index", idx,
            "--num-parts", "4", "--num-shards", "2",
        ]))
    assert rc == 0
    stats = json.loads(out.getvalue())
    assert stats["n_docs"] == 300 and stats["num_shards"] == 2

    out = io.StringIO()
    with redirect_stdout(out):
        rc = cmd_search(p.parse_args([
            "search", "--index", idx, "--query", "parse", "merge sort",
            "-k", "3",
        ]))
    assert rc == 0
    lines = [json.loads(x) for x in out.getvalue().splitlines()]
    assert [x["query"] for x in lines] == ["parse", "merge sort"]
    for x in lines:
        assert len(x["docs"]) <= 3
        scores = [d["score"] for d in x["docs"]]
        assert scores == sorted(scores, reverse=True)

    # actor-pool path returns identical results
    out = io.StringIO()
    with redirect_stdout(out):
        assert cmd_search(p.parse_args([
            "search", "--index", idx, "--query", "parse", "merge sort",
            "-k", "3", "--actors", "2",
        ])) == 0
    actor_lines = [json.loads(x) for x in out.getvalue().splitlines()]
    assert actor_lines == lines

    # resubmitting the same build resumes (shards skipped, same stats)
    out = io.StringIO()
    with redirect_stdout(out):
        cmd_build(p.parse_args([
            "build", "--source", corpus_index["src"], "--index", idx,
            "--num-parts", "4", "--num-shards", "2",
        ]))
    again = json.loads(out.getvalue())
    assert again["shards_skipped"] == again["num_shards"]
    assert again["n_postings"] == stats["n_postings"]


def test_build_with_toml_opts(ray_session, corpus_index, tmp_path):
    toml = tmp_path / "engine.toml"
    toml.write_text(
        '[engine]\nmode = "code"\nnum_parts = 4\nnum_shards = 2\n'
        "[bm25]\nk1 = 1.5\nb = 0.6\n"
    )
    p = make_parser()
    out = io.StringIO()
    with redirect_stdout(out):
        rc = cmd_build(p.parse_args([
            "build", "--source", corpus_index["src"],
            "--index", str(tmp_path / "idx"), "--opts", str(toml),
        ]))
    assert rc == 0
    stats = json.loads(out.getvalue())
    assert stats["num_shards"] == 2
    assert stats["opts"]["bm25"] == {"k1": 1.5, "b": 0.6}


def test_serve_subprocess(corpus_index):
    """`python -m riot_ray.job serve` comes up, answers /status and
    /search, and dies cleanly."""
    import subprocess
    import sys
    import time
    import urllib.request

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.Popen(
        [sys.executable, "-m", "riot_ray.job", "serve",
         "--index", corpus_index["index_dir"], "--host", "127.0.0.1",
         "--port", "0", "--actors", "0"],
        cwd=repo, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
        text=True, env={**os.environ, "RAY_ADDRESS": ""},
    )
    try:
        import select

        ready, _, _ = select.select([proc.stdout], [], [], 180)
        assert ready, "serve subprocess printed nothing within 180s"
        line = proc.stdout.readline()  # {"serving": "http://host:port"}
        base = json.loads(line)["serving"]
        st = json.loads(urllib.request.urlopen(f"{base}/status", timeout=10).read())
        assert st["n_docs"] == corpus_index["stats"]["n_docs"]
        out = json.loads(urllib.request.urlopen(
            f"{base}/search?query=parse&maxOutputs=3", timeout=10).read())
        assert out["code"] == 0 and len(out["docs"]) <= 3
    finally:
        proc.terminate()
        proc.wait(timeout=60)


def test_retrieve_roundtrip(ray_session, corpus_index, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from riot_ray.engine import LocalSearcher
    from riot_ray.job import cmd_retrieve
    from riot_ray.types import RankOpts, SearchReq

    qfile = str(tmp_path / "queries.parquet")
    pq.write_table(pa.table({
        "query_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["parse json", "merge sort"], pa.string()),
    }), qfile)
    out_dir = str(tmp_path / "hits")
    p = make_parser()
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = cmd_retrieve(p.parse_args([
            "retrieve", "--index", corpus_index["index_dir"],
            "--queries", qfile, "--output", out_dir, "-k", "3",
            "--actors", "1",
        ]))
    assert rc == 0
    summary = json.loads(buf.getvalue())
    got = pq.read_table(out_dir).to_pandas()
    assert summary["rows"] == len(got)
    se = LocalSearcher(corpus_index["index_dir"])
    for qid, text in [(0, "parse json"), (1, "merge sort")]:
        resp = se.search(SearchReq(text=text, rank_opts=RankOpts(max_outputs=3)))
        sub = got[got["query_id"] == qid].sort_values("score_milli",
                                                      ascending=False)
        assert list(sub["doc_id"]) == [h.doc_id for h in resp.docs]


def test_retrieve_checkpoint_resume(ray_session, corpus_index, tmp_path):
    """A rerun after losing one partition recomputes ONLY that partition's
    queries (parts_resumed counts the committed ones it skipped)."""
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    from riot_ray.job import cmd_retrieve
    from riot_ray.pipelines.checkpoint import read_checkpointed

    qfile = str(tmp_path / "q.parquet")
    pq.write_table(pa.table({
        "query_id": pa.array(list(range(12)), pa.int64()),
        "text": pa.array(["parse json"] * 6 + ["merge sort"] * 6, pa.string()),
    }), qfile)
    out_dir = str(tmp_path / "ckpt")
    p = make_parser()
    argv = ["retrieve", "--index", corpus_index["index_dir"],
            "--queries", qfile, "--output", out_dir, "-k", "2",
            "--actors", "1", "--checkpoint", "--partitions", "4"]
    buf = io.StringIO()
    with redirect_stdout(buf):
        assert cmd_retrieve(p.parse_args(argv)) == 0
    s1 = json.loads(buf.getvalue())
    assert s1["parts_written"] == 4 and s1["parts_resumed"] == 0
    full = read_checkpointed(out_dir).to_pandas().sort_values(
        ["query_id", "doc_id"]).reset_index(drop=True)

    # lose one partition, rerun: 3 resumed, 1 rewritten, output identical
    victim = sorted(os.listdir(out_dir))[0]
    shutil.rmtree(os.path.join(out_dir, victim))
    buf = io.StringIO()
    with redirect_stdout(buf):
        assert cmd_retrieve(p.parse_args(argv)) == 0
    s2 = json.loads(buf.getvalue())
    assert s2["parts_resumed"] == 3 and s2["parts_written"] == 1
    again = read_checkpointed(out_dir).to_pandas().sort_values(
        ["query_id", "doc_id"]).reset_index(drop=True)
    assert again.equals(full)

    # fully-committed rerun: nothing recomputed, output untouched
    buf = io.StringIO()
    with redirect_stdout(buf):
        assert cmd_retrieve(p.parse_args(argv)) == 0
    s3 = json.loads(buf.getvalue())
    assert s3["parts_resumed"] == 4 and s3["parts_written"] == 0


def test_shards_checkpoint_resume(ray_session, tmp_path):
    """`job shards`: curate -> dedup -> sample -> shuffle_shards(carry) ->
    checkpointed partitioned write; a lost partition is restored
    bit-identically on rerun (the permutation is seed-keyed) while
    committed partitions' writes are skipped."""
    import shutil

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from riot_ray.job import cmd_shards
    from riot_ray.pipelines.checkpoint import read_checkpointed

    # 40 docs: ids 0..39; 1 and 21 share content (dedup keeps 1); 30+
    # are too short for the quality gate (min_tokens=5)
    texts = [f"alpha beta gamma delta epsilon token{i}" for i in range(30)]
    texts[21] = texts[1]
    texts += ["short text"] * 10
    src = str(tmp_path / "docs.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(list(range(40)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * 40, pa.string()),
    }), src)
    out_dir = str(tmp_path / "shards")
    p = make_parser()
    argv = ["shards", "--source", src, "--output", out_dir,
            "--n-shards", "8", "--seed", "3", "--frac", "1.0",
            "--min-tokens", "5", "--partitions", "2"]
    buf = io.StringIO()
    with redirect_stdout(buf):
        assert cmd_shards(p.parse_args(argv)) == 0
    s1 = json.loads(buf.getvalue())
    full = read_checkpointed(out_dir).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    # gate drops the 10 short docs; dedup drops doc 21 (dup of 1)
    assert sorted(full["doc_id"]) == [i for i in range(30) if i != 21]
    # "part" is hive-inferred from the part=K layout by the reader
    assert set(full.columns) == {"doc_id", "text", "lang", "rank", "shard",
                                 "part"}
    # rank is a permutation; shards exactly balanced
    assert sorted(full["rank"]) == list(range(29))
    sizes = full.groupby("shard").size()
    assert sizes.max() - sizes.min() <= 1
    assert s1["n_rows"] == 29 and s1["parts_written"] >= 1

    # lose one partition, rerun: only it is rewritten; output identical
    victim = sorted(os.listdir(out_dir))[0]
    shutil.rmtree(os.path.join(out_dir, victim))
    buf = io.StringIO()
    with redirect_stdout(buf):
        assert cmd_shards(p.parse_args(argv)) == 0
    s2 = json.loads(buf.getvalue())
    assert s2["parts_written"] == 1
    assert s2["parts_skipped"] == s1["parts_written"] - 1
    again = read_checkpointed(out_dir).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    assert again.equals(full)

    # fully-committed rerun: every partition's write skipped
    buf = io.StringIO()
    with redirect_stdout(buf):
        assert cmd_shards(p.parse_args(argv)) == 0
    s3 = json.loads(buf.getvalue())
    assert s3["parts_written"] == 0
    assert s3["parts_skipped"] == s1["parts_written"]

    # a changed --text-col must NOT resume against the old fingerprint
    argv_tc = argv + ["--text-col", "lang"]
    buf = io.StringIO()
    with redirect_stdout(buf):
        assert cmd_shards(p.parse_args(argv_tc)) == 0
    s4 = json.loads(buf.getvalue())
    assert s4["parts_skipped"] == 0  # different column -> fresh compute


def test_shards_glob_source(ray_session, tmp_path):
    """`job shards` accepts a glob --source (the DEPLOY.md multi-file
    form): the resume fingerprint degrades to the pattern string instead
    of os.stat crashing on it."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from riot_ray.job import cmd_shards
    from riot_ray.pipelines.checkpoint import read_checkpointed

    for part in range(2):
        ids = list(range(part * 10, part * 10 + 10))
        pq.write_table(pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(
                [f"alpha beta gamma delta epsilon t{i}" for i in ids],
                pa.string()),
        }), str(tmp_path / f"docs_{part}.parquet"))
    out_dir = str(tmp_path / "shards")
    p = make_parser()
    argv = ["shards", "--source", str(tmp_path / "docs_*.parquet"),
            "--output", out_dir, "--n-shards", "4", "--frac", "1.0",
            "--min-tokens", "5", "--partitions", "2"]
    buf = io.StringIO()
    with redirect_stdout(buf):
        assert cmd_shards(p.parse_args(argv)) == 0
    s1 = json.loads(buf.getvalue())
    assert s1["n_rows"] == 20
    got = read_checkpointed(out_dir).to_pandas()
    assert sorted(got["doc_id"]) == list(range(20))


def test_shards_dsir_selection(ray_session, tmp_path):
    """`job shards --dsir-target t.parquet --dsir-top N`: the DSIR stage
    keeps exactly the N docs the library's dsir_sample picks (verified
    against a direct call), the fingerprint changes (no stale-resume
    against a non-DSIR run's manifests), and --dsir-target without
    --dsir-top fails loudly."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest
    import ray.data as rd

    from riot_ray.job import cmd_shards
    from riot_ray.pipelines import dsir_sample
    from riot_ray.pipelines.checkpoint import read_checkpointed

    rng = np.random.default_rng(5)
    code = ["def", "class", "import", "return", "lambda", "yield"]
    prose = ["the", "quick", "brown", "fox", "jumps", "over"]
    texts = [
        " ".join(rng.choice(code if i % 2 else prose, size=12))
        for i in range(60)
    ]
    src = str(tmp_path / "docs.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(list(range(60)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }), src)
    tgt = str(tmp_path / "target.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array([" ".join(code), " ".join(code[::-1])], pa.string()),
    }), tgt)

    out_dir = str(tmp_path / "dsir_shards")
    p = make_parser()
    argv = ["shards", "--source", src, "--output", out_dir,
            "--n-shards", "4", "--seed", "3", "--min-tokens", "3",
            "--partitions", "2", "--dsir-target", tgt, "--dsir-top", "20",
            "--dsir-buckets", "2048"]
    buf = io.StringIO()
    with redirect_stdout(buf):
        assert cmd_shards(p.parse_args(argv)) == 0
    got = read_checkpointed(out_dir).to_pandas()
    assert len(got) == 20

    want = dsir_sample(
        rd.read_parquet(src), rd.read_parquet(tgt), n=20, n_buckets=2048)
    assert sorted(got["doc_id"]) == sorted(want["doc_id"].to_pylist())
    # the code-heavy target must select code-heavy (odd-id) docs
    assert all(i % 2 == 1 for i in got["doc_id"])

    with pytest.raises(SystemExit, match="dsir-top"):
        cmd_shards(p.parse_args(
            ["shards", "--source", src, "--output", str(tmp_path / "x"),
             "--dsir-target", tgt]))
    # the converse is just as loud: --dsir-top with no target would
    # otherwise silently skip selection
    with pytest.raises(SystemExit, match="dsir-target"):
        cmd_shards(p.parse_args(
            ["shards", "--source", src, "--output", str(tmp_path / "x"),
             "--dsir-top", "10"]))
