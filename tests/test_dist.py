"""Distributed wire merge by (Attri.Ts desc, Id desc) — conformance with
/root/reference/net/grpc/search.go:40-65 (rpcSlice comparator), :95-99
(per-node truncate) and :151-175 (wgGrpc merge incl. the maxOutputs-1
off-by-one)."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from riot_ray.engine import merge_dist_ts, ts_node_reply, ts_sort_hits
from riot_ray.types import RankOpts, ScoredHit, SearchReq, SearchResp


def _hit(doc_id, ts=None, score=1.0):
    fields = {"ts": ts} if ts is not None else None
    return ScoredHit(doc_id=doc_id, scores=(score,), fields=fields)


def test_ts_sort_string_id_desc_tiebreak():
    # equal Ts -> Id desc as Go STRING compare: "99" > "100"
    hits = [_hit("100", 5), _hit("99", 5), _hit("5", 7)]
    ts_sort_hits(hits)
    assert [h.doc_id for h in hits] == ["5", "99", "100"]


def test_ts_missing_defaults_to_zero():
    hits = [_hit("a"), _hit("b", 1), _hit("c")]  # a/c carry no ts -> 0
    ts_sort_hits(hits)
    assert [h.doc_id for h in hits] == ["b", "c", "a"]


def test_node_reply_truncates_to_max_outputs():
    resp = SearchResp(docs=[_hit(str(i), ts=i) for i in range(6)])
    out = ts_node_reply(resp, max_outputs=4)
    assert [h.doc_id for h in out.docs] == ["5", "4", "3", "2"]
    assert out.num_docs == 4
    # maxOutputs==0 keeps everything (config default path)
    resp2 = SearchResp(docs=[_hit(str(i), ts=i) for i in range(6)])
    assert len(ts_node_reply(resp2, 0).docs) == 6


def test_merge_single_reply_passthrough_no_quirk():
    # one reply returns verbatim — wgGrpc's len(rpcdata)==1 branch skips
    # the re-sort AND the maxOutputs-1 truncation
    docs = [_hit(str(i), ts=i) for i in range(5)]
    r = SearchResp(docs=list(docs), num_docs=5)
    out = merge_dist_ts([r], max_outputs=5)
    assert out is r and len(out.docs) == 5


def test_merge_truncates_to_max_outputs_minus_one():
    a = SearchResp(docs=[_hit("1", 10), _hit("2", 8), _hit("3", 6)])
    b = SearchResp(docs=[_hit("4", 9), _hit("5", 7), _hit("6", 5)])
    out = merge_dist_ts([a, b], max_outputs=4)
    # pool 6 > 4 -> truncate to 3 (maxOutputs-1), order ts desc
    assert [h.doc_id for h in out.docs] == ["1", "4", "2"]
    assert out.num_docs == 3


def test_merge_exactly_max_outputs_not_truncated():
    a = SearchResp(docs=[_hit("1", 4), _hit("2", 3)])
    b = SearchResp(docs=[_hit("3", 2), _hit("4", 1)])
    out = merge_dist_ts([a, b], max_outputs=4)
    # len(docs) == maxOutputs is NOT > maxOutputs -> all 4 kept
    assert [h.doc_id for h in out.docs] == ["1", "2", "3", "4"]


def test_merge_unlimited_keeps_all():
    a = SearchResp(docs=[_hit("1", 1)])
    b = SearchResp(docs=[_hit("2", 2)])
    out = merge_dist_ts([a, b], max_outputs=0)
    assert [h.doc_id for h in out.docs] == ["2", "1"]


@pytest.fixture(scope="module")
def dist_nodes(ray_session, tmp_path_factory):
    """Two independent node indexes over disjoint halves of one corpus,
    each forward-storing a ts meta column."""
    from riot_ray.build import IndexWriter
    from riot_ray.config import EngineOpts
    from riot_ray.corpus import make_corpus

    root = tmp_path_factory.mktemp("dist_nodes")
    t = make_corpus(120, seed=11)
    # deterministic per-doc timestamp with collisions (modulus 7 forces the
    # Id-desc string tiebreak to matter)
    import numpy as np

    rows = np.arange(t.num_rows, dtype=np.int64)
    t = t.append_column("ts", pa.array((rows * 37 + 3) % 7, pa.int64()))
    dirs = []
    for node in (0, 1):
        part = t.filter(pa.array(rows % 2 == node))
        src = str(root / f"n{node}" / "src.parquet")
        import os

        os.makedirs(os.path.dirname(src), exist_ok=True)
        pq.write_table(part, src)
        opts = EngineOpts(mode="code", num_parts=4, num_shards=2,
                          meta_cols=("lang", "ts") if "lang" in t.column_names
                          else ("ts",))
        idx = str(root / f"n{node}" / "index")
        IndexWriter(idx, opts).build(src)
        dirs.append(idx)
    return {"dirs": dirs, "table": t}


def test_dist_searcher_end_to_end(dist_nodes, ray_session):
    """DistSearcher == hand-computed reference semantics on real indexes:
    per-node score-ranked top-M, ts-resorted, merged, M-1 truncated."""
    from riot_ray.engine import DistSearcher, LocalSearcher

    M = 6
    # "def" occurs in every synthetic corpus doc -> each node returns its
    # score-top-M, the merged pool is 2M > M and the -1 quirk engages
    req = SearchReq(text="def", rank_opts=RankOpts(max_outputs=M))
    dist = DistSearcher(dist_nodes["dirs"])
    got = dist.search(req)
    dist.shutdown()

    # expected: run each node locally (hydrated), apply the wire transform
    replies = []
    for d in dist_nodes["dirs"]:
        r = LocalSearcher(d, hydrate=True).search(req)
        replies.append(ts_node_reply(r, M))
    want = merge_dist_ts(replies, M)

    assert [h.doc_id for h in got.docs] == [h.doc_id for h in want.docs]
    assert got.num_docs == want.num_docs
    # the off-by-one quirk MUST engage: every doc matches "def", so the
    # pool is 2M and the merge truncates to M-1
    assert sum(len(r.docs) for r in replies) == 2 * M
    assert len(got.docs) == M - 1
    # wire order holds: ts non-increasing, id string-desc within equal ts
    seq = [(int((h.fields or {}).get("ts") or 0), h.doc_id) for h in got.docs]
    for (t1, i1), (t2, i2) in zip(seq, seq[1:]):
        assert t1 > t2 or (t1 == t2 and i1 > i2)


# ---- property: merge equals a direct transcription of the Go code ---------- #
from hypothesis import given, settings
from hypothesis import strategies as st

_ID = st.text(alphabet="0123456789ab", min_size=1, max_size=4)
_REPLY = st.lists(
    st.tuples(_ID, st.integers(0, 5)), min_size=0, max_size=8
)


def _go_merge(replies, max_outputs):
    """Literal transcription of wgGrpc (search.go:151-175) over
    (id, ts) tuples: per-reply lists arrive already node-sorted."""
    if len(replies) == 1:
        return list(replies[0])
    docs = [d for r in replies for d in r]
    # sort.Sort(rpcSlice): Less = ts desc, then id > (string) — emulate
    # with sorted() and a key that inverts ts and uses id descending via
    # two stable passes
    docs = sorted(docs, key=lambda d: d[0], reverse=True)
    docs = sorted(docs, key=lambda d: d[1], reverse=True)
    if max_outputs > 0 and len(docs) > max_outputs:
        docs = docs[: max_outputs - 1]
    return docs


@settings(max_examples=200, deadline=None)
@given(st.lists(_REPLY, min_size=1, max_size=4), st.integers(0, 12))
def test_merge_matches_go_transcription(replies, max_outputs):
    def node(r):
        hits = [_hit(i, t) for i, t in r]
        return ts_node_reply(SearchResp(docs=hits), max_outputs)

    node_replies = [node(r) for r in replies]
    got = merge_dist_ts(node_replies, max_outputs)
    want = _go_merge(
        [[(h.doc_id, _ts(h)) for h in nr.docs] for nr in node_replies],
        max_outputs,
    )
    assert [(h.doc_id, _ts(h)) for h in got.docs] == want


def _ts(h):
    return int((h.fields or {}).get("ts") or 0)


def test_dist_searcher_survives_node_kill(dist_nodes, ray_session):
    """A killed node actor restarts in place (read-only serving state +
    max_restarts) and the interrupted scatter-gather replays — the
    rebuild's analog of the reference heartbeat/restart liveness for the
    distributed deployment."""
    import ray

    from riot_ray.engine import DistSearcher

    req = SearchReq(text="def", rank_opts=RankOpts(max_outputs=6))
    dist = DistSearcher(dist_nodes["dirs"])
    try:
        want = [h.doc_id for h in dist.search(req).docs]
        ray.kill(dist.nodes[0], no_restart=False)
        got = [h.doc_id for h in dist.search(req).docs]
        assert got == want
    finally:
        dist.shutdown()


def test_dist_search_many_matches_per_query(dist_nodes, ray_session):
    """Batched dist (one RPC per node) == per-query dist, including
    duplicate queries in the batch (aliased node replies re-transformed
    idempotently)."""
    from riot_ray.engine import DistSearcher

    reqs = [
        SearchReq(text=t, rank_opts=RankOpts(max_outputs=6))
        for t in ("def", "parse", "def", "merge sort", "zzz_nothing", "def")
    ]
    dist = DistSearcher(dist_nodes["dirs"])
    try:
        batched = dist.search_many(reqs)
        singles = [dist.search(r) for r in reqs]
        for b, s in zip(batched, singles):
            assert [h.doc_id for h in b.docs] == [h.doc_id for h in s.docs]
            assert b.num_docs == s.num_docs
    finally:
        dist.shutdown()


def test_dist_reload_advances_nodes(dist_nodes, ray_session, tmp_path):
    """DistSearcher.reload(): a doc removed from one NODE's index
    disappears from merged results without recreating the searcher."""
    import shutil

    from riot_ray.engine import DistSearcher
    from riot_ray.updates import remove_docs

    # private copies: this test MUTATES node indexes (module fixture is
    # shared with the other dist tests)
    dirs = []
    for i, d in enumerate(dist_nodes["dirs"]):
        c = str(tmp_path / f"n{i}")
        shutil.copytree(d, c)
        dirs.append(c)
    dist_nodes = {"dirs": dirs}
    dist = DistSearcher(dist_nodes["dirs"])
    try:
        req = SearchReq(text="def", rank_opts=RankOpts(max_outputs=6))
        before = [h.doc_id for h in dist.search(req).docs]
        victim = before[0]
        node = 0 if remove_docs(dist_nodes["dirs"][0], [victim])["n_removed"] \
            else 1
        if node == 1:
            assert remove_docs(dist_nodes["dirs"][1], [victim])["n_removed"]
        assert victim in [h.doc_id for h in dist.search(req).docs]  # snapshot
        dist.reload()
        assert victim not in [h.doc_id for h in dist.search(req).docs]
    finally:
        dist.shutdown()
