"""Reference-conformance goldens ported from riot's own tests.

Fixtures are the dictionary-independent token-level corpora from
/root/reference/core/indexer_test.go and the NotUseGse space-mode E2E test
from /root/reference/engine_test.go:663-720 — the rank-identity contract
(SURVEY.md §2.9).  riot's unstable sort means equal-score groups compare as
SETS; our documented order is (score desc, doc_id asc).
"""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from riot_ray.build import IndexWriter
from riot_ray.config import FREQS_INDEX, LOCS_INDEX, EngineOpts
from riot_ray.engine import LocalSearcher
from riot_ray.types import RankOpts, SearchReq


def _tok(text, locs, freq=None):
    d = {"text": text, "locations": list(locs)}
    if freq is not None:
        d["frequency"] = float(freq)
    return d


def _build_pretokenized(tmp_path, name, rows, index_type, bm25=None):
    """rows: list of (doc_id, tokens, token_len|None)."""
    from riot_ray.config import BM25Params

    tok_type = pa.list_(
        pa.struct(
            [
                ("text", pa.string()),
                ("locations", pa.list_(pa.int32())),
                ("frequency", pa.float32()),
            ]
        )
    )
    table = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.string()),
            "content": pa.array(["" for _ in rows], pa.string()),
            "tokens": pa.array(
                [
                    [
                        {
                            "text": t["text"],
                            "locations": t["locations"],
                            "frequency": t.get("frequency"),
                        }
                        for t in r[1]
                    ]
                    for r in rows
                ],
                tok_type,
            ),
            "token_len": pa.array([r[2] for r in rows], pa.float32()),
        }
    )
    src = os.path.join(str(tmp_path), f"{name}.parquet")
    pq.write_table(table, src)
    opts = EngineOpts(
        mode="pretokenized",
        index_type=index_type,
        id_cols=("doc_id",),
        content_col="content",
        meta_cols=(),
        tokens_col="tokens",
        token_len_col="token_len",
        num_parts=2,
        num_shards=2,
        bm25=bm25 or BM25Params(),
    )
    idx = os.path.join(str(tmp_path), f"{name}_index")
    IndexWriter(idx, opts).build(src)
    return LocalSearcher(idx)


# F2 corpus — /root/reference/core/indexer_test.go:136-230
F2 = [
    ("1", [_tok("token2", [0]), _tok("token3", [7])], None),
    ("2", [_tok("token1", [0]), _tok("token2", [7]), _tok("token3", [14])], None),
    ("3", [_tok("token1", [0]), _tok("token2", [7])], None),
    ("4", [_tok("token2", [0])], None),
    ("7", [_tok("token1", [0]), _tok("token3", [7])], None),
    ("9", [_tok("token3", [0])], None),
]


@pytest.fixture(scope="module")
def f2(ray_session, tmp_path_factory):
    return _build_pretokenized(
        tmp_path_factory.mktemp("f2"), "f2", F2, LOCS_INDEX
    )


def _hits(searcher, tokens):
    resp = searcher.search(SearchReq(tokens=tuple(tokens), orderless=True))
    return {h.doc_id: h for h in resp.docs}


def test_f2_single_term(f2):
    # riot: ["token1"] -> docs {7,3,2}, proximity 0, snippet [0]
    hits = _hits(f2, ["token1"])
    assert set(hits) == {"7", "3", "2"}
    for h in hits.values():
        assert h.token_proximity == 0
        assert h.token_snippet_locs == (0,)


def test_f2_missing_term_empties(f2):
    assert _hits(f2, ["token1", "token4"]) == {}


def test_f2_two_terms_order_sensitive_proximity(f2):
    # ["token1","token2"] -> docs {3,2}, proximity 1, snippets [0,7]
    hits = _hits(f2, ["token1", "token2"])
    assert set(hits) == {"3", "2"}
    for h in hits.values():
        assert h.token_proximity == 1
        assert h.token_snippet_locs == (0, 7)
    # reversed query order -> proximity 13 (/root/reference/core/indexer_test.go:207-210)
    hits = _hits(f2, ["token2", "token1"])
    assert set(hits) == {"3", "2"}
    for h in hits.values():
        assert h.token_proximity == 13


def test_f2_three_terms(f2):
    hits = _hits(f2, ["token1", "token2", "token3"])
    assert set(hits) == {"2"}
    h = hits["2"]
    assert h.token_proximity == 2
    assert h.token_snippet_locs == (0, 7, 14)
    hits = _hits(f2, ["token3", "token2", "token1"])
    assert hits["2"].token_proximity == 26
    assert hits["2"].token_snippet_locs == (14, 7, 0)


# --- proximity DP goldens (/root/reference/core/indexer_test.go:328-372) --- #
def test_proximity_dp_goldens():
    from riot_ray.query import token_proximity

    # doc "token2 token4 token4 token2 token3 token4"
    prox, snip = token_proximity([[0, 21], [28]], ["token2", "token3"])
    assert (prox, snip) == (1, (21, 28))
    # doc "t2 t1 . . . t2 t3"
    prox, snip = token_proximity([[3], [0, 12], [15]], ["t1", "t2", "t3"])
    assert (prox, snip) == (8, (3, 12, 15))
    # doc "t3 t2 t1 . . . . . t2 t3"
    prox, snip = token_proximity([[6], [3, 19], [0, 22]], ["t1", "t2", "t3"])
    assert (prox, snip) == (10, (6, 3, 0))


# --- labels (/root/reference/core/indexer_test.go:374-403) ----------------- #
def test_labels_participate_in_and(ray_session, tmp_path_factory):
    rows = [
        (
            "1",
            [_tok("token2", [0, 21]), _tok("token3", [28]),
             _tok("label1", []), _tok("token4", [7, 14, 35])],
            None,
        ),
        (
            "2",
            [_tok("token2", [0, 21]), _tok("token3", [28]),
             _tok("token4", [7, 14, 35])],
            None,
        ),
    ]
    s = _build_pretokenized(tmp_path_factory.mktemp("lab"), "lab", rows, LOCS_INDEX)
    resp = s.search(
        SearchReq(tokens=("token2", "token3"), labels=("label1",), orderless=True)
    )
    # riot golden "[1 1 [21 28]]": only doc 1 carries the label; proximity
    # over the TOKENS only (labels excluded) = 1 with snippet [21 28]
    assert len(resp.docs) == 1
    h = resp.docs[0]
    assert h.doc_id == "1"
    assert h.token_proximity == 1
    assert h.token_snippet_locs == (21, 28)


# --- BM25 golden (/root/reference/core/indexer_test.go:405-441) ------------ #
def test_bm25_golden_76055(ray_session, tmp_path_factory):
    from riot_ray.config import BM25Params

    rows = [
        (
            "1",
            [_tok("token2", [0, 21], freq=3), _tok("token3", [28], freq=7),
             _tok("token4", [7, 14, 35], freq=15)],
            6.0,
        ),
        ("2", [_tok("token6", [0], freq=3), _tok("token7", [7], freq=15)], 2.0),
    ]
    s = _build_pretokenized(
        tmp_path_factory.mktemp("bm"), "bm", rows, FREQS_INDEX,
        bm25=BM25Params(k1=1.0, b=1.0),
    )
    resp = s.search(SearchReq(tokens=("token2", "token3", "token4")))
    assert len(resp.docs) == 1
    # riot: BM25 = log2(3) * (12/9 + 28/17 + 60/33); int(x*10000) == 76055
    assert int(resp.docs[0].bm25 * 10000) == 76055


# --- docIds allowlist (/root/reference/core/indexer_test.go:443-488) ------- #
def test_doc_ids_allowlist_golden(ray_session, tmp_path_factory):
    rows = [
        ("1", [_tok("token2", [0]), _tok("token3", [7])], None),
        ("2", [_tok("token1", [0]), _tok("token2", [7]), _tok("token3", [14])], None),
        ("3", [_tok("token1", [0]), _tok("token2", [7])], None),
        ("4", [_tok("token2", [0])], None),
    ]
    s = _build_pretokenized(tmp_path_factory.mktemp("ids"), "ids", rows, LOCS_INDEX)
    resp = s.search(
        SearchReq(tokens=("token2",), doc_ids=frozenset({"1", "3"}), orderless=True)
    )
    got = {(h.doc_id, h.token_proximity, h.token_snippet_locs) for h in resp.docs}
    # riot golden "[3 0 [7]] [1 0 [0]]"
    assert got == {("3", 0, (7,)), ("1", 0, (0,))}


# --- locations after remove (/root/reference/core/indexer_test.go:490-517) - #
def test_token_locs_after_remove(ray_session, tmp_path_factory):
    from riot_ray.updates import remove_docs

    rows = [
        ("1", [_tok("token2", [0, 21]), _tok("token3", [28]),
               _tok("token4", [7, 14, 35])], None),
        ("2", [_tok("token3", [0, 21]), _tok("token5", [28]),
               _tok("token2", [7, 14, 35])], None),
    ]
    tmp = tmp_path_factory.mktemp("locs")
    s = _build_pretokenized(tmp, "locs", rows, LOCS_INDEX)
    remove_docs(s.index_dir, ["2"])
    s = LocalSearcher(s.index_dir)
    resp = s.search(SearchReq(tokens=("token2", "token3"), orderless=True))
    assert len(resp.docs) == 1
    # riot golden: TokenLocs [[0 21] [28]]
    assert resp.docs[0].token_locs == ((0, 21), (28,))


# --- E2E space mode: /root/reference/engine_test.go:663-720 ---------------- #
def test_search_space_mode_golden_3736(ray_session, tmp_path_factory):
    """TestSearchNotUseGse rebuilt: 6 AddDocs docs + docs 7/8 (identical
    content + an external 'test' token), query "google is" with a docId
    allowlist.  riot: 2 hits, score int(x*1000) == 3736; top-of-tie is
    unstable in riot (sort.Sort) so the golden checks the tie SET."""
    tok_type = pa.list_(
        pa.struct(
            [("text", pa.string()), ("locations", pa.list_(pa.int32())),
             ("frequency", pa.float32())]
        )
    )
    add_docs = [
        ("1", "The world, 有七十亿人口人口", None),
        ("2", "The world, 人口", None),
        ("3", "The world", None),
        ("4", "有人口", None),
        ("5", "The world, 七十亿人口", None),
        ("6", "有七十亿人口", None),
        ("7", "Google Is Experimenting With Virtual Reality Advertising", [{"text": "test", "locations": [], "frequency": None}]),
        ("8", "Google Is Experimenting With Virtual Reality Advertising", [{"text": "test", "locations": [], "frequency": None}]),
    ]
    table = pa.table(
        {
            "doc_id": pa.array([d[0] for d in add_docs], pa.string()),
            "content": pa.array([d[1] for d in add_docs], pa.string()),
            "tokens": pa.array([d[2] for d in add_docs], tok_type),
        }
    )
    tmp = tmp_path_factory.mktemp("space")
    src = os.path.join(str(tmp), "docs.parquet")
    pq.write_table(table, src)
    opts = EngineOpts(
        mode="space",
        index_type=FREQS_INDEX,
        id_cols=("doc_id",),
        content_col="content",
        meta_cols=(),
        tokens_col="tokens",
        num_parts=2,
        num_shards=2,
    )
    idx = os.path.join(str(tmp), "index")
    IndexWriter(idx, opts).build(src)
    s = LocalSearcher(idx)
    resp = s.search(
        SearchReq(
            text="google is",
            doc_ids=frozenset({"5", "1", "6", "7", "8"}),
        )
    )
    assert resp.tokens == ("google", "is")
    assert len(resp.docs) == 2
    assert {h.doc_id for h in resp.docs} == {"7", "8"}
    # riot's printed golden is 3736 — an artifact of its NumShards=8
    # PER-SHARD BM25 statistics (numDocs/avgdl/df of whatever shard docs
    # 7/8 murmur-hashed to).  Our documented conformance target is riot
    # with NumShards=1 == GLOBAL statistics (SURVEY.md §2.9.1), whose value
    # derives exactly:  N=8, df(google)=df(is)=2 -> idf=log2(5);
    # ForSplitData gives tf(google)=2 (element + first cumulative prefix),
    # tf(is)=1; token_len(doc7)=15 (7 elements + 7 prefixes + 1 external
    # token entry); avgdl=56/8=7; k1=2,b=0.75:
    #   log2(5)*(2*3/(2+2*(0.25+0.75*15/7)) + 1*3/(1+2*(0.25+0.75*15/7)))
    #   = 3.91561...
    import math

    idf = np.float32(math.log2(8 / 2 + 1))
    norm = np.float32(2.0) * (np.float32(0.25) + np.float32(0.75) * np.float32(15.0) / np.float32(7.0))
    expect = idf * (np.float32(6.0) / (np.float32(2.0) + norm)) + idf * (
        np.float32(3.0) / (np.float32(1.0) + norm)
    )
    for h in resp.docs:
        assert int(h.bm25 * 1000) == int(expect * 1000) == 3915, h.bm25
