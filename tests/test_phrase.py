"""Exact-phrase search: postings-AND prune + hydrated-content RE2 verify,
checked against the identical regex evaluated by DuckDB over the raw table
(the regex IS the semantics — tokenize.phrase_pattern's docstring argues
regex-on-text == token-stream adjacency for simple/space modes)."""

import duckdb
import numpy as np
import pytest

SF = "/root/testdata/sf0.001"
PHRASE = ("spark", "data")
PATTERN_SQL = "(^|[^a-z0-9])spark[^a-z0-9]+data([^a-z0-9]|$)"


@pytest.fixture(scope="module")
def simple_index(ray_session, tmp_path_factory):
    from riot_ray.build import IndexWriter
    from riot_ray.config import EngineOpts

    root = tmp_path_factory.mktemp("phrase_index")
    opts = EngineOpts(
        mode="simple", id_cols=("doc_id",), content_col="text",
        meta_cols=("lang",), num_parts=8, num_shards=4,
    )
    IndexWriter(str(root / "index"), opts).build(f"{SF}/documents.parquet")
    return str(root / "index")


def _oracle_ids():
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    t = con.execute(
        f"SELECT doc_id::BIGINT FROM documents "
        f"WHERE regexp_matches(lower(text), '{PATTERN_SQL}') ORDER BY 1"
    ).fetchall()
    return np.array([r[0] for r in t], dtype=np.int64)


def test_phrase_local_matches_regex_oracle(simple_index):
    from riot_ray.engine import LocalSearcher
    from riot_ray.types import RankOpts, SearchReq

    s = LocalSearcher(simple_index, hydrate=True)
    resp = s.search(
        SearchReq(text=" ".join(PHRASE), phrase=True,
                  rank_opts=RankOpts(max_outputs=0))
    )
    got = np.sort(np.array([int(h.doc_id) for h in resp.docs], dtype=np.int64))
    exp = _oracle_ids()
    assert len(exp) > 0
    assert (got == exp).all()
    assert resp.num_docs == len(exp)
    # phrase is stricter than AND: matches must be a strict subset
    plain = s.search(SearchReq(text=" ".join(PHRASE),
                               rank_opts=RankOpts(max_outputs=0)))
    assert len(exp) < plain.num_docs


def test_phrase_count_only(simple_index):
    from riot_ray.engine import LocalSearcher
    from riot_ray.types import SearchReq

    s = LocalSearcher(simple_index, hydrate=True)
    resp = s.search(
        SearchReq(text=" ".join(PHRASE), phrase=True, count_docs_only=True)
    )
    assert resp.num_docs == len(_oracle_ids())
    assert resp.docs == []


def test_phrase_actor_and_batched_path(simple_index):
    from riot_ray.engine import ActorSearcher
    from riot_ray.types import RankOpts, SearchReq

    s = ActorSearcher(simple_index, num_actors=2, hydrate=True)
    try:
        req = SearchReq(text=" ".join(PHRASE), phrase=True,
                        rank_opts=RankOpts(max_outputs=0))
        exp = _oracle_ids()
        got = np.sort(np.array([int(h.doc_id) for h in s.search(req).docs],
                               dtype=np.int64))
        assert (got == exp).all()
        # search_many goes through _plan (the batched shard-worker path)
        many = s.search_many([req, req])
        for resp in many:
            ids = np.sort(np.array([int(h.doc_id) for h in resp.docs],
                                   dtype=np.int64))
            assert (ids == exp).all()
    finally:
        s.shutdown()


def test_phrase_single_token_standalone(simple_index):
    from riot_ray.engine import LocalSearcher
    from riot_ray.types import RankOpts, SearchReq

    s = LocalSearcher(simple_index, hydrate=True)
    resp = s.search(SearchReq(text="spark", phrase=True,
                              rank_opts=RankOpts(max_outputs=0)))
    plain = s.search(SearchReq(text="spark", rank_opts=RankOpts(max_outputs=0)))
    # a token occurrence IS a standalone occurrence: same doc set
    assert resp.num_docs == plain.num_docs


def test_phrase_with_stop_word_matches_literal_text(ray_session, tmp_path):
    """A stop word INSIDE the phrase must stay in the adjacency regex: the
    doc containing the literal phrase matches; the doc where the remaining
    words are directly adjacent does not (ADVICE r2, engine.py phrase
    pattern built from stop-filtered tokens)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from riot_ray.build import IndexWriter
    from riot_ray.config import EngineOpts
    from riot_ray.engine import LocalSearcher
    from riot_ray.types import RankOpts, SearchReq

    src = tmp_path / "docs.parquet"
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": [
                    "alpha the beta gamma",   # literal phrase w/ stop word
                    "alpha beta gamma",       # adjacent WITHOUT the stop word
                    "alpha zzz beta gamma",   # neither
                ],
                "lang": ["en"] * 3,
            }
        ),
        src,
    )
    opts = EngineOpts(
        mode="simple", id_cols=("doc_id",), content_col="text",
        meta_cols=("lang",), num_parts=2, num_shards=2,
        stop_tokens=("the",),
    )
    idx = tmp_path / "index"
    IndexWriter(str(idx), opts).build(str(src))
    s = LocalSearcher(str(idx), hydrate=True)
    resp = s.search(SearchReq(text="alpha the beta", phrase=True,
                              rank_opts=RankOpts(max_outputs=0)))
    assert sorted(int(h.doc_id) for h in resp.docs) == [1]
    # control: the phrase without the stop word keeps matching doc 2 only
    resp2 = s.search(SearchReq(text="alpha beta", phrase=True,
                               rank_opts=RankOpts(max_outputs=0)))
    assert sorted(int(h.doc_id) for h in resp2.docs) == [2]


def test_phrase_requires_supported_mode():
    from riot_ray.tokenize import phrase_pattern

    with pytest.raises(ValueError, match="phrase search supports"):
        phrase_pattern(["a", "b"], "code")


def test_phrase_requires_hydrate(simple_index):
    from riot_ray.engine import LocalSearcher
    from riot_ray.types import RankOpts, SearchReq

    s = LocalSearcher(simple_index, hydrate=False)
    with pytest.raises(ValueError, match="hydrate"):
        s.search(SearchReq(text=" ".join(PHRASE), phrase=True,
                           rank_opts=RankOpts(max_outputs=0)))
