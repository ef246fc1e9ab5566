"""Block-max WAND fast path: identical top-k vs the naive scorer.

Exactness contract: for any AND query, search(approx_count=True) must
return the same (score, doc-set) sequence as the exhaustive path — pruning
may only skip docs that cannot enter the top-k.
"""

import pytest

from riot_ray.engine import LocalSearcher
from riot_ray.types import RankOpts, SearchReq


@pytest.fixture(scope="module")
def searcher(corpus_index):
    return LocalSearcher(corpus_index["index_dir"])


def _levels(docs):
    """[(rounded score, set of doc_ids at that score)] — tie-safe compare."""
    out = []
    for h in docs:
        s = round(h.bm25, 4)
        if out and out[-1][0] == s:
            out[-1][1].add(h.doc_id)
        else:
            out.append((s, {h.doc_id}))
    return out


QUERIES = [
    "parse", "parse batch", "merge sort", "read write open",
    "def import", "index query search", "parse_batch", "loadJson",
]


@pytest.mark.parametrize("text", QUERIES)
def test_wand_topk_matches_naive(searcher, text):
    for k in (1, 3, 10):
        naive = searcher.search(SearchReq(text=text, rank_opts=RankOpts(max_outputs=k)))
        wand = searcher.search(
            SearchReq(text=text, rank_opts=RankOpts(max_outputs=k), approx_count=True)
        )
        assert _levels(wand.docs) == _levels(naive.docs), (text, k)


def test_wand_with_offset(searcher):
    naive = searcher.search(
        SearchReq(text="parse batch", rank_opts=RankOpts(max_outputs=5, output_offset=3))
    )
    wand = searcher.search(
        SearchReq(
            text="parse batch",
            rank_opts=RankOpts(max_outputs=5, output_offset=3),
            approx_count=True,
        )
    )
    assert _levels(wand.docs) == _levels(naive.docs)


def test_wand_prunes_scoring(searcher):
    """num_docs under WAND counts only scored docs — must not exceed the
    exhaustive match count, and top-k membership is unaffected."""
    naive = searcher.search(SearchReq(text="def", rank_opts=RankOpts(max_outputs=5)))
    wand = searcher.search(
        SearchReq(text="def", rank_opts=RankOpts(max_outputs=5), approx_count=True)
    )
    assert wand.num_docs <= naive.num_docs
    assert _levels(wand.docs) == _levels(naive.docs)


@pytest.fixture(scope="module")
def tie_searcher(ray_session, tmp_path_factory):
    """Tie-dense corpus at tiny block_size: many identical docs (equal
    scores at the k boundary) + skewed lengths — the adversarial shape for
    the best-first batched WAND kernel's tie handling."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from riot_ray.build import IndexWriter
    from riot_ray.config import EngineOpts

    root = tmp_path_factory.mktemp("wand_ties")
    rng = np.random.default_rng(17)
    vocab = [f"w{i}" for i in range(12)]
    rows = []
    for i in range(400):
        base = " ".join(rng.choice(vocab, size=int(rng.integers(3, 30))))
        rows.append(rows[i - 3] if i % 3 == 0 and i >= 3 else base)  # ties
    src = str(root / "src.parquet")
    pq.write_table(pa.table({
        "repo": ["r"] * len(rows), "path": [f"p{i}" for i in range(len(rows))],
        "commit": ["c"] * len(rows), "lang": ["x"] * len(rows),
        "content": rows,
    }), src)
    idx = str(root / "index")
    IndexWriter(idx, EngineOpts(mode="space", num_parts=4, num_shards=2,
                                block_size=8)).build(src)
    return LocalSearcher(idx)


def test_wand_matches_naive_tie_dense_random_queries(tie_searcher):
    import itertools

    vocab = [f"w{i}" for i in range(12)]
    queries = [f"{a} {b}" for a, b in itertools.permutations(vocab[:7], 2)]
    queries += [f"{a} {b} {c}" for a, b, c in
                itertools.combinations(vocab[:6], 3)]
    for text in queries:
        for k in (1, 2, 10):
            naive = tie_searcher.search(
                SearchReq(text=text, rank_opts=RankOpts(max_outputs=k)))
            wand = tie_searcher.search(
                SearchReq(text=text, rank_opts=RankOpts(max_outputs=k),
                          approx_count=True))
            assert _levels(wand.docs) == _levels(naive.docs), (text, k)
