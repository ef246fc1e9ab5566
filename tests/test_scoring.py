"""Custom ScoringCriteria hook (X1): multi-score lexicographic order,
drop-on-empty, reverse order, hydrated fields — semantics of
/root/reference/core/ranker_test.go and types/scoring_criteria.go:19-24."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from riot_ray.build import IndexWriter
from riot_ray.config import EngineOpts
from riot_ray.engine import LocalSearcher
from riot_ray.types import RankOpts, SearchReq


@pytest.fixture(scope="module")
def scored_index(ray_session, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("scoring")
    rows = [
        ("1", "alpha beta", 6.0),
        ("2", "alpha beta", 0.0),
        ("3", "alpha beta", 24.0),
        ("4", "alpha beta", 18.0),
    ]
    table = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows]),
            "content": pa.array([r[1] for r in rows]),
            "amount": pa.array([r[2] for r in rows], pa.float64()),
        }
    )
    src = os.path.join(str(tmp), "docs.parquet")
    pq.write_table(table, src)
    opts = EngineOpts(
        mode="simple",
        id_cols=("doc_id",),
        content_col="content",
        meta_cols=("amount",),
        num_parts=2,
        num_shards=2,
    )
    idx = os.path.join(str(tmp), "idx")
    IndexWriter(idx, opts).build(src)
    return idx


def test_threshold_scorer_drop_on_empty(scored_index):
    s = LocalSearcher(scored_index, hydrate=True)

    def threshold_scorer(hit, fields):
        # DummyScoringCriteria{Threshold: 10} semantics
        v = float(fields["amount"])
        if v < 10:
            return []  # drop-on-empty (/root/reference/core/ranker.go:132-137)
        return [v]

    resp = s.search(
        SearchReq(text="alpha", rank_opts=RankOpts(scoring_criteria=threshold_scorer))
    )
    assert [(h.doc_id, h.scores) for h in resp.docs] == [
        ("3", (24.0,)),
        ("4", (18.0,)),
    ]
    assert resp.num_docs == 2  # dropped docs don't count


def test_multi_score_lexicographic_longer_wins(scored_index):
    s = LocalSearcher(scored_index, hydrate=True)

    def multi(hit, fields):
        v = float(fields["amount"])
        if hit.doc_id == "2":
            return [6.0]        # prefix of doc 1's vector
        if hit.doc_id == "1":
            return [6.0, 1.0]   # longer vector ranks higher on tie
        return [v / 10.0]

    resp = s.search(SearchReq(text="alpha", rank_opts=RankOpts(scoring_criteria=multi)))
    # expected: 1 (6,1) > 2 (6) > 3 (2.4) > 4 (1.8)
    assert [h.doc_id for h in resp.docs] == ["1", "2", "3", "4"]


def test_reverse_order_with_criteria(scored_index):
    s = LocalSearcher(scored_index, hydrate=True)

    def by_amount(hit, fields):
        return [float(fields["amount"])]

    resp = s.search(
        SearchReq(
            text="alpha",
            rank_opts=RankOpts(scoring_criteria=by_amount, reverse_order=True),
        )
    )
    assert [h.doc_id for h in resp.docs] == ["2", "1", "4", "3"]


def test_default_bm25_scores_attached(scored_index):
    s = LocalSearcher(scored_index)
    resp = s.search(SearchReq(text="alpha beta"))
    assert len(resp.docs) == 4
    for h in resp.docs:
        assert h.scores == (h.bm25,)
