"""Public request/response types.

Semantics mirror /root/reference/types/search_request.go:19-99 and
search_response.go:23-161 (struct shapes only — the implementation is new).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Sequence


@dataclass
class Expr:
    """Per-clause keyword arrays (/root/reference/types/search_request.go:86-99)."""

    must: tuple = ()
    should: tuple = ()
    not_in: tuple = ()


@dataclass
class Logic:
    """AND/OR/NOT flags over SearchReq.tokens, or explicit Expr clauses
    (/root/reference/types/search_request.go:72-99)."""

    must: bool = False
    should: bool = False
    not_in: bool = False
    expr: Expr = field(default_factory=Expr)

    def active(self, n_keywords: int) -> bool:
        # /root/reference/core/indexer.go:386-411: flag-logic requires keywords;
        # expr-logic requires a must/should clause (NotIn len>=0 is always true).
        if (self.must or self.should or self.not_in) and n_keywords > 0:
            return True
        return bool(self.expr.must or self.expr.should)


@dataclass
class RankOpts:
    """/root/reference/types/search_request.go:57-69."""

    scoring_criteria: Callable[["ScoredHit", Any], Sequence[float]] | None = None
    reverse_order: bool = False
    output_offset: int = 0
    max_outputs: int = 0  # 0 = unlimited


@dataclass
class SearchReq:
    """/root/reference/types/search_request.go:19-54."""

    text: str = ""
    tokens: tuple = ()          # appended after tokenized text
    labels: tuple = ()          # AND-participating, tf=0 terms
    doc_ids: frozenset | None = None  # allowlist of doc_id strings
    logic: Logic | None = None
    rank_opts: RankOpts | None = None
    timeout_ms: int = 0
    count_docs_only: bool = False
    orderless: bool = False
    # opt-in block-max WAND fast path: identical top-k, but num_docs becomes
    # the number of docs actually scored (pruned blocks are never counted).
    # riot has no analog — its Lookup always scores every hit.
    approx_count: bool = False
    # exact-phrase search: query tokens must appear consecutively in the
    # document (only separator characters between them).  Postings AND
    # prunes candidates; hydrated content verifies exactly.  Requires a
    # searcher built with hydrate=True and modes 'simple' or 'space'.
    # riot has no phrase operator — this extends its AND semantics.
    phrase: bool = False
    # facet columns (forward-table attribute names): the response carries
    # {col: {value: n_docs}} counted over the FULL matching set (before
    # offset/limit), merged across shards by summation.  Not combinable
    # with approx_count (WAND never sees the full set).  riot has no
    # facet operator — this is the aggregation search engines bolt on.
    # NULL attribute values are counted under the "" (empty-string) bucket
    # — a documented sentinel, unlike SQL GROUP BY's distinct NULL group.
    facets: tuple = ()


@dataclass
class ScoredHit:
    """Union of riot's IndexedDoc + ScoredID
    (/root/reference/types/index.go:47-67, search_response.go:121-137)."""

    doc_id: str
    doc: int = 0                      # internal u64
    scores: tuple = ()
    bm25: float = 0.0
    token_proximity: int = -1
    token_snippet_locs: tuple = ()
    token_locs: tuple = ()            # tuple of tuples, per query token
    fields: dict | None = None        # hydrated meta columns (SearchDoc variant)
    content: str | None = None


@dataclass
class SearchResp:
    """/root/reference/types/search_response.go:23-60."""

    tokens: tuple = ()
    docs: list = field(default_factory=list)   # list[ScoredHit]
    num_docs: int = 0
    timeout: bool = False
    facets: dict | None = None  # {col: {value: n_docs}} when requested


def _cmp_hits(a: ScoredHit, b: ScoredHit) -> int:
    """Deterministic total order replacing riot's unstable sort.Sort
    (/root/reference/engine.go:658, core/ranker.go:163-168): descending
    lexicographic over the score vector; when one vector is a prefix of the
    other, the LONGER vector ranks higher (search_response.go:97-108); then
    doc_id ascending as OUR documented tiebreak (SURVEY.md §2.9.2)."""
    n = min(len(a.scores), len(b.scores))
    for i in range(n):
        if a.scores[i] > b.scores[i]:
            return -1
        if a.scores[i] < b.scores[i]:
            return 1
    if len(a.scores) != len(b.scores):
        return -1 if len(a.scores) > len(b.scores) else 1
    if a.doc_id != b.doc_id:
        return -1 if a.doc_id < b.doc_id else 1
    return 0


def hit_sort_key():
    import functools

    return functools.cmp_to_key(_cmp_hits)


def sort_hits(hits: list, reverse: bool = False) -> None:
    """In-place sort by the `_cmp_hits` total order.  When every score
    vector has the same length (the default single-score path and any
    fixed-arity ScoringCriteria — i.e. almost always), the longer-prefix
    rule can never fire and the order equals a plain key sort on
    (negated scores, doc_id), which runs at C speed instead of one Python
    comparator call per compare (~3x faster merges measured).  Mixed
    lengths fall back to the comparator."""
    if len(hits) > 1:
        it = iter(hits)
        n0 = len(next(it).scores)
        if all(len(h.scores) == n0 for h in it):
            hits.sort(
                key=lambda h: (tuple(-s for s in h.scores), h.doc_id),
                reverse=reverse,
            )
            return
    hits.sort(key=hit_sort_key(), reverse=reverse)
