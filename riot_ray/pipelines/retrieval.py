"""Offline batch retrieval: a query TABLE streamed through index-holding
actors.

The batch counterpart of riot's online ``Engine.Search``
(/root/reference/engine.go:509-679) for the training-data case: millions
of STORED queries — hard-negative mining, eval-set retrieval, doc-to-doc
distillation — scored against one fixed index.  Ray Data shape: the
queries are just a Dataset; ``map_batches`` with a CLASS (stateful actor
pool) loads the full serving state ONCE per actor (``LocalSearcher``
over the on-disk segment files — the same kernels the online path uses)
and each ``__call__`` scores one Arrow batch of queries.

Scale shape (the part that matters at 10^9 queries):
* queries stream with backpressure — the query table is never
  materialized, and each actor holds only one batch of them at a time;
* the index is read once per actor from shared storage (not per batch,
  not per query) and shared read-only across the pool's calls;
* output is k rows per query, emitted as the batch completes — the
  result is itself a Dataset, so downstream stages (joins against the
  positives, sampling, packing) pipeline without a barrier;
* no shuffle anywhere: this is embarrassingly parallel over queries.
  Sizing: ``concurrency`` x (index resident size) must fit the node;
  for indexes too big per-actor, shard the index and fan out instead
  (``ActorSearcher``), trading the extra RPC per query.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def batch_retrieval(
    queries_ds,
    index_dir: str,
    k: int = 10,
    concurrency: int = 2,
    batch_size: int = 256,
    tokenizer_factory=None,
):
    """Top-k BM25 retrieval for every row of a query Dataset.

    ``queries_ds`` schema: ``(query_id: int64, text: string)``.  Returns a
    Dataset ``(query_id: int64, doc_id: string, score_milli: int64)`` with
    <= k rows per query — ties and ordering exactly as the online path
    (score desc, doc_id-string asc at the k boundary), ``score_milli =
    floor(bm25 * 1000 + 0.5)`` (the repo's oracle-exact milli convention).
    Queries with no AND match contribute zero rows.

    Duplicate query texts inside a batch share one kernel pass
    (``search_many``'s distinct-plan cache), so skewed query logs — the
    common case — get cheaper, not hotter.

    Partitioning assumption: parallelism follows the INPUT's block count
    (one block = one task) — a query table from ``read_parquet`` arrives
    in file/row-group blocks and fans out naturally, but a single-block
    in-memory table (``from_arrow``/``from_items``) must be
    ``repartition(n)``-ed first or one actor serves everything.
    """
    from ..engine import LocalSearcher
    from ..types import RankOpts, SearchReq

    class _Retrieve:
        def __init__(self):
            self.se = LocalSearcher(index_dir, tokenizer_factory=tokenizer_factory)

        def __call__(self, batch: pa.Table) -> pa.Table:
            qids = batch["query_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            texts = batch["text"].to_pylist()
            reqs = [
                SearchReq(text=t or "", rank_opts=RankOpts(max_outputs=k))
                for t in texts
            ]
            resps = self.se.search_many(reqs)
            n_hits = [len(r.docs) for r in resps]
            out_q = np.repeat(qids, n_hits)
            out_d = [h.doc_id for r in resps for h in r.docs]
            sc = np.array(
                [h.bm25 for r in resps for h in r.docs], dtype=np.float64
            )
            milli = np.floor(sc * 1000.0 + 0.5).astype(np.int64)
            return pa.table(
                {
                    "query_id": pa.array(out_q, pa.int64()),
                    "doc_id": pa.array(out_d, pa.string()),
                    "score_milli": pa.array(milli, pa.int64()),
                }
            )

    return queries_ds.map_batches(
        _Retrieve,
        concurrency=concurrency,
        batch_size=batch_size,
        batch_format="pyarrow",
    )
