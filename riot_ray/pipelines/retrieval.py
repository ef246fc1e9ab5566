"""Offline batch retrieval: a query TABLE streamed through index-holding
actors.

The batch counterpart of riot's online ``Engine.Search``
(/root/reference/engine.go:509-679) for the training-data case: millions
of STORED queries — hard-negative mining, eval-set retrieval, doc-to-doc
distillation — scored against one fixed index.  The kernel stage is
``engine.search_dataset`` (``_BatchQueryStage``: one ``LocalSearcher``
per actor, loaded once in ``__init__``, ``search_many`` plan sharing per
batch); this wrapper fixes the TRAINING-PIPELINE output contract on top
— oracle-exact integer milli scores, rank implied by the (score desc,
doc_id asc) row order, no float column to hash-drift.

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
    from ..engine import search_dataset

    out = search_dataset(
        index_dir,
        queries_ds,
        max_outputs=k,
        concurrency=concurrency,
        batch_size=batch_size,
        tokenizer_factory=tokenizer_factory,
    )

    def to_milli(b: pa.Table) -> pa.Table:
        sc = b["bm25"].to_numpy(zero_copy_only=False)
        milli = np.floor(sc * 1000.0 + 0.5).astype(np.int64)
        return pa.table(
            {
                "query_id": b["query_id"],
                "doc_id": b["doc_id"],
                "score_milli": pa.array(milli, pa.int64()),
            }
        )

    return out.map_batches(to_milli, batch_format="pyarrow")
