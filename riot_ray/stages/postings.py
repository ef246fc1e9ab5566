"""Tokenize stage: forward-table batches -> postings rows.

One ``map_batches`` flat-map (SURVEY.md §2.2 M1-M11).  The freq-mode
simple/code path is fully vectorized; space/pretokenized/locs paths run
per-doc Python (conformance features).  Emitted schema:

    term:string, doc:uint64, tf:float32, token_len:float32,
    is_head:uint8 [, positions:list<int32> in locs mode]

``token_len`` (riot's DocIndex.TokenLen, /root/reference/segment.go:284)
rides on every row so the per-shard build can extract doc lengths without a
second shuffle; ``is_head`` marks exactly one row per doc for exact corpus
stats.  ``shard`` is pure arithmetic on the doc u64 (its high bits are the
hash partition), so routing postings to query shards costs no string hash.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import META_TERM, PART_SHIFT, EngineOpts
from ..tokenize import Tokenizer, needs_positions, tokens_map_to_rows


class TokenizeStage:
    """Callable-class stage for ``map_batches`` — actor pool when the
    tokenizer holds real state (code-mode expansion cache, stop set)."""

    def __init__(self, opts: EngineOpts):
        self.opts = opts
        self.tok = Tokenizer(opts)
        self.with_pos = needs_positions(opts)

    def __call__(self, batch: pa.Table) -> pa.Table:
        opts = self.opts
        vector_ok = (
            opts.mode in ("simple", "code")
            and not self.with_pos
            and opts.tokens_col is None
            and opts.labels_col is None
        )
        if vector_ok:
            return self._vectorized(batch)
        return self._perdoc(batch)

    # -- hot path ---------------------------------------------------------
    def _vectorized(self, batch: pa.Table) -> pa.Table:
        contents = batch[self.opts.content_col]
        if isinstance(contents, pa.ChunkedArray):
            contents = contents.combine_chunks()
        doc = batch["doc"].to_numpy(zero_copy_only=False).astype(np.uint64)
        parent, terms, tf, token_len = self.tok.batch_term_counts(contents)
        # batch_term_counts returns (doc,term) pairs sorted by (parent, code)
        is_head = np.zeros(len(parent), dtype=np.uint8)
        if len(parent):
            is_head[np.r_[True, parent[1:] != parent[:-1]]] = 1
        # docs that produced no postings still need a docmeta (META_TERM) row
        seen = np.zeros(len(doc), dtype=bool)
        seen[parent] = True
        empty_idx = np.flatnonzero(~seen)
        term_arr = terms
        out_doc = doc[parent]
        out_tf = tf.astype(np.float32)
        out_len = token_len[parent].astype(np.float32)
        if len(empty_idx):
            term_arr = pa.concat_arrays(
                [term_arr.combine_chunks() if isinstance(term_arr, pa.ChunkedArray) else term_arr,
                 pa.array([META_TERM] * len(empty_idx), pa.string())]
            )
            out_doc = np.r_[out_doc, doc[empty_idx]]
            out_tf = np.r_[out_tf, np.zeros(len(empty_idx), np.float32)]
            out_len = np.r_[out_len, token_len[empty_idx].astype(np.float32)]
            is_head = np.r_[is_head, np.ones(len(empty_idx), np.uint8)]
        out = pa.table(
            {
                "term": term_arr,
                "doc": pa.array(out_doc, pa.uint64()),
                "tf": pa.array(out_tf, pa.float32()),
                "token_len": pa.array(out_len, pa.float32()),
                "is_head": pa.array(is_head, pa.uint8()),
            }
        )
        return self._with_shard(out)

    # -- conformance path -------------------------------------------------
    def _perdoc(self, batch: pa.Table) -> pa.Table:
        opts = self.opts
        contents = batch[opts.content_col].to_pylist() if opts.content_col in batch.column_names else [None] * batch.num_rows
        docs = batch["doc"].to_numpy(zero_copy_only=False)
        ext_tokens = batch[opts.tokens_col].to_pylist() if opts.tokens_col and opts.tokens_col in batch.column_names else [None] * batch.num_rows
        labels = batch[opts.labels_col].to_pylist() if opts.labels_col and opts.labels_col in batch.column_names else [None] * batch.num_rows

        o_term, o_doc, o_tf, o_len, o_head, o_pos = [], [], [], [], [], []
        for i in range(batch.num_rows):
            tmap, num_tokens = self.tok.doc_tokens_map(
                contents[i] or "", ext_tokens[i], labels[i]
            )
            terms, tfs, poss = tokens_map_to_rows(tmap, self.with_pos)
            if not terms:
                terms, tfs, poss = [META_TERM], [0.0], [[]]
            for j, t in enumerate(terms):
                o_term.append(t)
                o_doc.append(int(docs[i]))
                o_tf.append(tfs[j])
                o_len.append(float(num_tokens))
                o_head.append(1 if j == 0 else 0)
                o_pos.append(poss[j])
        cols = {
            "term": pa.array(o_term, pa.string()),
            "doc": pa.array(o_doc, pa.uint64()),
            "tf": pa.array(o_tf, pa.float32()),
            "token_len": pa.array(o_len, pa.float32()),
            "is_head": pa.array(o_head, pa.uint8()),
        }
        if self.with_pos:
            cols["positions"] = pa.array(o_pos, pa.list_(pa.int32()))
        return self._with_shard(pa.table(cols))

    def _with_shard(self, out: pa.Table) -> pa.Table:
        doc = out["doc"].to_numpy(zero_copy_only=False).astype(np.uint64)
        part = (doc >> np.uint64(PART_SHIFT)).astype(np.int64)
        shard = (part * self.opts.num_shards // self.opts.num_parts).astype(np.int32)
        return out.append_column("shard", pa.array(shard, pa.int32()))
