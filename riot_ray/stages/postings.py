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
import pyarrow.compute as pc

from ..codecs import _THRESHOLDS, encode_varbyte
from ..config import META_TERM, PART_SHIFT, EngineOpts
from ..tokenize import Tokenizer, needs_positions, tokens_map_to_rows
from .segments import _large_binary_from_offsets


class TokenizeStage:
    """Callable-class stage for ``map_batches`` — actor pool when the
    tokenizer holds real state (code-mode expansion cache, stop set).

    ``tokenizer_factory`` injects a custom analyzer (X3 — riot's WithGse,
    /root/reference/engine.go:250-259): any picklable ``factory(opts) ->
    Tokenizer-like`` with the same ``doc_tokens_map``/``batch_term_counts``
    /``query_tokens`` surface.  The same factory must be handed to the
    searcher so the query side tokenizes byte-identically."""

    def __init__(self, opts: EngineOpts, tokenizer_factory=None):
        self.opts = opts
        self.tok = (tokenizer_factory or Tokenizer)(opts)
        self.with_pos = needs_positions(opts)
        self.custom = tokenizer_factory is not None

    def __call__(self, batch: pa.Table) -> pa.Table:
        opts = self.opts
        vector_ok = (
            opts.mode in ("simple", "code")
            and not self.with_pos
            and opts.tokens_col is None
            and opts.labels_col is None
            # explicit DocIndex.TokenLen overrides are applied in the per-doc
            # path only — the vectorized path derives token_len from counts
            and opts.token_len_col is None
            # pinyin expansion is per-doc only (segment.go:231-241)
            and not getattr(opts, "pinyin", False)
            and hasattr(self.tok, "batch_term_counts")
        )
        if vector_ok:
            return self._vectorized(batch)
        return self._perdoc(batch)

    # -- hot path ---------------------------------------------------------
    def _vectorized(self, batch: pa.Table) -> pa.Table:
        """Packed combiner output: ONE row per (shard, term) carrying the
        batch's postings, plus one META_TERM row per shard carrying
        (doc, token_len) docmeta pairs.  This shrinks the shuffle from a row
        per (term, doc) to a row per distinct term per batch — the
        pre-aggregation that makes the groupby("shard") exchange cheap
        (SURVEY.md §4 hot-key guidance).

        Shuffle diet: docs travel SORTED + delta + varbyte packed into a
        binary column (~2-3 B/posting vs 8 B raw u64 + list offsets), tfs as
        raw little-endian f32 bytes; the per-row posting count is implicit
        (len(tfs)/4).  BuildShard re-sorts everything by (term, doc) anyway,
        so pre-sorting per run costs nothing semantically and makes the
        deltas small.  Schema:

            shard:int32, term:string,
            docs_vb:large_binary, tfs_f32:large_binary
        """
        opts = self.opts
        contents = batch[opts.content_col]
        if isinstance(contents, pa.ChunkedArray):
            contents = contents.combine_chunks()
        doc = batch["doc"].to_numpy(zero_copy_only=False).astype(np.uint64)
        parent, terms, tf, token_len = self.tok.batch_term_counts(contents)
        if isinstance(terms, pa.ChunkedArray):
            terms = terms.combine_chunks()

        part_of_doc = (doc >> np.uint64(PART_SHIFT)).astype(np.int64)
        shard_of_doc = (part_of_doc * opts.num_shards // opts.num_parts).astype(np.int64)

        denc = pc.dictionary_encode(terms)
        if isinstance(denc, pa.ChunkedArray):
            denc = denc.combine_chunks()
        codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vocab = denc.dictionary
        p_doc = doc[parent]
        p_tf = tf.astype(np.float32)
        p_shard = shard_of_doc[parent]

        # sort postings by (shard, term-code, doc): contiguous runs per
        # output row with ascending docs inside each run (delta-encodable)
        order = np.lexsort((p_doc, codes, p_shard))
        s_shard, s_code = p_shard[order], codes[order]
        s_doc, s_tf = p_doc[order], p_tf[order]
        n = len(order)
        if n:
            newrun = np.r_[True, (s_shard[1:] != s_shard[:-1]) | (s_code[1:] != s_code[:-1])]
            starts = np.flatnonzero(newrun)
            ends = np.r_[starts[1:], n]
        else:
            starts = np.empty(0, np.int64)
            ends = np.empty(0, np.int64)

        out_shard = s_shard[starts]
        out_term = vocab.take(pa.array(s_code[starts]))

        # docmeta rows: one META_TERM row per shard, docs ascending
        dorder = np.lexsort((doc, shard_of_doc))
        d_shard = shard_of_doc[dorder]
        d_doc = doc[dorder]
        d_len = token_len[dorder].astype(np.float32)
        if len(d_shard):
            dnew = np.r_[True, d_shard[1:] != d_shard[:-1]]
            dstarts = np.flatnonzero(dnew)
            dends = np.r_[dstarts[1:], len(d_shard)]
        else:
            dstarts = np.empty(0, np.int64)
            dends = np.empty(0, np.int64)

        # one packed encode over postings + docmeta values together
        all_doc = np.concatenate([s_doc, d_doc]) if (n or len(d_doc)) else s_doc
        all_tf = np.concatenate([s_tf, d_len]) if (n or len(d_len)) else s_tf
        row_starts = np.concatenate([starts, n + dstarts]).astype(np.int64)
        row_ends = np.concatenate([ends, n + dends]).astype(np.int64)

        deltas = all_doc.copy()
        if len(deltas):
            deltas[1:] -= all_doc[:-1]
            deltas[row_starts] = all_doc[row_starts]
        vb = encode_varbyte(deltas)
        vlen = np.searchsorted(_THRESHOLDS, deltas, side="right").astype(np.int64) + 1
        vb_ends = np.cumsum(vlen)
        blk_ends = vb_ends[row_ends - 1] if len(row_ends) else np.empty(0, np.int64)
        blk_starts = np.r_[0, blk_ends[:-1]] if len(row_ends) else np.empty(0, np.int64)
        # rows are laid out consecutively (postings runs then meta runs), so
        # per-row slices tile the buffer exactly
        docs_vb = _large_binary_from_offsets(vb, blk_ends)
        assert len(blk_starts) == len(row_starts)

        tf_bytes = np.ascontiguousarray(all_tf, dtype="<f4").tobytes()
        tfs_col = _large_binary_from_offsets(tf_bytes, row_ends * 4)

        shard_col = np.r_[out_shard, d_shard[dstarts]].astype(np.int32)
        term_col = pa.concat_arrays(
            [out_term.combine_chunks() if isinstance(out_term, pa.ChunkedArray) else out_term,
             pa.array([META_TERM] * len(dstarts), pa.string())]
        )
        return pa.table(
            {
                "shard": pa.array(shard_col, pa.int32()),
                "term": term_col,
                "docs_vb": docs_vb,
                "tfs_f32": tfs_col,
            }
        )

    # -- conformance path -------------------------------------------------
    def _perdoc(self, batch: pa.Table) -> pa.Table:
        opts = self.opts
        contents = batch[opts.content_col].to_pylist() if opts.content_col in batch.column_names else [None] * batch.num_rows
        docs = batch["doc"].to_numpy(zero_copy_only=False)
        ext_tokens = batch[opts.tokens_col].to_pylist() if opts.tokens_col and opts.tokens_col in batch.column_names else [None] * batch.num_rows
        labels = batch[opts.labels_col].to_pylist() if opts.labels_col and opts.labels_col in batch.column_names else [None] * batch.num_rows
        tl_over = (
            batch[opts.token_len_col].to_pylist()
            if opts.token_len_col and opts.token_len_col in batch.column_names
            else [None] * batch.num_rows
        )

        o_term, o_doc, o_tf, o_len, o_head, o_pos = [], [], [], [], [], []
        for i in range(batch.num_rows):
            tmap, num_tokens, freq_ov = self.tok.doc_tokens_map(
                contents[i] or "", ext_tokens[i], labels[i]
            )
            if tl_over[i] is not None:
                num_tokens = tl_over[i]  # explicit DocIndex.TokenLen
            terms, tfs, poss = tokens_map_to_rows(tmap, self.with_pos, freq_ov)
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
