"""Query serving: per-shard kernels + actor-pool engine.

Doc-sharded serving (riot's architecture — /root/reference/engine.go:785-799
fans every query to all shards, per-shard top-(offset+k), global merge) with
globally-consistent BM25 statistics (NumShards=1 semantics, SURVEY.md
§2.9.1): the driver holds the global term->df dictionary and ships per-token
float32 idf values with each query, so shards never need cross-shard stats.

BM25 replicates /root/reference/core/indexer.go:523-547 operation-for-
operation in float32 (idf computed via log2 in float64 then cast, exactly
like Go's ``float32(math.Log2(...))``), accumulated per query token in token
order — the rank-identity contract.  ``score_dtype="float64"`` switches the
same kernel to f64 for DuckDB-oracle comparison.
"""

from __future__ import annotations

import glob
import os
import re

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .codecs import decode_varbyte
from .config import DOCIDS_INDEX, LOCS_INDEX, EngineOpts, shard_of_part
from .types import Logic, RankOpts, ScoredHit, SearchReq, SearchResp, sort_hits


# --------------------------------------------------------------------------- #
# BM25 (conformance-exact)
# --------------------------------------------------------------------------- #
def bm25_idf(n_docs: int, df: int, dtype=np.float32):
    # Go: float32(math.Log2(float64(numDocs)/float64(df) + 1))
    return dtype(np.log2(float(n_docs) / float(df) + 1.0))


def bm25_term_scores(idf, freq, d, avgdl, k1, b, dtype=np.float32):
    """idf * freq * (k1+1) / (freq + k1*(1-b+b*d/avgdl)) with every
    intermediate rounded at the target dtype, mirroring Go float32 ops
    left-to-right (/root/reference/core/indexer.go:536-546)."""
    one = dtype(1.0)
    k1 = dtype(k1)
    b = dtype(b)
    avgdl = dtype(avgdl)
    idf = dtype(idf)
    freq = np.asarray(freq).astype(dtype, copy=False)
    d = np.asarray(d).astype(dtype, copy=False)
    denom = freq + k1 * (one - b + b * d / avgdl)
    return idf * freq * (k1 + one) / denom


def bm25_term_scores_prenorm(idf, freq, norm, k1, dtype=np.float32):
    """Same kernel with the length norm ``k1*(1-b+b*d/avgdl)`` precomputed
    per doc (:meth:`ShardData.bm25_norms`) — elementwise op order is
    unchanged, so results are bit-identical to :func:`bm25_term_scores`."""
    one = dtype(1.0)
    k1 = dtype(k1)
    idf = dtype(idf)
    freq = np.asarray(freq).astype(dtype, copy=False)
    denom = freq + norm
    return idf * freq * (k1 + one) / denom


def default_scoring(hit: ScoredHit, fields) -> tuple:
    """RankByBM25 (/root/reference/types/scoring_criteria.go:27-33)."""
    return (hit.bm25,)


# --------------------------------------------------------------------------- #
# proximity DP — semantics of computeTokenProximity
# (/root/reference/core/indexer.go:723-813); new implementation
# --------------------------------------------------------------------------- #
def _sparse_levels(arr: np.ndarray) -> list:
    """Doubling-max levels of a sparse table over ``arr`` (O(n log n) build,
    reusable across queries — see :func:`_range_max`)."""
    levels = [arr]
    while (1 << len(levels)) <= len(arr):
        prev = levels[-1]
        step = 1 << (len(levels) - 1)
        levels.append(np.maximum(prev[: len(prev) - step], prev[step:]))
    return levels


def _range_max(levels: list, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized max over ``arr[a_i:b_i)`` for many (possibly overlapping)
    ranges with ``b > a``: the sparse table (``_sparse_levels``) answers
    every query as max of two aligned windows — the standard RMQ
    construction, fully numpy (no per-range Python loop)."""
    w = (b - a).astype(np.int64)
    # floor(log2(w)) exactly via frexp: w = m * 2^e with 0.5 <= m < 1
    lev = (np.frexp(w.astype(np.float64))[1] - 1).astype(np.int64)
    out = np.empty(len(a), np.float64)
    for j, L in enumerate(levels):
        m = lev == j
        if m.any():
            step = 1 << j
            out[m] = np.maximum(L[a[m]], L[b[m] - step])
    return out


def token_proximity(locations, tokens):
    """Minimize sum(|P_{i+1} - P_i - bytelen(token_i)|) over one position
    choice per token; two-candidate DP transition.  Returns
    (min_proximity, chosen position per token)."""
    k = len(tokens)
    if k == 0:
        return -1, ()
    if k == 1:
        return 0, (locations[0][0],)
    cur_locs = locations[0]
    cur_min = [0] * len(cur_locs)
    path = [None] * k
    for i in range(1, k):
        nxt = locations[i]
        nxt_min = [-1] * len(nxt)
        path[i] = [0] * len(nxt)
        tok_len = len(tokens[i - 1].encode("utf-8"))
        i_next = 0
        for i_cur, cur_loc in enumerate(cur_locs):
            if cur_min[i_cur] == -1:
                continue
            while i_next + 1 < len(nxt) and nxt[i_next + 1] < cur_loc:
                i_next += 1
            for to in (i_next, i_next + 1):
                if to >= len(nxt):
                    continue
                value = cur_min[i_cur] + abs(nxt[to] - cur_loc - tok_len)
                if nxt_min[to] == -1 or value < nxt_min[to]:
                    nxt_min[to] = value
                    path[i][to] = i_cur
        cur_locs = nxt
        cur_min = nxt_min
    best, cursor = -1, 0
    for i, v in enumerate(cur_min):
        if v == -1:
            continue
        if best == -1 or v < best:
            best, cursor = v, i
    out = [0] * k
    for i in range(k - 1, -1, -1):
        if i != k - 1:
            cursor = path[i + 1][cursor]
        out[i] = locations[i][cursor]
    return best, tuple(out)


# packed key = value * PACK + within-doc index: PACK bounds a term's
# positions within ONE doc (2^24), INF the accumulated proximity value
# (2^36 — positions are i4, k is small; values clamp there defensively).
# Sentinel INF*PACK = 2^60 fits int64 with headroom.
_PROX_INF = np.int64(1) << 36
_PROX_PACK = np.int64(1) << 24


def token_proximity_block(flats: list, tokens) -> tuple:
    """:func:`token_proximity` for ALL candidate docs at once — every DP
    layer is one vectorized pass over the concatenated position arrays
    (the per-doc Python loop was the proximity path's dominant cost,
    ~8 us/doc).

    ``flats[t] = (vals int64, offs int64[n+1])`` — token t's positions for
    each of the n docs, ascending within a doc.  Returns ``(prox int64[n],
    chosen list of k int64[n])``: the minimal proximity per doc (-1 where
    any token has no positions — the demoted case — or, defensively,
    where no path exists) and the chosen position per token per doc.

    Semantics are pinned to the scalar DP by a hypothesis equality test:
    the two-candidate transition with the ``max(#(P_next < pos) - 1, 0)``
    quirk, first-reacher wins on ties (packed (value, within-doc index)
    keys make ``np.minimum.at`` reproduce the scalar loop's strict-<
    update order)."""
    k = len(tokens)
    n = len(flats[0][1]) - 1 if k else 0
    if k == 0 or n == 0:
        return np.full(n, -1, np.int64), []
    lens = [offs[1:] - offs[:-1] for _vals, offs in flats]
    active = lens[0] > 0
    for ln in lens[1:]:
        active &= ln > 0
    if k == 1:
        vals, offs = flats[0]
        prox = np.where(active, 0, -1).astype(np.int64)
        chosen = np.zeros(n, np.int64)
        chosen[active] = vals[offs[:-1][active]]
        return prox, [chosen]

    # packed (value, within-doc index) keys require every per-doc position
    # count < _PROX_PACK (2^24); a pathological doc would silently corrupt
    # the tie-break ordering — hard-fail like dup_spans' analogous pack
    for ln in lens:
        if len(ln) and int(ln.max()) >= _PROX_PACK:
            raise ValueError(
                f"token_proximity_block: a document has >= {int(_PROX_PACK)} "
                "positions for one term; packed-key DP would corrupt — "
                "use token_proximity (scalar) for this document"
            )

    # positions shifted into disjoint per-doc ranges so ONE searchsorted
    # answers every doc's "# next-layer positions < this position" count
    stride = max(int(v.max()) + 2 if len(v) else 1 for v, _ in flats)

    def doc_of(offs):
        return np.repeat(np.arange(n, dtype=np.int64), offs[1:] - offs[:-1])

    cur_vals, cur_offs = flats[0]
    cur_doc = doc_of(cur_offs)
    # packed running cost: value * PACK + within-doc index of the BEST
    # predecessor is carried separately (paths); here value only
    cur_min = np.zeros(len(cur_vals), np.int64)
    paths = [None]
    for i in range(1, k):
        nxt_vals, nxt_offs = flats[i]
        nxt_doc = doc_of(nxt_offs)
        tok_len = len(tokens[i - 1].encode("utf-8"))
        count = np.searchsorted(
            nxt_vals + nxt_doc * stride, cur_vals + cur_doc * stride
        ) - nxt_offs[cur_doc]
        j0 = np.maximum(count - 1, 0)
        len_d = (nxt_offs[1:] - nxt_offs[:-1])[cur_doc]
        packed = np.full(len(nxt_vals), _PROX_INF * _PROX_PACK, np.int64)
        cur_idx = (np.arange(len(cur_vals), dtype=np.int64)
                   - cur_offs[cur_doc])
        reach = cur_min < _PROX_INF
        for cand in (j0, j0 + 1):
            ok = reach & (cand < len_d)
            if not ok.any():
                continue
            to = nxt_offs[cur_doc[ok]] + cand[ok]
            value = cur_min[ok] + np.abs(
                nxt_vals[to] - cur_vals[ok] - tok_len)
            value = np.minimum(value, _PROX_INF - 1)
            np.minimum.at(packed, to, value * _PROX_PACK + cur_idx[ok])
        paths.append(packed % _PROX_PACK)
        cur_min = packed // _PROX_PACK
        cur_vals, cur_offs, cur_doc = nxt_vals, nxt_offs, nxt_doc

    # best of the last layer per doc, first-index tie-break (packed again)
    last_idx = (np.arange(len(cur_vals), dtype=np.int64)
                - cur_offs[cur_doc])
    best = np.full(n, _PROX_INF * _PROX_PACK, np.int64)
    fin = cur_min < _PROX_INF
    np.minimum.at(best, cur_doc[fin],
                  cur_min[fin] * _PROX_PACK + last_idx[fin])
    prox = best // _PROX_PACK
    reached = active & (prox < _PROX_INF)
    prox = np.where(reached, prox, -1)
    # vectorized backtrack: k gathers walk the path arrays right-to-left
    chosen = [np.zeros(n, np.int64) for _ in range(k)]
    cursor = np.where(reached, best % _PROX_PACK, 0)
    docs = np.arange(n, dtype=np.int64)
    for i in range(k - 1, -1, -1):
        vals, offs = flats[i]
        at = np.minimum(offs[:-1] + cursor, np.maximum(offs[1:] - 1, 0))
        ch = np.zeros(n, np.int64)
        ch[reached] = vals[at[reached]]
        chosen[i] = ch
        if i:
            pat = np.zeros(n, np.int64)
            pat[reached] = paths[i][at[reached]]
            cursor = pat
    return prox, chosen


class _SnippetSeq:
    """Lazy per-candidate snippet tuples over the block DP's chosen-position
    columns — materialized ON ACCESS (the rank path touches only the top-k;
    building n python tuples up front was pure waste)."""

    __slots__ = ("cols", "prox")

    def __init__(self, cols, prox):
        self.cols = cols
        self.prox = prox

    def __len__(self):
        return len(self.prox)

    def __getitem__(self, i):
        if self.prox[i] == -1:
            return ()
        return tuple(int(c[i]) for c in self.cols)


class _TokenLocsSeq:
    """Lazy per-candidate full position-list tuples over the flat
    (vals, offs) arrays (same on-access contract as :class:`_SnippetSeq`)."""

    __slots__ = ("flats", "prox")

    def __init__(self, flats, prox):
        self.flats = flats
        self.prox = prox

    def __len__(self):
        return len(self.prox)

    def __getitem__(self, i):
        if self.prox[i] == -1:
            return ()
        return tuple(
            tuple(v[o[i]: o[i + 1]].tolist()) for v, o in self.flats
        )


# --------------------------------------------------------------------------- #
# hit block: column-oriented candidate set (replaces per-hit dicts so the
# default-scoring rank path is one vectorized argsort, not 2N allocations)
# --------------------------------------------------------------------------- #
class HitBlock:
    __slots__ = ("doc", "doc_id", "bm25", "proximity", "snippet", "token_locs")

    def __init__(self, doc, doc_id, bm25, proximity=None, snippet=None, token_locs=None):
        self.doc = doc              # u64[n]
        self.doc_id = doc_id        # object[n]
        self.bm25 = bm25            # f64[n]
        self.proximity = proximity  # i64[n] | None (locs mode)
        self.snippet = snippet      # list[tuple] | None
        self.token_locs = token_locs

    def __len__(self):
        return len(self.doc)

    @staticmethod
    def empty():
        return HitBlock(
            np.empty(0, np.uint64), np.empty(0, object), np.empty(0, np.float64)
        )

    def take(self, mask: np.ndarray) -> "HitBlock":
        idx = np.flatnonzero(mask)
        return HitBlock(
            self.doc[idx],
            self.doc_id[idx],
            self.bm25[idx],
            self.proximity[idx] if self.proximity is not None else None,
            [self.snippet[i] for i in idx] if self.snippet is not None else None,
            [self.token_locs[i] for i in idx] if self.token_locs is not None else None,
        )

    def hit_at(self, i: int) -> ScoredHit:
        return ScoredHit(
            doc_id=self.doc_id[i],
            doc=int(self.doc[i]),
            bm25=float(self.bm25[i]),
            token_proximity=int(self.proximity[i]) if self.proximity is not None else -1,
            token_snippet_locs=self.snippet[i] if self.snippet is not None else (),
            token_locs=self.token_locs[i] if self.token_locs is not None else (),
        )


# --------------------------------------------------------------------------- #
# shard-resident data + lookup kernel
# --------------------------------------------------------------------------- #
class ShardData:
    """One segment shard in memory: term dict + packed block columns +
    docmeta + forward doc_id strings (and optional hydration columns).
    Read-only after load — no locks (riot needs RWMutex striping,
    /root/reference/core/indexer.go:36-52; we don't)."""

    def __init__(self, shard_id: int, index_dir: str, opts: EngineOpts, hydrate=False):
        self.shard_id = shard_id
        self.opts = opts
        sdir = os.path.join(index_dir, "segments", f"shard={shard_id:05d}")
        from .store import read_segment

        blocks = read_segment(sdir, "blocks")
        self.with_pos = "pos_i32" in blocks.column_names
        terms = blocks["term"].to_pylist()
        self.blk_n = blocks["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        self.blk_min = blocks["min_doc"].to_numpy(zero_copy_only=False).astype(np.uint64)
        self.blk_max = blocks["max_doc"].to_numpy(zero_copy_only=False).astype(np.uint64)
        self.blk_max_tf = blocks["max_tf"].to_numpy(zero_copy_only=False)
        self.blk_min_len = blocks["min_len"].to_numpy(zero_copy_only=False)
        self.docs_vb = blocks["docs_vb"].to_pylist()
        self.tfs_bin = blocks["tfs_f32"].to_pylist()
        if self.with_pos:
            self.pos_cnt_bin = blocks["pos_cnt_i32"].to_pylist()
            self.pos_bin = blocks["pos_i32"].to_pylist()
        # blocks are term-sorted: term -> contiguous block range
        self.term_range: dict[str, tuple] = {}
        start = 0
        for i in range(1, len(terms) + 1):
            if i == len(terms) or terms[i] != terms[start]:
                self.term_range[terms[start]] = (start, i)
                start = i
        dm = read_segment(sdir, "docmeta")
        self.dm_doc = dm["doc"].to_numpy(zero_copy_only=False).astype(np.uint64)
        self.dm_len = dm["token_len"].to_numpy(zero_copy_only=False)
        self.fw_doc = self.dm_doc  # forward load replaces with its own order
        self.fw_doc_id = None
        self.hydrate_cols: dict = {}
        self.tombstones = np.empty(0, dtype=np.uint64)  # sorted u64
        self._cache: dict[str, tuple] = {}
        self._fw_files: list[str] = []
        self._facet_cache: dict[str, tuple] = {}
        self._norm_cache: dict[tuple, np.ndarray] = {}
        self._ub_cache: dict[tuple, tuple] = {}
        self._pos_cache: dict[str, tuple] = {}
        self._id_sorted_ids = None  # fw_doc_id sorted by string (lazy)
        self._id_order = None
        self._load_forward(index_dir, opts, hydrate)

    def _load_forward(self, index_dir, opts, hydrate):
        files = []
        for f in sorted(glob.glob(os.path.join(index_dir, "forward", "part=*.parquet"))):
            part = int(re.search(r"part=(\d+)", f).group(1))
            if shard_of_part(part, opts.num_parts, opts.num_shards) == self.shard_id:
                files.append(f)
        self._fw_files = files
        extra = []
        if hydrate:
            extra = [c for c in list(opts.meta_cols)] + (
                [opts.content_col] if opts.store_content else []
            )
        if not files:
            self.fw_doc = np.empty(0, dtype=np.uint64)
            self.fw_doc_id = np.empty(0, dtype=object)
            self.hydrate_cols = {c: np.empty(0, dtype=object) for c in extra}
            return
        t = pq.read_table(files, columns=["doc", "doc_id"] + extra)
        doc = t["doc"].to_numpy(zero_copy_only=False).astype(np.uint64)
        order = np.argsort(doc)
        self.fw_doc = doc[order]
        self.fw_doc_id = np.asarray(t["doc_id"].to_pylist(), dtype=object)[order]
        self.hydrate_cols = {
            c: np.asarray(t[c].to_pylist(), dtype=object)[order] for c in extra
        }

    def set_tombstones(self, docs: np.ndarray):
        self.tombstones = np.sort(np.asarray(docs, dtype=np.uint64))

    # -- decode ----------------------------------------------------------- #
    def postings(self, term: str):
        """(docs u64 asc, tfs f32) for a term, fully decoded (LRU-ish cache)."""
        hit = self._cache.get(term)
        if hit is not None:
            return hit
        rng = self.term_range.get(term)
        if rng is None:
            out = (np.empty(0, np.uint64), np.empty(0, np.float32))
        else:
            s, e = rng
            docs = np.concatenate(
                [np.cumsum(decode_varbyte(self.docs_vb[i]), dtype=np.uint64) for i in range(s, e)]
            )
            tfs = (
                np.frombuffer(b"".join(self.tfs_bin[s:e]), dtype="<f4")
                if e > s
                else np.empty(0, np.float32)
            )
            out = (docs, tfs)
        if len(self._cache) > 4096:
            self._cache.pop(next(iter(self._cache)))
        self._cache[term] = out
        return out

    def _positions_decoded(self, term: str):
        """(values int64, offs int64) for a term's FULL posting order —
        decoded once and LRU-cached per term (the decode is a binary join
        over every posting row; per-query re-decoding dominated the
        proximity path before this cache)."""
        hit = self._pos_cache.get(term)
        if hit is not None:
            return hit
        rng = self.term_range.get(term)
        if rng is None:
            out = (np.empty(0, np.int64), np.zeros(1, np.int64))
        else:
            s, e = rng
            counts = np.frombuffer(
                b"".join(self.pos_cnt_bin[s:e]), dtype="<i4"
            ).astype(np.int64)
            values = np.frombuffer(
                b"".join(self.pos_bin[s:e]), dtype="<i4"
            ).astype(np.int64)
            offs = np.zeros(len(counts) + 1, dtype=np.int64)
            np.cumsum(counts, out=offs[1:])
            out = (values, offs)
        if len(self._pos_cache) > 1024:
            self._pos_cache.pop(next(iter(self._pos_cache)))
        self._pos_cache[term] = out
        return out

    def positions_flat(self, term: str, idx: np.ndarray):
        """Positions for posting rows ``idx``, as ONE flat (vals, offs)
        pair in idx order — the vectorized multi-range gather (same idiom
        as the WAND block gather), no per-row python lists."""
        values, offs_all = self._positions_decoded(term)
        idx = np.asarray(idx, dtype=np.int64)
        if idx.size == 0 or len(offs_all) <= 1:
            return np.empty(0, np.int64), np.zeros(len(idx) + 1, np.int64)
        lens = offs_all[idx + 1] - offs_all[idx]
        starts = offs_all[idx]
        shift = np.repeat(
            starts - np.concatenate(([0], np.cumsum(lens)[:-1])), lens)
        rows = shift + np.arange(int(lens.sum()), dtype=np.int64)
        offs = np.zeros(len(idx) + 1, np.int64)
        np.cumsum(lens, out=offs[1:])
        return values[rows], offs

    def positions_of(self, term: str, idx: np.ndarray):
        """Position lists for rows ``idx`` (indices into the term's posting
        order). Returns list of python lists."""
        vals, offs = self.positions_flat(term, idx)
        return [vals[offs[i]: offs[i + 1]].tolist() for i in range(len(idx))]

    def doc_lens(self, cand: np.ndarray) -> np.ndarray:
        i = np.searchsorted(self.dm_doc, cand)
        return self.dm_len[i]

    def doc_ids_of(self, cand: np.ndarray) -> np.ndarray:
        i = np.searchsorted(self.fw_doc, cand)
        return self.fw_doc_id[i]

    def bm25_norms(self, avgdl: float, dtype) -> np.ndarray:
        """Per-doc BM25 length norm ``k1*(1-b+b*d/avgdl)`` aligned to
        ``dm_doc``, computed ONCE per (k1,b,avgdl,dtype) at first use
        instead of per query term.  Elementwise in the target dtype, so a
        gathered slice is bit-identical to computing the same expression
        on the gathered doc lengths (the float32 conformance contract)."""
        # dtype class itself is the key — np.dtype(...).name costs ~15us
        # per call, measurable at 1ms/query
        key = (float(self.opts.bm25.k1), float(self.opts.bm25.b),
               float(avgdl), dtype)
        hit = self._norm_cache.get(key)
        if hit is None:
            one = dtype(1.0)
            k1 = dtype(self.opts.bm25.k1)
            b = dtype(self.opts.bm25.b)
            av = dtype(avgdl)
            d = self.dm_len.astype(dtype, copy=False)
            hit = k1 * (one - b + b * d / av)
            self._norm_cache[key] = hit
        return hit

    def allowed_docs(self, allow_ids) -> np.ndarray:
        """Translate a string-docId allowlist into this shard's sorted
        uint64 doc array: |A| searchsorted string probes against a cached
        string-sorted forward permutation — replaces the per-candidate
        Python set-membership loop (VERDICT r3 #4).  Ids unknown to the
        shard are dropped (same semantics as the set filter)."""
        if self._id_sorted_ids is None:
            order = np.argsort(self.fw_doc_id, kind="stable")
            self._id_order = order
            self._id_sorted_ids = self.fw_doc_id[order]
        ids = self._id_sorted_ids
        if ids.size == 0:
            return np.empty(0, np.uint64)
        a = np.unique(np.asarray(list(allow_ids), dtype=object))
        pos = np.searchsorted(ids, a)
        ok = pos < ids.size
        ok[ok] = ids[pos[ok]] == a[ok]
        return np.sort(self.fw_doc[self._id_order[pos[ok]]])

    def _apply_allowlist(self, cand: np.ndarray, allow_ids) -> np.ndarray:
        allowed = self.allowed_docs(allow_ids)
        if allowed.size == 0:
            return cand[:0]
        pos = np.searchsorted(allowed, cand)
        ok = pos < allowed.size
        ok[ok] = allowed[pos[ok]] == cand[ok]
        return cand[ok]

    def fields_of(self, doc: int) -> dict:
        if not self.hydrate_cols:
            return {}
        i = int(np.searchsorted(self.fw_doc, np.uint64(doc)))
        return {c: v[i] for c, v in self.hydrate_cols.items()}

    # -- facets ------------------------------------------------------------ #
    def _facet_col(self, col: str):
        """Lazy per-shard facet column: (int32 dictionary codes aligned to
        ``fw_doc`` order, category strings).  Loaded ONCE per shard per
        column, value-coded — ~4 bytes/doc regardless of string length, so
        a node's shard slice stays facetable at billions of docs without
        holding the raw strings."""
        hit = self._facet_cache.get(col)
        if hit is not None:
            return hit
        import pyarrow.compute as pc

        if not self._fw_files:
            out = (np.empty(0, np.int64), [])
            self._facet_cache[col] = out
            return out
        have = pq.read_schema(self._fw_files[0]).names
        if col not in have:
            raise ValueError(
                f"unknown facet column {col!r}; forward table columns: "
                f"{sorted(c for c in have if c != 'doc')}"
            )
        t = pq.read_table(self._fw_files, columns=["doc", col])
        doc = t["doc"].to_numpy(zero_copy_only=False).astype(np.uint64)
        order = np.argsort(doc)
        vals = pc.fill_null(t[col].cast("string"), "")
        enc = vals.combine_chunks().dictionary_encode()
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)[order]
        cats = enc.dictionary.to_pylist()
        out = (codes, cats)
        self._facet_cache[col] = out
        return out

    def _with_facets(self, facets, hits, num, cand=None):
        """Kernel return shape: (hits, num) plain, or with a third
        facet-count element when ``facets`` is non-empty — the single
        contract all three query kernels share."""
        if not facets:
            return hits, num
        c = cand if cand is not None else np.empty(0, np.uint64)
        return hits, num, self.facet_counts(c, facets)

    def facet_counts(self, cand: np.ndarray, cols) -> dict:
        """{col: {value: n_docs}} over a candidate doc array (the FULL
        matching set, not the top-k) — one searchsorted gather + bincount
        per column."""
        out: dict = {}
        for col in cols:
            codes, cats = self._facet_col(col)
            if cand.size == 0 or not cats:
                out[col] = {}
                continue
            i = np.searchsorted(self.fw_doc, cand)
            bc = np.bincount(codes[i], minlength=len(cats))
            out[col] = {cats[j]: int(bc[j]) for j in np.flatnonzero(bc)}
        return out

    # -- lookup kernels --------------------------------------------------- #
    def _alive(self, cand: np.ndarray) -> np.ndarray:
        if self.tombstones.size:
            # cand may contain duplicates (the NotIn-only quirk preserves
            # them) — assume_unique would silently drop live docs
            dead = np.isin(cand, self.tombstones)
            cand = cand[~dead]
        return cand

    def and_candidates(self, keywords: list) -> np.ndarray:
        cand, _ = self._and_candidates_rows(keywords, ())
        return cand

    def _and_candidates_rows(self, keywords: list, want_rows):
        """Sorted-list AND intersection (semantics of internalLookup,
        /root/reference/core/indexer.go:417-558), smallest list first.
        Membership is a searchsorted probe of the small list into the
        larger (O(s log L)) rather than ``np.intersect1d``, which re-sorts
        the concatenation (O((s+L) log(s+L))) on every step.

        Returns ``(cand, rows)`` where ``rows[t]`` holds each candidate's
        row index in term t's posting list for every t in ``want_rows`` —
        a BYPRODUCT of the intersection probes (each shrink step masks the
        already-known positions), so the BM25 stage never re-probes its
        terms (the profile's top cost after this change moved from
        searchsorted to the scoring math itself)."""
        infos = []
        for k in keywords:
            docs, _ = self.postings(k)
            if docs.size == 0:
                return np.empty(0, np.uint64), {}
            infos.append((k, docs))
        infos.sort(key=lambda x: len(x[1]))
        k0, d0 = infos[0]
        cand = d0
        rows = {k0: np.arange(d0.size, dtype=np.int64)}
        for k, arr in infos[1:]:
            pos = np.searchsorted(arr, cand)
            ok = pos < arr.size
            ok[ok] = arr[pos[ok]] == cand[ok]
            cand = cand[ok]
            for kk in rows:
                rows[kk] = rows[kk][ok]
            rows[k] = pos[ok]
            if cand.size == 0:
                return cand, {}
        return cand, {k: rows[k] for k in want_rows if k in rows}

    def search(
        self,
        tokens: list,
        labels: list,
        idfs: list,
        avgdl: float,
        allow_ids,
        count_only: bool,
        dtype_name: str = "float32",
        facets=(),
        with_ids: bool = True,
    ):
        """AND lookup + BM25 (+proximity in locs mode).  Returns
        (hits: list[dict], num_docs) — hits unranked, driver/actor ranks —
        plus a {col: {value: n}} dict over the FULL candidate set as a
        third element when ``facets`` is non-empty.

        ``with_ids=False`` defers doc-id STRING materialization to the
        rank stage (HitBlock.doc_id = None): the default rank path needs
        strings only for the top-k boundary set, so gathering an object
        array for every candidate (common terms: most of the shard) is
        wasted work.  Callers that consume hits directly keep the
        default."""
        opts = self.opts
        dtype = np.float32 if dtype_name == "float32" else np.float64
        keywords = list(tokens) + list(labels)
        ret = lambda hits, num, cand=None: self._with_facets(facets, hits, num, cand)  # noqa: E731
        if not keywords:
            return ret(HitBlock.empty(), 0)
        cand, trows = self._and_candidates_rows(keywords, tokens)
        # the alive/allowlist filters shrink cand — mask the tracked
        # posting rows in lockstep so the BM25 stage never re-probes
        if self.tombstones.size and cand.size:
            alive = ~np.isin(cand, self.tombstones)
            cand = cand[alive]
            trows = {k: v[alive] for k, v in trows.items()}
        if allow_ids is not None and cand.size:
            allowed = self.allowed_docs(allow_ids)
            if allowed.size == 0:
                cand = cand[:0]
            else:
                pos = np.searchsorted(allowed, cand)
                ok = pos < allowed.size
                ok[ok] = allowed[pos[ok]] == cand[ok]
                cand = cand[ok]
                trows = {k: v[ok] for k, v in trows.items()}
        if cand.size == 0:
            return ret(HitBlock.empty(), 0)
        num_docs = int(cand.size)
        if count_only:
            return ret(HitBlock.empty(), num_docs, cand)

        n = cand.size
        bm25 = np.zeros(n, dtype=dtype)
        token_tfs = []
        token_flats = []
        demoted = np.zeros(n, dtype=bool)
        if opts.index_type != DOCIDS_INDEX:
            nrm = self.bm25_norms(avgdl, dtype)[np.searchsorted(self.dm_doc, cand)]
            for t, idf in zip(tokens, idfs):
                docs, tfs = self.postings(t)
                rows = trows.get(t)
                if rows is None:
                    rows = np.searchsorted(docs, cand)
                tf_t = tfs[rows]
                if opts.index_type == LOCS_INDEX:
                    vals, offs = self.positions_flat(t, rows)
                    token_flats.append((vals, offs))
                    freq = (offs[1:] - offs[:-1]).astype(np.float32)
                    demoted |= freq == 0
                else:
                    freq = tf_t
                token_tfs.append(freq)
            # per-token f32 accumulation in token order (conformance)
            for idf, freq in zip(idfs, token_tfs):
                contrib = bm25_term_scores_prenorm(
                    idf, freq, nrm, opts.bm25.k1, dtype
                )
                # riot skips tf==0 terms (label-injected) — contribution 0
                contrib = np.where(freq > 0, contrib, dtype(0.0))
                bm25 = bm25 + contrib

        doc_ids = self.doc_ids_of(cand) if with_ids else None
        bm25 = np.where(demoted, 0.0, bm25)
        prox = None
        snippet = None
        tlocs = None
        if opts.index_type == LOCS_INDEX:
            if tokens:
                # one vectorized DP over every candidate at once; snippet /
                # token-locs tuples materialize lazily at the top-k boundary
                prox, chosen = token_proximity_block(token_flats, list(tokens))
                snippet = _SnippetSeq(chosen, prox)
                tlocs = _TokenLocsSeq(token_flats, prox)
            else:
                prox = np.full(n, -1, dtype=np.int64)
                snippet = [()] * n
                tlocs = [()] * n
        return ret(
            HitBlock(cand, doc_ids, np.asarray(bm25, np.float64), prox,
                     snippet, tlocs),
            num_docs, cand,
        )

    def phrase_search(self, tokens, labels, idfs, avgdl, pattern,
                      allow_ids=None, count_only=False, dtype_name="float32",
                      facets=()):
        """Exact-phrase lookup: the regular AND+BM25 kernel prunes to docs
        containing every token, then the phrase is verified exactly by one
        vectorized RE2 match over the candidates' hydrated content (built
        by :func:`riot_ray.tokenize.phrase_pattern`, whose docstring argues
        why regex-on-text == token-stream adjacency for the supported
        modes).  Byte positions alone cannot verify adjacency — the gap
        between two matched positions may contain another token — so the
        content column is the verifier, not the positions."""
        import pyarrow as pa
        import pyarrow.compute as pc

        content_col = self.opts.content_col
        if content_col not in self.hydrate_cols:
            raise ValueError(
                "phrase search needs hydrated content: build the searcher "
                "with hydrate=True over an index with store_content=True"
            )
        ret = lambda hits, num, cand=None: self._with_facets(facets, hits, num, cand)  # noqa: E731
        hits, _ = self.search(
            tokens, labels, idfs, avgdl, allow_ids=allow_ids,
            count_only=False, dtype_name=dtype_name,
        )
        if len(hits) == 0:
            return ret(HitBlock.empty(), 0)
        rows = np.searchsorted(self.fw_doc, hits.doc)
        texts = pa.array(
            [t if t is not None else "" for t in self.hydrate_cols[content_col][rows]],
            pa.string(),
        )
        mask = (
            pc.match_substring_regex(pc.utf8_lower(texts), pattern)
            .to_numpy(zero_copy_only=False)
            .astype(bool)
        )
        n = int(mask.sum())
        if count_only:
            return ret(HitBlock.empty(), n, hits.doc[mask])
        return ret(hits.take(mask), n, hits.doc[mask])

    def logic_search(self, must, should, not_in, allow_ids, count_only,
                     facets=()):
        """LogicLookup semantics (/root/reference/core/indexer.go:560-685):
        Must: all must-lists contain doc (a must-term missing from the GLOBAL
        index empties the result — driver enforces); Should: >=1 contains;
        NotIn: anti; Should-only: union minus NotIn; NotIn-only quirk:
        returns the concatenation of the NotIn lists themselves.  With
        ``facets`` the counts run over the final candidate set (the quirk's
        duplicates count twice, matching the duplicated hits)."""
        ret = lambda hits, num, cand=None: self._with_facets(facets, hits, num, cand)  # noqa: E731
        if must:
            lists = []
            for k in must:
                docs, _ = self.postings(k)
                lists.append(docs)
            if any(d.size == 0 for d in lists):
                return ret(HitBlock.empty(), 0)
            lists.sort(key=len)
            cand = lists[0]
            for arr in lists[1:]:
                cand = np.intersect1d(cand, arr, assume_unique=True)
            if should:
                sh = self._union(should)
                cand = cand[np.isin(cand, sh, assume_unique=True)]
            if not_in:
                ni = self._union(not_in)
                cand = cand[~np.isin(cand, ni, assume_unique=True)]
        elif should:
            cand = self._union(should)
            if cand.size == 0:
                return ret(HitBlock.empty(), 0)
            if not_in:
                ni = self._union(not_in)
                cand = cand[~np.isin(cand, ni, assume_unique=True)]
        elif not_in:
            # quirk: concatenation (dups preserved) of NotIn lists
            parts = [self.postings(k)[0] for k in not_in]
            cand = np.concatenate(parts) if parts else np.empty(0, np.uint64)
        else:
            return ret(HitBlock.empty(), 0)
        cand = self._alive(cand)
        if allow_ids is not None and cand.size:
            cand = self._apply_allowlist(cand, allow_ids)
        num = int(cand.size)
        if count_only:
            return ret(HitBlock.empty(), num, cand)
        doc_ids = self.doc_ids_of(cand)
        return ret(
            HitBlock(cand, doc_ids, np.zeros(len(cand), np.float64)), num, cand
        )

    def _union(self, keywords):
        arrs = [self.postings(k)[0] for k in keywords]
        arrs = [a for a in arrs if a.size]
        if not arrs:
            return np.empty(0, np.uint64)
        return np.unique(np.concatenate(arrs))

    # -- block-max WAND (north star: pruned AND + top-k) ------------------ #
    def block_upper_bounds(self, term: str, idf: float, avgdl: float, dtype=np.float32):
        """Per-block score upper bound for one term: tf=max_tf, d=min_len
        maximize idf*tf*(k1+1)/(tf+k1*(1-b+b*d/avgdl)).

        Bounds are always computed in float64 and inflated by a few float32
        ulps: the exact kernel runs in the configured dtype, and in float32
        mode its separately-rounded numerator/denominator can land ~1 ulp
        ABOVE the float64 value of the same expression — a bound taken at the
        kernel's own dtype could then prune a block holding a true top-k doc.
        The inflation keeps the identical-top-k contract; it only makes
        pruning negligibly less aggressive."""
        key = (term, float(idf), float(avgdl), dtype is np.float32)
        hit = self._ub_cache.get(key)
        if hit is not None:
            return hit
        rng = self.term_range.get(term)
        if rng is None:
            return None
        s, e = rng
        ub = bm25_term_scores(
            idf,
            self.blk_max_tf[s:e],
            self.blk_min_len[s:e],
            avgdl,
            self.opts.bm25.k1,
            self.opts.bm25.b,
            np.float64,
        )
        ub = np.asarray(ub, dtype=np.float64)
        if dtype is np.float32:
            # ~6 f32 ops in the kernel, each <= 2^-24 relative error
            ub = ub * (1.0 + 1e-6) + 1e-30
        out = (s, e, ub, _sparse_levels(ub))
        if len(self._ub_cache) > 4096:
            self._ub_cache.pop(next(iter(self._ub_cache)))
        self._ub_cache[key] = out
        return out

    def search_wand(self, tokens, idfs, avgdl, k, dtype_name="float32"):
        """Exact top-k for an AND query with block-max pruning (Ding & Suel,
        "Faster top-k document retrieval using block-max indexes",
        SIGIR 2011 — public literature; applied here to riot's AND
        semantics).  All block upper bounds (lead block bound + each other
        term's range-max over the overlapping doc range) are computed
        UP FRONT in one vectorized pass (sparse-table range max), then
        blocks are visited BEST-FIRST (descending bound): the k-th score
        rises as fast as possible and the first bound below it terminates
        the whole scan — no per-block Python bound loop, no per-candidate
        heap.  Returns (hits: HitBlock of <=k docs, n_scored).  Skipped
        blocks mean the total match count is NOT computed — callers use
        approx counts."""
        dtype = np.float32 if dtype_name == "float32" else np.float64
        infos = []
        for t, idf in zip(tokens, idfs):
            bi = self.block_upper_bounds(t, idf, avgdl, dtype)
            if bi is None:
                return HitBlock.empty(), 0
            infos.append((t, idf, *bi))
        # rarest term drives iteration; ``infos`` stays in TOKEN order so the
        # final score accumulates per query token in token order (the f32
        # conformance contract, SURVEY.md §7.5)
        lead_i = min(range(len(infos)), key=lambda i: infos[i][3] - infos[i][2])
        lead_t, lead_idf, ls, le, lead_ub, _lead_lev = infos[lead_i]
        others = [x for i, x in enumerate(infos) if i != lead_i]

        # -- vectorized bounds: one pass over ALL lead blocks ------------- #
        lo = self.blk_min[ls:le]
        hi = self.blk_max[ls:le]
        ub_tot = np.asarray(lead_ub, dtype=np.float64).copy()
        alive = np.ones(le - ls, bool)
        for (_t, _idf, s, e, _oub, olev) in others:
            # overlapping block range of the other term per lead block
            a = np.searchsorted(self.blk_max[s:e], lo)
            b = np.searchsorted(self.blk_min[s:e], hi, side="right")
            ok = a < b  # no overlap: AND impossible in this doc range
            alive &= ok
            if ok.any():
                ub_tot[ok] += _range_max(olev, a[ok], b[ok])
        idx_alive = np.flatnonzero(alive)
        # best-first: the k-th score rises fastest, and the scan STOPS at
        # the first bound strictly below it (all later bounds are <= it)
        visit = idx_alive[np.argsort(-ub_tot[idx_alive], kind="stable")]

        # lead candidates come from the SAME LRU-cached full decode the
        # exhaustive kernel uses; per-block row ranges via blk_n offsets
        lead_docs, lead_tfs = self.postings(lead_t)
        off = np.concatenate(([0], np.cumsum(self.blk_n[ls:le])))

        # running top-k, kept sorted (score desc, doc_id-string asc) — the
        # exact path's total order at the k boundary
        top_s = np.empty(0, np.float64)
        top_d = np.empty(0, np.uint64)
        kth = -np.inf
        n_scored = 0
        # geometric batching: tiny first batch establishes the k-th score
        # (best-first order makes it tight), then batches grow so the
        # no-pruning worst case degenerates to a handful of vectorized
        # passes over the full lead list instead of one pass per block
        vpos, bsz = 0, 4
        while vpos < len(visit):
            if len(top_s) >= k and ub_tot[visit[vpos]] < kth:
                break  # strict: a TIED block could still hold a smaller
                # doc_id that wins the tie, so it is visited
            if len(top_s) >= k and ub_tot[visit[(vpos + len(visit)) // 2]] >= kth:
                # adaptive bailout: the k-th score cannot prune even the
                # MEDIAN remaining bound — pruning prospects are weak
                # (uniform corpora), so the batched loop would just replay
                # the exhaustive scan with per-batch overhead.  Take every
                # remaining block in one vectorized pass instead.
                bsz = len(visit)
            take = visit[vpos:vpos + bsz]
            vpos += len(take)
            bsz = min(bsz * 4, 1024)
            # vectorized multi-range gather of the batch's posting rows
            lens = off[take + 1] - off[take]
            starts = off[take]
            shift = np.repeat(
                starts - np.concatenate(([0], np.cumsum(lens)[:-1])), lens)
            rows = shift + np.arange(int(lens.sum()), dtype=np.int64)
            cand = lead_docs[rows]
            cand_tf = {lead_t: lead_tfs[rows]}
            for (t, _idf, s, e, _oub, _olev) in others:
                odocs, otfs = self.postings(t)
                rows = np.searchsorted(odocs, cand)
                rows = np.minimum(rows, len(odocs) - 1)
                hit = odocs[rows] == cand
                cand = cand[hit]
                for key in cand_tf:
                    cand_tf[key] = cand_tf[key][hit]
                cand_tf[t] = otfs[rows][hit]
                if cand.size == 0:
                    break
            if cand.size == 0:
                continue
            if self.tombstones.size:
                alive = ~np.isin(cand, self.tombstones, assume_unique=True)
                cand = cand[alive]
                for key in cand_tf:
                    cand_tf[key] = cand_tf[key][alive]
            if cand.size == 0:
                continue
            nrm = self.bm25_norms(avgdl, dtype)[np.searchsorted(self.dm_doc, cand)]
            score = np.zeros(len(cand), dtype=dtype)
            for (t, idf, *_rest) in infos:
                tf_t = cand_tf[t]
                contrib = bm25_term_scores_prenorm(
                    idf, tf_t, nrm, self.opts.bm25.k1, dtype
                )
                score = score + np.where(tf_t > 0, contrib, dtype(0.0))
            n_scored += int(cand.size)
            # vectorized top-k merge — doc-id STRINGS deferred to the tie
            # boundary (rank_hits' select-kth pattern): O(n) partition by
            # score keeps every candidate tied-or-above the k-th largest,
            # and only that small set is string-gathered and two-key
            # sorted (score desc, doc_id-string asc)
            all_s = np.concatenate([top_s, score.astype(np.float64)])
            all_d = np.concatenate([top_d, cand])
            if len(all_s) > k:
                kv = np.partition(all_s, len(all_s) - k)[len(all_s) - k]
                sel = np.flatnonzero(all_s >= kv)
                all_s, all_d = all_s[sel], all_d[sel]
            ids = np.asarray(self.doc_ids_of(all_d), dtype=object)
            o = np.argsort(ids, kind="stable")            # doc_id asc
            o = o[np.argsort(-all_s[o], kind="stable")]   # score desc
            o = o[:k]
            top_s, top_d = all_s[o], all_d[o]
            if len(top_s) >= k:
                kth = top_s[-1]
        if not len(top_s):
            return HitBlock.empty(), 0
        return HitBlock(top_d, np.asarray(self.doc_ids_of(top_d),
                                          dtype=object), top_s), n_scored


# --------------------------------------------------------------------------- #
# ranking (per shard) and merge
# --------------------------------------------------------------------------- #
def rank_hits(hits: HitBlock, rank: RankOpts, shard: ShardData | None, keep: int):
    """Apply scoring criteria, sort by the documented total order, truncate
    to ``keep`` (= offset+max per shard — /root/reference/ranker_worker.go:62-66).
    Returns (list[ScoredHit], num_scored)."""
    n = len(hits)
    if n == 0:
        return [], 0
    scorer = rank.scoring_criteria
    lazy = hits.doc_id is None
    if scorer is None and not rank.reverse_order:
        # vectorized default path: order by (bm25 desc, doc_id asc), then
        # materialize ScoredHit only for the kept top slice.  When keep is
        # small relative to n, an O(n) select-kth pass shrinks the sort to
        # the boundary set first: every candidate with score >= the keep-th
        # largest survives selection (ties included), so the subsequent
        # exact two-key sort over that subset yields the identical top slice.
        # Lazy blocks (with_ids=False) gather doc-id strings ONLY for the
        # boundary set — never for the full candidate array.
        if 0 < keep < n // 4 and n > 64:
            kth = np.partition(hits.bm25, n - keep)[n - keep]
            sel = np.flatnonzero(hits.bm25 >= kth)
            ids_sel = (shard.doc_ids_of(hits.doc[sel]) if lazy
                       else hits.doc_id[sel])
            sub = np.argsort(ids_sel, kind="stable")
            sub = sub[np.argsort(-hits.bm25[sel][sub], kind="stable")]
            order = sel[sub][:keep]
            ids_of = dict(zip(sel.tolist(), ids_sel.tolist())) if lazy else None
        else:
            if lazy:
                hits.doc_id = shard.doc_ids_of(hits.doc)
                lazy = False
            order = np.argsort(hits.doc_id, kind="stable")
            order = order[np.argsort(-hits.bm25[order], kind="stable")]
            if keep > 0:
                order = order[:keep]
            ids_of = None
        out = []
        hydrate = shard is not None and shard.hydrate_cols
        for i in order:
            i = int(i)
            if lazy:
                sh = ScoredHit(
                    doc_id=ids_of[i], doc=int(hits.doc[i]),
                    bm25=float(hits.bm25[i]),
                    token_proximity=int(hits.proximity[i]) if hits.proximity is not None else -1,
                    token_snippet_locs=hits.snippet[i] if hits.snippet is not None else (),
                    token_locs=hits.token_locs[i] if hits.token_locs is not None else (),
                )
            else:
                sh = hits.hit_at(i)
            sh.scores = (sh.bm25,)
            if hydrate:
                # SearchDoc hydration (/root/reference/core/ranker.go:179-219)
                sh.fields = shard.fields_of(int(hits.doc[i]))
                sh.content = sh.fields.pop(shard.opts.content_col, None)
            out.append(sh)
        return out, n
    if lazy:  # defensive: non-default paths need full ids
        hits.doc_id = shard.doc_ids_of(hits.doc)
    # custom criteria / reverse order: per-hit path (drop-on-empty honored,
    # /root/reference/core/ranker.go:132-137)
    scorer = scorer or default_scoring
    out = []
    for i in range(n):
        sh = hits.hit_at(i)
        fields = shard.fields_of(int(hits.doc[i])) if shard is not None else None
        scores = tuple(scorer(sh, fields))
        if len(scores) == 0:
            continue
        sh.scores = scores
        if fields:
            sh.fields = dict(fields)
            sh.content = sh.fields.pop(shard.opts.content_col, None)
        out.append(sh)
    num = len(out)
    sort_hits(out, reverse=rank.reverse_order)
    if keep > 0:
        out = out[:keep]
    return out, num


def merge_ranked(per_shard: list, rank: RankOpts):
    allhits = [h for hits in per_shard for h in hits]
    sort_hits(allhits, reverse=rank.reverse_order)
    # global slice — /root/reference/engine.go:527-538
    start = min(rank.output_offset, len(allhits))
    end = len(allhits) if rank.max_outputs == 0 else min(start + rank.max_outputs, len(allhits))
    return allhits[start:end]
