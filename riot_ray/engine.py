"""SearchEngine facade: global stats + term dictionary + shard fan-out.

Two serving modes over the same ShardData kernels:

* ``LocalSearcher`` — in-process shards (tests, DuckDB-oracle callables).
* ``ActorSearcher`` — named actor pool (one ``ShardWorker`` actor owning a
  contiguous slice of shards, SURVEY.md §3.3 rebuild equivalent); the driver
  tokenizes, ships per-token idf, ``ray.wait``s with the request timeout and
  merges per-shard top-k heaps.

The driver holds term->df (global BM25 stats = riot NumShards=1 semantics);
a keyword absent from the global dictionary short-circuits the AND search to
empty exactly like /root/reference/core/indexer.go:425-430.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .build import load_stats
from .config import DOCIDS_INDEX, EngineOpts
from .query import ShardData, bm25_idf, merge_ranked, rank_hits
from .tokenize import Tokenizer
from .types import RankOpts, SearchReq, SearchResp


class TermStats:
    """Global term->df dictionary, ARROW-RESIDENT: terms stay in one sorted
    Arrow string buffer and lookups are O(log n) binary searches.

    A Python dict of the whole vocabulary costs ~100 B/entry of object
    overhead per searcher replica — GBs at a 10^8-term vocabulary.  Here the
    resident footprint is the raw UTF-8 bytes + one i64 offset per term
    (plus the df i64 vector), independent of Python object count; query-side
    lookups touch a handful of terms, so ~27 buffer probes per token are
    free compared to posting-list decode."""

    def __init__(self, index_dir: str):
        d = os.path.join(index_dir, "termstats")
        files = [
            os.path.join(d, f) for f in sorted(os.listdir(d)) if f.endswith(".parquet")
        ]
        t = pa.concat_tables(pq.read_table(f, columns=["term", "df"]) for f in files)
        # builds write the driver-aggregated file term-sorted; the
        # distributed fallback emits several unsorted files — sort once here
        terms = t["term"].combine_chunks()
        idx = pa.compute.sort_indices(terms)
        self._terms = terms.take(idx)
        self._df = t["df"].combine_chunks().take(idx).to_numpy(zero_copy_only=False)

    def __len__(self) -> int:
        return len(self._terms)

    def get(self, term: str, default=None):
        lo, hi = 0, len(self._terms)
        while lo < hi:
            mid = (lo + hi) // 2
            if self._terms[mid].as_py() < term:
                lo = mid + 1
            else:
                hi = mid
        if lo < len(self._terms) and self._terms[lo].as_py() == term:
            return int(self._df[lo])
        return default

    def items(self):
        """Iterate (term, df) — export/debug only, not the query path."""
        for i in range(len(self._terms)):
            yield self._terms[i].as_py(), int(self._df[i])


def _load_termstats(index_dir: str) -> TermStats:
    return TermStats(index_dir)


def _load_tombstones(index_dir: str) -> np.ndarray:
    from .updates import load_tombstones

    return load_tombstones(index_dir)


class _SearcherBase:
    def __init__(self, index_dir: str, hydrate: bool = False, tokenizer_factory=None):
        self.index_dir = index_dir
        self._tok_factory = tokenizer_factory
        self.stats = load_stats(index_dir)
        self.opts = EngineOpts.from_json_dict(self.stats["opts"])
        if self.stats.get("custom_tokenizer") and tokenizer_factory is None:
            raise ValueError(
                "index was built with a custom tokenizer_factory; pass the "
                "same factory to the searcher (query tokens must be "
                "byte-identical to the index side)"
            )
        self.tok = (tokenizer_factory or Tokenizer)(self.opts)
        self.termstats = _load_termstats(index_dir)
        self.hydrate = hydrate
        self.shard_ids = self._existing_shards()
        tomb = _load_tombstones(index_dir)
        self.n_tomb = int(tomb.size)
        self._tomb = tomb
        # reset (not just default) — reload() re-runs this __init__ and a
        # compact() clears tombstones, so stale adjustments must not leak
        self._tomb_ndocs = 0
        self._tomb_len = 0.0

    def _existing_shards(self):
        seg = os.path.join(self.index_dir, "segments")
        ids = []
        if os.path.isdir(seg):
            for name in sorted(os.listdir(seg)):
                if name.startswith("shard="):
                    ids.append(int(name.split("=")[1]))
        return ids

    # ---- stats with tombstones applied --------------------------------- #
    def _global(self):
        n = self.stats["n_docs"] - getattr(self, "_tomb_ndocs", 0)
        total = self.stats["total_token_len"] - getattr(self, "_tomb_len", 0.0)
        return n, total

    def refresh_tombstone_stats(self, n_docs_removed: int, len_removed: float):
        self._tomb_ndocs = n_docs_removed
        self._tomb_len = len_removed

    # ---- query assembly -------------------------------------------------#
    def _prepare(self, req: SearchReq):
        if req.phrase:
            # one segmentation pass yields both streams; the raw one is
            # picked up again by the phrase branch in _plan
            filtered, raw = self.tok.query_tokens_both(req.text)
            return filtered + list(req.tokens), (req.rank_opts or RankOpts()), raw
        tokens = self.tok.query_tokens(req.text) + list(req.tokens)
        rank = req.rank_opts or RankOpts()
        return tokens, rank, None

    def _plan(self, req: SearchReq):
        """Resolve one request into a dispatchable (method, kwargs, rank,
        keep, orderless) plan, or a finished SearchResp for the short-circuit
        cases (empty query, missing keyword, logic handled separately).
        Returns (plan_tuple | None, resp | None)."""
        tokens, rank, raw_toks = self._prepare(req)
        labels = list(req.labels)
        resp = SearchResp(tokens=tuple(tokens))
        if req.logic is not None and req.logic.active(len(tokens) + len(labels)):
            return ("logic", tokens, labels, rank), resp
        keywords = tokens + labels
        if not keywords:
            return None, resp
        n_docs, total_len = self._global()
        if n_docs <= 0:
            return None, resp
        dfs = []
        for k in keywords:
            df = self.termstats.get(k)
            if not df:
                return None, resp
            dfs.append(df)
        dtype = np.float32 if self.opts.score_dtype == "float32" else np.float64
        avgdl = (
            np.float32(np.float32(total_len) / np.float32(n_docs))
            if dtype is np.float32
            else total_len / n_docs
        )
        idfs = [float(bm25_idf(n_docs, df, dtype)) for df in dfs[: len(tokens)]]
        keep = 0 if rank.max_outputs == 0 else rank.output_offset + rank.max_outputs
        from .config import FREQS_INDEX

        if req.phrase and tokens:
            from .tokenize import phrase_pattern

            # The adjacency pattern must reflect the user's LITERAL phrase:
            # build it from the UNFILTERED token stream so a stop word in
            # the phrase stays in the regex (postings-AND pruning and
            # scoring still use the stop-filtered `tokens`, which are the
            # only terms present in the index).  raw_toks came from the
            # same single segmentation pass as `tokens` (_prepare).
            phrase_toks = list(raw_toks or []) + list(req.tokens)
            plan = ("phrase_search",
                    dict(tokens=tokens, labels=labels, idfs=idfs,
                         avgdl=float(avgdl),
                         pattern=phrase_pattern(phrase_toks, self.opts.mode),
                         allow_ids=req.doc_ids,
                         count_only=req.count_docs_only,
                         dtype_name=self.opts.score_dtype,
                         facets=tuple(req.facets)),
                    rank, keep, req.orderless, False)
            return plan, resp
        use_wand = (
            req.approx_count
            and not req.facets
            and keep > 0
            and not labels
            and req.doc_ids is None
            and not req.count_docs_only
            and not req.orderless
            and rank.scoring_criteria is None
            and not rank.reverse_order
            and self.opts.index_type == FREQS_INDEX
        )
        if use_wand:
            plan = ("search_wand",
                    dict(tokens=tokens, idfs=idfs, avgdl=float(avgdl), k=keep,
                         dtype_name=self.opts.score_dtype),
                    rank, keep, False, True)
        else:
            plan = ("search",
                    dict(tokens=tokens, labels=labels, idfs=idfs,
                         avgdl=float(avgdl), allow_ids=req.doc_ids,
                         count_only=req.count_docs_only,
                         dtype_name=self.opts.score_dtype,
                         facets=tuple(req.facets)),
                    rank, keep, req.orderless, False)
        return plan, resp

    @staticmethod
    def _short_circuit_facets(req: SearchReq, resp: SearchResp) -> SearchResp:
        """Short-circuited (no-kernel) responses still honor the facets
        contract: every requested column present, all counts empty."""
        if req.facets and resp.facets is None:
            resp.facets = {c: {} for c in req.facets}
        return resp

    def search(self, req: SearchReq) -> SearchResp:
        plan, resp = self._plan(req)
        if plan is None:
            return self._short_circuit_facets(req, resp)
        return self._exec_plan(plan, req, resp)

    def _exec_plan(self, plan, req: SearchReq, resp: SearchResp) -> SearchResp:
        """Execute one plan produced by :meth:`_plan`."""
        if plan[0] == "logic":
            _tag, tokens, labels, rank = plan
            return self._logic_search(req, tokens, labels, rank, resp)
        method, kw, rank, keep, orderless, is_wand = plan
        results = self._dispatch(method, kw, req, rank, keep, orderless=orderless)
        out = self._collect(results, req, rank, resp)
        if is_wand:
            # num_docs = docs actually SCORED (pruned blocks never counted)
            out.num_docs = results[2]
        return out

    def _logic_search(self, req, tokens, labels, rank, resp):
        logic = req.logic
        keywords = tokens + labels
        must = list(logic.expr.must) or (keywords if logic.must else [])
        should = list(logic.expr.should) or (keywords if logic.should else [])
        not_in = list(logic.expr.not_in) or (keywords if logic.not_in else [])
        # a must-keyword missing globally empties the result
        for k in must:
            if not self.termstats.get(k):
                return self._short_circuit_facets(req, resp)
        # should-keywords missing are dropped; all missing -> empty
        should_present = [k for k in should if self.termstats.get(k)]
        if should and not should_present:
            return self._short_circuit_facets(req, resp)
        not_in_present = [k for k in not_in if self.termstats.get(k)]
        keep = 0 if rank.max_outputs == 0 else rank.output_offset + rank.max_outputs
        results = self._dispatch(
            "logic_search",
            dict(
                must=must,
                should=should_present,
                not_in=not_in_present,
                allow_ids=req.doc_ids,
                count_only=req.count_docs_only,
                facets=tuple(req.facets),
            ),
            req,
            rank,
            keep,
            orderless=req.orderless,
        )
        return self._collect(results, req, rank, resp)

    def _collect(self, results, req, rank, resp):
        per_shard, num_scored, num_found, timed_out = results[:4]
        if req.facets:
            fc = results[4] if len(results) > 4 else None
            resp.facets = {c: dict(sorted((fc or {}).get(c, {}).items()))
                           for c in req.facets}
        resp.timeout = timed_out
        if req.count_docs_only:
            resp.num_docs = num_found
            return resp
        if req.orderless:
            # skip ranking entirely (/root/reference/indexer_worker.go:75-113)
            resp.docs = [h for hits in per_shard for h in hits]
            resp.num_docs = len(resp.docs)
            return resp
        resp.docs = merge_ranked(per_shard, rank)
        resp.num_docs = num_scored
        return resp

    @staticmethod
    def _plan_key(plan, count_only: bool):
        """Hashable execution key for a planned query, or None when the
        plan carries unshareable state (custom scoring callables, doc-id
        allowlists).  Two requests with equal keys run the identical
        kernel + rank computation, so a batch executes each distinct key
        once — the cross-query sharing that makes repeated/overlapping
        queries in one batch cost one postings pass."""
        method, kw, rank, keep, orderless, is_wand = plan
        if rank.scoring_criteria is not None or kw.get("allow_ids") is not None:
            return None
        items = []
        for k, v in sorted(kw.items()):
            if k == "allow_ids":
                continue
            if isinstance(v, list):
                v = tuple(v)
            items.append((k, v))
        return (
            method, tuple(items), keep, orderless, count_only,
            rank.output_offset, rank.max_outputs, rank.reverse_order,
        )

    def search_many(self, reqs: list) -> list[SearchResp]:
        """Batched serving: plan every request once and execute each
        DISTINCT plan once (identical queries in a batch share one kernel
        pass and one ranked result — responses for duplicates alias the
        same hit objects; treat them as read-only).  Logic queries and
        plans with unshareable state fall back to the per-query path.
        ActorSearcher overrides this with the one-RPC-per-worker variant."""
        results: list = [None] * len(reqs)
        by_key: dict = {}
        for i, req in enumerate(reqs):
            plan, resp = self._plan(req)
            if plan is None:
                results[i] = self._short_circuit_facets(req, resp)
                continue
            key = None if plan[0] == "logic" else self._plan_key(
                plan, req.count_docs_only
            )
            if key is None:
                results[i] = self._exec_plan(plan, req, resp)
                continue
            if key in by_key:
                results[i] = results[by_key[key]]
            else:
                by_key[key] = i
                results[i] = self._exec_plan(plan, req, resp)
        return results


class LocalSearcher(_SearcherBase):
    """In-process serving — shares every kernel with the actor path."""

    def __init__(self, index_dir: str, hydrate: bool = False, tokenizer_factory=None):
        super().__init__(index_dir, hydrate, tokenizer_factory)
        self.shards = [
            ShardData(i, index_dir, self.opts, hydrate) for i in self.shard_ids
        ]
        for s in self.shards:
            if self._tomb.size:
                s.set_tombstones(self._tomb)
        if self._tomb.size:
            lens = []
            for s in self.shards:
                mask = np.isin(s.dm_doc, self._tomb, assume_unique=True)
                lens.append(float(s.dm_len[mask].sum()))
            self.refresh_tombstone_stats(int(self._tomb.size), float(sum(lens)))

    def reload(self):
        """Re-open the index in place: new generations (add_docs), fresh
        tombstones (remove_docs), compactions and updated global stats
        become visible without recreating the searcher — the rebuild's
        answer to riot's always-live in-process engine (searchers here
        are point-in-time snapshots by design; reload advances the
        snapshot).

        NOT safe under concurrent searches from other threads (state is
        replaced in place) — callers coordinate; the HTTP facade holds
        its write lock across mutate+reload."""
        self.__init__(self.index_dir, self.hydrate, self._tok_factory)

    def _dispatch(self, method, kwargs, req, rank, keep, orderless):
        per_shard, num_scored, num_found, facets = [], 0, 0, None
        if (method == "search" and not orderless and not req.count_docs_only
                and rank.scoring_criteria is None and not rank.reverse_order):
            # default rank path: defer doc-id string materialization to the
            # top-k boundary inside rank_hits (with_ids=False) — common
            # terms otherwise gather an object array for most of the shard
            kwargs = {**kwargs, "with_ids": False}
        for s in self.shards:
            out = getattr(s, method)(**kwargs)
            hits, num = out[0], out[1]
            if len(out) > 2:
                facets = merge_facets(facets, out[2])
            num_found += num
            if req.count_docs_only:
                continue
            if orderless:
                per_shard.append(rank_hit_passthrough(hits))
                continue
            ranked, n_scored = rank_hits(hits, rank, s, keep)
            num_scored += n_scored
            per_shard.append(ranked)
        return per_shard, num_scored, num_found, False, facets


def merge_facets(acc, fc):
    """Shard/node facet-count merge: per-column, per-value summation (the
    same merge a multi-node deployment applies at the coordinator)."""
    if fc is None:
        return acc
    if acc is None:
        acc = {}
    for col, d in fc.items():
        tgt = acc.setdefault(col, {})
        for v, n in d.items():
            tgt[v] = tgt.get(v, 0) + n
    return acc


def rank_hit_passthrough(hits):
    """Orderless mode: materialize every hit unranked
    (/root/reference/indexer_worker.go:75-113)."""
    return [hits.hit_at(i) for i in range(len(hits))]


# --------------------------------------------------------------------------- #
# forward-table dump helpers — S5 (/root/reference/riot.go:120-180)
# --------------------------------------------------------------------------- #
def _forward_dataset(index_dir: str, columns=None):
    import glob

    import ray.data as rd

    files = sorted(glob.glob(os.path.join(index_dir, "forward", "part=*.parquet")))
    return rd.read_parquet(files, columns=columns)


def all_doc_ids(index_dir: str):
    """GetDBAllIds analog: Dataset of (doc_id) over the forward table."""
    return _forward_dataset(index_dir, columns=["doc_id"])


def all_docs(index_dir: str):
    """GetDBAllDocs analog: the full forward table as a Dataset."""
    return _forward_dataset(index_dir)


def has_doc(index_dir: str, doc_id: str) -> bool:
    """HasDocDB analog (driver-side point lookup: crc-routed part file)."""
    import zlib

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from .build import load_stats

    stats = load_stats(index_dir)
    opts = EngineOpts.from_json_dict(stats["opts"])
    part = zlib.crc32(doc_id.encode()) % opts.num_parts
    f = os.path.join(index_dir, "forward", f"part={part:05d}.parquet")
    if not os.path.exists(f):
        return False
    t = pq.read_table(f, columns=["doc_id"])
    return bool(pc.any(pc.equal(t["doc_id"], doc_id)).as_py())


# --------------------------------------------------------------------------- #
# replicated serving: N actors each owning the FULL index, round-robin
# routing — one RPC per query (vs ActorSearcher's per-shard fan-out).
# The right mode when the index fits one node's RAM and QPS matters; the
# sharded fan-out is the right mode when it doesn't (100TB-scale).
# Mirrors riot's multi-replica deployments (/root/reference/docs/en/
# distributed_indexing_and_search.md).
# --------------------------------------------------------------------------- #
def _make_replica():
    import ray

    @ray.remote
    class Replica:
        def __init__(self, index_dir, hydrate, tokenizer_factory):
            self.searcher = LocalSearcher(index_dir, hydrate, tokenizer_factory)

        def search(self, req):
            return self.searcher.search(req)

        def search_many(self, reqs):
            # LocalSearcher's batched path: distinct plans execute once
            return self.searcher.search_many(reqs)

        def reload(self):
            self.searcher.reload()

        def ping(self, msg: int = 1) -> int:
            # HeartBeat echo (reference net/grpc/grpc.go:84-87)
            return msg

    return Replica


class ReplicatedSearcher:
    def __init__(self, index_dir: str, replicas: int = 2, hydrate: bool = False,
                 num_cpus_per_actor: float = 1.0, tokenizer_factory=None):
        Replica = _make_replica()
        replicas = max(1, min(replicas, _cpu_actor_cap(num_cpus_per_actor)))
        self.index_dir, self.hydrate = index_dir, hydrate
        self._num_cpus_per_actor = num_cpus_per_actor
        self._tok_factory = tokenizer_factory
        # Serving state is read-only (reloaded from disk in __init__), so a
        # crashed replica restarts in place and interrupted calls replay —
        # the rebuild's analog of riot's heartbeat+restart liveness layer
        # (/root/reference/net/heartb/heart.go:48-114).
        self.actors = [
            Replica.options(
                num_cpus=num_cpus_per_actor, max_restarts=3, max_task_retries=-1
            ).remote(index_dir, hydrate, tokenizer_factory)
            for _ in range(replicas)
        ]
        self._rr = 0

    def _next(self):
        a = self.actors[self._rr % len(self.actors)]
        self._rr += 1
        return a

    def search(self, req: SearchReq) -> SearchResp:
        import ray

        return ray.get(self._next().search.remote(req))

    def search_async(self, req: SearchReq):
        """Returns an ObjectRef — callers pipeline many queries in flight."""
        return self._next().search.remote(req)

    def reload(self):
        """Advance every replica to the index's current on-disk state."""
        import ray

        ray.get([a.reload.remote() for a in self.actors])

    def restart_replica(self, i: int):
        """Tear down and recreate replica ``i`` from current disk state —
        the HeartbeatMonitor's restart callback for a replica that is past
        Ray's own restart budget or alive-but-wedged (the case riot's
        net/heartb/heart.go:100-114 restart command covers)."""
        import ray

        Replica = _make_replica()
        old = self.actors[i]
        self.actors[i] = Replica.options(
            num_cpus=self._num_cpus_per_actor, max_restarts=3,
            max_task_retries=-1
        ).remote(self.index_dir, self.hydrate, self._tok_factory)
        try:
            ray.kill(old, no_restart=True)
        except Exception:
            pass

    def attach_heartbeats(self, monitor, registry=None,
                          service: str = "riot-search",
                          ttl_s: float | None = None):
        """Register every replica in the service registry (etcd analog)
        and wire it into ``monitor`` so missed heartbeats trigger
        :meth:`restart_replica`.  Returns the instance names used."""
        from .discovery import DEFAULT_TTL_S

        names = []
        for i, a in enumerate(self.actors):
            name = f"replica-{i}"
            meta = {"index_dir": self.index_dir, "slot": i}
            if registry is not None:
                registry.register.remote(service, name, meta,
                                         ttl_s or DEFAULT_TTL_S)
            monitor.watch(
                name,
                ping=lambda msg, i=i: self.actors[i].ping.remote(msg),
                restart=lambda i=i: self.restart_replica(i),
                meta=meta,
            )
            names.append(name)
        return names

    def search_many(self, reqs: list) -> list:
        """Round-robin a batch across replicas, one RPC per replica."""
        import ray

        n = len(self.actors)
        buckets = [reqs[i::n] for i in range(n)]
        futs = [
            a.search_many.remote(b) for a, b in zip(self.actors, buckets) if b
        ]
        parts = ray.get(futs)
        out = [None] * len(reqs)
        fi = 0
        for i, b in enumerate(buckets):
            if not b:
                continue
            for j, r in enumerate(parts[fi]):
                out[i + j * n] = r
            fi += 1
        return out

    def shutdown(self):
        import ray

        for a in self.actors:
            ray.kill(a)
        self.actors = []


# --------------------------------------------------------------------------- #
# distributed wire merge by (ts desc, id desc): riot's gRPC scatter-gather
# (/root/reference/net/grpc/search.go:40-65,95-99,151-175).  Each node owns
# an independent index; a node reply is the node's score-ranked top-M
# re-sorted by (Attri.Ts desc, Id desc — STRING comparison); the global
# merge concatenates replies, re-sorts by the same key, and — only when
# more than one node replied AND the pool exceeds maxOutputs — truncates to
# maxOutputs-1 (`end := maxOutputs - 1`, search.go:162-165: a faithful
# off-by-one of the reference wire, kept deliberately).
# --------------------------------------------------------------------------- #
def _hit_ts(hit, ts_field: str) -> int:
    """Attri.Ts of a hit: the hydrated forward column `ts_field`, 0 when
    absent (riot's zero-valued Attri.Ts for docs indexed without Attri)."""
    if hit.fields and ts_field in hit.fields:
        v = hit.fields[ts_field]
        return int(v) if v is not None else 0
    return 0


def ts_sort_hits(hits: list, ts_field: str = "ts") -> None:
    """In-place rpcSlice order (search.go:40-65): Ts desc, then Id desc as
    Go STRING comparison ("99" > "100") — NOT numeric.  A descending string
    key can't be negated inside one tuple key, so use a stable two-pass:
    secondary key (id desc) first, then primary (ts desc)."""
    hits.sort(key=lambda h: h.doc_id, reverse=True)
    hits.sort(key=lambda h: _hit_ts(h, ts_field), reverse=True)


def ts_node_reply(resp: SearchResp, max_outputs: int,
                  ts_field: str = "ts") -> SearchResp:
    """Per-node rpcSearch post-processing (search.go:80-107): re-sort the
    engine's score-ranked docs by (ts desc, id desc) and truncate to
    maxOutputs.  maxOutputs<=0 keeps everything."""
    ts_sort_hits(resp.docs, ts_field)
    if max_outputs > 0 and len(resp.docs) > max_outputs:
        resp.docs = resp.docs[:max_outputs]
    resp.num_docs = len(resp.docs)
    return resp


def merge_dist_ts(replies: list, max_outputs: int,
                  ts_field: str = "ts") -> SearchResp:
    """wgGrpc global merge (search.go:151-175).  With ONE reply it passes
    through untouched; with several it concatenates, re-sorts by
    (ts desc, id desc) and truncates to maxOutputs-1 when the pool
    exceeds maxOutputs — exactly maxOutputs docs are NOT truncated."""
    if len(replies) == 1:
        return replies[0]
    docs = [h for r in replies for h in r.docs]
    ts_sort_hits(docs, ts_field)
    if max_outputs > 0 and len(docs) > max_outputs:
        docs = docs[: max_outputs - 1]
    out = SearchResp(tokens=replies[0].tokens if replies else ())
    out.docs = docs
    out.num_docs = len(docs)
    out.timeout = any(r.timeout for r in replies)
    fc = None
    for r in replies:
        fc = merge_facets(fc, r.facets)
    out.facets = fc
    return out


class DistSearcher:
    """riot's distributed deployment shape: N independent nodes, each a
    full engine over its OWN document partition (separate index dirs),
    queries fanned to every node and merged by the (ts desc, id desc)
    wire order above.  Nodes are crash-restartable replica actors
    (read-only serving state), the rebuild analog of the gRPC peers in
    /root/reference/net/grpc/search.go:140-149.

    ``hydrate=True`` is forced: the merge key needs the forward-stored
    ``ts_field`` column (index with ``meta_cols=(..., ts_field)``)."""

    def __init__(self, index_dirs: list, ts_field: str = "ts",
                 num_cpus_per_actor: float = 1.0, tokenizer_factory=None):
        import ray

        Replica = _make_replica()
        self.ts_field = ts_field
        self.nodes = [
            Replica.options(
                num_cpus=num_cpus_per_actor, max_restarts=3, max_task_retries=-1
            ).remote(d, True, tokenizer_factory)
            for d in index_dirs
        ]

    def search(self, req: SearchReq) -> SearchResp:
        import ray

        max_outputs = req.rank_opts.max_outputs if req.rank_opts else 0
        futs = [n.search.remote(req) for n in self.nodes]
        replies = [
            ts_node_reply(r, max_outputs, self.ts_field) for r in ray.get(futs)
        ]
        return merge_dist_ts(replies, max_outputs, self.ts_field)

    def search_many(self, reqs: list) -> list:
        """Batched scatter-gather: ONE RPC per node for the whole batch
        (each node's LocalSearcher dedupes distinct plans), then the wire
        merge per query.

        Duplicate queries in a batch may ALIAS one SearchResp inside a
        node's reply (pickle preserves identity); ts_node_reply then runs
        twice on that object — safe because re-sorting is idempotent and
        duplicates share a plan only when their max_outputs match, so the
        re-truncation is a no-op."""
        import ray

        per_node = ray.get([n.search_many.remote(reqs) for n in self.nodes])
        out = []
        for qi, req in enumerate(reqs):
            m = req.rank_opts.max_outputs if req.rank_opts else 0
            replies = [
                ts_node_reply(node_out[qi], m, self.ts_field)
                for node_out in per_node
            ]
            out.append(merge_dist_ts(replies, m, self.ts_field))
        return out

    def reload(self):
        """Advance every node to its index's current on-disk state."""
        import ray

        ray.get([n.reload.remote() for n in self.nodes])

    def shutdown(self):
        import ray

        for n in self.nodes:
            ray.kill(n)
        self.nodes = []


# --------------------------------------------------------------------------- #
# batch query API: Dataset of queries -> Dataset of ranked results
# --------------------------------------------------------------------------- #
class _BatchQueryStage:
    """Actor-pool stage: one LocalSearcher per actor (index loaded once in
    __init__ — T2/T3), each batch of query rows searched in-process."""

    def __init__(self, index_dir: str, max_outputs: int, hydrate: bool,
                 tokenizer_factory=None):
        self.searcher = LocalSearcher(
            index_dir, hydrate=hydrate, tokenizer_factory=tokenizer_factory
        )
        self.max_outputs = max_outputs

    def __call__(self, batch):
        import numpy as np
        import pyarrow as pa

        qids = batch["query_id"].to_pylist()
        texts = batch["text"].to_pylist()
        resps = self.searcher.search_many([
            SearchReq(text=t or "", rank_opts=RankOpts(max_outputs=self.max_outputs))
            for t in texts
        ])
        out_q, out_rank, out_doc, out_score = [], [], [], []
        for qid, resp in zip(qids, resps):
            for r, h in enumerate(resp.docs, 1):
                out_q.append(qid)
                out_rank.append(r)
                out_doc.append(h.doc_id)
                out_score.append(h.bm25)
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "rank": pa.array(out_rank, pa.int64()),
                "doc_id": pa.array(out_doc, pa.string()),
                "bm25": pa.array(out_score, pa.float64()),
            }
        )


def search_dataset(
    index_dir: str,
    queries_ds,
    max_outputs: int = 10,
    concurrency: int = 4,
    batch_size: int = 256,
    hydrate: bool = False,
    tokenizer_factory=None,
):
    """Batch search: a Dataset with (query_id:int64, text:string) ->
    Dataset of (query_id, rank, doc_id, bm25).  Each actor holds the full
    index read-only; queries stream through the pool — the batch analog of
    riot's query fan-out, inverted (queries move, index stays)."""
    return queries_ds.map_batches(
        _BatchQueryStage,
        fn_constructor_kwargs={
            "index_dir": index_dir,
            "max_outputs": max_outputs,
            "hydrate": hydrate,
            "tokenizer_factory": tokenizer_factory,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


# --------------------------------------------------------------------------- #
# actor pool
# --------------------------------------------------------------------------- #
def _make_shard_worker():
    import ray

    @ray.remote
    class ShardWorker:
        """Owns a contiguous slice of shards; query-path state loaded once
        in __init__ (actor-pool pattern, SURVEY.md §2.3 T2/T3)."""

        def __init__(self, index_dir, shard_ids, hydrate):
            # EVERYTHING that can advance after construction is re-derived
            # from the index dir here: a crash-restarted actor replays its
            # ORIGINAL ctor args, so anything else would silently revert
            # on restart.  shard_ids is a slice of the FIXED universe
            # range(num_shards) (immutable for the index's lifetime, so
            # restart-safe); ids whose segment dir doesn't exist yet (a
            # shard that has received no postings) load as nothing and are
            # picked up by the next reload()/restart once the dir appears.
            # Tombstones advance via remove_docs: re-reading them means a
            # restarted worker may be NEWER than the driver's snapshot
            # until the next reload() — the safe direction (a deleted doc
            # never resurrects; the reverse would silently undo removals).
            self._index_dir, self._hydrate = index_dir, hydrate
            self._shard_ids = list(shard_ids)
            self.searchers = []
            stats = load_stats(index_dir)
            opts = EngineOpts.from_json_dict(stats["opts"])
            tombstones = _load_tombstones(index_dir)
            seg = os.path.join(index_dir, "segments")
            for i in self._shard_ids:
                if not os.path.isdir(os.path.join(seg, f"shard={i:05d}")):
                    continue  # not materialized yet
                s = ShardData(i, index_dir, opts, hydrate)
                if tombstones.size:
                    s.set_tombstones(tombstones)
                self.searchers.append(s)

        def reload(self):
            """Re-open this worker's FIXED shard slice (new generations /
            tombstones / compactions / newly materialized shard dirs)
            without restarting the actor.  The slice itself never changes,
            so a crash-restart reconstructs the identical assignment."""
            self.__init__(self._index_dir, self._shard_ids, self._hydrate)

        def ping(self, msg: int = 1) -> int:
            # HeartBeat echo (reference net/grpc/grpc.go:84-87)
            return msg

        def run(self, method, kwargs, rank, keep, count_only, orderless):
            if (method == "search" and not orderless and not count_only
                    and rank.scoring_criteria is None
                    and not rank.reverse_order):
                # same lazy doc-id deferral as LocalSearcher._dispatch
                kwargs = {**kwargs, "with_ids": False}
            out_hits, num_scored, num_found, facets = [], 0, 0, None
            for s in self.searchers:
                out = getattr(s, method)(**kwargs)
                hits, num = out[0], out[1]
                if len(out) > 2:
                    facets = merge_facets(facets, out[2])
                num_found += num
                if count_only:
                    continue
                if orderless:
                    out_hits.append(rank_hit_passthrough(hits))
                    continue
                ranked, n_sc = rank_hits(hits, rank, s, keep)
                num_scored += n_sc
                out_hits.append(ranked)
            return out_hits, num_scored, num_found, facets

        def run_many(self, items):
            """Batched entry: one RPC carrying many planned queries —
            items = [(method, kwargs, rank, keep, count_only, orderless)]."""
            return [self.run(*item) for item in items]

        def tombstone_len(self, tombstones):
            total, count = 0.0, 0
            for s in self.searchers:
                mask = np.isin(s.dm_doc, tombstones, assume_unique=True)
                total += float(s.dm_len[mask].sum())
                count += int(mask.sum())
            return total, count

    return ShardWorker


def _cpu_actor_cap(num_cpus_per_actor: float) -> int:
    """Max actors the CURRENT cluster can host — creating more than this
    leaves permanently-pending actors whose method calls block forever (the
    same failure mode as a fixed Ray Data actor pool larger than the
    cluster)."""
    import ray

    try:
        cpus = ray.cluster_resources().get("CPU") if ray.is_initialized() else None
    except Exception:
        cpus = None
    if not cpus:
        return 1 << 30  # unknown: don't cap (ray.init may still be pending)
    return max(1, int(float(cpus) / max(float(num_cpus_per_actor), 1e-9)))


class ActorSearcher(_SearcherBase):
    def __init__(self, index_dir: str, num_actors: int = 4, hydrate: bool = False,
                 num_cpus_per_actor: float = 1.0, tokenizer_factory=None):
        super().__init__(index_dir, hydrate, tokenizer_factory)
        import ray

        ShardWorker = _make_shard_worker()
        # slice the FIXED shard universe range(num_shards), not the shard
        # dirs that happen to exist today: the assignment is then immutable
        # for the index's lifetime — a crash-restarted worker reconstructs
        # the identical slice, reload() needs no re-slicing, and shards
        # materialized later (first postings via add_docs — including on an
        # index built from an EMPTY source) already have an owner
        universe = list(range(int(self.opts.num_shards) or 1))
        num_actors = max(1, min(num_actors, len(universe),
                                _cpu_actor_cap(num_cpus_per_actor)))
        slices = [universe[i::num_actors] for i in range(num_actors)]
        # serving state is loaded from the index dir in each worker's
        # __init__ (incl. tombstones) -> crash-restartable: a replayed
        # ctor re-reads CURRENT disk state (see ReplicatedSearcher)
        self.actors = [
            ShardWorker.options(
                num_cpus=num_cpus_per_actor, max_restarts=3, max_task_retries=-1
            ).remote(index_dir, sl, hydrate)
            for sl in slices
        ]
        if self._tomb.size:
            parts = ray.get([a.tombstone_len.remote(self._tomb) for a in self.actors])
            self.refresh_tombstone_stats(
                int(sum(p[1] for p in parts)), float(sum(p[0] for p in parts))
            )

    def reload(self):
        """Advance every worker (and the driver's stats/termstats/
        tombstones) to the index's current on-disk state — no actor
        restarts, no downtime between add_docs/remove_docs/compact and
        serving.  Shard slices are fixed universe slices, so newly
        materialized shard dirs are simply picked up by their owner.

        Not transactional: driver state advances first, then workers; if
        a worker reload raises (actor past max_restarts), the searcher is
        torn — retry reload() or rebuild the searcher."""
        import ray

        _SearcherBase.__init__(self, self.index_dir, self.hydrate,
                               self._tok_factory)
        ray.get([a.reload.remote() for a in self.actors])
        if self._tomb.size:
            parts = ray.get([a.tombstone_len.remote(self._tomb) for a in self.actors])
            self.refresh_tombstone_stats(
                int(sum(p[1] for p in parts)), float(sum(p[0] for p in parts))
            )

    def search_many(self, reqs: list) -> list[SearchResp]:
        import ray

        results: list = [None] * len(reqs)
        batch: list[tuple[int, tuple]] = []
        for i, req in enumerate(reqs):
            plan, resp = self._plan(req)
            if plan is None:
                results[i] = self._short_circuit_facets(req, resp)
            elif plan[0] == "logic":
                results[i] = self.search(req)  # logic: per-query path
            else:
                batch.append((i, plan, resp))
        if batch:
            # cross-query sharing: ship each DISTINCT plan once (smaller
            # RPC, one kernel pass per distinct query per shard); duplicate
            # requests alias the same SearchResp (read-only by convention)
            items, key_to_uq, uq_of = [], {}, []
            for i, plan, _r in batch:
                m, kw, rank, keep, orderless, _w = plan
                key = self._plan_key(plan, reqs[i].count_docs_only)
                if key is not None and key in key_to_uq:
                    uq_of.append(key_to_uq[key])
                    continue
                uq = len(items)
                items.append((m, kw, rank, keep, reqs[i].count_docs_only, orderless))
                if key is not None:
                    key_to_uq[key] = uq
                uq_of.append(uq)
            futs = [a.run_many.remote(items) for a in self.actors]
            per_actor = ray.get(futs)  # [actor][uq] -> (hits, n_sc, n_f)
            done: dict[int, SearchResp] = {}
            for (i, plan, resp), uq in zip(batch, uq_of):
                m, kw, rank, keep, orderless, is_wand = plan
                if uq in done:
                    results[i] = done[uq]
                    continue
                per_shard, num_scored, num_found, fc_all = [], 0, 0, None
                for actor_out in per_actor:
                    hits_list, n_sc, n_f, fc = actor_out[uq]
                    per_shard.extend(hits_list)
                    num_scored += n_sc
                    num_found += n_f
                    fc_all = merge_facets(fc_all, fc)
                out = self._collect(
                    (per_shard, num_scored, num_found, False, fc_all),
                    reqs[i], rank, resp
                )
                if is_wand:
                    out.num_docs = num_found  # wand counts SCORED docs only
                done[uq] = out
                results[i] = out
        return results

    def _dispatch(self, method, kwargs, req, rank, keep, orderless):
        import ray

        futs = [
            a.run.remote(method, kwargs, rank, keep, req.count_docs_only, orderless)
            for a in self.actors
        ]
        timed_out = False
        if req.timeout_ms and req.timeout_ms > 0:
            ready, not_ready = ray.wait(
                futs, num_returns=len(futs), timeout=req.timeout_ms / 1000.0
            )
            if not_ready:
                timed_out = True  # partial results + Timeout flag
            futs = ready
        results = ray.get(futs)
        per_shard, num_scored, num_found, facets = [], 0, 0, None
        for hits_list, n_sc, n_f, fc in results:
            per_shard.extend(hits_list)
            num_scored += n_sc
            num_found += n_f
            facets = merge_facets(facets, fc)
        return per_shard, num_scored, num_found, timed_out, facets

    def shutdown(self):
        import ray

        for a in self.actors:
            ray.kill(a)
        self.actors = []
