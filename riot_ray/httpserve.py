"""HTTP serving facade — the rebuild of riot's ``net/http`` layer.

Mirrors the reference's request/response shapes
(/root/reference/net/http/http.go:53-128, search.go:21-36):

* ``GET/POST /search`` — params ``query``, ``outputOffset``, ``maxOutputs``
  (+ passthrough ``userid``/``time``); responds
  ``{"code": 0, "len": N, "timestamp": unix, "docs": [{"id", "content",
  "score", "attri"}]}``.
* ``GET/POST /dist``  — scatter the same request to member node URLs
  (``/search`` on each), merge, truncate to maxOutputs
  (dist.go:52-115).  The reference merges by ``(Attri.Ts, Id)`` — a
  serving-layer recency order this rebuild intentionally replaces with the
  engine's (score desc, id asc) total order (SURVEY.md §2.9 note).
* ``GET/POST /index``  — add one document (http.go:131-166 AddIndex):
  params ``docid``, ``query``; routed through riot_ray.updates.add_docs.
* ``GET /delete``      — tombstone one docid (http.go:169-175 DelIndex).
* ``GET /status``      — engine stats (n_docs, tombstones, shards).

Deliberately stdlib-only (http.server.ThreadingHTTPServer): the sandbox has
no web framework, and the facade's job is wire-shape parity + a real
network endpoint over ``LocalSearcher``/``ActorSearcher`` — not a prod
server.  etcd/grpc registration (net/grpc, net/cli) is out of scope; Ray's
own actor naming covers member discovery inside a cluster.

Searcher choice (per-call latency vs index size — VERDICT r4 #1):

* one-query-at-a-time callers should serve over ``LocalSearcher`` (the
  ``job serve`` default): the index loads once in the server process and
  each request runs the ~0.7 ms kernel directly — no Ray RPC, no
  driver-side result serialization.  ``ReplicatedSearcher`` is the
  multi-process variant when one process's cores aren't enough.
* ``ActorSearcher`` (``--actors N``) is for indexes too big for one
  process: each call fans out one RPC per shard actor (~5 ms p50 at 8
  actors) — prefer its batched ``search_many`` for throughput work.
"""

from __future__ import annotations

import json
import threading
import time
import urllib.parse
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from .types import RankOpts, SearchReq


class _RWLock:
    """Minimal reader-writer lock: /search requests read shared; /index
    and /delete mutate exclusively (they reload the searcher IN PLACE —
    ThreadingHTTPServer runs handlers concurrently, and an un-guarded
    reload would let a concurrent search read torn searcher state)."""

    def __init__(self):
        self._cond = threading.Condition()
        self._readers = 0
        self._writer = False
        self._writers_waiting = 0

    def acquire_read(self):
        with self._cond:
            # writer priority: new readers queue behind a WAITING writer,
            # or sustained search traffic would starve /index //delete
            while self._writer or self._writers_waiting:
                self._cond.wait()
            self._readers += 1

    def release_read(self):
        with self._cond:
            self._readers -= 1
            if self._readers == 0:
                self._cond.notify_all()

    def acquire_write(self):
        with self._cond:
            self._writers_waiting += 1
            try:
                while self._writer or self._readers:
                    self._cond.wait()
            finally:
                self._writers_waiting -= 1
            self._writer = True

    def release_write(self):
        with self._cond:
            self._writer = False
            self._cond.notify_all()


def _doc_payload(hit) -> dict:
    return {
        "id": hit.doc_id,
        "content": hit.content if hit.content is not None else "",
        "score": list(hit.scores) if hit.scores else [hit.bm25],
        "attri": hit.fields or {},
    }


class SearchHTTPServer:
    """Thread-pooled HTTP endpoint over any searcher (Local/Actor/Replicated).

    ``dist_members``: other nodes' base URLs for /dist scatter-gather
    (analog of com.Config.Url, /root/reference/net/http/dist.go:77-84)."""

    def __init__(self, searcher, host: str = "127.0.0.1", port: int = 0,
                 default_max_outputs: int = 10, dist_members: list[str] | None = None,
                 index_dir: str | None = None, dist_timeout_s: float = 1.0):
        self.searcher = searcher
        self.default_max_outputs = default_max_outputs
        self.dist_members = list(dist_members or [])
        self.index_dir = index_dir or getattr(searcher, "index_dir", None)
        self.dist_timeout_s = dist_timeout_s  # reference: 1000ms client timeout
        self._lock = _RWLock()          # searcher snapshot: readers vs reload
        self._mut_lock = threading.Lock()  # serializes /index //delete jobs
        outer = self

        class Handler(BaseHTTPRequestHandler):
            # HTTP/1.1: persistent connections — a one-at-a-time caller
            # pays the TCP+thread setup once, not per query (every reply
            # already carries Content-Length, which keep-alive requires;
            # ThreadingHTTPServer's daemon_threads covers idle keepers).
            # TCP_NODELAY is mandatory with keep-alive: the reply goes out
            # as several small writes, and Nagle + delayed-ACK stalls each
            # response ~40 ms on a persistent connection without it
            protocol_version = "HTTP/1.1"
            disable_nagle_algorithm = True

            def log_message(self, *a):  # quiet
                pass

            def _params(self):
                if self.command == "POST":
                    n = int(self.headers.get("Content-Length") or 0)
                    body = self.rfile.read(n).decode()
                    return {k: v[0] for k, v in urllib.parse.parse_qs(body).items()}
                q = urllib.parse.urlparse(self.path).query
                return {k: v[0] for k, v in urllib.parse.parse_qs(q).items()}

            def _reply(self, obj, code=200):
                data = json.dumps(obj).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json;charset=utf-8")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def _route(self):
                path = urllib.parse.urlparse(self.path).path
                p = self._params()
                try:
                    # locking lives INSIDE the handlers: reads take the
                    # shared lock only around the local searcher touch
                    # (not across /dist member HTTP calls), mutations
                    # serialize on a mutex and take the exclusive lock
                    # only around the snapshot refresh — searches stay
                    # live during the (seconds-long) indexing job itself
                    if path == "/search":
                        self._reply(outer._search(p))
                    elif path == "/dist":
                        self._reply(outer._dist(p))
                    elif path == "/status":
                        self._reply(outer._status())
                    elif path == "/index":
                        with outer._mut_lock:
                            self._reply(outer._add_index(p))
                    elif path == "/delete":
                        with outer._mut_lock:
                            self._reply(outer._delete(p))
                    else:
                        self._reply({"code": 404, "error": "unknown route"}, 404)
                except Exception as e:  # wire errors as JSON, like a service
                    self._reply({"code": 500, "error": str(e)}, 500)

            do_GET = _route
            do_POST = _route

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self.host, self.port = self._httpd.server_address

    # ---- handlers -------------------------------------------------------- #
    def _search_docs(self, p: dict) -> tuple[list[dict], int, dict | None]:
        offset = int(p.get("outputOffset") or 0)
        max_outputs = int(p.get("maxOutputs") or 0) or self.default_max_outputs
        phrase = str(p.get("phrase") or "").lower() in ("1", "true", "yes")
        facets = tuple(f.strip() for f in (p.get("facets") or "").split(",")
                       if f.strip())
        self._lock.acquire_read()
        try:
            resp = self.searcher.search(
                SearchReq(
                    text=p.get("query") or "",
                    phrase=phrase,
                    facets=facets,
                    rank_opts=RankOpts(output_offset=offset,
                                       max_outputs=max_outputs),
                )
            )
        finally:
            self._lock.release_read()
        return [_doc_payload(h) for h in resp.docs], max_outputs, resp.facets

    def _search(self, p: dict) -> dict:
        docs, _, facets = self._search_docs(p)
        out = {
            "code": 0,
            "len": len(docs),
            "timestamp": int(time.time()),
            "docs": docs,
        }
        if facets is not None:
            out["facets"] = facets
        return out

    def _dist(self, p: dict) -> dict:
        """Scatter to members (plus this node), merge, truncate.

        Two merge orders:
        * default — the engine's (score desc, id asc), truncate to
          maxOutputs (the useful order);
        * ``order=ts`` — the reference WIRE order
          (/root/reference/net/http/dist.go:86-108): (attri.ts desc,
          id desc as string), truncated to maxOutputs-1 when the pooled
          docs exceed maxOutputs and more than one reply contributed —
          the same off-by-one `end := maxOuts - 1` the gRPC path has."""
        max_outputs = int(p.get("maxOutputs") or 0) or self.default_max_outputs
        docs, _, facets = self._search_docs(p)
        replies = 1
        qs = urllib.parse.urlencode({**p, "maxOutputs": str(max_outputs)})
        from .engine import merge_facets

        for base in self.dist_members:
            try:
                with urllib.request.urlopen(
                    f"{base}/search?{qs}", timeout=self.dist_timeout_s
                ) as r:
                    reply = json.loads(r.read().decode())
                    docs.extend(reply.get("docs", []))
                    facets = merge_facets(facets, reply.get("facets"))
                    replies += 1
            except Exception:
                continue  # member down: partial results (dist.go:40-44)
        if str(p.get("order") or "").lower() == "ts":
            docs.sort(key=lambda d: d["id"], reverse=True)
            docs.sort(
                key=lambda d: int((d.get("attri") or {}).get("ts") or 0),
                reverse=True,
            )
            if replies > 1 and len(docs) > max_outputs:
                docs = docs[: max_outputs - 1]
        else:
            docs.sort(key=lambda d: (-max(d["score"]) if d["score"] else 0.0, d["id"]))
            docs = docs[:max_outputs]
        out = {"code": 0, "len": len(docs), "timestamp": int(time.time()),
               "docs": docs}
        if facets is not None:
            out["facets"] = facets  # node counts merged by summation
        return out

    def _add_index(self, p: dict) -> dict:
        if not self.index_dir:
            raise RuntimeError("index_dir unknown: pass index_dir= to enable /index")
        import pyarrow as pa
        import ray.data as rd

        from .build import load_stats
        from .config import EngineOpts
        from .updates import add_docs

        opts = EngineOpts.from_json_dict(load_stats(self.index_dir)["opts"])
        docid = p.get("docid") or ""
        # invert derive_doc_id's "{c0}/{c1}@{c2}" composition for multi-col ids
        if len(opts.id_cols) == 1:
            id_vals = [docid]
        else:
            head, _, commit = docid.rpartition("@")
            id_vals = head.split("/", len(opts.id_cols) - 2) + [commit]
            if len(id_vals) != len(opts.id_cols):
                raise RuntimeError(
                    f"docid {docid!r} does not match the id scheme "
                    f"{'/'.join(opts.id_cols[:-1])}@{opts.id_cols[-1]}"
                )
        row = pa.table(
            {
                **{c: pa.array([v], pa.string()) for c, v in zip(opts.id_cols, id_vals)},
                opts.content_col: pa.array([p.get("query") or ""], pa.string()),
                **{c: pa.array([""], pa.string()) for c in opts.meta_cols},
            }
        )
        out = add_docs(self.index_dir, rd.from_arrow(row))
        if out["n_added"] or out.get("n_replaced"):
            self._refresh_searcher()  # indexed docs are immediately searchable
        return {"code": 0, "timestamp": int(time.time()), "docs": None,
                "n_added": out["n_added"], "n_replaced": out["n_replaced"]}

    def _delete(self, p: dict) -> dict:
        if not self.index_dir:
            raise RuntimeError("index_dir unknown: pass index_dir= to enable /delete")
        from .updates import remove_docs

        out = remove_docs(self.index_dir, [p.get("docid") or ""])
        if out["n_removed"]:  # no-op delete leaves the snapshot current
            self._refresh_searcher()
        return {"code": 0, "timestamp": int(time.time()),
                "n_removed": out["n_removed"]}

    def _refresh_searcher(self):
        """After a mutate endpoint: advance the serving snapshot so /search
        reflects the change immediately (riot's engine is always live; our
        searchers reload explicitly).  Holds the exclusive lock only for
        the reload itself."""
        reload_fn = getattr(self.searcher, "reload", None)
        if reload_fn is not None:
            self._lock.acquire_write()
            try:
                reload_fn()
            finally:
                self._lock.release_write()

    def _status(self) -> dict:
        self._lock.acquire_read()
        try:
            st = getattr(self.searcher, "stats", {})
            return {
                "code": 0,
                "n_docs": st.get("n_docs"),
                "n_postings": st.get("n_postings"),
                "num_shards": st.get("num_shards"),
                "tombstones": getattr(self.searcher, "n_tomb", 0),
            }
        finally:
            self._lock.release_read()

    # ---- lifecycle ------------------------------------------------------- #
    def serve_background(self):
        """Start serving on a daemon thread; returns the base URL."""
        import threading

        t = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        t.start()
        self._thread = t
        return f"http://{self.host}:{self.port}"

    def serve_forever(self):
        self._httpd.serve_forever()

    def shutdown(self):
        self._httpd.shutdown()
        self._httpd.server_close()
