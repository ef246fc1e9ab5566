"""Analog of /root/reference/examples/logic: Must / Should / NotIn.

Run from the repo root: python examples/logic.py
"""

import _path  # noqa: F401  (repo-root sys.path bootstrap)

import ray

ray.init(address="local", num_cpus=8, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False

from riot_ray import EngineOpts, Expr, Logic, RankOpts, SearchReq
from riot_ray.build import IndexWriter
from riot_ray.corpus import write_corpus
from riot_ray.engine import LocalSearcher

src = write_corpus("/tmp/rr_example/src/code.parquet", 2000, seed=7)
IndexWriter("/tmp/rr_example/index", EngineOpts(mode="code")).build(src)

s = LocalSearcher("/tmp/rr_example/index")
# expr clauses are explicit keyword lists; SearchReq.text participates
# only via the must/should/not_in FLAGS (riot semantics) — here the whole
# query lives in the Expr
req = SearchReq(
    logic=Logic(expr=Expr(must=("parse",), should=("json", "merge"),
                          not_in=("uuid",))),
    rank_opts=RankOpts(max_outputs=5),
)
resp = s.search(req)
print(f"{resp.num_docs} docs match parse AND (json OR merge) AND NOT uuid")
for h in resp.docs:
    print(f"  {h.doc_id}")
ray.shutdown()
