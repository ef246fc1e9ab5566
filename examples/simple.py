"""Analog of /root/reference/examples/simple: index a corpus, search it.

Run from the repo root: python examples/simple.py
"""

import _path  # noqa: F401  (repo-root sys.path bootstrap)

import ray

ray.init(address="local", num_cpus=8, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False

from riot_ray import EngineOpts, RankOpts, SearchReq
from riot_ray.build import IndexWriter
from riot_ray.corpus import write_corpus
from riot_ray.engine import ActorSearcher

src = write_corpus("/tmp/rr_example/src/code.parquet", 2000, seed=7)
stats = IndexWriter("/tmp/rr_example/index", EngineOpts(mode="code")).build(src)
print(f"indexed {stats['n_docs']} docs, {stats['n_postings']} postings "
      f"in {stats['build_wall_s']}s")

se = ActorSearcher("/tmp/rr_example/index", num_actors=4)
resp = se.search(SearchReq(text="parse json", rank_opts=RankOpts(max_outputs=5)))
for h in resp.docs:
    print(f"  {h.bm25:8.3f}  {h.doc_id}")
se.shutdown()
ray.shutdown()
