"""Analog of /root/reference/examples/store: persistence + recovery.
Here persistence is the default (parquet segments ARE the index):
re-running build() skips completed shards; remove/compact maintain it.

Run from the repo root: python examples/store_resume.py
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
from riot_ray.engine import LocalSearcher
from riot_ray.updates import compact, remove_docs

src = write_corpus("/tmp/rr_example/src/code.parquet", 2000, seed=7)
w = IndexWriter("/tmp/rr_example/index", EngineOpts(mode="code"))
w.build(src)
again = w.build(src)  # resume: all shards skipped
print(f"re-run skipped {again['shards_skipped']}/{again['num_shards']} shards")

s = LocalSearcher("/tmp/rr_example/index")
victim = s.search(SearchReq(text="parse", rank_opts=RankOpts(max_outputs=1))).docs[0].doc_id
remove_docs("/tmp/rr_example/index", [victim])
s2 = LocalSearcher("/tmp/rr_example/index")
hits = [h.doc_id for h in s2.search(
    SearchReq(text="parse", rank_opts=RankOpts(max_outputs=5))).docs]
print(f"removed {victim!r}; excluded from results: {victim not in hits}")
compact("/tmp/rr_example/index")  # rewrite segments, drop tombstones
print("compacted: tombstones folded into the segments")
ray.shutdown()
