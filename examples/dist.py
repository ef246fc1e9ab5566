"""Analog of the reference's distributed deployment (net/grpc + net/http):
N independent node indexes, scatter-gather with riot's wire merge order
((attri.ts desc, id desc), maxOutputs-1 truncation), plus the HTTP facade.

Run from the repo root: python examples/dist.py
"""

import _path  # noqa: F401  (repo-root sys.path bootstrap)

import ray

ray.init(address="local", num_cpus=8, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from riot_ray import EngineOpts, RankOpts, SearchReq
from riot_ray.build import IndexWriter
from riot_ray.corpus import make_corpus
from riot_ray.engine import DistSearcher

t = make_corpus(400, seed=9)
rows = np.arange(t.num_rows, dtype=np.int64)
t = t.append_column("ts", pa.array((rows * 37 + 3) % 97, pa.int64()))
dirs = []
for node in (0, 1):  # two "nodes", disjoint doc partitions, own ts column
    part = t.filter(pa.array(rows % 2 == node))
    src = f"/tmp/rr_example_dist/n{node}/src.parquet"
    os.makedirs(os.path.dirname(src), exist_ok=True)
    pq.write_table(part, src)
    idx = f"/tmp/rr_example_dist/n{node}/index"
    IndexWriter(idx, EngineOpts(mode="code", num_parts=4, num_shards=2,
                                meta_cols=("lang", "ts"))).build(src)
    dirs.append(idx)

d = DistSearcher(dirs)
resp = d.search(SearchReq(text="def", rank_opts=RankOpts(max_outputs=8)))
print(f"{len(resp.docs)} docs (maxOutputs-1 wire quirk), newest first:")
for h in resp.docs:
    print(f"  ts={h.fields['ts']:3d}  {h.doc_id}")
d.shutdown()
ray.shutdown()
