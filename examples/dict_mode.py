"""Analog of /root/reference/examples/{dict,pinyin}: dictionary
segmentation + pinyin expansion from inline entries (no external files).

Run from the repo root: python examples/dict_mode.py
"""

import _path  # noqa: F401  (repo-root sys.path bootstrap)

import ray

ray.init(address="local", num_cpus=4, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False

import pyarrow as pa
import pyarrow.parquet as pq

from riot_ray import EngineOpts, RankOpts, SearchReq
from riot_ray.build import IndexWriter
from riot_ray.engine import LocalSearcher

import os

os.makedirs("/tmp/rr_example_dict", exist_ok=True)
pq.write_table(
    pa.table({
        "repo": ["r", "r"], "path": ["a", "b"], "commit": ["c", "c"],
        "lang": ["zh", "zh"],
        "content": ["此次发布的极光单行本", "极光黑暗独立版本"],
    }),
    "/tmp/rr_example_dict/src.parquet",
)
opts = EngineOpts(
    mode="dict",
    dict_entries=(("此次", 10), ("发布", 10), ("极光", 10), ("单行本", 10),
                  ("黑暗", 10), ("独立", 10), ("版本", 10)),
)
IndexWriter("/tmp/rr_example_dict/index", opts).build(
    "/tmp/rr_example_dict/src.parquet")
s = LocalSearcher("/tmp/rr_example_dict/index")
resp = s.search(SearchReq(text="极光", rank_opts=RankOpts(max_outputs=5)))
print(f"极光 -> {[h.doc_id for h in resp.docs]}")
ray.shutdown()
