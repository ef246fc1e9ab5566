"""End-to-end training-shard prep: curate -> dedup -> sample -> seeded
global shuffle -> checkpointed partitioned shards, then prove resume by
deleting one partition and re-running.

This is the `python -m riot_ray.job shards` composition driven as a
library; the CLI form is shown at the bottom.

Run from the repo root: python examples/train_shards.py
"""

import _path  # noqa: F401  (repo-root sys.path bootstrap)

import ray

ray.init(address="local", num_cpus=8, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from riot_ray.pipelines import dedup_rows_exact, hash_sample, shuffle_shards
from riot_ray.pipelines.checkpoint import checkpointed_write, read_checkpointed

# a documents-style corpus with planted exact duplicates
src = "/tmp/rr_example/docs.parquet"
os.makedirs(os.path.dirname(src), exist_ok=True)
pq.write_table(pa.table({
    "doc_id": pa.array(range(5000), pa.int64()),
    "text": pa.array([f"alpha beta gamma delta tok{i % 4000}"
                      for i in range(5000)], pa.string()),
}), src)

docs = rd.read_parquet(src)
curated = dedup_rows_exact(docs)                   # keep min-id row per content
sampled = hash_sample(curated, 0.5, seed=7)        # deterministic 50%
sharded = shuffle_shards(sampled, n_shards=16, seed=3, carry_rows=True)

out = "/tmp/rr_example/shards"
shutil.rmtree(out, ignore_errors=True)
s1 = checkpointed_write(sharded, out, fingerprint="example-v1",
                        partition_col="shard", num_partitions=8)
print("first run:", s1)

# lose a partition, re-run the SAME pipeline: only it is rewritten, and
# the restored rows are bit-identical (the permutation is seed-keyed)
victim = sorted(d for d in os.listdir(out) if d.startswith("part="))[0]
shutil.rmtree(os.path.join(out, victim))
sharded2 = shuffle_shards(hash_sample(dedup_rows_exact(
    rd.read_parquet(src)), 0.5, seed=7), n_shards=16, seed=3,
    carry_rows=True)
s2 = checkpointed_write(sharded2, out, fingerprint="example-v1",
                        partition_col="shard", num_partitions=8)
print("resume run:", s2, f"(restored {victim})")

final = read_checkpointed(out)
sizes = final.groupby("shard").count().to_pandas()["count()"]
print(f"{final.count()} rows across {len(sizes)} shards; "
      f"max-min shard size = {int(sizes.max() - sizes.min())}")
print("CLI form: python -m riot_ray.job shards --source", src,
      "--output", out, "--n-shards 16 --frac 0.5 --partitions 8")
ray.shutdown()
