"""Training-data curation chain over a parquet corpus: quality gate ->
exact dedup -> deterministic sample -> token-budget packing.

Run from the repo root: python examples/pipeline.py
"""

import _path  # noqa: F401  (repo-root sys.path bootstrap)

import ray

ray.init(address="local", num_cpus=8, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from riot_ray.corpus import write_corpus
from riot_ray.pipelines import exact_dedup, hash_sample, pack_sequences
from riot_ray.pipelines.analysis import quality_batch

src = write_corpus("/tmp/rr_example/src/code.parquet", 2000, seed=7)
docs = rd.read_parquet(src).map_batches(
    lambda b: pa.table({"doc_id": pc.binary_join_element_wise(
        b["repo"], b["path"], "/"), "text": b["content"]}),
    batch_format="pyarrow",
)

def gate(batch: pa.Table) -> pa.Table:
    q = quality_batch(batch)
    keep = pc.greater_equal(q["n_tokens"], 30)
    return batch.filter(keep)

gated = docs.map_batches(gate, batch_format="pyarrow")
survivors = exact_dedup(gated)                      # min doc_id per content
sampled = hash_sample(survivors, 0.5, seed=7)       # deterministic 50%
print(f"{docs.count()} docs -> {gated.count()} pass quality "
      f"-> {survivors.count()} unique -> {sampled.count()} sampled")
ray.shutdown()
