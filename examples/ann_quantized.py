"""Quantized-ANN deployment shape: fit int8 scales once, encode the
corpus, PERSIST the codes (4x smaller than float32), then serve query
waves from the code table — results bit-identical to searching the
original float corpus, and DSIR data selection over the same docs.

Run from the repo root: python examples/ann_quantized.py
"""

import _path  # noqa: F401  (repo-root sys.path bootstrap)

import ray

ray.init(address="local", num_cpus=8, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from riot_ray.pipelines import (dsir_sample, knn_int8, knn_int8_codes,
                                quantize_embeddings)

# a unit-norm embedding corpus (knn_int8 ranks by DOT product — normalize
# upstream when you want cosine semantics)
base = "/tmp/rr_example_ann"
shutil.rmtree(base, ignore_errors=True)
os.makedirs(base)
rng = np.random.default_rng(3)
N, D = 20_000, 64
V = rng.normal(size=(N, D))
V = (V / np.linalg.norm(V, axis=1, keepdims=True)).astype(np.float32)
emb_path = f"{base}/embeddings.parquet"
pq.write_table(pa.table({
    "vec_id": pa.array(np.arange(N, dtype=np.int64)),
    "embedding": pa.ListArray.from_arrays(
        pa.array(np.arange(N + 1, dtype=np.int32) * D, pa.int32()),
        pa.array(V.ravel())),
}), emb_path)

emb = rd.read_parquet(emb_path)

# 1) encode once: scales are one streaming max-abs pass, codes map-only
codes_ds, scales = quantize_embeddings(emb)
codes_ds.write_parquet(f"{base}/codes")
np.save(f"{base}/scales.npy", scales)  # the codebook travels WITH the codes

fsz = os.path.getsize(emb_path)
csz = sum(os.path.getsize(os.path.join(r, f))
          for r, _, fs in os.walk(f"{base}/codes") for f in fs)
print(f"float corpus {fsz/1e6:.1f} MB -> codes {csz/1e6:.1f} MB "
      f"({fsz/csz:.1f}x smaller)")

# 2) every query wave scans only the code table
Q = V[:4].astype(np.float64)
stored = rd.read_parquet(f"{base}/codes")
hits = knn_int8_codes(stored, Q, np.load(f"{base}/scales.npy"), k=5)
print(hits.to_pandas().head(8))

# bit-identical to searching the float corpus with the same scales
direct = knn_int8(emb, Q, np.arange(4), k=5, scales=scales)
assert hits.to_pydict() == direct.to_pydict()
print("code-table search == float-corpus search: True")

# 3) DSIR selection on a documents table: pick the docs most like a
#    target distribution (deterministic, or Gumbel-sampled with a seed)
docs = rd.from_arrow(pa.table({
    "doc_id": pa.array(np.arange(2000, dtype=np.int64)),
    "text": pa.array(
        [("def main import return" if i % 3 else "the cat sat on the mat")
         + f" tok{i}" for i in range(2000)], pa.string()),
}))
target = rd.from_arrow(pa.table({
    "doc_id": pa.array([0], pa.int64()),
    "text": pa.array(["def class import return lambda yield"], pa.string()),
}))
top = dsir_sample(docs, target, n=100, n_buckets=4096)
sampled = dsir_sample(docs, target, n=100, n_buckets=4096,
                      temperature=1.0, seed=7)
code_like = sum(1 for i in top["doc_id"].to_pylist() if i % 3 != 0)
print(f"dsir top-100: {code_like}/100 code-like docs (target is code); "
      f"gumbel overlap {len(set(top['doc_id'].to_pylist()) & set(sampled['doc_id'].to_pylist()))}/100")

ray.shutdown()
