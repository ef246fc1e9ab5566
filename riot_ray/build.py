"""Index build orchestration — the flagship Ray Data pipeline.

    read_parquet(src)                                        # S1
      -> map_batches(prepare: doc_id + sha256 + part)        # D4 input
      -> groupby(part).map_groups(AssignIds)                 # dedup + u64 ids
         (writes forward/part=K.parquet atomically)
    read_parquet(forward)
      -> map_batches(TokenizeStage)                          # M1-M11
      -> groupby(shard).map_groups(BuildShard)               # A1/A2 shuffle
         (writes segments/shard=K/{blocks,terms,docmeta}.parquet + manifest)
    read segments/*/terms.parquet -> groupby(term).sum       # global df (A2)
    stats.json from shard manifests                          # A3 (global N, avgdl)

Resume: each segment shard carries a manifest with a build fingerprint;
re-running build() skips shards whose manifest matches (per-partition
lineage, north rule).  Updates (D5) are handled by riot_ray.updates via
generations + tombstones.
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import time

import ray.data as rd

from .config import EngineOpts
from .stages.prepare import AssignIds, make_prepare_fn
from .stages.postings import TokenizeStage
from .stages.segments import BuildShard

STATS_FILE = "stats.json"


def _fingerprint(opts: EngineOpts, source: str) -> str:
    return hashlib.sha256((opts.to_json() + "\0" + source).encode()).hexdigest()[:16]


class IndexWriter:
    def __init__(self, index_dir: str, opts: EngineOpts | None = None):
        self.index_dir = index_dir
        self.opts = opts or EngineOpts()

    @property
    def forward_dir(self):
        return os.path.join(self.index_dir, "forward")

    @property
    def segments_dir(self):
        return os.path.join(self.index_dir, "segments")

    @property
    def termstats_dir(self):
        return os.path.join(self.index_dir, "termstats")

    def build(self, source, source_desc: str = "") -> dict:
        """source: parquet path(s) or a ray.data.Dataset. Returns stats dict."""
        t0 = time.time()
        opts = self.opts
        os.makedirs(self.index_dir, exist_ok=True)

        ds = source if isinstance(source, rd.Dataset) else rd.read_parquet(source)
        desc = source_desc or (source if isinstance(source, str) else "dataset")
        fp = _fingerprint(opts, desc)

        # ---- doc pass: dedup + id assign + forward table -----------------
        prepared = ds.map_batches(make_prepare_fn(opts), batch_format="pyarrow")
        fwd_manifest = (
            prepared.groupby("part")
            .map_groups(
                AssignIds(opts, self.forward_dir), batch_format="pyarrow"
            )
            .to_pandas()
        )
        n_docs_forward = int(fwd_manifest["n_docs"].sum())

        # ---- postings + segments ----------------------------------------
        fwd_cols = ["doc", opts.content_col]
        if opts.tokens_col:
            fwd_cols.append(opts.tokens_col)
        if opts.labels_col:
            fwd_cols.append(opts.labels_col)
        fwd = rd.read_parquet(self._forward_files(), columns=fwd_cols)
        tok_kwargs: dict = {"batch_format": "pyarrow", "batch_size": opts.tokenize_batch_size}
        if opts.tokenize_concurrency:
            tok_kwargs["concurrency"] = opts.tokenize_concurrency
        postings = fwd.map_batches(TokenizeStage(opts), **tok_kwargs)
        seg_manifest = (
            postings.groupby("shard")
            .map_groups(
                BuildShard(opts, self.segments_dir, fp), batch_format="pyarrow"
            )
            .to_pandas()
        )

        # ---- global term stats (df) -------------------------------------
        from ray.data.aggregate import Sum

        terms_files = sorted(
            glob.glob(os.path.join(self.segments_dir, "shard=*", "terms.parquet"))
        )
        df_ds = rd.read_parquet(terms_files).groupby("term").aggregate(
            Sum("df_local", alias_name="df")
        )
        tmp_ts = self.termstats_dir + ".tmp"
        import shutil

        if os.path.exists(tmp_ts):
            shutil.rmtree(tmp_ts)
        df_ds.write_parquet(tmp_ts)
        if os.path.exists(self.termstats_dir):
            shutil.rmtree(self.termstats_dir)
        os.replace(tmp_ts, self.termstats_dir)

        # ---- global stats ------------------------------------------------
        stats = {
            "n_docs": int(seg_manifest["n_docs"].sum()),
            "total_token_len": float(seg_manifest["total_token_len"].sum()),
            "n_postings": int(seg_manifest["n_postings"].sum()),
            "n_terms_with_dups_across_shards": int(seg_manifest["n_terms"].sum()),
            "n_blocks": int(seg_manifest["n_blocks"].sum()),
            "n_docs_forward": n_docs_forward,
            "shards_skipped": int(seg_manifest["skipped"].sum()),
            "num_shards": opts.num_shards,
            "num_parts": opts.num_parts,
            "fingerprint": fp,
            "build_wall_s": round(time.time() - t0, 3),
            "opts": json.loads(opts.to_json()),
            "generations": [0],
        }
        with open(os.path.join(self.index_dir, STATS_FILE), "w") as f:
            json.dump(stats, f, indent=1)
        return stats

    def _forward_files(self):
        return sorted(glob.glob(os.path.join(self.forward_dir, "part=*.parquet")))


def load_stats(index_dir: str) -> dict:
    with open(os.path.join(index_dir, STATS_FILE)) as f:
        return json.load(f)
