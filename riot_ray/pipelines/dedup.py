"""Deduplication operators for training-data pipelines.

Five family members, each expressed Ray-Data-first:

* exact        — hash-partition on a content digest, keep min-id per group
                 (one groupby shuffle; the digest is computed in a
                 map_batches so only (digest, id) moves through the shuffle)
* ngram-jaccard— exact word-n-gram Jaccard pairs via the inverted
                 shingle->doc index: explode shingles, groupby(shingle) to
                 emit co-occurring pairs, count pair intersections, verify
                 |A∩B| / (|A|+|B|-|A∩B|) >= tau.  SQL-oracle-checkable.
* minhash-LSH  — Broder's minhash (1997) + banded LSH: shingle signatures
                 (vectorized affine permutations)
                 banded into buckets; candidate pairs from bucket groupby,
                 verified by exact jaccard of signatures.  Approximate, so
                 no SQL oracle — tests pin recall vs the exact operator.
* simhash      — Charikar's simhash (STOC 2002): 64-bit tf-weighted; Hamming-<=d pairs found by the
                 4x16-bit block trick (a pair within distance 3 must agree
                 on >=1 of 4 blocks -> groupby each block).
* embedding    — cosine near-dup pairs over list<float> embeddings:
                 normalized matrix broadcast via ray.put, per-batch matmul.

All pair outputs use (id_a < id_b) canonical order.  Hot-key safety: shingle
groups are capped (a shingle shared by >max_group docs is dropped from
candidate generation — standard LSH practice; a shingle that common carries
no signal) so no group is quadratic in the corpus.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .analysis import _flatten_tokens, _token_hashes, round6

_MERSENNE = np.uint64((1 << 61) - 1)


# --------------------------------------------------------------------------- #
# exact dedup
# --------------------------------------------------------------------------- #
def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Survivor ids after exact-content dedup: min(id) per content digest.
    Returns a Dataset with columns (id_col, n_copies)."""

    def digest(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        d = [hashlib.sha256((t or "").encode()).hexdigest() for t in texts]
        return pa.table({id_col: batch[id_col], "digest": pa.array(d, pa.string())})

    from ray.data.aggregate import Count, Min

    agg = (
        ds.map_batches(digest, batch_format="pyarrow")
        .groupby("digest")
        .aggregate(Min(id_col, alias_name=id_col), Count(alias_name="n_copies"))
    )
    return agg.select_columns([id_col, "n_copies"])


# --------------------------------------------------------------------------- #
# shingles
# --------------------------------------------------------------------------- #
def shingle_batch(batch: pa.Table, text_col: str, id_col: str, n: int) -> pa.Table:
    """Distinct word-n-gram shingle hashes per doc: (id, shingle:u64)."""
    texts = batch[text_col]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    flat, parents = _flatten_tokens(texts)
    h = _token_hashes(flat)
    tot = len(h)
    ids = batch[id_col].to_numpy(zero_copy_only=False)
    if tot >= n:
        kg = np.zeros(tot - n + 1, dtype=np.uint64)
        for i in range(n):
            kg = (kg * np.uint64(1099511628211)) ^ h[i : tot - n + 1 + i]
        kp = parents[: tot - n + 1]
        valid = parents[n - 1 :] == kp
        kg, kp = kg[valid], kp[valid]
        # distinct (doc, shingle)
        order = np.lexsort((kg, kp))
        kg, kp = kg[order], kp[order]
        keep = np.r_[True, (kp[1:] != kp[:-1]) | (kg[1:] != kg[:-1])]
        kg, kp = kg[keep], kp[keep]
    else:
        kg = np.empty(0, np.uint64)
        kp = np.empty(0, np.int64)
    return pa.table(
        {
            id_col: pa.array(ids[kp], pa.int64()),
            "shingle": pa.array(kg, pa.uint64()),
        }
    )


class _PairEmit:
    """groupby(bucket) -> co-occurring doc pairs (a<b) for EVERY key run in
    the bucket.  Keys are bucketed (bucket = key % 32) so one group
    call covers thousands of keys and the downstream pair groupby sees few,
    large blocks (sort-shuffle cost scales with maps x reduces) — per-key map_groups costs ~10x more.
    Vectorized: runs found by sort boundaries; pairs generated per distinct
    run LENGTH with one precomputed triu per length.  Runs larger than
    max_group are dropped (a key shared by that many docs carries no
    signal — standard LSH practice, avoids O(g^2) blowup)."""

    def __init__(self, id_col: str, max_group: int, key_col: str = "key"):
        self.id_col = id_col
        self.max_group = max_group
        self.key_col = key_col
        self.__name__ = "PairEmit"

    def __call__(self, group: pa.Table) -> pa.Table:
        key = group[self.key_col].to_numpy(zero_copy_only=False)
        ids = group[self.id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, key))
        key, ids = key[order], ids[order]
        n = len(key)
        empty = pa.table(
            {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())}
        )
        if n < 2:
            return empty
        # dedup (key, id) then find runs per key
        keep = np.r_[True, (key[1:] != key[:-1]) | (ids[1:] != ids[:-1])]
        key, ids = key[keep], ids[keep]
        n = len(key)
        newrun = np.r_[True, key[1:] != key[:-1]]
        starts = np.flatnonzero(newrun)
        lens = np.diff(np.r_[starts, n])
        ok = (lens >= 2) & (lens <= self.max_group)
        starts, lens = starts[ok], lens[ok]
        if not len(starts):
            return empty
        out_a, out_b = [], []
        for l in np.unique(lens):
            runs_l = starts[lens == l]
            ia, ib = np.triu_indices(int(l), k=1)
            a = (runs_l[:, None] + ia[None, :]).ravel()
            b = (runs_l[:, None] + ib[None, :]).ravel()
            out_a.append(ids[a])
            out_b.append(ids[b])
        return pa.table(
            {
                "id_a": pa.array(np.concatenate(out_a), pa.int64()),
                "id_b": pa.array(np.concatenate(out_b), pa.int64()),
            }
        )


def ngram_jaccard_pairs(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    max_group: int = 512,
):
    """Exact n-gram Jaccard duplicate pairs: columns
    (id_a, id_b, jaccard) with jaccard rounded to 6dp, id_a < id_b.

    Shingles shared by more than ``max_group`` docs (no-signal boilerplate)
    are removed from the shingle UNIVERSE — both the pair counts and the
    per-doc sizes — so the reported jaccard is exact over the filtered
    universe (dropping them from candidates alone would understate the
    intersection of surfaced pairs).  With no shingle over the cap the
    result is plain exact jaccard (the SQL-oracle case)."""
    import ray
    from ray.data.aggregate import Count

    shingles = ds.map_batches(
        lambda b: shingle_batch(b, text_col, id_col, n),
        batch_format="pyarrow",
        batch_size=2048,
    ).materialize()  # reused below: materialize once

    # hot-shingle filter: df per shingle, drop df > max_group everywhere
    sh_df = shingles.groupby("shingle").aggregate(Count(alias_name="df"))
    hot_tbl = sh_df.filter(lambda r: r["df"] > max_group).to_pandas()
    if len(hot_tbl):
        hot = np.sort(hot_tbl["shingle"].to_numpy().astype(np.uint64))
        hot_ref = ray.put(hot)

        def drop_hot(batch: pa.Table) -> pa.Table:
            h = ray.get(hot_ref)
            sh = batch["shingle"].to_numpy(zero_copy_only=False).astype(np.uint64)
            return batch.filter(pa.array(~np.isin(sh, h, assume_unique=False)))

        shingles = shingles.map_batches(drop_hot, batch_format="pyarrow").materialize()

    sizes = shingles.groupby(id_col).aggregate(Count(alias_name="n_shingles"))
    size_tbl = sizes.to_pandas()
    sid = size_tbl[id_col].to_numpy()
    sn = size_tbl["n_shingles"].to_numpy().astype(np.float64)
    order = np.argsort(sid)
    size_ref = ray.put((sid[order], sn[order]))

    def bucketize(batch: pa.Table) -> pa.Table:
        sh = batch["shingle"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "bucket", pa.array((sh % np.uint64(32)).astype(np.int32), pa.int32())
        )

    inter = (
        shingles.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(
            _PairEmit(id_col, max_group, key_col="shingle"), batch_format="pyarrow"
        )
        .groupby(["id_a", "id_b"])
        .aggregate(Count(alias_name="inter"))
    )

    def score(batch: pa.Table) -> pa.Table:
        sid_s, sn_s = ray.get(size_ref)
        a = batch["id_a"].to_numpy(zero_copy_only=False)
        b = batch["id_b"].to_numpy(zero_copy_only=False)
        it = batch["inter"].to_numpy(zero_copy_only=False).astype(np.float64)
        na = sn_s[np.searchsorted(sid_s, a)]
        nb = sn_s[np.searchsorted(sid_s, b)]
        j = round6(it / (na + nb - it))
        keep = j >= threshold
        return pa.table(
            {
                "id_a": pa.array(a[keep], pa.int64()),
                "id_b": pa.array(b[keep], pa.int64()),
                "jaccard": pa.array(j[keep], pa.float64()),
            }
        )

    return inter.map_batches(score, batch_format="pyarrow")


# --------------------------------------------------------------------------- #
# pair lists -> clusters -> survivors
# --------------------------------------------------------------------------- #
def dedup_clusters(pairs_ds):
    """Connected components over a near-dup pair list: every doc appearing in
    >=1 pair gets ``cluster_id`` = the minimum doc id in its component
    (transitive closure — A~B, B~C puts A and C in one cluster even if they
    never paired directly).

    Input: a Dataset/table with ``id_a``/``id_b`` columns (the output shape
    of every ``*_pairs`` operator here); extra columns are ignored.  Returns
    a Dataset with columns (doc_id, cluster_id).

    Scale note: the PAIR set is the thresholded survivors — orders of
    magnitude smaller than the corpus (the corpus itself never centralizes).
    Union-find runs driver-side over that small set; past ~10^8 pairs swap
    this for iterative hash-min label propagation (repeat
    groupby(node).min(label) until fixpoint), same output contract.
    """
    import ray.data as rd

    tbl = pairs_ds.select_columns(["id_a", "id_b"]).to_pandas()
    # an empty Dataset round-trips to a column-less DataFrame
    a = tbl["id_a"].to_numpy(np.int64) if "id_a" in tbl else np.empty(0, np.int64)
    b = tbl["id_b"].to_numpy(np.int64) if "id_b" in tbl else np.empty(0, np.int64)
    ids = np.unique(np.concatenate([a, b])) if len(a) else np.empty(0, np.int64)
    parent = np.arange(len(ids), dtype=np.int64)

    def find(x: int) -> int:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for u, v in zip(np.searchsorted(ids, a), np.searchsorted(ids, b)):
        ru, rv = find(u), find(v)
        if ru != rv:
            # union by min index == min doc id (ids is sorted), so the root
            # IS the cluster label
            if ru < rv:
                parent[rv] = ru
            else:
                parent[ru] = rv
    roots = np.array([find(i) for i in range(len(ids))], dtype=np.int64)
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "cluster_id": pa.array(ids[roots], pa.int64()),
            }
        )
    )


def dedup_filter(ds, pairs_ds, id_col: str = "doc_id"):
    """Survivors after near-dup collapse: drop every doc whose cluster_id
    (from :func:`dedup_clusters` over ``pairs_ds``) is not itself — i.e.
    keep one representative (min id) per duplicate cluster plus every
    singleton.  The loser set (small) is broadcast once via ray.put; the
    corpus-wide filter is a distributed map_batches anti-join."""
    import ray

    members = dedup_clusters(pairs_ds).to_pandas()
    losers = members.loc[
        members["doc_id"] != members["cluster_id"], "doc_id"
    ].to_numpy(np.int64)
    losers_ref = ray.put(np.sort(losers))

    def keep(batch: pa.Table) -> pa.Table:
        drop = ray.get(losers_ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.filter(pa.array(~np.isin(ids, drop, assume_unique=False)))

    return ds.map_batches(keep, batch_format="pyarrow")


# --------------------------------------------------------------------------- #
# minhash + LSH
# --------------------------------------------------------------------------- #
def _perm_params(num_perm: int, seed: int):
    """a, b < 2^32 so a * x32 + b < 2^64 computes EXACTLY in uint64 — a
    full-width product would silently wrap mod 2^64 before the Mersenne
    mod, breaking the permutation family (collisions bias est_jaccard)."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 1 << 32, size=num_perm, dtype=np.uint64) | np.uint64(1)
    b = rng.integers(0, 1 << 32, size=num_perm, dtype=np.uint64)
    return a, b


class MinHashStage:
    """Per-doc minhash signature (num_perm x u64->u32) — permutation params
    built once per actor; the per-batch work is one (shingles x perms)
    broadcast min-reduce via np.minimum.reduceat."""

    def __init__(self, text_col: str, id_col: str, n: int, num_perm: int, seed: int):
        self.text_col, self.id_col, self.n = text_col, id_col, n
        self.a, self.b = _perm_params(num_perm, seed)
        self.num_perm = num_perm

    def __call__(self, batch: pa.Table) -> pa.Table:
        sh = shingle_batch(batch, self.text_col, self.id_col, self.n)
        ids_all = batch[self.id_col].to_numpy(zero_copy_only=False)
        kp = sh[self.id_col].to_numpy(zero_copy_only=False)
        kg = sh["shingle"].to_numpy(zero_copy_only=False)
        # group boundaries (kp sorted by construction)
        starts = np.r_[0, 1 + np.flatnonzero(kp[1:] != kp[:-1])] if len(kp) else np.empty(0, np.int64)
        sigs = np.full((len(ids_all), self.num_perm), np.iinfo(np.uint64).max, np.uint64)
        if len(kp):
            # fold shingles to 32 bits so the affine hash is exact in u64;
            # (n_shingles, num_perm) — size batches so this fits worker heap
            x32 = (kg ^ (kg >> np.uint64(32))) & np.uint64(0xFFFFFFFF)
            hv = (x32[:, None] * self.a[None, :] + self.b[None, :]) % _MERSENNE
            mins = np.minimum.reduceat(hv, starts, axis=0)
            present_ids = kp[starts.astype(np.int64)]
            id_to_row = {v: i for i, v in enumerate(ids_all)}
            rows = np.fromiter((id_to_row[v] for v in present_ids), np.int64, count=len(present_ids))
            sigs[rows] = mins
        return pa.table(
            {
                self.id_col: pa.array(ids_all, pa.int64()),
                "sig": pa.FixedSizeListArray.from_arrays(
                    pa.array(sigs.ravel(), pa.uint64()), self.num_perm
                ),
            }
        )


def minhash_lsh_pairs(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_perm: int = 128,
    bands: int = 32,
    threshold: float = 0.5,
    seed: int = 42,
    max_group: int = 512,
    concurrency: int | None = None,
):
    """Near-dup pairs via MinHash+LSH: (id_a, id_b, est_jaccard).  Candidate
    generation = band-bucket groupby; verification = signature agreement
    fraction (unbiased jaccard estimator) >= threshold."""
    import ray
    from ray.data.aggregate import Count

    rows_per_band = num_perm // bands
    # bound the (n_shingles x num_perm) hash matrix: 512 docs x ~200
    # shingles x 128 perms x 8B ~ 100 MB per task
    kwargs: dict = {"batch_format": "pyarrow", "batch_size": 512}
    if concurrency:
        kwargs["concurrency"] = concurrency
    sigs = ds.map_batches(
        MinHashStage(text_col, id_col, n, num_perm, seed), **kwargs
    ).materialize()

    def band_keys(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        sig_col = batch["sig"]
        if isinstance(sig_col, pa.ChunkedArray):
            sig_col = sig_col.combine_chunks()
        sig = np.asarray(
            sig_col.flatten().to_numpy(zero_copy_only=False), dtype=np.uint64
        ).reshape(len(ids), num_perm)
        outs_id, outs_key = [], []
        for bi in range(bands):
            chunk = sig[:, bi * rows_per_band : (bi + 1) * rows_per_band]
            # stable 64-bit digest of the band content + band index
            key = np.zeros(len(ids), np.uint64)
            for c in range(rows_per_band):
                key = (key * np.uint64(1099511628211)) ^ chunk[:, c]
            key = (key << np.uint64(6)) | np.uint64(bi)
            outs_id.append(ids)
            outs_key.append(key)
        keys = np.concatenate(outs_key)
        return pa.table(
            {
                "id_a": pa.array(np.concatenate(outs_id), pa.int64()),
                "key": pa.array(keys, pa.uint64()),
                "bucket": pa.array((keys % np.uint64(32)).astype(np.int32), pa.int32()),
            }
        )

    # no pre-verify groupby: a pair surfacing from several bands would only
    # be deduped here at full candidate volume; verification is idempotent,
    # so verify every candidate row and dedup the (small) surviving set
    cands = (
        sigs.map_batches(band_keys, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_PairEmit("id_a", max_group, key_col="key"), batch_format="pyarrow")
    )

    # broadcast signatures as ONE (ids, matrix) pair — a dict of N small
    # arrays has O(N) python overhead and stalls past ~100k docs.  (At the
    # next scale tier — billions of docs — replace the broadcast entirely
    # with a candidates x signatures join.)
    sig_tables = ray.get(sigs.to_arrow_refs())
    ids_cat = np.concatenate(
        [t[id_col].to_numpy(zero_copy_only=False) for t in sig_tables if t.num_rows]
    )
    mat_cat = np.concatenate(
        [
            np.asarray(
                t["sig"].combine_chunks().flatten().to_numpy(zero_copy_only=False)
            ).reshape(t.num_rows, num_perm)
            for t in sig_tables
            if t.num_rows
        ]
    )
    order = np.argsort(ids_cat)
    sig_ref = ray.put((ids_cat[order], mat_cat[order]))

    def verify(batch: pa.Table) -> pa.Table:
        sids, smat = ray.get(sig_ref)
        a = batch["id_a"].to_numpy(zero_copy_only=False)
        b = batch["id_b"].to_numpy(zero_copy_only=False)
        if len(a) == 0:
            return pa.table({"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()), "est_jaccard": pa.array([], pa.float64())})
        sa = smat[np.searchsorted(sids, a)]
        sb = smat[np.searchsorted(sids, b)]
        est = round6((sa == sb).mean(axis=1))
        keep = est >= threshold
        return pa.table(
            {
                "id_a": pa.array(a[keep], pa.int64()),
                "id_b": pa.array(b[keep], pa.int64()),
                "est_jaccard": pa.array(est[keep], pa.float64()),
            }
        )

    from ray.data.aggregate import Max

    verified = cands.map_batches(verify, batch_format="pyarrow")
    return verified.groupby(["id_a", "id_b"]).aggregate(
        Max("est_jaccard", alias_name="est_jaccard")
    )


# --------------------------------------------------------------------------- #
# simhash
# --------------------------------------------------------------------------- #
def simhash_batch(batch: pa.Table, text_col: str, id_col: str) -> pa.Table:
    """64-bit tf-weighted simhash per doc, fully vectorized via bincount
    over (doc, bit) keys."""
    texts = batch[text_col]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    flat, parents = _flatten_tokens(texts)
    h = _token_hashes(flat)
    n_rows = batch.num_rows
    ids = batch[id_col].to_numpy(zero_copy_only=False)
    sims = np.zeros(n_rows, dtype=np.uint64)
    if len(h):
        # accumulate +1/-1 per bit: counts of set bits per (doc, bit)
        bits = (h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)
        ones = np.zeros((n_rows, 64), np.int64)
        np.add.at(ones, parents, bits.astype(np.int64))
        total = np.bincount(parents, minlength=n_rows)[:, None]
        simbits = (ones * 2 > total).astype(np.uint64)
        sims = (simbits << np.arange(64, dtype=np.uint64)[None, :]).sum(
            axis=1, dtype=np.uint64
        )
    return pa.table(
        {id_col: pa.array(ids, pa.int64()), "simhash": pa.array(sims, pa.uint64())}
    )


def simhash_pairs(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    max_group: int = 1024,
):
    """Pairs within Hamming distance <= max_hamming of their 64-bit simhash.
    Blocking: split 64 bits into (max_hamming+1) blocks — a qualifying pair
    must agree exactly on >=1 block (pigeonhole), so candidates come from
    (block_id, block_value) groupbys; verified by popcount."""
    import ray
    from ray.data.aggregate import Count

    n_blocks = max_hamming + 1
    width = 64 // n_blocks

    sims = ds.map_batches(
        lambda b: simhash_batch(b, text_col, id_col),
        batch_format="pyarrow",
        batch_size=2048,  # bounds the (docs x 64)-bit accumulation matrices
    ).materialize()

    def block_keys(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        s = batch["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        out_i, out_k = [], []
        for bi in range(n_blocks):
            lo = bi * width
            hi = 64 if bi == n_blocks - 1 else lo + width
            mask = (np.uint64((1 << (hi - lo)) - 1)) << np.uint64(lo)
            val = (s & mask) >> np.uint64(lo)
            out_i.append(ids)
            out_k.append((val << np.uint64(3)) | np.uint64(bi))
        keys = np.concatenate(out_k)
        return pa.table(
            {
                "id_a": pa.array(np.concatenate(out_i), pa.int64()),
                "key": pa.array(keys, pa.uint64()),
                "bucket": pa.array((keys % np.uint64(32)).astype(np.int32), pa.int32()),
            }
        )

    cands = (
        sims.map_batches(block_keys, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_PairEmit("id_a", max_group, key_col="key"), batch_format="pyarrow")
    )

    sim_tables = ray.get(sims.to_arrow_refs())
    ids_cat = np.concatenate(
        [t[id_col].to_numpy(zero_copy_only=False) for t in sim_tables if t.num_rows]
    )
    sim_cat = np.concatenate(
        [
            t["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
            for t in sim_tables
            if t.num_rows
        ]
    )
    order = np.argsort(ids_cat)
    sim_ref = ray.put((ids_cat[order], sim_cat[order]))

    def verify(batch: pa.Table) -> pa.Table:
        sids, svals = ray.get(sim_ref)
        a = batch["id_a"].to_numpy(zero_copy_only=False)
        b = batch["id_b"].to_numpy(zero_copy_only=False)
        if len(a) == 0:
            return pa.table({"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()), "hamming": pa.array([], pa.int64())})
        sa = svals[np.searchsorted(sids, a)]
        sb = svals[np.searchsorted(sids, b)]
        x = sa ^ sb
        ham = np.zeros(len(x), np.int64)
        for i in range(64):
            ham += ((x >> np.uint64(i)) & np.uint64(1)).astype(np.int64)
        keep = ham <= max_hamming
        return pa.table(
            {
                "id_a": pa.array(a[keep], pa.int64()),
                "id_b": pa.array(b[keep], pa.int64()),
                "hamming": pa.array(ham[keep], pa.int64()),
            }
        )

    from ray.data.aggregate import Max

    verified = cands.map_batches(verify, batch_format="pyarrow")
    return verified.groupby(["id_a", "id_b"]).aggregate(
        Max("hamming", alias_name="hamming")
    )


# --------------------------------------------------------------------------- #
# embedding cosine near-dup
# --------------------------------------------------------------------------- #
def embedding_dup_pairs(
    ds,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
):
    """Cosine-similarity >= threshold pairs (id_a < id_b, cos rounded 6dp).

    Scale path: the normalized matrix is broadcast once via ray.put and each
    batch does one matmul against it (works to ~1M x few-hundred dims; past
    that, swap the broadcast for the LSH-bucketed variant in simsearch.py —
    same pair-verify tail)."""
    import ray

    mat_tbl = ds.select_columns([id_col, vec_col]).to_pandas()
    ids_all = mat_tbl[id_col].to_numpy()
    M = np.stack(mat_tbl[vec_col].to_numpy()).astype(np.float64)
    norms = np.linalg.norm(M, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    Mn = M / norms
    ref = ray.put((ids_all, Mn))

    def pairs(batch: pa.Table) -> pa.Table:
        g_ids, g_mat = ray.get(ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        V = np.stack(
            batch[vec_col].to_numpy(zero_copy_only=False)
        ).astype(np.float64)
        n = np.linalg.norm(V, axis=1, keepdims=True)
        n[n == 0] = 1.0
        sims = (V / n) @ g_mat.T
        ri, ci = np.nonzero(sims >= threshold)
        a, b = ids[ri], g_ids[ci]
        keep = a < b
        return pa.table(
            {
                "id_a": pa.array(a[keep], pa.int64()),
                "id_b": pa.array(b[keep], pa.int64()),
                "cosine": pa.array(round6(sims[ri, ci][keep]), pa.float64()),
            }
        )

    return ds.map_batches(pairs, batch_format="pyarrow")
