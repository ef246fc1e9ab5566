"""Deterministic synthetic source-code corpus (FIXTURES.md F1).

Schema matches the driver ``input_hint`` exactly:
``(repo:string, path:string, commit:string, lang:string, content:string)``.
Zipf(1.2)-skewed draws from a 200-word vocabulary guarantee hot terms
("def", "import", "return", ...) so the doc-range salting path is exercised.
Seeded — same (n_docs, seed) always yields byte-identical tables.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

LANGS = ["py", "go", "js", "java", "rs", "c"]
EXT = {l: l for l in LANGS}

_KEYWORDS = [
    "def", "func", "class", "import", "return", "if", "else", "for", "while",
    "var", "let", "const", "struct", "impl", "fn", "pub", "static", "void",
    "int", "float", "string", "bool", "err", "nil", "self", "this", "new",
    "try", "catch", "raise", "panic", "defer", "go", "async", "await", "yield",
]
_STEMS = [
    "parse", "load", "dump", "read", "write", "open", "close", "init", "run",
    "exec", "eval", "build", "make", "create", "delete", "update", "fetch",
    "send", "recv", "encode", "decode", "hash", "sort", "merge", "split",
    "join", "map", "filter", "reduce", "index", "query", "search", "rank",
    "score", "token", "batch", "shard", "block", "cache", "store", "flush",
    "count", "sum", "min", "max", "mean", "norm", "scale", "clip", "pad",
    "mask", "attn", "embed", "conv", "pool", "dense", "layer", "model",
    "train", "test", "valid", "config", "option", "param", "value", "key",
    "node", "edge", "graph", "tree", "list", "dict", "set", "tuple", "array",
    "buffer", "stream", "file", "path", "dir", "url", "http", "grpc", "json",
    "yaml", "toml", "proto", "schema", "table", "column", "row", "field",
    "record", "event", "log", "trace", "span", "metric", "gauge", "timer",
    "client", "server", "worker", "actor", "task", "job", "queue", "topic",
    "lock", "mutex", "atomic", "thread", "proc", "signal", "ctx", "req",
    "resp", "code", "status", "error", "retry", "backoff", "limit", "quota",
    "user", "group", "role", "auth", "token2", "session", "cookie", "header",
    "body", "chunk", "frame", "packet", "byte", "bit", "word", "line", "text",
    "doc", "term", "corpus", "vocab", "freq", "tfidf", "bm", "wand", "heap",
    "stack", "ring", "slab", "arena", "page", "slot", "bucket", "probe",
    "seed", "rand", "uuid", "time", "date", "clock", "tick", "delay", "wait",
]


def vocabulary() -> list:
    vocab = list(_KEYWORDS) + list(_STEMS)
    return vocab[:200]


def _zipf_probs(n: int, a: float = 1.2) -> np.ndarray:
    ranks = np.arange(1, n + 1, dtype=np.float64)
    p = ranks ** (-a)
    return p / p.sum()


def make_corpus(n_docs: int, seed: int = 42) -> pa.Table:
    rng = np.random.default_rng(seed)
    vocab = np.array(vocabulary(), dtype=object)
    probs = _zipf_probs(len(vocab))
    n_tokens = rng.integers(20, 401, size=n_docs)
    repos, paths, commits, langs, contents = [], [], [], [], []
    for i in range(n_docs):
        lang = LANGS[i % len(LANGS)]
        repos.append(f"org{i % 7}/repo{i % 23}")
        paths.append(f"src/mod{i % 11}/file_{i}.{EXT[lang]}")
        commits.append(hashlib.sha1(f"c{i}".encode()).hexdigest())
        langs.append(lang)
        toks = rng.choice(vocab, size=int(n_tokens[i]), p=probs)
        # sprinkle snake_case / camelCase identifiers (code-mode fodder)
        words = []
        for j, t in enumerate(toks):
            r = (i * 31 + j) % 17
            if r == 0 and j + 1 < len(toks):
                words.append(f"{t}_{toks[j + 1]}")
            elif r == 1 and j + 1 < len(toks):
                words.append(t + str(toks[j + 1]).capitalize())
            else:
                words.append(str(t))
        lines = []
        for k in range(0, len(words), 8):
            lines.append(" ".join(words[k : k + 8]))
        contents.append("\n".join(lines))
    return pa.table(
        {
            "repo": pa.array(repos, pa.string()),
            "path": pa.array(paths, pa.string()),
            "commit": pa.array(commits, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "content": pa.array(contents, pa.string()),
        }
    )


def make_corpus_fast(n_docs: int, seed: int = 42, mean_tokens: int = 210) -> pa.Table:
    """Vectorized corpus generator for benchmark-scale tables (600k+ docs in
    seconds): one Zipf draw for all tokens, Arrow dictionary gather, and
    ``pc.binary_join_element_wise`` via list joins — no per-doc Python.
    Vocabulary = 200 base words + 200 snake_case compounds so code-mode
    identifier splitting still has real work to do."""
    import pyarrow.compute as pc

    rng = np.random.default_rng(seed)
    base = vocabulary()
    compounds = [f"{base[i % 200]}_{base[(i * 7 + 3) % 200]}" for i in range(200)]
    vocab = pa.array(base + compounds, pa.string())
    probs = _zipf_probs(len(vocab))
    n_tokens = rng.integers(mean_tokens // 2, mean_tokens * 3 // 2, size=n_docs)
    total = int(n_tokens.sum())
    codes = rng.choice(len(vocab), size=total, p=probs).astype(np.int32)
    offsets = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(n_tokens, out=offsets[1:])
    flat = vocab.take(pa.array(codes))
    lists = pa.LargeListArray.from_arrays(pa.array(offsets, pa.int64()), flat)
    contents = pc.binary_join(lists, " ")

    idx = np.arange(n_docs)
    repos = pa.array([f"org{i % 7}/repo{i % 23}" for i in range(161)], pa.string()).take(
        pa.array(idx % 161)
    )
    lang_arr = pa.array(LANGS, pa.string()).take(pa.array(idx % len(LANGS)))
    paths = pc.binary_join_element_wise(
        pa.array(np.char.add("src/f", idx.astype("U10")), pa.string()),
        lang_arr,
        ".",
    )
    commits = pa.array(
        [hashlib.sha1(f"c{i % 9973}".encode()).hexdigest() for i in range(9973)],
        pa.string(),
    ).take(pa.array(idx % 9973))
    return pa.table(
        {
            "repo": repos,
            "path": paths,
            "commit": commits,
            "lang": lang_arr,
            "content": contents,
        }
    )


def write_corpus(path: str, n_docs: int, seed: int = 42) -> str:
    import os

    import pyarrow.parquet as pq

    os.makedirs(os.path.dirname(path), exist_ok=True)
    pq.write_table(make_corpus(n_docs, seed), path)
    return path
