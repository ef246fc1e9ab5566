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


def write_corpus(path: str, n_docs: int, seed: int = 42) -> str:
    import os

    import pyarrow.parquet as pq

    os.makedirs(os.path.dirname(path), exist_ok=True)
    pq.write_table(make_corpus(n_docs, seed), path)
    return path
