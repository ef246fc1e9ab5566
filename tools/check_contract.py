#!/usr/bin/env python
"""Driver-style correctness gate, runnable locally.

Replays what the round driver does with `__ray_entry__.py`: runs `entry()`,
then every `queries()` callable against an sf dir, and for each key that has
an `oracle_sql()` entry runs the SQL in DuckDB over the same parquet tables
and compares row count, column names, and a value hash (columns sorted by
name, rows sorted by all columns — same normalization the driver uses).

Usage (from the repo root, so Ray workers can import riot_ray):

    python tools/check_contract.py [SF_DIR] [--num-cpus N]

Default SF_DIR is /root/testdata/sf0.01 (the driver's correctness scale).
Exit code 0 iff every oracled query hash-matches and nothing errors.
"""

from __future__ import annotations

import argparse
import hashlib
import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _norm(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


def _vhash(df) -> str:
    import pandas as pd

    return hashlib.sha256(
        pd.util.hash_pandas_object(df.astype(str)).values.tobytes()
    ).hexdigest()[:12]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.01")
    ap.add_argument("--num-cpus", type=int, default=16)
    ap.add_argument(
        "--only",
        default=None,
        help="comma-separated substring filters: run only queries whose "
        "name contains one of them (skips entry() too)",
    )
    args = ap.parse_args()

    import duckdb
    import pandas as pd
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level=logging.ERROR,
        )
    # the testdata parquet carries pandas schema metadata that trips two
    # harmless-but-noisy Ray Data warnings (schema-hash dedup, RefBundle
    # schema drift) on every mixed-metadata stage boundary
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    if args.only is None:
        t0 = time.time()
        res = entrymod.entry()
        n = len(res) if isinstance(res, pd.DataFrame) else res.count()
        print(f"entry(): {n} rows in {time.time() - t0:.1f}s")

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(args.sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"create view {t} as select * from read_parquet('{p}')")

    queries, oracles = entrymod.queries(), entrymod.oracle_sql()
    if args.only:
        pats = [p.strip() for p in args.only.split(",") if p.strip()]
        queries = {n: f for n, f in queries.items()
                   if any(p in n for p in pats)}
    fails: list[tuple[str, str]] = []
    for name, fn in queries.items():
        t0 = time.time()
        try:
            got = fn(args.sf_dir)
            if not isinstance(got, pd.DataFrame):
                got = got.to_pandas()
        except Exception as ex:  # noqa: BLE001 - report, don't crash the sweep
            fails.append((name, f"query error: {ex!r}"))
            print(f"{name:28s} QUERY-ERROR {ex!r}")
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"{name:28s} rows={len(got):7d}  (rows-only; no oracle)  {time.time() - t0:.1f}s")
            continue
        try:
            want = con.execute(sql).df()
        except Exception as ex:  # noqa: BLE001
            fails.append((name, f"oracle error: {ex!r}"))
            print(f"{name:28s} ORACLE-ERROR {ex!r}")
            continue
        a, b = _norm(got.copy()), _norm(want.copy())
        cols_ok = list(a.columns) == list(b.columns)
        ha, hb = _vhash(a), _vhash(b)
        ok = len(a) == len(b) and cols_ok and ha == hb
        if not ok:
            fails.append(
                (name, f"rows {len(a)}/{len(b)} cols_ok={cols_ok} hash {ha}/{hb}")
            )
        print(
            f"{name:28s} rows={len(a):7d}/{len(b):7d} cols_ok={cols_ok} "
            f"hash_ok={ha == hb}  {time.time() - t0:.1f}s"
        )

    print(f"\n{len(queries)} queries, {len(oracles)} oracled, {len(fails)} failures")
    for name, why in fails:
        print(f"  FAIL {name}: {why}")
    ray.shutdown()
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
