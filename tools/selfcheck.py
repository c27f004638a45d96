"""Simulate the driver's correctness gate: run every queries() entry at
sf0.01 and compare to oracle_sql() via DuckDB (row count + schema +
order-insensitive value hash). Usage: python tools/selfcheck.py [names...]
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb
import pandas as pd
import pyarrow as pa

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def to_pandas(res):
    if isinstance(res, pa.Table):
        return res.to_pandas()
    if isinstance(res, pd.DataFrame):
        return res
    return res.to_pandas()  # ray Dataset


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    rows = df.astype(str).values.tolist()
    rows.sort()
    h = hashlib.md5()
    for r in rows:
        h.update(("\x1f".join(r) + "\x1e").encode())
    return h.hexdigest()


def main():
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF_DIR}/{t}.parquet')")

    names = sys.argv[1:] or list(qs)
    failures = []
    for name in names:
        fn = qs[name]
        t0 = time.time()
        try:
            ours = to_pandas(fn(SF_DIR))
        except Exception as e:
            print(f"{name}: RAY ERROR {type(e).__name__}: {e}")
            failures.append(name)
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"{name}: rows-only ({len(ours)} rows, {dt:.1f}s) cols={list(ours.columns)}")
            continue
        try:
            theirs = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"{name}: SQL ERROR {type(e).__name__}: {e}")
            failures.append(name)
            continue
        ok_rows = len(ours) == len(theirs)
        ok_cols = sorted(ours.columns) == sorted(theirs.columns)
        ok_hash = ok_rows and ok_cols and value_hash(ours) == value_hash(theirs)
        status = "OK" if (ok_rows and ok_cols and ok_hash) else "MISMATCH"
        print(f"{name}: {status} rows={len(ours)}/{len(theirs)} "
              f"cols_ok={ok_cols} hash_ok={ok_hash} ({dt:.1f}s)")
        if status != "OK":
            failures.append(name)
            if not ok_cols:
                print("  ours:", sorted(ours.columns))
                print("  theirs:", sorted(theirs.columns))
            elif ok_rows:
                a = ours[sorted(ours.columns)].astype(str)
                b = theirs[sorted(theirs.columns)].astype(str)
                sa = set(map(tuple, a.values.tolist()))
                sb = set(map(tuple, b.values.tolist()))
                only_a = list(sa - sb)[:3]
                only_b = list(sb - sa)[:3]
                print("  only_ours:", only_a)
                print("  only_oracle:", only_b)
    print("FAILURES:", failures if failures else "none")
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
