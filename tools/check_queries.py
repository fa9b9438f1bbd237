"""Driver-style correctness harness: run every queries() entry and compare to
oracle_sql() through DuckDB (row count, column names, order-insensitive value
hash).  Usage: python tools/check_queries.py [sf_dir] [query ...]
(trailing args restrict the run to the named queries)."""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb
import numpy as np
import pandas as pd


def to_pandas(obj):
    import pyarrow as pa

    try:
        from ray.data import Dataset

        if isinstance(obj, Dataset):
            return obj.to_pandas()
    except ImportError:
        pass
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj


def value_hash(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1)
    rows = df.to_dict("records")
    canon = sorted(repr(sorted(r.items())) for r in rows)
    return hashlib.sha256("\n".join(canon).encode()).hexdigest()[:16]


def norm_df(df: pd.DataFrame) -> pd.DataFrame:
    out = df.copy()
    for c in out.columns:
        if out[c].dtype == np.uint64:
            out[c] = out[c].astype("int64", errors="ignore") if out[c].max() < 2**63 else out[c]
        if str(out[c].dtype).startswith("int") or str(out[c].dtype).startswith("uint"):
            out[c] = out[c].astype("int64")
        if str(out[c].dtype).startswith("float"):
            out[c] = out[c].astype("float64")
    return out


def main(sf_dir: str, only: list | None = None):
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, ".")
    import __ray_entry__ as e

    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        try:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        except duckdb.Error:
            pass

    qs = e.queries()
    oracles = e.oracle_sql()
    if only:
        unknown = [q for q in only if q not in qs]
        if unknown:
            print("unknown queries:", unknown)
            return 1
        qs = {k: v for k, v in qs.items() if k in only}
    failures = []
    for name, fn in qs.items():
        t0 = time.time()
        try:
            mine = norm_df(to_pandas(fn(sf_dir)))
        except Exception as ex:
            failures.append(name)
            print(f"[FAIL-run ] {name}: {type(ex).__name__}: {ex}")
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"[rows-only] {name}: {len(mine)} rows, {dt:.1f}s")
            continue
        try:
            oracle = norm_df(con.execute(oracles[name]).df())
        except Exception as ex:
            failures.append(name)
            print(f"[FAIL-sql ] {name}: {ex}")
            continue
        ok_rows = len(mine) == len(oracle)
        ok_cols = sorted(mine.columns) == sorted(oracle.columns)
        ok_vals = ok_rows and ok_cols and value_hash(mine) == value_hash(oracle)
        status = "OK" if (ok_rows and ok_cols and ok_vals) else "MISMATCH"
        if status != "OK":
            failures.append(name)
        print(
            f"[{status:9}] {name}: rows {len(mine)}/{len(oracle)} "
            f"cols={'=' if ok_cols else sorted(set(mine.columns) ^ set(oracle.columns))} "
            f"vals={'=' if ok_vals else '!'} {dt:.1f}s"
        )
        if status != "OK" and ok_cols and ok_rows:
            merged = mine.merge(oracle, on=[c for c in mine.columns if not str(mine[c].dtype).startswith("float")], how="outer", indicator=True, suffixes=("_m", "_o"))
            diff = merged[merged["_merge"] != "both"]
            print(diff.head(6).to_string())
    print("FAILURES:", failures or "none")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01", sys.argv[2:] or None))
