"""Local stand-in for the driver's correctness gate: run every queries()
entry and its oracle_sql() twin at a given sf_dir, compare row count,
column names and an order-insensitive value hash.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
       python tools/check_correctness.py <sf_dir> --extras --json EXTRAS_r4.json

``--json PATH`` additionally writes a machine-readable artifact:
one record per query with pass/fail, the individual check bits, row
counts and runtime — the driver-visible evidence for the 137 extra
queries the per-round gate doesn't score.
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    rows = []
    for _, row in df.iterrows():
        parts = []
        for v in row:
            if isinstance(v, float) or isinstance(v, np.floating):
                parts.append(repr(float(v)))
            elif isinstance(v, (pd.Timestamp, np.datetime64)):
                parts.append(str(pd.Timestamp(v)))
            else:
                parts.append(str(v))
        rows.append("\x1f".join(parts))
    rows.sort()
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


def main():
    argv = [a for a in sys.argv[1:] if a != "--extras"]
    extras = "--extras" in sys.argv
    json_path = None
    if "--json" in argv:
        i = argv.index("--json")
        json_path = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as E

    qs, oracles = E.queries(), E.oracle_sql()
    if extras:
        from web_scraping_script_ray.pipelines.queries import (
            EXTRA_ORACLE_SQL,
            EXTRA_QUERIES,
        )

        qs.update(EXTRA_QUERIES)
        oracles.update(EXTRA_ORACLE_SQL)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    unknown = only - set(qs)
    if unknown:
        # a typo'd (or extras-only, without --extras) name must not pass
        # vacuously as "all good"
        print(f"FAIL  unknown query names: {sorted(unknown)} (forgot --extras?)")
        sys.exit(2)

    failures = []
    records = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            mine = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"FAIL  {name}: query raised {type(e).__name__}: {e}")
            failures.append(name)
            records.append(
                {"query": name, "status": "error",
                 "err": f"{type(e).__name__}: {e}", "sec": round(time.time() - t0, 2)}
            )
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok*   {name}: rows={len(mine)} cols={sorted(mine.columns)} ({dt:.1f}s, rows-only)")
            records.append(
                {"query": name, "status": "rows_only", "rows": len(mine),
                 "sec": round(dt, 2)}
            )
            continue
        gold = con.sql(oracles[name]).df()
        problems = []
        if sorted(mine.columns) != sorted(gold.columns):
            problems.append(f"cols {sorted(mine.columns)} != {sorted(gold.columns)}")
        if len(mine) != len(gold):
            problems.append(f"rows {len(mine)} != {len(gold)}")
        if not problems:
            h1, h2 = value_hash(mine), value_hash(gold)
            if h1 != h2:
                problems.append("value-hash mismatch")
                merged = mine[sorted(mine.columns)].round(6)
                gm = gold[sorted(gold.columns)].round(6)
                a = merged.sort_values(list(merged.columns)).reset_index(drop=True)
                b = gm.sort_values(list(gm.columns)).reset_index(drop=True)
                neq = (a != b) & ~(a.isna() & b.isna())
                bad = neq.any(axis=1)
                print(a[bad].head(3))
                print(b[bad].head(3))
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)} ({dt:.1f}s)")
            failures.append(name)
        else:
            print(f"ok    {name}: rows={len(mine)} ({dt:.1f}s)")
        records.append(
            {
                "query": name,
                "status": "fail" if problems else "pass",
                "rows": len(mine),
                "oracle_rows": len(gold),
                "rows_match": len(mine) == len(gold),
                "schema_match": sorted(mine.columns) == sorted(gold.columns),
                "hash_match": not problems,
                "problems": problems,
                "sec": round(dt, 2),
            }
        )
    ray.shutdown()
    if json_path:
        import json

        with open(json_path, "w") as f:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "extras": extras,
                    "n_queries": len(records),
                    "n_pass": sum(r["status"] == "pass" for r in records),
                    "n_rows_only": sum(r["status"] == "rows_only" for r in records),
                    "n_fail": len(failures),
                    "failures": failures,
                    "queries": records,
                },
                f,
                indent=1,
            )
        print(f"wrote {json_path} ({len(records)} records)")
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all good")


if __name__ == "__main__":
    main()
