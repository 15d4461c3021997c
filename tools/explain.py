"""EXPLAIN for registered queries: run one query and print its Ray Data
execution plan and per-operator stats — the observability surface for
"is this stage shuffling / materializing / starving?".

    python tools/explain.py <query_name> [sf_dir]
    python tools/explain.py --list

Prints: the logical→physical plan (from the dataset logger), then
``ds.stats()`` — per-operator wall time, blocks, rows, and exchange
sizes.  Owns its Ray session (like bench.py); the library itself never
calls ray.init.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--list"]
    list_only = "--list" in sys.argv[1:]

    from web_scraping_script_ray.pipelines.queries import EXTRA_QUERIES, QUERIES

    allq = {**QUERIES, **EXTRA_QUERIES}
    if list_only:
        if args:
            print(f"--list takes no positional arguments (got {args!r})",
                  file=sys.stderr)
            return 2
        for name in sorted(allq):
            print(name)
        return 0
    if not args:
        for name in sorted(allq):
            print(name)
        return 0
    if len(args) > 2:
        print(f"usage: explain.py <query> [sf_dir] (got extra args {args[2:]!r})",
              file=sys.stderr)
        return 2

    name = args[0]
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.001"
    if name not in allq:
        print(f"unknown query {name!r}; --list shows all", file=sys.stderr)
        return 2

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "8")),
            include_dashboard=False,
            logging_level="ERROR",
        )

    try:  # finally-shutdown: a raising query must not leak the session
        t0 = time.time()
        res = allq[name](sf_dir)
        if hasattr(res, "materialize"):
            mat = res.materialize()
            wall = time.time() - t0
            print(f"== {name} @ {sf_dir}: {mat.count()} rows in {wall:.2f}s ==")
            print(mat.stats())
        else:  # a few queries fold to a driver-side Arrow table
            wall = time.time() - t0
            n = len(res) if hasattr(res, "__len__") else res.num_rows
            print(f"== {name} @ {sf_dir}: {n} rows in {wall:.2f}s ==")
            print("(driver-side table result — constituent dataset stats were "
                  "consumed inside the query; rerun stages individually to "
                  "profile them)")
    finally:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
