"""Kill -9 resume probe: crash the crawl driver mid-run, resume, and
require byte-identical output lineage vs an uninterrupted run.

The north rule's checkpoint criterion, driven at the real surface: a
subprocess runs `tools/submit_crawl.py`, this script SIGKILLs it after
--kill-after seconds (no atexit, no cleanup — the honest crash), reruns
it with --resume, then compares the sha256 of the crawl_seq-sorted
crawled table (and the final fetched/seen/hosts summary) against a
fresh uninterrupted run of the same budget.

    python tools/kill_resume_probe.py --docs 200000 --hosts 2000 \
        --cpus 8 --kill-after 12 --max-rounds 4

Prints PROBE_OK / PROBE_MISMATCH as the last line; exit code follows.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import shutil
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def table_hash(crawl_out: str) -> str:
    """sha256 of the crawl_seq-sorted crawled table (all columns)."""
    import duckdb

    con = duckdb.connect()
    t = con.execute(
        f"select * from read_parquet('{crawl_out}/crawled/round-*/*.parquet', "
        "union_by_name=true) order by crawl_seq"
    ).arrow()
    h = hashlib.sha256()
    for col in sorted(t.column_names):
        h.update(col.encode())
        for chunk in t.column(col).chunks:
            h.update(str(chunk.to_pylist()).encode())
    return h.hexdigest()


def run_crawl(out: str, web: str, args, resume: bool, kill_after: float | None):
    cmd = [
        sys.executable,
        os.path.join(REPO, "tools", "submit_crawl.py"),
        "--web", web,
        "--out", out,
        "--max-rounds", str(args.max_rounds),
        "--max-urls", str(args.max_urls),
    ]
    if resume:
        cmd.append("--resume")
    # confine the whole child tree (driver + raylet + workers inherit the
    # mask) so the probe coexists with other work on the shared box; a
    # fresh session/process-group lets the SIGKILL take out the entire
    # Ray tree without touching OTHER Ray sessions on the box
    pre = lambda: os.sched_setaffinity(0, set(range(args.cpus)))
    proc = subprocess.Popen(
        cmd,
        env=dict(os.environ),
        stdout=subprocess.PIPE,
        text=True,
        preexec_fn=pre,
        start_new_session=True,
    )
    if kill_after is not None:
        time.sleep(kill_after)
        try:
            os.killpg(proc.pid, signal.SIGKILL)
        except ProcessLookupError:
            pass
        proc.wait()
        time.sleep(2)
        return None
    out_text, _ = proc.communicate(timeout=3600)
    line = [l for l in out_text.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    ap = argparse.ArgumentParser(description="kill -9 mid-crawl resume probe")
    ap.add_argument("--docs", type=int, default=200000)
    ap.add_argument("--hosts", type=int, default=2000)
    ap.add_argument("--seed", type=int, default=11)
    ap.add_argument("--seeds", type=int, default=None,
                    help="crawl seed URLs (default n_docs//4 — a frontier big "
                    "enough that the SIGKILL lands mid-crawl)")
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--kill-after", type=float, default=12.0)
    ap.add_argument("--max-rounds", type=int, default=4)
    ap.add_argument("--max-urls", type=int, default=10**9)
    args = ap.parse_args()

    from web_scraping_script_ray.synthweb import WebParams, fixture_dir

    web = fixture_dir(
        WebParams(
            n_docs=args.docs,
            n_hosts=args.hosts,
            seed=args.seed,
            n_seeds=args.seeds or max(8, args.docs // 4),
        )
    )

    killed_out = "/tmp/krp_killed"
    clean_out = "/tmp/krp_clean"
    for d in (killed_out, clean_out):
        shutil.rmtree(d, ignore_errors=True)

    print(f"[1/3] run + SIGKILL at {args.kill_after}s", flush=True)
    run_crawl(killed_out, web, args, resume=False, kill_after=args.kill_after)
    print("[2/3] resume killed run", flush=True)
    resumed = run_crawl(killed_out, web, args, resume=True, kill_after=None)
    print("[3/3] uninterrupted control run", flush=True)
    control = run_crawl(clean_out, web, args, resume=False, kill_after=None)

    h_resumed = table_hash(killed_out)
    h_control = table_hash(clean_out)
    keys = ("fetched", "seen", "hosts", "rounds")
    summary = {
        "resumed": {k: resumed.get(k) for k in keys},
        "control": {k: control.get(k) for k in keys},
        "hash_resumed": h_resumed,
        "hash_control": h_control,
    }
    print(json.dumps(summary), flush=True)
    ok = h_resumed == h_control and summary["resumed"] == summary["control"]
    print("PROBE_OK" if ok else "PROBE_MISMATCH")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
