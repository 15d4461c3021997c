"""Randomized crawl↔oracle parity soak (``python tools/parity_soak.py [N]``): N seeded random configs across
the full feature space (skew, redirects, flaky, sitemaps, retries,
priority modes, per-host caps, budgets).  Compares full crawled-table
column equality (incl. span sequences) and the URL-seen set."""
import random
import shutil
import sys
import time

import numpy as np
import ray

ray.init(address="local", num_cpus=16, include_dashboard=False,
         logging_level="ERROR")

import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from web_scraping_script_ray.oracle import run_oracle
from web_scraping_script_ray.pipelines.crawl import run_crawl
from web_scraping_script_ray.synthweb import Budget, WebParams, fixture_dir

N = int(sys.argv[1]) if len(sys.argv) > 1 else 30
rng = random.Random(20260820)
fails = []
for i in range(N):
    p = WebParams(
        n_docs=rng.choice([200, 400, 700, 1200, 2000]),
        n_hosts=rng.choice([2, 5, 12, 30, 60]),
        seed=rng.randrange(1_000_000),
        n_buckets=rng.choice([4, 8, 16]),
        hot_frac=rng.choice([0.05, 0.22, 0.5, 0.7]),
        zipf_s=rng.choice([1.05, 1.1, 1.4]),
        max_links=rng.choice([2, 5, 10, 16]),
        p_cross_host=rng.choice([0.0, 0.05, 0.3]),
        p_dangling=rng.choice([0.0, 0.05]),
        p_private=rng.choice([0.0, 0.1]),
        n_seeds=rng.choice([4, 8, 20]),
        p_redirect=rng.choice([0.0, 0.0, 0.2]),
        sitemap_frac=rng.choice([0.0, 0.0, 0.15]),
        p_flaky=rng.choice([0.0, 0.0, 0.15]),
    )
    budget = Budget(
        max_rounds=rng.choice([2, 3, 5]),
        max_urls=rng.choice([0, 0, 120, 500]) or 10**9,
        default_delay=rng.choice([0.5, 1.0, 3.0]),
        max_per_host=rng.choice([0, 0, 25]),
        max_retries=rng.choice([0, 0, 2]) if p.p_flaky else 0,
        priority=rng.choice(["discovery", "discovery", "popularity"]),
    )
    t0 = time.time()
    web = fixture_dir(p)
    out = f"/tmp/parity_soak_out/{i}"
    shutil.rmtree(out, ignore_errors=True)
    eng, info = run_crawl(web, out, budget)
    try:
        oracle = run_oracle(web, budget)
        got = (
            eng.crawled_dataset().to_pandas()
            .sort_values("crawl_seq").reset_index(drop=True)
        )
        exp = oracle.crawled_table().to_pandas()
        ok = len(got) == len(exp) == info["fetched"]
        detail = "" if ok else f"rows {len(got)} vs {len(exp)}"
        if ok:
            for col in exp.columns:
                if col == "spans":
                    a = [tuple(map(tuple, (map(dict.values, s)))) for s in got[col]]
                    b = [tuple(map(tuple, (map(dict.values, s)))) for s in exp[col]]
                    same = a == b
                else:
                    same = (got[col].values == exp[col].values).all()
                if not same:
                    ok = False
                    detail = f"col {col}"
                    break
        if ok:
            eng_seen = set()
            for _, exact in eng.seen.dump():
                eng_seen.update(np.asarray(exact, dtype=np.uint64).tolist())
            if eng_seen != set(oracle.seen):
                ok = False
                detail = "seen set"
        status = "OK " if ok else "FAIL"
        print(
            f"[{i:02d}] {status} docs={p.n_docs} hosts={p.n_hosts} "
            f"seed={p.seed} rd={p.p_redirect} fk={p.p_flaky} "
            f"sm={p.sitemap_frac} pr={budget.priority} cap={budget.max_per_host} "
            f"rt={budget.max_retries} fetched={info['fetched']} "
            f"({time.time()-t0:.1f}s) {detail}",
            flush=True,
        )
        if not ok:
            fails.append((i, p, budget, detail))
    finally:
        eng.shutdown()
        shutil.rmtree(out, ignore_errors=True)

# ---- randomized REFRESH parity: epoch-0 crawl -> conditional-GET
# recrawl of a mutated epoch-1 web, engine vs sequential refresh oracle
from dataclasses import replace as _replace

from web_scraping_script_ray.functions.hashing import span_content_hash_py
from web_scraping_script_ray.pipelines.refresh import refresh_crawl

NR = max(4, N // 4)
for i in range(NR):
    p1 = WebParams(
        n_docs=rng.choice([300, 600, 1200]),
        n_hosts=rng.choice([5, 15, 40]),
        seed=rng.randrange(1_000_000),
        n_buckets=rng.choice([8, 16]),
        hot_frac=rng.choice([0.1, 0.3]),
        n_seeds=rng.choice([4, 8]),
    )
    p2 = _replace(
        p1,
        epoch=1,
        p_change=rng.choice([0.05, 0.15, 0.4]),
        p_gone=rng.choice([0.0, 0.05, 0.15]),
        child_frac=rng.choice([0.0, 0.5, 1.0]),
    )
    budget = Budget(max_rounds=rng.choice([3, 5]), max_urls=10**9)
    t0 = time.time()
    w1, w2 = fixture_dir(p1), fixture_dir(p2)
    prior_out = f"/tmp/parity_soak_out/r{i}-prior"
    out = f"/tmp/parity_soak_out/r{i}"
    for d in (prior_out, out):
        shutil.rmtree(d, ignore_errors=True)
    eng1, _ = run_crawl(w1, prior_out, budget)
    eng1.shutdown()
    o1 = run_oracle(w1, budget)
    eng, info = refresh_crawl(w2, prior_out, out, budget)
    try:
        got = (
            eng.crawled_dataset().to_pandas()
            .sort_values("crawl_seq").reset_index(drop=True)
        )
        seeds = [dict(url=c["url"], seed_rank=c["crawl_seq"]) for c in o1.crawled]
        etags = {
            c["url_hash"]: span_content_hash_py(c["spans"])
            for c in o1.crawled
            if c["ok"] and c["spans"]
        }
        exp = run_oracle(w2, budget, seeds=seeds, etags=etags).crawled_table().to_pandas()
        ok = len(got) == len(exp) == info["fetched"]
        detail = "" if ok else f"rows {len(got)} vs {len(exp)}"
        if ok:
            for col in exp.columns:
                if col == "spans":
                    a = [[(x["kind"], x["text"], x["media_ref"]) for x in s] for s in got[col]]
                    b = [[(x["kind"], x["text"], x["media_ref"]) for x in s] for s in exp[col]]
                    same = a == b
                else:
                    same = (got[col].values == exp[col].values).all()
                if not same:
                    ok = False
                    detail = f"col {col}"
                    break
        status = "OK " if ok else "FAIL"
        print(
            f"[R{i:02d}] {status} docs={p1.n_docs} hosts={p1.n_hosts} "
            f"seed={p1.seed} ch={p2.p_change} go={p2.p_gone} kid={p2.child_frac} "
            f"fetched={info['fetched']} n304={int(got['not_modified'].sum())} "
            f"({time.time()-t0:.1f}s) {detail}",
            flush=True,
        )
        if not ok:
            fails.append((f"refresh-{i}", p1, p2, detail))
    finally:
        eng.shutdown()
        for d in (prior_out, out):
            shutil.rmtree(d, ignore_errors=True)

print(f"\n{N + NR - len(fails)}/{N + NR} parity OK; failures: {len(fails)}")
for f in fails:
    print("FAIL:", f)
ray.shutdown()
sys.exit(1 if fails else 0)
