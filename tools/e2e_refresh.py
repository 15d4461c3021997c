"""End-to-end corpus MAINTENANCE cycle: crawl → train set → refresh →
incremental train update — the nightly job a 100-TB corpus runs.

One command over a synthetic web pair (epoch 0 and a mutated epoch):

1. budgeted crawl of the epoch-0 web (fused parse),
2. training-set build from the parsed output,
3. conditional-GET refresh against the mutated web (304s move no
   bodies; only changed pages' links expand),
4. status diff + merged corpus snapshot,
5. INCREMENTAL training-set rebuild — prior parsed rows carry for
   unchanged/stale pages, refresh parsed rows enter for changed/new,
   gone pages tombstone; the unchanged majority is never re-parsed.

    python tools/e2e_refresh.py --synth-docs 100000 --synth-hosts 1000 \
        --out /tmp/maint1 --max-rounds 6 --p-change 0.05 --p-gone 0.02
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description="crawl + refresh + incremental train")
    ap.add_argument("--synth-docs", type=int, required=True)
    ap.add_argument("--synth-hosts", type=int, default=None)
    ap.add_argument("--synth-seed", type=int, default=7)
    ap.add_argument("--synth-seeds", type=int, default=None)
    ap.add_argument("--synth-buckets", type=int, default=64)
    ap.add_argument("--p-change", type=float, default=0.05)
    ap.add_argument("--p-gone", type=float, default=0.02)
    ap.add_argument("--child-frac", type=float, default=0.5)
    ap.add_argument("--out", required=True, help="output root")
    ap.add_argument("--max-rounds", type=int, default=6)
    ap.add_argument("--max-urls", type=int, default=10**9)
    ap.add_argument("--min-quality", type=float, default=0.0)
    ap.add_argument("--shards", type=int, default=16)
    ap.add_argument("--seed-order", choices=["url", "change_first"], default="url")
    ap.add_argument("--skip-corpus", action="store_true",
                    help="skip the merged-snapshot materialization")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(
            address=os.environ.get("RAY_ADDRESS", "local"),
            include_dashboard=False,
            logging_level="ERROR",
        )

    from dataclasses import replace

    from web_scraping_script_ray.pipelines.crawl import run_crawl
    from web_scraping_script_ray.pipelines.refresh import (
        classify_statuses,
        materialize_corpus,
        refresh_crawl,
        refresh_training_set,
    )
    from web_scraping_script_ray.pipelines.train_data import build_training_set
    from web_scraping_script_ray.synthweb import Budget, WebParams, fixture_dir

    p1 = WebParams(
        n_docs=args.synth_docs,
        n_hosts=args.synth_hosts or max(5, args.synth_docs // 200),
        seed=args.synth_seed,
        n_buckets=args.synth_buckets,
        n_seeds=args.synth_seeds or max(8, args.synth_docs // 4),
    )
    p2 = replace(
        p1, epoch=1, p_change=args.p_change, p_gone=args.p_gone,
        child_frac=args.child_frac,
    )
    budget = Budget(max_rounds=args.max_rounds, max_urls=args.max_urls)
    w1 = fixture_dir(p1, parallel=True)
    w2 = fixture_dir(p2, parallel=True)

    line: dict = {"web1": w1, "web2": w2}
    out1 = os.path.join(args.out, "crawl1")
    out2 = os.path.join(args.out, "refresh")
    shutil.rmtree(args.out, ignore_errors=True)

    t0 = time.time()
    eng, info1 = run_crawl(w1, out1, budget)
    eng.shutdown()
    line["crawl"] = {"sec": round(time.time() - t0, 2), "fetched": info1["fetched"]}

    t0 = time.time()
    stats1 = build_training_set(
        out1, os.path.join(args.out, "train_v1"),
        min_quality=args.min_quality, n_shards=args.shards,
    )
    line["train_v1"] = {
        "sec": round(time.time() - t0, 2), "kept_rows": stats1["kept_rows"],
    }

    t0 = time.time()
    eng2, info2 = refresh_crawl(
        w2, out1, out2, budget, seed_order=args.seed_order
    )
    eng2.shutdown()
    line["refresh"] = {"sec": round(time.time() - t0, 2), "fetched": info2["fetched"]}
    etag_dir = info2["refresh_inputs"]["etag_dir"]

    st = classify_statuses(out2, etag_dir)
    counts: dict[str, int] = {}
    for b in st.select_columns(["status"]).iter_batches(batch_format="pyarrow"):
        for item in b.column("status").value_counts().to_pylist():
            counts[item["values"]] = counts.get(item["values"], 0) + item["counts"]
    line["statuses"] = counts

    if not args.skip_corpus:
        t0 = time.time()
        line["corpus"] = {
            **materialize_corpus(
                out1, out2, os.path.join(args.out, "corpus_v2"), p1.n_buckets
            ),
            "sec": round(time.time() - t0, 2),
        }

    # persisted near-dup signature index maintenance (round 5): epoch-1
    # build projects signatures off crawl1's parsed shards (nothing
    # re-signed), the epoch-2 update carries the unchanged majority
    # verbatim and admits only changed/new pages — fresh == changed+new
    # by construction, asserted in the output line
    from web_scraping_script_ray.pipelines.refresh import (
        _write_status_shards,
        build_neardup_index,
        update_neardup_index,
    )

    t0 = time.time()
    status_dir = os.path.join(args.out, "status_shards")
    _write_status_shards(st, status_dir, p1.n_buckets)
    idx1 = os.path.join(args.out, "neardup_idx_v1")
    idx2 = os.path.join(args.out, "neardup_idx_v2")
    b1 = build_neardup_index(out1, idx1, p1.n_buckets)
    u2 = update_neardup_index(idx1, out2, status_dir, idx2, p1.n_buckets)
    line["neardup_index"] = {
        "sec": round(time.time() - t0, 2),
        "v1_rows": b1["rows"],
        **u2,
        "fresh_equals_changed_plus_new": u2["fresh"]
        == counts.get("changed", 0) + counts.get("new", 0),
    }

    t0 = time.time()
    stats2 = refresh_training_set(
        out1, out2, etag_dir, os.path.join(args.out, "train_v2"),
        min_quality=args.min_quality, n_shards=args.shards,
    )
    line["train_v2"] = {
        "sec": round(time.time() - t0, 2), "kept_rows": stats2["kept_rows"],
    }
    print(json.dumps(line))
    ray.shutdown()


if __name__ == "__main__":
    main()
