"""End-to-end training-set build: crawl → filter → dedup → shards.

The composed LLM-data-pipeline product run (``ray job submit`` style,
like ``tools/submit_crawl.py``): one command takes a (synthetic or
bucketed-parquet) web, runs the budgeted crawl with fused parse, then
builds the hash-sharded training set from the parsed output with
``pipelines/train_data.build_training_set``.

Both halves are independently resumable: the crawl resumes from its
newest complete round manifest (pass ``--resume``), and the training
build is manifest-gated (a finished export returns its stamped stats
without recomputation).  Kill the job anywhere and resubmit — same
output lineage.

    python tools/e2e_train.py --synth-docs 10000000 \
        --out /tmp/e2e10m --max-rounds 3 --max-urls 7500000 \
        --min-quality 0.3 --langs en fr --shards 64 --resume
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description="crawl + training-set build")
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--web", help="bucketed web-table directory")
    src.add_argument("--synth-docs", type=int, help="generate a synthetic web of N docs")
    ap.add_argument("--synth-hosts", type=int, default=None)
    ap.add_argument("--synth-seed", type=int, default=7)
    ap.add_argument("--synth-seeds", type=int, default=None,
                    help="crawl seed URLs in the synthetic web (default n_docs//4)")
    ap.add_argument("--synth-buckets", type=int, default=64)
    ap.add_argument("--out", required=True, help="crawl checkpoint/output directory")
    ap.add_argument("--export", default=None, help="training-shard dir (default <out>/train)")
    ap.add_argument("--max-rounds", type=int, default=3)
    ap.add_argument("--max-urls", type=int, default=10**9)
    ap.add_argument("--default-delay", type=float, default=1.0)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--min-quality", type=float, default=0.0)
    ap.add_argument("--langs", nargs="*", default=None)
    ap.add_argument("--shards", type=int, default=64)
    ap.add_argument("--shuffle-seed", type=int, default=None,
                    help="seeded within-shard shuffle (byte-deterministic export)")
    ap.add_argument("--pack-capacity", type=int, default=None,
                    help="also emit the (doc, pack) context-window map at this "
                         "token capacity (<export>/packs/)")
    ap.add_argument("--seen-shards", type=int, default=8)
    ap.add_argument("--politeness-shards", type=int, default=4)
    ap.add_argument("--fetch-batch-size", type=int, default=4096)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(
            address=os.environ.get("RAY_ADDRESS", "local"),
            include_dashboard=False,
            logging_level="ERROR",
        )

    web_dir = args.web
    if web_dir is None:
        from web_scraping_script_ray.synthweb import WebParams, fixture_dir

        p = WebParams(
            n_docs=args.synth_docs,
            n_hosts=args.synth_hosts or max(5, args.synth_docs // 200),
            seed=args.synth_seed,
            n_buckets=args.synth_buckets,
            n_seeds=args.synth_seeds or max(8, args.synth_docs // 4),
        )
        t0 = time.time()
        web_dir = fixture_dir(p, parallel=True)
        print(json.dumps({"stage": "web", "dir": web_dir, "sec": round(time.time() - t0, 1)}), flush=True)

    from web_scraping_script_ray.pipelines.crawl import CrawlEngine
    from web_scraping_script_ray.pipelines.train_data import build_training_set
    from web_scraping_script_ray.synthweb import Budget

    n_cpus = int(ray.cluster_resources().get("CPU", 8))
    eng = CrawlEngine(
        web_dir,
        args.out,
        Budget(
            max_rounds=args.max_rounds,
            max_urls=args.max_urls,
            default_delay=args.default_delay,
        ),
        n_seen_shards=args.seen_shards,
        n_politeness_shards=args.politeness_shards,
        fetch_concurrency=max(2, n_cpus // 2),
        fetch_batch_size=args.fetch_batch_size,
        parse=True,
    )
    t0 = time.time()
    info = eng.run(resume=args.resume)
    crawl_s = time.time() - t0
    print(
        json.dumps(
            {
                "stage": "crawl",
                "crawl_sec": round(crawl_s, 2),
                "urls_per_sec": round(info["fetched"] / crawl_s, 1) if crawl_s else None,
                **info,
            }
        ),
        flush=True,
    )
    eng.shutdown()

    t0 = time.time()
    stats = build_training_set(
        args.out,
        args.export or os.path.join(args.out, "train"),
        min_quality=args.min_quality,
        langs=args.langs,
        n_shards=args.shards,
        resume=args.resume,
        shuffle_seed=args.shuffle_seed,
    )
    train_s = time.time() - t0
    out = {"stage": "train", "train_sec": round(train_s, 2)}
    out.update({k: v for k, v in stats.items() if k != "manifest"})
    man = stats.get("manifest")
    if isinstance(man, dict):
        out["shards_written"] = len(man.get("shard_rows", man.get("counts", {})) or {})
    print(json.dumps(out), flush=True)

    if args.pack_capacity:
        from web_scraping_script_ray.pipelines.train_data import pack_training_set

        t0 = time.time()
        pstats = pack_training_set(
            args.export or os.path.join(args.out, "train"),
            capacity=args.pack_capacity,
            resume=args.resume,
        )
        print(
            json.dumps(
                {"stage": "pack", "pack_sec": round(time.time() - t0, 2), **pstats}
            ),
            flush=True,
        )
    ray.shutdown()


if __name__ == "__main__":
    main()
