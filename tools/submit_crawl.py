"""``ray job submit`` entrypoint for the crawl engine (north_rule: "run
via ray job submit on a fixed-size multi-node Ray cluster").

On a real cluster::

    ray job submit --address http://head:8265 \
        --working-dir . -- python tools/submit_crawl.py \
        --web /data/web --out /data/crawl_out \
        --max-rounds 8 --max-urls 10000000 --resume

In this sandbox the same command line runs against the local node
(``RAY_ADDRESS=local`` is preset).  The script owns the Ray session (CLI
entry points do; library code never calls ``ray.init``).  ``--resume``
continues from the newest complete round manifest — kill the job at any
point and resubmit with ``--resume`` for identical output lineage
(``tests/test_resume.py`` is the kill-test).

``--synth-docs`` generates (or reuses, cached by params under
``/tmp/synthweb``) a synthetic web instead of ``--web`` — handy for
smoke-testing a cluster before pointing at real data.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description="Submit a crawl run")
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--web", help="bucketed web-table directory (params.json + buckets)")
    src.add_argument("--synth-docs", type=int, help="generate a synthetic web of N docs")
    ap.add_argument("--synth-hosts", type=int, default=None, help="hosts for --synth-docs")
    ap.add_argument("--synth-seed", type=int, default=7)
    ap.add_argument("--synth-seeds", type=int, default=None,
                    help="crawl seed URLs in the synthetic web (default keeps "
                    "WebParams' smoke-test-sized 8; pass n_docs//4 for real runs)")
    ap.add_argument("--synth-buckets", type=int, default=None)
    ap.add_argument("--synth-redirects", type=float, default=0.0,
                    help="share of docs behind a 3xx alias URL")
    ap.add_argument("--synth-sitemaps", type=float, default=0.0,
                    help="per-host sitemap.xml listing this doc share (joins seeds)")
    ap.add_argument("--synth-flaky", type=float, default=0.0,
                    help="share of docs failing their first 1..3 fetch attempts")
    ap.add_argument("--synth-epoch", type=int, default=0,
                    help="freshness epoch of the synthetic web (recrawl model)")
    ap.add_argument("--synth-change", type=float, default=0.0,
                    help="share of docs whose content changed this epoch")
    ap.add_argument("--synth-gone", type=float, default=0.0,
                    help="share of docs that 404 this epoch")
    ap.add_argument("--synth-children", type=float, default=0.0,
                    help="share of changed docs linking a brand-new child page")
    ap.add_argument("--refresh-from", default=None, metavar="PRIOR_OUT",
                    help="run a REFRESH crawl: revisit every URL of this "
                    "prior crawl output with conditional-GET semantics "
                    "(pipelines/refresh.py); prints the status-diff counts")
    ap.add_argument("--merge-corpus", default=None, metavar="DEST",
                    help="with --refresh-from: merge prior + refresh into a "
                    "refreshed corpus snapshot at DEST")
    ap.add_argument("--out", required=True, help="checkpoint/output directory")
    ap.add_argument("--max-rounds", type=int, default=4)
    ap.add_argument("--max-urls", type=int, default=10**9)
    ap.add_argument("--default-delay", type=float, default=1.0)
    ap.add_argument("--max-per-host", type=int, default=0,
                    help="cumulative page cap per host (crawler-trap guard); 0 = off")
    ap.add_argument("--max-retries", type=int, default=0,
                    help="fetch attempts per URL (tenacity-style); 0 = no retries")
    ap.add_argument("--retry-delay", type=float, default=5.0)
    ap.add_argument("--retry-mult", type=float, default=1.5)
    ap.add_argument("--priority", choices=["discovery", "popularity"],
                    default="discovery",
                    help="frontier order: reference BFS, or most-discovered-"
                    "first within each host's politeness run")
    ap.add_argument("--resume", action="store_true", help="continue from last manifest")
    ap.add_argument("--seen-shards", type=int, default=8)
    ap.add_argument("--politeness-shards", type=int, default=4)
    ap.add_argument("--fetch-concurrency", type=int, default=0, help="0 = CPUs//2")
    ap.add_argument("--fetch-batch-size", type=int, default=4096)
    ap.add_argument("--max-file-size", type=int, default=None, help="bytes; oversized docs fetch as ok=False")
    ap.add_argument("--no-parse", action="store_true", help="skip the span/token parse stage")
    ap.add_argument("--sink-compression", default=None,
                    help="parquet codec for the crawled/parsed sinks "
                    "(e.g. zstd — halves output footprint; default snappy)")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        # inside `ray job submit` the job server pre-sets RAY_ADDRESS to
        # the cluster; standalone it defaults to a local session
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
            **({"n_buckets": args.synth_buckets} if args.synth_buckets else {}),
            **({"n_seeds": args.synth_seeds} if args.synth_seeds else {}),
            p_redirect=args.synth_redirects,
            sitemap_frac=args.synth_sitemaps,
            p_flaky=args.synth_flaky,
            epoch=args.synth_epoch,
            p_change=args.synth_change,
            p_gone=args.synth_gone,
            child_frac=args.synth_children,
        )
        web_dir = fixture_dir(p, parallel=True)

    from web_scraping_script_ray.pipelines.crawl import CrawlEngine
    from web_scraping_script_ray.synthweb import Budget

    n_cpus = int(ray.cluster_resources().get("CPU", 8))
    refresh_kw = {}
    if args.refresh_from:
        import json as _json

        from web_scraping_script_ray.pipelines.refresh import (
            build_refresh_inputs,
            build_refresh_inputs_from_corpus,
        )

        with open(os.path.join(web_dir, "params.json")) as f:
            _nb = _json.load(f)["n_buckets"]
        _dest = os.path.join(args.out, "refresh_inputs")
        if os.path.isdir(os.path.join(args.refresh_from, "crawled")):
            refresh_kw = build_refresh_inputs(args.refresh_from, _dest, _nb)
        else:  # a materialized corpus snapshot (chained maintenance)
            refresh_kw = build_refresh_inputs_from_corpus(
                args.refresh_from, _dest, _nb
            )
    eng = CrawlEngine(
        web_dir,
        args.out,
        Budget(
            max_rounds=args.max_rounds,
            max_urls=args.max_urls,
            default_delay=args.default_delay,
            max_per_host=args.max_per_host,
            max_retries=args.max_retries,
            retry_delay=args.retry_delay,
            retry_mult=args.retry_mult,
            priority=args.priority,
        ),
        n_seen_shards=args.seen_shards,
        n_politeness_shards=args.politeness_shards,
        fetch_concurrency=args.fetch_concurrency or max(2, n_cpus // 2),
        fetch_batch_size=args.fetch_batch_size,
        parse=not args.no_parse,
        max_file_size=args.max_file_size,
        sink_compression=args.sink_compression,
        **refresh_kw,
    )
    t0 = time.time()
    info = eng.run(resume=args.resume)
    secs = time.time() - t0
    line = {
        "web_dir": web_dir,
        "out_dir": args.out,
        "resumed": bool(args.resume),
        "crawl_sec": round(secs, 2),
        "urls_per_sec": round(info["fetched"] / secs, 1) if secs else None,
        **info,
    }
    if args.refresh_from:
        from web_scraping_script_ray.pipelines.refresh import (
            classify_statuses,
            materialize_corpus,
        )

        st = classify_statuses(args.out, refresh_kw["etag_dir"])
        counts: dict[str, int] = {}
        for b in st.select_columns(["status"]).iter_batches(batch_format="pyarrow"):
            vc = b.column("status").value_counts()
            for item in vc.to_pylist():
                counts[item["values"]] = counts.get(item["values"], 0) + item["counts"]
        line["refresh_statuses"] = counts
        if args.merge_corpus:
            with open(os.path.join(web_dir, "params.json")) as f:
                _nb = json.load(f)["n_buckets"]
            line["corpus"] = materialize_corpus(
                args.refresh_from, args.out, args.merge_corpus, _nb
            )
    print(json.dumps(line))
    eng.shutdown()
    ray.shutdown()


if __name__ == "__main__":
    main()
