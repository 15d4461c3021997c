"""CLI for declarative YAML pipelines — the reference's `python cli.py
--config pipeline.yaml` surface (reference: src/cli.py:240-266,
src/pipeline.yaml) on the Ray engine.

    python tools/run_pipeline.py --spec my_pipeline.yaml \
        --web /tmp/synthweb/<fixture> --out /tmp/run1

Or smoke-test against a generated web:

    python tools/run_pipeline.py --spec my_pipeline.yaml \
        --synth-docs 2000 --synth-hosts 20 --out /tmp/run1

The script owns the Ray session (CLI entry points do; library code never
calls ``ray.init``).  The spec's ``post_processing.export`` settings
decide the output format/path inside ``--out``.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description="Run a declarative YAML pipeline")
    ap.add_argument("--spec", required=True, help="pipeline YAML (reference format)")
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--web", help="bucketed web-table directory")
    src.add_argument("--synth-docs", type=int, help="generate a synthetic web of N docs")
    ap.add_argument("--synth-hosts", type=int, default=None)
    ap.add_argument("--synth-seed", type=int, default=7)
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument(
        "--site-config",
        help="reference-format config.yaml whose sites: blocks (selectors/"
        "pagination/login/download) merge into the pipeline spec",
    )
    ap.add_argument("--num-cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "8")))
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    try:
        from web_scraping_script_ray.pipelines.spec import PipelineSpec, run_pipeline
        from web_scraping_script_ray.synthweb import WebParams, fixture_dir

        if args.synth_docs is not None:
            hosts = args.synth_hosts or max(1, args.synth_docs // 100)
            web = fixture_dir(
                WebParams(n_docs=args.synth_docs, n_hosts=hosts, seed=args.synth_seed)
            )
        else:
            web = args.web
        spec = PipelineSpec.from_yaml(args.spec)
        if args.site_config:
            merged = PipelineSpec.load_site_config(args.site_config)
            merged.update(spec.sites)  # pipeline-YAML blocks win
            spec.sites = merged
        t0 = time.time()
        ds = run_pipeline(spec, web, args.out, export_result=True)
        n = ds.count()
        print(
            json.dumps(
                {
                    "pipeline": spec.name,
                    "rows": n,
                    "export_format": spec.export_format,
                    "out": args.out,
                    "sec": round(time.time() - t0, 2),
                }
            )
        )
    finally:
        ray.shutdown()


if __name__ == "__main__":
    main()
