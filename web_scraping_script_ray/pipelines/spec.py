"""Declarative pipeline spec → Ray Data plan (SURVEY.md §2.10, §3.1).

Mirrors the reference's pipeline YAML surface (reference:
src/pipeline.yaml:1-70, consumed by src/main.py:44-133): seed ``urls``,
``scraper_mode``, ``extract_*`` flags, ``post_processing.operations``
and ``post_processing.export``.  Execution is the reference's §3.1 trace
re-expressed on the engine:

- the seed loop (src/main.py:79) becomes a ONE-round crawl — the
  reference extracts links but never enqueues them (src/main.py:107-108),
  so pipeline mode never recurses;
- "scrape" = the fetch stage's lookup join against the synthetic web;
- per-flag extraction = vectorized span projections (stages.spans);
- post_processing ops compile via pipelines.postprocess.apply_ops with
  ``crawl_seq`` as the first-wins order column (A3 semantics);
- export = parquet/csv/json writers (K5).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..stages.spans import project_text, span_kind_counts
from ..synthweb import Budget
from .postprocess import apply_ops, export


@dataclass
class PipelineSpec:
    name: str = "pipeline"
    urls: list[str] = field(default_factory=list)
    scraper_mode: str = "simple"
    extract_text: bool = True
    extract_links: bool = False
    extract_images: bool = False
    extract_metadata: bool = False
    operations: list[dict] = field(default_factory=list)
    export_format: str = "parquet"
    export_path: str = "processed_data"
    # reference config.yaml `sites:` blocks (src/config.yaml:111-157):
    # base_url / scraping_mode / selectors / pagination / login / download.
    # Selectors+login+download parse and carry (the reference declares but
    # never consumes pagination/login in code); pagination IS consumed
    # here: bounded next-link chains per seed in pipeline mode.
    sites: dict = field(default_factory=dict)

    @staticmethod
    def from_yaml(path: str) -> "PipelineSpec":
        import yaml

        with open(path) as f:
            raw = yaml.safe_load(f) or {}
        post = raw.get("post_processing") or {}
        exp = post.get("export") or {}
        return PipelineSpec(
            name=raw.get("name", "pipeline"),
            urls=list(raw.get("urls") or []),
            scraper_mode=raw.get("scraper_mode", "simple"),
            extract_text=bool(raw.get("extract_text", True)),
            extract_links=bool(raw.get("extract_links", False)),
            extract_images=bool(raw.get("extract_images", False)),
            extract_metadata=bool(raw.get("extract_metadata", False)),
            operations=list(post.get("operations") or []),
            export_format=exp.get("format", "parquet"),
            export_path=exp.get("path", "processed_data"),
            sites=dict(raw.get("sites") or {}),
        )

    @staticmethod
    def load_site_config(path: str) -> dict:
        """Parse a reference-format ``config.yaml``'s ``sites:`` section
        (selectors / pagination / login / download blocks all accepted)
        so reference config files drop in verbatim."""
        import yaml

        with open(path) as f:
            raw = yaml.safe_load(f) or {}
        return dict(raw.get("sites") or {})


def _project_flags(spec: PipelineSpec):
    def project(batch: pa.Table) -> pa.Table:
        cols = {
            "url": batch.column("url"),
            "crawl_seq": batch.column("crawl_seq"),
            "ok": batch.column("ok"),
            # single timestamp column everywhere (SURVEY.md §1.2): the
            # deterministic virtual fetch time, not 3 wall-clock formats
            "timestamp": batch.column("fetch_time"),
        }
        out = pa.Table.from_arrays(list(cols.values()), names=list(cols.keys()))
        if spec.extract_text:
            text = project_text(batch, id_col="url")
            out = out.append_column("text", text.column("text"))
        if spec.extract_links or spec.extract_images:
            counts = span_kind_counts(batch, id_col="url")
            if spec.extract_links:
                out = out.append_column("n_links", counts.column("n_link"))
            if spec.extract_images:
                out = out.append_column("n_images", counts.column("n_image"))
        if spec.extract_metadata:
            # spans carry no meta map in the synthetic web; expose the
            # per-doc span count as the metadata surface
            lens = pc.list_value_length(batch.column("spans")).cast(pa.int64())
            out = out.append_column("n_spans", lens)
        # pagination rows carry their chain position; crawl rows are page 0
        if "page_index" in batch.schema.names:
            out = out.append_column("page_index", batch.column("page_index"))
        else:
            out = out.append_column(
                "page_index", pa.array(np.zeros(batch.num_rows, np.int64), pa.int64())
            )
        return out

    return project


def _pagination_rules(spec: PipelineSpec) -> list[tuple[str, int]]:
    """(host-prefix, max_pages) for every site with pagination enabled."""
    rules = []
    for site in spec.sites.values():
        pag = (site or {}).get("pagination") or {}
        if pag.get("enabled") and site.get("base_url"):
            rules.append((str(site["base_url"]), int(pag.get("max_pages", 5))))
    return rules


def _paginate_task(
    web_dir: str, n_buckets: int, chains: list, span_type
) -> pa.Table:
    """Follow each seed's next-link chain (the synthetic web's stand-in
    for the reference's ``pagination.selector``: the page's FIRST
    same-host link span in document order) for up to ``max_pages - 1``
    extra pages.  One bounded task: pipeline seeds x max_pages lookups
    against the bucketed web — never a crawl round, exactly the
    reference's per-seed pagination loop shape."""
    from urllib.parse import urlparse

    import numpy as np

    from ..stages.fetch import WebFetcher
    from ..urlnorm import url_hash64

    f = WebFetcher(web_dir, n_buckets)

    def get_spans(u: str):
        return f.lookup([u], np.array([url_hash64(u)], np.uint64)).get(u)

    urls: list[str] = []
    seqs: list[int] = []
    oks: list[bool] = []
    times: list[float] = []
    pages: list[int] = []
    spans_out: list[list] = []
    for ci, (seed, max_pages) in enumerate(chains):
        host = urlparse(seed).netloc
        cur_spans = get_spans(seed)
        visited = {seed}  # prev/next cycles must not loop the chain
        for page in range(1, max_pages):
            nxt = None
            for s in sorted(cur_spans or [], key=lambda s: s["offset"]):
                if (
                    s["kind"] == "link"
                    and urlparse(s["media_ref"]).netloc == host
                    and s["media_ref"] not in visited
                ):
                    nxt = s["media_ref"]
                    break
            if nxt is None:
                break
            visited.add(nxt)
            nspans = get_spans(nxt)
            urls.append(nxt)
            # deterministic, collision-free sequence region above any
            # one-round crawl_seq: chains are pipeline-seed-indexed
            seqs.append(1_000_000_000 + ci * 10_000 + page)
            oks.append(nspans is not None)
            times.append(float(page))
            pages.append(page)
            spans_out.append(nspans or [])
            if nspans is None:
                break
            cur_spans = nspans
    return pa.Table.from_arrays(
        [
            pa.array(urls, pa.string()),
            pa.array(seqs, pa.int64()),
            pa.array(oks, pa.bool_()),
            pa.array(times, pa.float64()),
            pa.array(pages, pa.int64()),
            pa.array(spans_out, span_type),
        ],
        names=["url", "crawl_seq", "ok", "fetch_time", "page_index", "spans"],
    )


def run_pipeline(
    spec: PipelineSpec, web_dir: str, out_dir: str, export_result: bool = True
):
    """Execute the spec against a synthetic-web dir; returns the final
    Dataset (and writes the export when ``export_result``)."""
    import pyarrow.parquet as pq

    from ..schemas import SEEDS_SCHEMA
    from .crawl import run_crawl

    os.makedirs(out_dir, exist_ok=True)
    seeds_path = os.path.join(out_dir, "seeds.parquet")
    pq.write_table(
        pa.Table.from_arrays(
            [
                pa.array(spec.urls, pa.string()),
                pa.array(range(len(spec.urls)), pa.int64()),
            ],
            schema=SEEDS_SCHEMA,
        ),
        seeds_path,
    )
    # pipeline mode = one round (the reference never enqueues links)
    import shutil

    crawl_web = os.path.join(out_dir, "web_view")
    shutil.rmtree(crawl_web, ignore_errors=True)
    os.makedirs(crawl_web)
    # reuse the web tables; only the seed list is spec-specific
    for name in ("robots.parquet", "params.json"):
        os.symlink(os.path.join(web_dir, name), os.path.join(crawl_web, name))
    os.symlink(os.path.join(web_dir, "web"), os.path.join(crawl_web, "web"))
    os.replace(seeds_path, os.path.join(crawl_web, "seeds.parquet"))

    eng, _ = run_crawl(
        crawl_web, os.path.join(out_dir, "crawl"), Budget(max_rounds=1)
    )
    try:
        ds = eng.crawled_dataset()
        ds = ds.map_batches(_project_flags(spec), batch_format="pyarrow")
        rules = _pagination_rules(spec)
        if rules:
            import json

            import ray
            import ray.data as rd

            from ..schemas import WEB_SCHEMA

            with open(os.path.join(web_dir, "params.json")) as fh:
                n_buckets = int(json.load(fh)["n_buckets"])
            chains = []
            for u in spec.urls:
                for prefix, max_pages in rules:  # first matching rule wins
                    if u.startswith(prefix):
                        chains.append((u, max_pages))
                        break
            if chains:
                pag_ref = ray.remote(_paginate_task).remote(
                    web_dir, n_buckets, chains, WEB_SCHEMA.field("spans").type
                )
                pag_ds = rd.from_arrow_refs([pag_ref]).map_batches(
                    _project_flags(spec), batch_format="pyarrow"
                )
                ds = ds.union(pag_ds)
        ds = apply_ops(ds, spec.operations, order_col="crawl_seq")
        if export_result:
            export(ds, os.path.join(out_dir, spec.export_path), spec.export_format)
        return ds.materialize()
    finally:
        eng.shutdown()
