"""Sitemap ingestion: each host's /sitemap.xml is a real page in the web
table whose spans link every k-th doc of the host, and it joins the seed
list — bulk-feeding the frontier in round 0 with zero engine
special-casing (a sitemap is just a page with many links, which is
exactly what it is on the real web).
"""

import numpy as np
import pytest

from web_scraping_script_ray.oracle import run_oracle
from web_scraping_script_ray.synthweb import (
    Budget,
    WebParams,
    fixture_dir,
    gen_chunk,
    host_starts,
    make_seeds,
    sitemap_doc_idx,
    sitemap_url,
)

P = WebParams(n_docs=1500, n_hosts=6, seed=13, sitemap_frac=0.2, n_seeds=2)


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    yield


def test_sitemap_rows_and_seeds():
    starts = host_starts(P)
    t = gen_chunk(0, P, starts)
    by_url = dict(zip(t.column("doc_id").to_pylist(), t.column("spans").to_pylist()))
    for h in range(P.n_hosts):
        sm = by_url[sitemap_url(h)]
        listed = sitemap_doc_idx(h, P, starts)
        assert len(sm) == len(listed) > 0
        assert all(s["kind"] == "link" for s in sm)
        # every k-th doc of the host's contiguous range, in order
        assert [int(s["media_ref"].rsplit("/", 1)[1]) for s in sm] == listed.tolist()
    seeds = make_seeds(P, starts).column("url").to_pylist()
    for h in range(P.n_hosts):
        assert sitemap_url(h) in seeds


def test_sitemap_frac_zero_is_byte_identical():
    base = WebParams(n_docs=1000, n_hosts=20, seed=42)
    withf = WebParams(n_docs=1000, n_hosts=20, seed=42, sitemap_frac=0.0)
    starts = host_starts(base)
    assert gen_chunk(0, base, starts).equals(gen_chunk(0, withf, starts))
    assert make_seeds(base, starts).equals(make_seeds(withf, starts))


def test_crawl_parity_and_coverage_boost(tmp_path_factory):
    from web_scraping_script_ray.pipelines.crawl import run_crawl

    budget = Budget(max_rounds=3)
    web = fixture_dir(P)
    out = str(tmp_path_factory.mktemp("crawl_sitemap"))
    eng, info = run_crawl(web, out, budget)
    try:
        exp = run_oracle(web, budget).crawled_table().to_pandas()
        got = (
            eng.crawled_dataset()
            .to_pandas()
            .sort_values("crawl_seq")
            .reset_index(drop=True)
        )
        assert len(got) == len(exp) == info["fetched"]
        for col in ["url", "crawl_seq", "fetch_time", "ok"]:
            assert (got[col].values == exp[col].values).all(), col
        # all 6 sitemaps fetched in round 0 (they are seeds)
        r0 = got[got["round"] == 0]
        assert sum(u.endswith("/sitemap.xml") for u in r0["url"]) == P.n_hosts
    finally:
        eng.shutdown()

    # the same web WITHOUT sitemaps reaches far fewer docs from 2 seeds
    base = WebParams(n_docs=1500, n_hosts=6, seed=13, n_seeds=2)
    web0 = fixture_dir(base)
    out0 = str(tmp_path_factory.mktemp("crawl_nositemap"))
    eng0, info0 = run_crawl(web0, out0, budget)
    try:
        assert info["fetched"] > 2 * info0["fetched"]
    finally:
        eng0.shutdown()
