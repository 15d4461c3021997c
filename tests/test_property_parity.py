"""Property-based engine ↔ oracle equivalence (SURVEY.md §5.2.6):
randomized small webs (varying skew, size, seeds) must produce identical
crawl order and seen sets.  Uses seeded param draws rather than
hypothesis-driven generation because each example spins real Ray work —
a handful of diverse webs beats hundreds of near-identical tiny ones."""

import numpy as np
import pytest

from web_scraping_script_ray.oracle import run_oracle
from web_scraping_script_ray.synthweb import Budget, WebParams, fixture_dir

CASES = [
    # (n_docs, n_hosts, seed, hot_frac, max_links, budget)
    (300, 5, 101, 0.5, 6, Budget(max_rounds=3)),          # extreme hot host
    (800, 40, 202, 0.1, 3, Budget(max_rounds=4)),         # sparse links
    (500, 10, 303, 0.22, 10, Budget(max_rounds=2, max_urls=77)),  # budget cut
    (200, 2, 404, 0.6, 8, Budget(max_rounds=5, default_delay=3.0)),  # 2 hosts
]


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    yield


@pytest.mark.parametrize("n_docs,n_hosts,seed,hot,links,budget", CASES)
def test_random_web_parity(n_docs, n_hosts, seed, hot, links, budget, tmp_path_factory):
    from web_scraping_script_ray.pipelines.crawl import run_crawl

    p = WebParams(
        n_docs=n_docs, n_hosts=n_hosts, seed=seed, hot_frac=hot, max_links=links,
        n_buckets=8,
    )
    web = fixture_dir(p)
    out = str(tmp_path_factory.mktemp(f"prop{seed}"))
    eng, info = run_crawl(web, out, budget)
    try:
        oracle = run_oracle(web, budget)
        got = eng.crawled_dataset().to_pandas().sort_values("crawl_seq").reset_index(drop=True)
        exp = oracle.crawled_table().to_pandas()
        assert len(got) == len(exp) == info["fetched"]
        for col in ("url", "host", "crawl_seq", "fetch_time", "ok", "nbytes", "round"):
            assert (got[col].values == exp[col].values).all(), (seed, col)
        eng_seen = set()
        for _, exact in eng.seen.dump():
            eng_seen.update(np.asarray(exact, dtype=np.uint64).tolist())
        assert eng_seen == set(oracle.seen), seed
    finally:
        eng.shutdown()


REFRESH_CASES = [
    # (n_docs, n_hosts, seed, p_change, p_gone, child_frac, budget)
    (300, 5, 111, 0.3, 0.1, 0.8, Budget(max_rounds=4)),     # heavy churn
    (600, 25, 222, 0.02, 0.0, 0.0, Budget(max_rounds=4)),   # near-static web
    (400, 8, 333, 0.15, 0.05, 0.5, Budget(max_rounds=3, max_urls=150)),  # cut
]


@pytest.mark.parametrize(
    "n_docs,n_hosts,seed,ch,go,cf,budget", REFRESH_CASES
)
def test_random_refresh_parity(
    n_docs, n_hosts, seed, ch, go, cf, budget, tmp_path_factory
):
    """Refresh parity over diverse churn regimes: heavy mutation, a
    near-static web (almost everything 304s), and a truncating budget
    (not every revisit fits)."""
    from dataclasses import replace

    from web_scraping_script_ray.functions.hashing import span_content_hash_py
    from web_scraping_script_ray.pipelines.crawl import run_crawl
    from web_scraping_script_ray.pipelines.refresh import refresh_crawl

    p1 = WebParams(n_docs=n_docs, n_hosts=n_hosts, seed=seed, n_buckets=8)
    p2 = replace(p1, epoch=1, p_change=ch, p_gone=go, child_frac=cf)
    w1, w2 = fixture_dir(p1), fixture_dir(p2)
    out1 = str(tmp_path_factory.mktemp(f"rprop{seed}a"))
    eng1, _ = run_crawl(w1, out1, budget)
    eng1.shutdown()
    o1 = run_oracle(w1, budget)
    out2 = str(tmp_path_factory.mktemp(f"rprop{seed}b"))
    eng2, info = refresh_crawl(w2, out1, out2, budget)
    try:
        got = (
            eng2.crawled_dataset().to_pandas()
            .sort_values("crawl_seq").reset_index(drop=True)
        )
    finally:
        eng2.shutdown()
    seeds = [dict(url=c["url"], seed_rank=c["crawl_seq"]) for c in o1.crawled]
    etags = {
        c["url_hash"]: span_content_hash_py(c["spans"])
        for c in o1.crawled
        if c["ok"] and c["spans"]
    }
    o2 = run_oracle(w2, budget, seeds=seeds, etags=etags)
    exp = o2.crawled_table().to_pandas()
    assert len(got) == len(exp) == info["fetched"]
    for col in (
        "url", "host", "crawl_seq", "fetch_time", "ok", "nbytes",
        "round", "not_modified",
    ):
        assert (got[col].values == exp[col].values).all(), (seed, col)
