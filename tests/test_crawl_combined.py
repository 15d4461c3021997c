"""Every session-5 crawl feature AT ONCE vs the sequential oracle:
redirect aliases + sitemap seeding + flaky docs with retries + per-host
page caps + the popularity-priority frontier, on both schedule plans,
plus a mid-crawl resume.  Feature interactions (e.g. an alias whose
canonical is capped out; a flaky sitemap target recovered on attempt 2;
priority reordering under a quota) are exactly where independent
per-feature tests go blind.
"""

import pytest

from web_scraping_script_ray.oracle import run_oracle
from web_scraping_script_ray.synthweb import Budget, WebParams, fixture_dir

ORDER_COLS = [
    "url", "host", "url_hash", "depth", "crawl_seq", "round",
    "fetch_time", "discovered_by", "ok", "nbytes", "attempts",
]

P = WebParams(
    n_docs=2000,
    n_hosts=12,
    seed=31,
    n_seeds=4,
    p_redirect=0.2,
    sitemap_frac=0.05,
    p_flaky=0.12,
)
B = Budget(
    max_rounds=5,
    max_per_host=120,
    max_retries=3,
    priority="popularity",
)


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    yield


@pytest.fixture(scope="module")
def web():
    return fixture_dir(P)


def _crawl_df(eng):
    return (
        eng.crawled_dataset()
        .to_pandas()
        .sort_values("crawl_seq")
        .reset_index(drop=True)
    )


@pytest.mark.parametrize("small_limit", [None, 0])
def test_all_features_parity(web, tmp_path_factory, small_limit):
    from web_scraping_script_ray.pipelines.crawl import run_crawl

    kw = {} if small_limit is None else {"schedule_small_limit": 0}
    out = str(tmp_path_factory.mktemp(f"combined_{small_limit}"))
    eng, info = run_crawl(web, out, B, **kw)
    try:
        got = _crawl_df(eng)
        oracle = run_oracle(web, B)
        exp = oracle.crawled_table().to_pandas()
        assert len(got) == len(exp) == info["fetched"]
        for col in ORDER_COLS:
            assert (got[col].values == exp[col].values).all(), col
        assert eng.metrics_table().equals(oracle.metrics_table())
        # all features actually engaged on this web
        assert got["url"].str.contains("/r/").sum() > 20          # aliases
        assert got["url"].str.endswith("/sitemap.xml").sum() == P.n_hosts
        assert ((got["attempts"] > 1) & got["ok"]).sum() > 10     # recovered
        assert ((got["attempts"] == 3) & ~got["ok"]).sum() > 5    # exhausted
        counts = got.groupby("host").size()
        assert counts.max() <= B.max_per_host
        assert (counts == B.max_per_host).any()                   # cap bound
    finally:
        eng.shutdown()


def test_all_features_resume_identical(web, tmp_path_factory):
    """Interrupt after 2 rounds, resume to 5 — quota counters, clocks
    (including retry charges), seen shards and the priority signal all
    ride the checkpoint; the resumed crawl must equal a straight run."""
    from web_scraping_script_ray.pipelines.crawl import run_crawl

    short = Budget(max_rounds=2, max_per_host=120, max_retries=3,
                   priority="popularity")
    out1 = str(tmp_path_factory.mktemp("combined_resume"))
    eng, _ = run_crawl(web, out1, short)
    eng.shutdown()
    eng2, _ = run_crawl(web, out1, B, resume=True)
    try:
        got = _crawl_df(eng2)
    finally:
        eng2.shutdown()
    out2 = str(tmp_path_factory.mktemp("combined_straight"))
    eng3, _ = run_crawl(web, out2, B)
    try:
        exp = _crawl_df(eng3)
    finally:
        eng3.shutdown()
    assert len(got) == len(exp)
    for col in ORDER_COLS:
        assert (got[col].values == exp[col].values).all(), col
