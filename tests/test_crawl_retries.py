"""Transient-failure retry with exponential backoff (reference:
tenacity @retry on fetch, src/scraper.py:137 stop_after_attempt(3) +
wait_exponential; knobs src/config.yaml:3-5,104-108).

The engine models tenacity's blocking in-place retries: a fetch that
took ``a`` attempts records ``attempts=a`` on its crawled row, and the
``a-1`` backoff waits charge the host's politeness clock at round close
(transience is only discovered at fetch time).  Charges accumulate in
integer microseconds so the engine's per-bucket partial sums and the
oracle's row-order sums cannot diverge in float order — clocks stay
bit-identical.  Flaky docs come from the synthetic web's closed-form
``p_flaky`` table: ``fails ∈ {1,2,3}`` first attempts fail, so with 3
total attempts fails<3 recovers and fails=3 exhausts the budget.
"""

import pytest

from web_scraping_script_ray.oracle import run_oracle
from web_scraping_script_ray.synthweb import Budget, WebParams, fixture_dir, flaky_fails

ORDER_COLS = [
    "url", "host", "url_hash", "depth", "crawl_seq", "round",
    "fetch_time", "discovered_by", "ok", "nbytes", "attempts",
]

P = WebParams(n_docs=1200, n_hosts=10, seed=17, p_flaky=0.2, n_seeds=6)


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    yield


@pytest.fixture(scope="module")
def flaky_web():
    return fixture_dir(P)


def _run(web, budget, tmp, **kw):
    from web_scraping_script_ray.pipelines.crawl import run_crawl

    eng, info = run_crawl(web, tmp, budget, **kw)
    got = (
        eng.crawled_dataset()
        .to_pandas()
        .sort_values("crawl_seq")
        .reset_index(drop=True)
    )
    return eng, info, got


@pytest.mark.parametrize("small_limit", [None, 0])
def test_retry_parity_both_plans(flaky_web, tmp_path_factory, small_limit):
    budget = Budget(max_rounds=4, max_retries=3)
    kw = {} if small_limit is None else {"schedule_small_limit": 0}
    eng, info, got = _run(
        flaky_web, budget, str(tmp_path_factory.mktemp(f"retry_{small_limit}")), **kw
    )
    try:
        exp = run_oracle(flaky_web, budget).crawled_table().to_pandas()
        assert len(got) == len(exp) == info["fetched"]
        for col in ORDER_COLS:
            assert (got[col].values == exp[col].values).all(), col
        # all three attempt outcomes occur on this web
        rec = got[(got["ok"]) & (got["attempts"] > 1)]
        exh = got[(~got["ok"]) & (got["attempts"] == 3)]
        assert len(rec) > 20 and len(exh) > 10
        assert set(got["attempts"]) == {1, 2, 3}
        # recovered rows carry full content
        assert (rec["nbytes"] > 0).all()
        # metrics agree too (exhausted rows count as errors)
        oracle = run_oracle(flaky_web, budget)
        assert eng.metrics_table().equals(oracle.metrics_table())
    finally:
        eng.shutdown()


def test_retries_off_flaky_fails_first_attempt(flaky_web, tmp_path_factory):
    budget = Budget(max_rounds=3)  # max_retries=0
    eng, info, got = _run(
        flaky_web, budget, str(tmp_path_factory.mktemp("retry_off"))
    )
    try:
        exp = run_oracle(flaky_web, budget).crawled_table().to_pandas()
        assert len(got) == len(exp) == info["fetched"]
        for col in ORDER_COLS:
            assert (got[col].values == exp[col].values).all(), col
        assert (got["attempts"] == 1).all()
        # every flaky doc that was crawled failed
        import numpy as np

        idx = got["url"].str.rsplit("/", n=1).str[1].astype(int).values
        doc_rows = got["url"].str.contains("/p/").values & (idx < P.n_docs)
        ffails = flaky_fails(idx, P)
        flaky_crawled = doc_rows & (ffails > 0)
        # fewer flaky docs are even reached here: failed pages expand no
        # links, shrinking the frontier vs the retries-on runs
        assert flaky_crawled.sum() > 10
        assert (~got["ok"].values[flaky_crawled]).all()
    finally:
        eng.shutdown()


def test_backoff_charges_host_clock(flaky_web, tmp_path_factory):
    """With retries on, hosts with flaky docs end the crawl with strictly
    later clocks than the same crawl without retry charges."""
    b_on = Budget(max_rounds=3, max_retries=3)
    b_off = Budget(max_rounds=3)
    eng1, _, got1 = _run(flaky_web, b_on, str(tmp_path_factory.mktemp("clk_on")))
    clocks_on = {
        r["host"]: r["next_time"] for r in eng1.sched.dump_table().to_pylist()
    }
    eng1.shutdown()
    eng2, _, got2 = _run(flaky_web, b_off, str(tmp_path_factory.mktemp("clk_off")))
    clocks_off = {
        r["host"]: r["next_time"] for r in eng2.sched.dump_table().to_pylist()
    }
    eng2.shutdown()
    # retried rows exist on h0000 (hot host) → its clock must be later;
    # expected charge = 5·(1.5^0)=5 s per 2-attempt row, 12.5 s per
    # 3-attempt row (exact binary fractions)
    pen = b_on.retry_penalties_micro()
    charged = (
        got1.assign(p=[pen[a - 1] for a in got1["attempts"]])
        .groupby("host")["p"]
        .sum()
    )
    for host, p_micro in charged.items():
        if p_micro > 0 and host in clocks_off:
            assert clocks_on[host] > clocks_off[host]


def test_flaky_zero_is_byte_identical():
    from web_scraping_script_ray.synthweb import gen_chunk, host_starts, make_seeds

    base = WebParams(n_docs=1000, n_hosts=20, seed=42)
    withf = WebParams(n_docs=1000, n_hosts=20, seed=42, p_flaky=0.0)
    starts = host_starts(base)
    assert gen_chunk(0, base, starts).equals(gen_chunk(0, withf, starts))
    assert make_seeds(base, starts).equals(make_seeds(withf, starts))
