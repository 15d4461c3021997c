"""Engine ↔ oracle parity (SURVEY.md §5.2 invariants 2–3): crawl order,
URL-seen set, per-row span sequences, metrics — all exact."""

import numpy as np
import pytest

from web_scraping_script_ray.oracle import run_oracle
from web_scraping_script_ray.synthweb import Budget

ORDER_COLS = [
    "url", "host", "url_hash", "depth", "crawl_seq", "round",
    "fetch_time", "discovered_by", "ok", "nbytes",
]


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    yield


@pytest.fixture(scope="module")
def parity(t1_web, tmp_path_factory):
    from web_scraping_script_ray.pipelines.crawl import run_crawl

    budget = Budget(max_rounds=3)
    out = str(tmp_path_factory.mktemp("crawl_parity"))
    eng, info = run_crawl(t1_web, out, budget)
    oracle = run_oracle(t1_web, budget)
    got = eng.crawled_dataset().to_pandas().sort_values("crawl_seq").reset_index(drop=True)
    exp = oracle.crawled_table().to_pandas()
    yield eng, info, oracle, got, exp
    eng.shutdown()


def test_row_counts(parity):
    _, info, oracle, got, exp = parity
    assert len(got) == len(exp) == info["fetched"]


def test_crawl_order_and_schedule(parity):
    _, _, _, got, exp = parity
    for col in ORDER_COLS:
        assert (got[col].values == exp[col].values).all(), col


def test_span_sequence_equality(parity):
    # per-row invariant from BASELINE.json input_hint: (kind, text,
    # media_ref, order) equality, row by row
    _, _, _, got, exp = parity
    for a, b in zip(got["spans"], exp["spans"]):
        la = [(s["kind"], s["text"], s["media_ref"], i) for i, s in enumerate(a)]
        lb = [(s["kind"], s["text"], s["media_ref"], i) for i, s in enumerate(b)]
        assert la == lb


def test_seen_set_exact(parity):
    eng, _, oracle, _, _ = parity
    eng_seen = set()
    for _, exact in eng.seen.dump():
        eng_seen.update(np.asarray(exact, dtype=np.uint64).tolist())
    assert eng_seen == set(oracle.seen)


def test_metrics_equal(parity):
    eng, _, oracle, _, _ = parity
    assert eng.metrics_table().equals(oracle.metrics_table())


def test_distributed_schedule_path_parity(t1_web, tmp_path_factory):
    """schedule_small_limit=0 forces the distributed dedup/rank/zip path;
    its output must be identical to the small-round fast path / oracle."""
    from web_scraping_script_ray.pipelines.crawl import run_crawl

    budget = Budget(max_rounds=3)
    out = str(tmp_path_factory.mktemp("crawl_dist"))
    eng, info = run_crawl(t1_web, out, budget, schedule_small_limit=0)
    try:
        oracle = run_oracle(t1_web, budget)
        got = eng.crawled_dataset().to_pandas().sort_values("crawl_seq").reset_index(drop=True)
        exp = oracle.crawled_table().to_pandas()
        assert len(got) == len(exp) == info["fetched"]
        for col in ORDER_COLS:
            assert (got[col].values == exp[col].values).all(), col
    finally:
        eng.shutdown()


def test_budget_truncation_parity(t1_web, tmp_path_factory):
    from web_scraping_script_ray.pipelines.crawl import run_crawl

    budget = Budget(max_rounds=3, max_urls=23)
    out = str(tmp_path_factory.mktemp("crawl_budget"))
    eng, info = run_crawl(t1_web, out, budget)
    try:
        assert info["fetched"] == 23
        got = eng.crawled_dataset().to_pandas().sort_values("crawl_seq")
        exp = run_oracle(t1_web, budget).crawled_table().to_pandas()
        assert (got["url"].values == exp["url"].values).all()
        assert (got["fetch_time"].values == exp["fetch_time"].values).all()
    finally:
        eng.shutdown()


def test_politeness_token_window_bounded():
    """Stale-token replay within the window is a no-op; the applied-token
    set itself stays bounded (no per-round leak)."""
    from web_scraping_script_ray.state.politeness import PolitenessShard

    sh = PolitenessShard()
    sh.advance(["h"], [1.0], token=("r", 0))
    sh.advance(["h"], [1.0], token=("r", 0))  # replay → no-op
    assert sh.clock["h"] == 1.0
    for i in range(PolitenessShard.TOKEN_WINDOW + 10):
        sh.advance(["h"], [0.0], token=("x", i))
    assert len(sh._applied) <= PolitenessShard.TOKEN_WINDOW
    # a recent token still replays as a no-op
    sh.advance(["h"], [5.0], token=("x", PolitenessShard.TOKEN_WINDOW + 9))
    assert sh.clock["h"] == 1.0


def test_robots_query_string_path_parity():
    """allowed_mask_urls must match prefixes against the urlsplit path
    only — '?' / '#' suffixes cut before matching."""
    import numpy as np
    import pyarrow as pa

    from web_scraping_script_ray.state.politeness import RobotsRules

    robots = pa.table(
        {"host": ["h.example"], "disallow": [["/private"]], "crawl_delay": [1.0]}
    )
    r = RobotsRules(robots, 1.0)
    hosts = np.array(["h.example"] * 3, dtype=object)
    urls = [
        "http://h.example/private?x=1",
        "http://h.example/ok?path=/private",
        "http://h.example/priv#ate",
    ]
    mask = r.allowed_mask_urls(hosts, urls)
    assert mask.tolist() == [False, True, True]
