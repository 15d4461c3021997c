"""Per-host cumulative page cap (Budget.max_per_host) — the crawler-trap
guard (reference analogue: per-site pagination max_pages,
src/config.yaml:123).  Each host contributes at most N pages over the
whole crawl; over-quota candidates are each host's discovery-order
suffix, dropped unseen (rediscoverable, but the quota never recovers).
Both physical schedule plans and the sequential oracle agree exactly,
and the quota state checkpoints with the politeness clocks.
"""

import numpy as np
import pyarrow as pa
import pytest

from web_scraping_script_ray.oracle import run_oracle
from web_scraping_script_ray.synthweb import Budget

ORDER_COLS = [
    "url", "host", "url_hash", "depth", "crawl_seq", "round",
    "fetch_time", "discovered_by", "ok", "nbytes",
]

CAP = 7


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    yield


def _host_counts(df):
    return df.groupby("host").size()


@pytest.mark.parametrize("small_limit", [None, 0])
def test_cap_parity_both_plans(t1_web, tmp_path_factory, small_limit):
    from web_scraping_script_ray.pipelines.crawl import run_crawl

    budget = Budget(max_rounds=4, max_per_host=CAP)
    out = str(tmp_path_factory.mktemp(f"crawl_cap_{small_limit}"))
    kwargs = {} if small_limit is None else {"schedule_small_limit": 0}
    eng, info = run_crawl(t1_web, out, budget, **kwargs)
    try:
        exp = run_oracle(t1_web, budget).crawled_table().to_pandas()
        got = (
            eng.crawled_dataset()
            .to_pandas()
            .sort_values("crawl_seq")
            .reset_index(drop=True)
        )
        assert len(got) == len(exp) == info["fetched"]
        for col in ORDER_COLS:
            assert (got[col].values == exp[col].values).all(), col
        counts = _host_counts(got)
        assert counts.max() <= CAP
        assert (counts == CAP).any()  # the cap actually bound somewhere
    finally:
        eng.shutdown()


def test_uncapped_unchanged(t1_web, tmp_path_factory):
    """max_per_host=0 (the default) must reproduce the pre-cap schedule."""
    from web_scraping_script_ray.pipelines.crawl import run_crawl

    budget = Budget(max_rounds=3)
    out = str(tmp_path_factory.mktemp("crawl_nocap"))
    eng, info = run_crawl(t1_web, out, budget)
    try:
        exp = run_oracle(t1_web, budget).crawled_table().to_pandas()
        got = (
            eng.crawled_dataset()
            .to_pandas()
            .sort_values("crawl_seq")
            .reset_index(drop=True)
        )
        assert (got["url"].values == exp["url"].values).all()
        assert _host_counts(got).max() > CAP  # this web would trip the cap
    finally:
        eng.shutdown()


def test_quota_state_checkpoints():
    from web_scraping_script_ray.state.politeness import PolitenessScheduler

    sched = PolitenessScheduler(n_shards=2)
    try:
        sched.advance({"a.example": 2.0, "b.example": 1.0})
        # counts ride the same advance RPC
        import ray

        ray.get(
            sched.shards[0].advance.remote(["a.example"], [1.0], None, [3])
        )
        t = sched.dump_table()
        assert set(t.column_names) == {"host", "next_time", "fetched"}
        sched2 = PolitenessScheduler(n_shards=2)
        try:
            sched2.load_table(t)
            assert sched2.dump_table().equals(t)
            # pre-cap checkpoints (no fetched column) still load
            old = t.drop_columns(["fetched"])
            sched3 = PolitenessScheduler(n_shards=2)
            try:
                sched3.load_table(old)
                t3 = sched3.dump_table()
                assert t3.column("fetched").to_pylist() == [0] * t3.num_rows
                assert t3.column("next_time").to_pylist() == t.column(
                    "next_time"
                ).to_pylist()
            finally:
                sched3.shutdown()
        finally:
            sched2.shutdown()
    finally:
        sched.shutdown()


def test_capped_crawl_resumes_identically(t1_web, tmp_path_factory):
    """A capped crawl interrupted after round 1 and resumed must equal an
    uninterrupted run — i.e. the quota counters survive the checkpoint."""
    from web_scraping_script_ray.pipelines.crawl import run_crawl

    budget_short = Budget(max_rounds=2, max_per_host=CAP)
    budget_full = Budget(max_rounds=4, max_per_host=CAP)
    out1 = str(tmp_path_factory.mktemp("cap_resume"))
    eng, _ = run_crawl(t1_web, out1, budget_short)
    eng.shutdown()
    eng2, _ = run_crawl(t1_web, out1, budget_full, resume=True)
    try:
        got = (
            eng2.crawled_dataset()
            .to_pandas()
            .sort_values("crawl_seq")
            .reset_index(drop=True)
        )
    finally:
        eng2.shutdown()
    out2 = str(tmp_path_factory.mktemp("cap_straight"))
    eng3, _ = run_crawl(t1_web, out2, budget_full)
    try:
        exp = (
            eng3.crawled_dataset()
            .to_pandas()
            .sort_values("crawl_seq")
            .reset_index(drop=True)
        )
    finally:
        eng3.shutdown()
    assert len(got) == len(exp)
    for col in ORDER_COLS:
        assert (got[col].values == exp[col].values).all(), col
