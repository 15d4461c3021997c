import collections

from web_scraping_script_ray.oracle import run_oracle
from web_scraping_script_ray.synthweb import Budget
from web_scraping_script_ray.urlnorm import path_of


def test_oracle_deterministic(t1_web):
    a = run_oracle(t1_web, Budget(max_rounds=3))
    b = run_oracle(t1_web, Budget(max_rounds=3))
    assert a.crawled_table().equals(b.crawled_table())
    assert a.seen_table().equals(b.seen_table())


def test_oracle_seed_round(t1_web):
    res = run_oracle(t1_web, Budget(max_rounds=1))
    r0 = [c for c in res.crawled if c["round"] == 0]
    # seeds: 8 hosts + 1 dangling + 1 duplicate → 9 unique (first-wins)
    assert len(r0) == 9
    # crawl_seq contiguous from 0
    assert [c["crawl_seq"] for c in res.crawled] == list(range(len(res.crawled)))
    # dangling seed fetched but ok=False
    dangle = [c for c in r0 if not c["ok"]]
    assert len(dangle) == 1 and "0001999" in dangle[0]["url"]
    # first fetch of each host in round 0 is at clock 0
    first_per_host = {}
    for c in sorted(r0, key=lambda c: c["crawl_seq"]):
        first_per_host.setdefault(c["host"], c["fetch_time"])
    assert all(t == 0.0 for t in first_per_host.values())


def test_oracle_seen_equals_crawled(t1_web):
    res = run_oracle(t1_web, Budget(max_rounds=3))
    assert set(res.seen) == {c["url_hash"] for c in res.crawled}
    # no URL crawled twice
    seqs = [c["url_hash"] for c in res.crawled]
    assert len(seqs) == len(set(seqs))


def test_oracle_robots_disallow(t1_web):
    res = run_oracle(t1_web, Budget(max_rounds=4))
    for c in res.crawled:
        if c["host"] == "h0001.example":
            assert not path_of(c["url"]).startswith("/private/")


def test_oracle_politeness_ordering(t1_web):
    """Within a round, a host's k-th fetch is at clock+k*delay; the slow
    host (h0002, delay 5) sinks in the global order."""
    res = run_oracle(t1_web, Budget(max_rounds=3))
    by_round = collections.defaultdict(list)
    for c in res.crawled:
        by_round[c["round"]].append(c)
    for rnd, rows in by_round.items():
        keys = [(c["fetch_time"], c["host"]) for c in sorted(rows, key=lambda c: c["crawl_seq"])]
        assert keys == sorted(keys)
        per_host = collections.defaultdict(list)
        for c in rows:
            per_host[c["host"]].append(c["fetch_time"])
        for h, times in per_host.items():
            diffs = {round(b - a, 6) for a, b in zip(times, times[1:])}
            assert len(diffs) <= 1  # evenly spaced by delay(h)


def test_oracle_max_urls_budget(t1_web):
    res = run_oracle(t1_web, Budget(max_rounds=4, max_urls=17))
    assert len(res.crawled) == 17
    full = run_oracle(t1_web, Budget(max_rounds=4))
    # truncated crawl is a prefix of the full crawl
    assert [c["url"] for c in full.crawled[:17]] == [c["url"] for c in res.crawled]


def test_oracle_metrics(t1_web):
    res = run_oracle(t1_web, Budget(max_rounds=3))
    m = res.metrics_table().to_pylist()
    total = sum(r["fetched"] + r["errors"] for r in m)
    assert total == len(res.crawled)
    ok_bytes = sum(c["nbytes"] for c in res.crawled)
    assert sum(r["bytes"] for r in m) == ok_bytes


def test_ln_floor_micro_parity_numpy_vs_duckdb():
    """The whole micro/milli-log oracle family (lm_score, collocations,
    dsir, zipf, weighted_sample) rests on floor(ln(x)*scale) being
    bit-identical between numpy float64 and DuckDB: assert it across a
    wide random sample of positive int64-derived doubles."""
    import duckdb
    import numpy as np

    duck = duckdb.connect()
    rng = np.random.default_rng(17)
    ints = np.unique(
        np.concatenate(
            [
                rng.integers(1, 10**3, 300),
                rng.integers(10**3, 10**9, 300),
                rng.integers(10**9, 10**15, 300),
                np.array([1, 2, 3, 10, 255, 256, 65536, 10**6, 10**12]),
            ]
        )
    ).astype(np.int64)
    for scale in (1_000, 1_000_000):
        want = np.floor(np.log(ints.astype(np.float64)) * scale).astype(np.int64)
        lit = ", ".join(str(int(x)) for x in ints)
        got = (
            duck.sql(
                f"SELECT CAST(floor(ln(CAST(v AS DOUBLE)) * {scale}) AS BIGINT)"
                f" FROM (SELECT unnest([{lit}]) AS v)"
            )
            .fetchnumpy()
            .popitem()[1]
            .astype(np.int64)
        )
        np.testing.assert_array_equal(want, got)
