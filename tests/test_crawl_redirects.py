"""HTTP-3xx alias (redirect) handling in the crawl engine.

The reference's fetch backends follow redirects transparently inside
``requests.get`` (reference: src/scraper.py:97-101 — allow_redirects is
the requests default).  The Ray engine makes the hop explicit: an alias
URL is a fetched page whose single span is ``kind='redirect'`` naming
the canonical target, which enters the next round's frontier exactly
like a discovered link.  This keeps politeness (the alias fetch spent a
slot on its host), the seen-set (alias and canonical hashes are both
recorded — re-discovered aliases never refetch), and crawl ordering all
deterministic, and the sequential oracle reproduces it exactly.
"""

import numpy as np
import pytest

from web_scraping_script_ray.oracle import run_oracle
from web_scraping_script_ray.synthweb import (
    Budget,
    WebParams,
    _has_alias,
    alias_url,
    fixture_dir,
    gen_chunk,
    host_starts,
)

ORDER_COLS = [
    "url", "host", "url_hash", "depth", "crawl_seq", "round",
    "fetch_time", "discovered_by", "ok", "nbytes",
]

P = WebParams(n_docs=1200, n_hosts=8, seed=11, p_redirect=0.3, n_seeds=6)


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    yield


@pytest.fixture(scope="module")
def redirect_web():
    return fixture_dir(P)


@pytest.fixture(scope="module")
def crawl(redirect_web, tmp_path_factory):
    from web_scraping_script_ray.pipelines.crawl import run_crawl

    budget = Budget(max_rounds=8)
    out = str(tmp_path_factory.mktemp("crawl_redirects"))
    eng, info = run_crawl(redirect_web, out, budget)
    got = (
        eng.crawled_dataset()
        .to_pandas()
        .sort_values("crawl_seq")
        .reset_index(drop=True)
    )
    yield eng, info, got
    eng.shutdown()


def test_alias_rows_generated():
    starts = host_starts(P)
    t = gen_chunk(0, P, starts)
    urls = t.column("doc_id").to_pylist()
    aliases = [u for u in urls if "/r/" in u]
    # ~30% of 1200 docs carry an alias row
    assert 250 <= len(aliases) <= 470
    # every alias row is exactly one redirect span naming the canonical URL
    by_url = dict(zip(urls, t.column("spans").to_pylist()))
    for a in aliases:
        spans = by_url[a]
        assert len(spans) == 1
        assert spans[0]["kind"] == "redirect"
        tgt = spans[0]["media_ref"]
        assert tgt in by_url and "/r/" not in tgt
        # alias and canonical share a host (same-host 3xx)
        assert a.split("/")[2] == tgt.split("/")[2]


def test_p_redirect_zero_is_byte_identical():
    """The alias machinery must not perturb the rng stream: with
    p_redirect=0 the generated chunk equals the pre-feature output (this
    protects every cached fixture and golden crawl)."""
    base = WebParams(n_docs=1000, n_hosts=20, seed=42)
    withf = WebParams(n_docs=1000, n_hosts=20, seed=42, p_redirect=0.0)
    starts = host_starts(base)
    assert gen_chunk(0, base, starts).equals(gen_chunk(0, withf, starts))


def test_engine_oracle_parity_with_redirects(redirect_web, crawl):
    eng, info, got = crawl
    oracle = run_oracle(redirect_web, Budget(max_rounds=8))
    exp = oracle.crawled_table().to_pandas()
    assert len(got) == len(exp) == info["fetched"]
    for col in ORDER_COLS:
        assert (got[col].values == exp[col].values).all(), col


def test_aliases_resolve_and_nothing_refetches(crawl):
    _, _, got = crawl
    fetched = got["url"].tolist()
    assert len(set(fetched)) == len(fetched)  # no URL fetched twice
    ok = got[got["ok"]]
    alias_rows = ok[ok["url"].str.contains("/r/")]
    assert len(alias_rows) > 50  # aliases really were crawled
    fetched_set = set(fetched)
    # every alias fetched BEFORE the final round has had a chance to get
    # its canonical target scheduled; assert those all resolved
    last_round = int(got["round"].max())
    alias_rows = alias_rows[alias_rows["round"] < last_round]
    assert len(alias_rows) > 50
    starts = host_starts(P)
    for u in alias_rows["url"]:
        idx = int(u.rsplit("/", 1)[1])
        assert alias_url(idx, starts) == u
        canon = [s for s in ok[ok["url"] == u]["spans"].iloc[0]][0]["media_ref"]
        if canon.startswith("http://h0001.example/private/"):
            # the alias itself is fetchable but its canonical target is
            # robots-disallowed — correctly never fetched
            assert canon not in fetched_set
            continue
        assert canon in fetched_set
    # depth of a canonical reached through its alias is alias depth + 1
    by_url = dict(zip(got["url"], got["depth"]))
    a0 = alias_rows.iloc[0]
    canon0 = a0["spans"][0]["media_ref"]
    if by_url[canon0] > 0:  # unless the canonical was also a seed/direct link
        assert by_url[canon0] <= a0["depth"] + 1


def test_alias_coin_is_closed_form():
    idx = np.arange(5000)
    m1 = _has_alias(idx, P)
    m2 = _has_alias(idx, P)
    assert (m1 == m2).all()
    frac = m1.mean()
    assert 0.2 < frac < 0.4
