import collections

import numpy as np
import pyarrow.dataset as pads
import pyarrow.parquet as pq

from web_scraping_script_ray.schemas import SPAN_KINDS, WEB_SCHEMA
from web_scraping_script_ray.synthweb import (
    WebParams,
    fixture_dir,
    gen_chunk,
    host_of_doc,
    host_starts,
)
from web_scraping_script_ray.urlnorm import host_of


def test_chunk_determinism():
    p = WebParams(n_docs=500, n_hosts=10, seed=7)
    starts = host_starts(p)
    a, b = gen_chunk(0, p, starts), gen_chunk(0, p, starts)
    assert a.equals(b)
    assert a.schema.equals(WEB_SCHEMA)
    assert a.num_rows == 500


def test_host_skew_hot_host():
    p = WebParams(n_docs=10_000, n_hosts=100, seed=42)
    starts = host_starts(p)
    hosts = host_of_doc(np.arange(p.n_docs), starts)
    counts = collections.Counter(hosts.tolist())
    assert counts[0] >= 0.2 * p.n_docs  # FIXTURES.md: hot host ≥ 20%
    assert len(counts) == p.n_hosts
    assert starts[-1] == p.n_docs


def test_span_invariants(t1_web):
    ds = pads.dataset(f"{t1_web}/web")
    t = ds.to_table()
    assert t.num_rows == 1000
    seen_kinds = set()
    for row in t.to_pylist()[:200]:
        offs = [s["offset"] for s in row["spans"]]
        assert offs == sorted(offs) and len(set(offs)) == len(offs)
        assert 2 <= len(offs) <= 40
        for s in row["spans"]:
            assert s["kind"] in SPAN_KINDS
            seen_kinds.add(s["kind"])
            if s["kind"] == "text":
                assert s["text"] and not s["media_ref"]
            else:
                assert s["media_ref"] and not s["text"]
        assert host_of(row["doc_id"]).endswith(".example")
    assert "text" in seen_kinds and "link" in seen_kinds


def test_seeds_and_robots(t1_web):
    seeds = pq.read_table(f"{t1_web}/seeds.parquet").to_pylist()
    assert seeds[0]["seed_rank"] == 0
    assert [s["seed_rank"] for s in seeds] == list(range(len(seeds)))
    # duplicate seed for first-wins dedup + one dangling seed
    urls = [s["url"] for s in seeds]
    assert len(urls) != len(set(urls))
    robots = pq.read_table(f"{t1_web}/robots.parquet").to_pylist()
    by_host = {r["host"]: r for r in robots}
    assert by_host["h0001.example"]["disallow"] == ["/private/"]
    assert by_host["h0002.example"]["crawl_delay"] == 5.0


def test_bucketed_layout(t1_web):
    import glob
    import os

    from web_scraping_script_ray.urlnorm import url_hash64

    buckets = sorted(glob.glob(f"{t1_web}/web/bucket=*"))
    assert len(buckets) >= 2
    b3 = os.path.join(t1_web, "web", "bucket=3")
    t = pads.dataset(b3).to_table()
    for u in t.column("doc_id").to_pylist():
        assert url_hash64(u) % 16 == 3


def test_expand_links_fast_path_matches_canonicalize():
    """The vectorized already-canonical fast path in expand_links must
    agree with per-row canonicalize() on adversarial URLs (uppercase
    hosts, default/explicit ports, query strings, fragments, userinfo,
    relative refs, bad schemes)."""
    import numpy as np
    import pyarrow as pa

    from web_scraping_script_ray.schemas import SPAN_STRUCT
    from web_scraping_script_ray.stages.spans import expand_links
    from web_scraping_script_ray.urlnorm import canonicalize

    refs = [
        "http://plain.example/a/b",                 # fast path
        "http://plain.example/a?q=1#frag",          # query+fragment → slow
        "http://UPPER.example/Path",                # uppercase host → slow
        "http://host.example:80/x",                 # default port → strip
        "http://host.example:8080/x",               # explicit port → keep
        "https://secure.example/y",                 # https → slow path
        "HTTP://caps.example/z",                    # scheme case
        "http://user@host.example/w",               # userinfo
        "/relative/path",                           # relative → base join
        "javascript:void(0)",                       # dropped
        "mailto:x@y.z",                             # dropped
        "http://spaced.example/a b",                # space in path
        "http://dot.example",                       # no path → '/'
        "http://nbsp.example/x ",              # unicode ws → slow path strips
    ]
    base = "http://base.example/dir/page"
    spans = [
        [
            {"kind": "link", "text": "", "media_ref": r, "offset": i}
            for i, r in enumerate(refs)
        ]
    ]
    batch = pa.Table.from_arrays(
        [
            pa.array([base], pa.string()),
            pa.array([7], pa.int64()),
            pa.array([1], pa.int32()),
            pa.array([True], pa.bool_()),
            pa.array(spans, pa.list_(SPAN_STRUCT)),
        ],
        names=["url", "crawl_seq", "depth", "ok", "spans"],
    )
    out = expand_links(batch)
    got = out.column("url").to_pylist()
    expected = []
    for r in refs:
        cu = (
            canonicalize(r)
            if r.lower().startswith(("http://", "https://"))
            else canonicalize(r, base_url=base)
        )
        if cu is not None:
            expected.append(cu)
    assert got == expected
    # hosts agree with canonical urls
    from web_scraping_script_ray.urlnorm import host_of

    assert out.column("host").to_pylist() == [host_of(u) for u in expected]
