"""Seed-source tests (S1–S3 semantics, reference: src/cli.py:77-84)."""

import pytest

from web_scraping_script_ray.sources.seeds import seeds_from_file, seeds_from_urls


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    yield


def test_seeds_from_urls_ranked():
    df = seeds_from_urls(["http://a/", "http://b/", "http://c/"]).to_pandas()
    assert df.url.tolist() == ["http://a/", "http://b/", "http://c/"]
    assert df.seed_rank.tolist() == [0, 1, 2]


def test_seeds_from_file_filters_comments(tmp_path):
    p = tmp_path / "urls.txt"
    p.write_text("http://a/\n\n# comment\n  http://b/  \n#x\nhttp://c/\n")
    df = seeds_from_file(str(p)).to_pandas()
    assert df.url.tolist() == ["http://a/", "http://b/", "http://c/"]
    assert df.seed_rank.tolist() == [0, 1, 2]


def test_fetch_and_sink_registries(tmp_path):
    from web_scraping_script_ray.sources.registry import get_fetcher, get_sink

    f = get_fetcher("playwright", "/tmp/nonexistent")
    assert callable(f)
    assert callable(get_fetcher("not-a-mode", "/tmp/nonexistent"))  # fallback

    import pyarrow as pa
    import ray.data

    ds = ray.data.from_arrow(pa.table({"x": [1, 2, 3]}))
    sink = get_sink("json")
    sink(ds, str(tmp_path / "out"))
    assert any((tmp_path / "out").iterdir())
    assert callable(get_sink("mongodb"))  # fallback → parquet


def test_lance_seam_probe():
    """The Lance adapter seam: active iff the package exists (probed each
    round); otherwise the documented NotImplementedError with the parquet
    stand-in pointer."""
    import pyarrow as pa
    import pytest as _pytest

    from web_scraping_script_ray.sources import lance_io

    t = pa.table({"doc_id": ["a", "b"], "v": [1, 2]})
    if not lance_io.HAVE_LANCE:
        with _pytest.raises(NotImplementedError, match="bucketed-parquet"):
            lance_io.write_lance(t, "/tmp/never.lance")
        return
    import tempfile

    d = tempfile.mkdtemp() + "/t.lance"
    lance_io.write_lance(t, d)
    back = lance_io.read_lance(d)
    assert back.num_rows == 2
    assert lance_io.take_by_key(d, ["a"]).num_rows == 1


def test_sqlite_sink_roundtrip(tmp_path, ray_session):
    """K4 (reference src/storage.py:90-150): stream a Dataset into one
    SQLite db; types map int/bool->INTEGER, float->REAL, rest->TEXT."""
    import sqlite3

    import pyarrow as pa
    import ray.data

    from web_scraping_script_ray.sources.registry import get_sink
    from web_scraping_script_ray.sources.sqlite_sink import (
        write_sqlite,
        write_sqlite_partitioned,
    )

    t = pa.table(
        {
            "k": [1, 2, 3],
            "v": [1.5, 2.5, None],
            "s": ["a", "b", "c"],
            "b": [True, False, True],
        }
    )
    ds = ray.data.from_arrow(t).repartition(2)
    db = str(tmp_path / "out.sqlite")
    n = write_sqlite(ds, db, table="r")
    assert n == 3
    con = sqlite3.connect(db)
    rows = con.execute('SELECT k, v, s, b FROM "r" ORDER BY k').fetchall()
    con.close()
    assert rows == [(1, 1.5, "a", 1), (2, 2.5, "b", 0), (3, None, "c", 1)]
    # registry surface
    db2 = str(tmp_path / "out2.sqlite")
    get_sink("sqlite")(ray.data.from_arrow(t), db2)
    con = sqlite3.connect(db2)
    assert con.execute('SELECT count(*) FROM "results"').fetchone()[0] == 3
    con.close()
    # partitioned scale path: one file per block
    pdir = tmp_path / "parts"
    write_sqlite_partitioned(ray.data.from_arrow(t).repartition(2), str(pdir))
    files = list(pdir.glob("part-*.sqlite"))
    assert len(files) >= 1
    total = 0
    for f in files:
        con = sqlite3.connect(str(f))
        total += con.execute('SELECT count(*) FROM "results"').fetchone()[0]
        con.close()
    assert total == 3


def test_sqlite_loader_with_limit(tmp_path, ray_session):
    """S9/K4 read side (reference src/storage.py:259-282 load(limit))."""
    import pyarrow as pa
    import ray.data

    from web_scraping_script_ray.sources.sqlite_sink import read_sqlite, write_sqlite

    t = pa.table({"k": list(range(10)), "s": [f"r{i}" for i in range(10)]})
    db = str(tmp_path / "l.sqlite")
    write_sqlite(ray.data.from_arrow(t), db, table="tt")
    full = read_sqlite(db, "tt").to_pandas()
    assert len(full) == 10 and sorted(full.k) == list(range(10))
    lim = read_sqlite(db, "tt", limit=3).to_pandas()
    assert len(lim) == 3


def test_csv_json_loaders_roundtrip(tmp_path, ray_session):
    """S9 read side (reference src/storage.py:103-120,193-201): sink →
    loader round-trips through the registry for csv and json."""
    import pyarrow as pa
    import ray.data

    from web_scraping_script_ray.sources.registry import get_loader, get_sink

    t = pa.table({"k": [3, 1, 2], "s": ["c", "a", "b"]})
    for fmt in ("csv", "json"):
        path = str(tmp_path / f"rt_{fmt}")
        get_sink(fmt)(ray.data.from_arrow(t), path)
        back = get_loader(fmt)(path).to_pandas().sort_values("k").reset_index(drop=True)
        assert back.k.tolist() == [1, 2, 3]
        assert back.s.tolist() == ["a", "b", "c"]
    # missing path → [] (reference returns [] for a missing file)
    assert get_loader("csv")(str(tmp_path / "absent")).count() == 0
    assert get_loader("json")(str(tmp_path / "absent")).count() == 0


def test_docstore_mongo_semantics(tmp_path, ray_session):
    """K3 document-store parity (reference src/storage.py:225-257):
    single-dict coercion, shared per-save timestamp stamp, bulk insert,
    equality-query load with limit, atomic parts."""
    from web_scraping_script_ray.sources.docstore import DocStore

    clock = iter([100.0, 200.0])
    store = DocStore(str(tmp_path / "col"), clock=lambda: next(clock))
    assert store.save([{"u": "a", "n": 1}, {"u": "b", "n": 2}])
    assert store.save({"u": "a", "n": 3})  # single dict coerced to list
    docs = store.load()
    assert len(docs) == 3
    # every item of one save() call shares one stamp (reference stamps
    # one datetime.now() per save)
    stamps = {d["u"]: set() for d in docs}
    for d in docs:
        stamps[d["u"]].add(d["timestamp"])
    assert {d["timestamp"] for d in docs} == {100.0, 200.0}
    # equality query + limit
    assert sorted(d["n"] for d in store.load({"u": "a"})) == [1, 3]
    assert len(store.load(limit=2)) == 2
    assert store.load({"missing_col": 1}) == []
    # bulk read side is a Dataset
    assert store.as_dataset().count() == 3


def test_excel_export_gated(tmp_path, ray_session):
    """K5 excel (reference src/main.py:219-220): writes a real xlsx when
    a writer lib is importable, else raises the actionable ImportError."""
    import pyarrow as pa
    import pytest
    import ray.data

    from web_scraping_script_ray.pipelines.postprocess import export

    ds = ray.data.from_arrow(pa.table({"k": [1, 2], "s": ["a", "b"]}))
    path = str(tmp_path / "out.xlsx")
    try:
        import openpyxl  # noqa: F401

        have = True
    except ImportError:
        try:
            import xlsxwriter  # noqa: F401

            have = True
        except ImportError:
            have = False
    if have:
        export(ds, path, fmt="excel")
        import pandas as pd

        back = pd.read_excel(path).sort_values("k")
        assert back.k.tolist() == [1, 2]
    else:
        with pytest.raises(ImportError, match="openpyxl or xlsxwriter"):
            export(ds, path, fmt="excel")



def test_seed_candidates_vectorized_matches_scalar(tmp_path, ray_session):
    """The seed loader's RE2 fast path + per-row fallback must equal
    per-row canonicalize() over canonical, messy, and invalid seeds."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from web_scraping_script_ray.pipelines.crawl import CrawlEngine
    from web_scraping_script_ray.synthweb import Budget, WebParams, fixture_dir
    from web_scraping_script_ray.urlnorm import canonicalize, host_of, url_hash64

    urls = [
        "http://a.example/p/1",                 # fast path
        "http://a.example/p/1?q=2",             # query -> slow path, identity
        "HTTP://A.example:80/p/2#frag",         # lowercase + strip
        "https://b.example/x",                  # https -> slow path
        "javascript:void(0)",                   # dropped
        "http://c.example",                     # '' path -> '/'
        "  http://d.example/ws  ",              # strip()
        "mailto:x@y",                           # dropped
    ]
    seeds = pa.table(
        {"url": pa.array(urls), "seed_rank": pa.array(range(len(urls)), pa.int64())}
    )
    path = str(tmp_path / "seeds.parquet")
    pq.write_table(seeds, path)
    web = fixture_dir(WebParams(n_docs=300, n_hosts=5, seed=101))
    eng = CrawlEngine(web, str(tmp_path / "out"), Budget(max_rounds=1),
                      seeds_path=path, warmup=False)
    got = pa.concat_tables(
        [t for t in __import__("ray").get(eng.seed_candidates().to_arrow_refs())]
    ).to_pydict()
    want = []
    for rank, u in enumerate(urls):
        cu = canonicalize(u)
        if cu is None:
            continue
        want.append((cu, host_of(cu), url_hash64(cu), rank))
    assert list(zip(got["url"], got["host"], got["url_hash"],
                    got["disc_primary"])) == want
    assert got["depth"] == [0] * len(want)
    assert got["n_disc"] == [1] * len(want)
    eng.shutdown()


def test_docstore_contract_both_backends(tmp_path):
    """The doc-store contract (write → keyed take with bucket pruning →
    column projection) runs END-TO-END on the always-available
    bucketed-parquet backend; the SAME assertions run against Lance when
    the package is importable (auto-gated — this test never skips, the
    lance branch simply activates in richer environments)."""
    import numpy as np
    import pyarrow as pa

    from web_scraping_script_ray.sources import lance_io

    rng = np.random.default_rng(3)
    keys = rng.integers(0, 1 << 62, size=200).astype(np.uint64)
    t = pa.table(
        {
            "url_hash": pa.array(keys, pa.uint64()),
            "url": pa.array([f"http://h/{i}" for i in range(200)], pa.string()),
            "nbytes": pa.array(rng.integers(1, 9999, 200), pa.int64()),
        }
    )
    backends = ["parquet"] + (["lance"] if lance_io.HAVE_LANCE else [])
    for backend in backends:
        uri = str(tmp_path / f"store_{backend}")
        lance_io.docstore_write(t, uri, backend=backend)
        want = keys[[3, 77, 150]].tolist()
        got = lance_io.docstore_take(uri, want, backend=backend)
        assert sorted(got.column("url_hash").to_pylist()) == sorted(want)
        proj = lance_io.docstore_take(
            uri, want, columns=["url_hash", "url"], backend=backend
        )
        assert proj.column_names == ["url_hash", "url"]
        # miss: a key outside the store returns no rows (not an error)
        none = lance_io.docstore_take(uri, [np.uint64(1)], backend=backend)
        assert none.num_rows == 0
