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
