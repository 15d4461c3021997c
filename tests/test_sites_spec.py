"""Site extractors (M21–M23) and the declarative pipeline spec runner."""

import pytest

from web_scraping_script_ray.functions.sites import (
    extract_soundcloud_track,
    extract_youtube_watch,
    youtube_thumbnail_urls,
)
from web_scraping_script_ray.pipelines.spec import PipelineSpec, run_pipeline

YT_HTML = """
<html><head>
<title>Never Gonna Give You Up - YouTube</title>
<meta property="og:title" content="Never Gonna Give You Up">
<meta name="description" content="Official video">
</head><body>
<script>var ytInitialData = {"contents": {}, "author": "Rick Astley", "viewCount": "1234567890"};</script>
1,234,567,890 views
</body></html>
"""

SC_HTML = """
<html><head>
<meta property="og:title" content="Levitating by Dua Lipa">
<meta property="og:image" content="https://i1.sndcdn.com/artworks-xyz-t500x500.jpg">
<meta property="soundcloud:play_count" content="4200">
<meta property="soundcloud:like_count" content="99">
</head><body></body></html>
"""


def test_youtube_thumbnails_five_variants():
    urls = youtube_thumbnail_urls("dQw4w9WgXcQ")
    assert len(urls) == 5
    assert urls[0] == "https://img.youtube.com/vi/dQw4w9WgXcQ/maxresdefault.jpg"
    assert urls[-1].endswith("/default.jpg")


def test_extract_youtube_watch():
    rec = extract_youtube_watch(YT_HTML, "https://www.youtube.com/watch?v=dQw4w9WgXcQ")
    assert rec["video_id"] == "dQw4w9WgXcQ"
    assert rec["title"] == "Never Gonna Give You Up"
    assert rec["channel"] == "Rick Astley"
    assert rec["views"] == 1234567890
    assert rec["description"] == "Official video"


def test_extract_soundcloud_track():
    rec = extract_soundcloud_track(SC_HTML, "https://soundcloud.com/dualipa/levitating")
    assert rec["track_id"] == "dualipa/levitating"
    assert rec["title"] == "Levitating"
    assert rec["artist"] == "Dua Lipa"
    assert rec["plays"] == 4200
    assert rec["likes"] == 99
    assert rec["artwork_url"].endswith("t500x500.jpg")


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    yield


def test_pipeline_spec_yaml_roundtrip(tmp_path):
    y = tmp_path / "p.yaml"
    y.write_text(
        """
name: test pipeline
scraper_mode: simple
urls:
  - "http://h0000.example/p/0000000"
extract_text: true
extract_links: true
post_processing:
  operations:
    - type: deduplicate
      columns: ["url"]
    - type: sort
      column: timestamp
      ascending: false
  export:
    format: parquet
    path: out
"""
    )
    spec = PipelineSpec.from_yaml(str(y))
    assert spec.urls and spec.extract_links and len(spec.operations) == 2
    assert spec.export_format == "parquet"


def test_run_pipeline_end_to_end(t1_web, tmp_path):
    from web_scraping_script_ray.synthweb import WebParams, host_starts, doc_url

    p = WebParams(n_docs=1000, n_hosts=20, seed=42)
    starts = host_starts(p)
    urls = [str(u) for u in doc_url([0, 1, 0], p, starts)]  # dup → dedup test
    spec = PipelineSpec(
        urls=urls,
        extract_text=True,
        extract_links=True,
        extract_images=True,
        operations=[{"type": "deduplicate", "columns": ["url"]}],
    )
    out = str(tmp_path / "run")
    ds = run_pipeline(spec, t1_web, out, export_result=True)
    df = ds.to_pandas()
    assert len(df) == 2  # dup seed removed, first-wins
    assert {"url", "text", "n_links", "n_images", "timestamp"} <= set(df.columns)
    assert (df.ok).all()
    import os

    assert os.path.isdir(os.path.join(out, "out")) or os.path.isdir(
        os.path.join(out, "processed_data")
    )


def test_pipeline_pagination_chains(ray_session, t1_web, tmp_path):
    """Reference config.yaml `sites.pagination` consumed: each matching
    seed follows its next-link chain (first same-host link span) for up
    to max_pages total pages, emitted with page_index 1..k; non-matching
    seeds stay single-page."""
    from web_scraping_script_ray.pipelines.spec import PipelineSpec, run_pipeline
    from web_scraping_script_ray.synthweb import WebParams, host_starts, doc_url

    p = WebParams(n_docs=1000, n_hosts=20, seed=42)
    starts = host_starts(p)
    # seed 0 on h0000, seed 2 explicitly on another host's first doc
    other = int(starts[5])
    urls = [str(u) for u in doc_url([0, other], p, starts)]
    spec = PipelineSpec(
        urls=urls,
        extract_text=True,
        extract_links=True,
        sites={
            "h0": {
                "base_url": "http://h0000.example",
                "scraping_mode": "simple",
                "selectors": {"title": "h1.title"},  # parsed, carried
                "pagination": {"enabled": True, "selector": "a.next", "max_pages": 3},
                "login": {"required": False},
            }
        },
    )
    out = str(tmp_path / "pag")
    ds = run_pipeline(spec, t1_web, out, export_result=False)
    df = ds.to_pandas().sort_values("crawl_seq").reset_index(drop=True)
    base = df[df.page_index == 0]
    extra = df[df.page_index > 0]
    assert len(base) == 2
    # the h0000 seed paginated: up to 2 extra pages, all on h0000, distinct
    assert 1 <= len(extra) <= 2, extra.url.tolist()
    assert set(extra.page_index) <= {1, 2}
    assert all(u.startswith("http://h0000.example") for u in extra.url)
    assert len(set(extra.url) | set(base.url)) == len(extra) + len(base)
    assert (extra.ok).all()


def test_pipeline_spec_parses_reference_site_config(tmp_path):
    """A verbatim reference-format sites block round-trips from YAML."""
    from web_scraping_script_ray.pipelines.spec import PipelineSpec

    y = tmp_path / "config.yaml"
    y.write_text(
        """
sites:
  example_site:
    base_url: "https://example.com"
    scraping_mode: "simple"
    selectors:
      title: "h1.title"
    pagination:
      enabled: true
      selector: "a.next-page"
      max_pages: 5
    login:
      required: false
      login_url: ""
  youtube:
    base_url: "https://www.youtube.com"
    scraping_mode: "playwright"
    download:
      videos: true
      preferred_resolution: "720p"
"""
    )
    sites = PipelineSpec.load_site_config(str(y))
    assert set(sites) == {"example_site", "youtube"}
    assert sites["example_site"]["pagination"]["max_pages"] == 5
    assert sites["youtube"]["download"]["videos"] is True
