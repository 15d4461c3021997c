from web_scraping_script_ray.urlnorm import (
    canonicalize,
    extract_soundcloud_id,
    extract_youtube_id,
    host_kind,
    host_of,
    is_valid_url,
    path_of,
    url_hash64,
    url_hashes,
)


def test_canonicalize_basic():
    assert canonicalize("HTTP://Example.COM/a#frag") == "http://example.com/a"
    assert canonicalize("http://example.com") == "http://example.com/"
    assert canonicalize("https://example.com:443/x") == "https://example.com/x"
    assert canonicalize("http://example.com:8080/x") == "http://example.com:8080/x"
    assert canonicalize("http://example.com/a?b=1#c") == "http://example.com/a?b=1"


def test_canonicalize_relative():
    base = "http://example.com/dir/page.html"
    assert canonicalize("/abs", base) == "http://example.com/abs"
    assert canonicalize("rel", base) == "http://example.com/dir/rel"
    assert canonicalize("http://other.com/x", base) == "http://other.com/x"


def test_canonicalize_rejects():
    assert canonicalize("javascript:void(0)") is None
    assert canonicalize("mailto:a@b.c") is None
    assert canonicalize("data:text/plain,hi") is None
    assert canonicalize("ftp://example.com/f") is None
    assert canonicalize("") is None
    assert canonicalize(None) is None


def test_hash_stable_and_batched():
    h = url_hash64("http://example.com/")
    assert h == url_hash64("http://example.com/")
    assert 0 <= h < 2**64
    assert url_hashes(["http://example.com/", "http://x.com/"]) == [
        url_hash64("http://example.com/"),
        url_hash64("http://x.com/"),
    ]


def test_host_path():
    assert host_of("http://ExAmple.com:8080/a/b") == "example.com"
    assert path_of("http://example.com") == "/"
    assert path_of("http://example.com/a/b?q=1") == "/a/b"


def test_valid_url_reference_regex():
    # reference: src/web_interface.py:153
    assert is_valid_url("http://example.com/page")
    assert is_valid_url("https://a.b/c d") is False  # whitespace
    assert is_valid_url("notaurl") is False


def test_youtube_id():
    # reference: src/youtube_downloader.py:32-56
    assert extract_youtube_id("https://youtu.be/abc123") == "abc123"
    assert extract_youtube_id("https://www.youtube.com/watch?v=xyz&t=1") == "xyz"
    assert extract_youtube_id("https://www.youtube.com/embed/qqq?x=1") == "qqq"
    assert extract_youtube_id("https://www.youtube.com/shorts/sss") == "sss"
    assert extract_youtube_id("https://example.com/") is None


def test_soundcloud_id():
    # reference: src/soundcloud_downloader.py:34-71
    assert extract_soundcloud_id("https://soundcloud.com/artist/track") == "artist/track"
    assert extract_soundcloud_id("https://soundcloud.com/artist/sets") is None
    assert extract_soundcloud_id("https://soundcloud.com/discover/x") is None
    assert extract_soundcloud_id("https://example.com/a/b") is None


def test_host_kind():
    assert host_kind("www.youtube.com") == "youtube"
    assert host_kind("soundcloud.com") == "soundcloud"
    assert host_kind("example.com") == "generic"
