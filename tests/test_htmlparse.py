from web_scraping_script_ray.htmlparse import (
    clean_text,
    content_hash_name,
    decode_data_url,
    discover_media,
    extract_by_regex,
    extract_images,
    extract_json_ld,
    extract_links,
    extract_metadata,
    extract_tables,
    extract_text,
    get_extension,
    get_media_type,
    html_to_spans,
    is_valid_extension,
    parse_html,
)

HTML = """
<html><head><title> My  Page </title>
<meta name="description" content="desc here">
<meta property="og:title" content="OG">
<script type="application/ld+json">{"@type": "Thing", "name": "x"}</script>
<style>.x{color:red}</style>
</head><body>
<h1 class="headline">Hello   World</h1>
<p>Some  text</p>
<script>var x = 1;</script>
<a href="http://other.com/page">Other</a>
<a href="/abs">Abs</a>
<a href="rel.html">Rel</a>
<a href="javascript:void(0)">JS</a>
<img src="/img/a.png" alt="pic A">
<img src="http://cdn.example/b.jpg">
<video><source src="/v/movie.mp4"></video>
<audio src="/a/song.mp3"></audio>
<iframe src="http://embed.example/f"></iframe>
<a href="/files/report.pdf">Report</a>
<table><tr><th>H1</th><th>H2</th></tr><tr><td>a</td><td>b</td></tr></table>
</body></html>
"""


def test_clean_text():
    # reference: src/parser.py:209-226
    assert clean_text("  a \t b\n\nc ") == "a b c"
    assert clean_text("") == ""


def test_extract_text_skips_script_style():
    txt = extract_text(HTML)
    assert "Hello World" in txt
    assert "var x" not in txt
    assert "color:red" not in txt
    assert "  " not in txt


def test_extract_links_naive_resolution():
    # reference quirk: string concat, not urljoin (src/parser.py:76-80)
    links = extract_links(HTML, base_url="http://base.example")
    urls = [l["url"] for l in links]
    assert "http://other.com/page" in urls
    assert "http://base.example/abs" in urls
    assert "http://base.example/rel.html" in urls
    assert not any("javascript" in u for u in urls)
    assert links[0]["text"] == "Other"


def test_extract_images():
    imgs = extract_images(HTML, base_url="http://base.example")
    assert {"url": "http://base.example/img/a.png", "alt": "pic A"} in imgs
    assert {"url": "http://cdn.example/b.jpg", "alt": ""} in imgs


def test_extract_metadata():
    meta = extract_metadata(HTML)
    assert meta["title"] == "My Page"
    assert meta["description"] == "desc here"
    assert meta["og:title"] == "OG"


def test_extract_json_ld():
    out = extract_json_ld(HTML)
    assert out == [{"@type": "Thing", "name": "x"}]


def test_extract_tables():
    tables = extract_tables(HTML)
    assert tables == [[["H1", "H2"], ["a", "b"]]]


def test_parse_html_scalar_squeeze():
    # reference: src/parser.py:34-35 — 1 match → scalar, 0 → None
    out = parse_html(HTML, {"h": "h1.headline", "missing": ".nope", "links": "a"})
    assert out["h"] == "Hello World"
    assert out["missing"] is None
    assert isinstance(out["links"], list) and len(out["links"]) >= 3


def test_parse_html_no_selectors_gives_text():
    assert "Hello World" in parse_html(HTML)


def test_discover_media_category_order():
    # reference: src/media_downloader.py:326-340
    media = discover_media(HTML, page_url="http://base.example/p")
    assert media["images"] == ["http://base.example/img/a.png", "http://cdn.example/b.jpg"]
    assert media["videos"] == ["http://base.example/v/movie.mp4"]
    assert media["audio"] == ["http://base.example/a/song.mp3"]
    assert media["iframes"] == ["http://embed.example/f"]
    assert media["documents"] == ["http://base.example/files/report.pdf"]


def test_html_to_spans_interleaved_offsets():
    spans = html_to_spans(HTML, page_url="http://base.example/p")
    offsets = [s["offset"] for s in spans]
    assert offsets == sorted(offsets)
    kinds = [s["kind"] for s in spans]
    assert "text" in kinds and "image" in kinds and "link" in kinds
    for s in spans:
        if s["kind"] == "text":
            assert s["text"] and not s["media_ref"]
        else:
            assert s["media_ref"] and not s["text"]
    # media refs resolved
    img = next(s for s in spans if s["kind"] == "image")
    assert img["media_ref"] == "http://base.example/img/a.png"
    # document order: h1 text precedes the first image span
    first_text = next(s for s in spans if s["kind"] == "text")
    assert "Hello World" in first_text["text"] or "My Page" in first_text["text"]


def test_extension_inference():
    # reference: src/media_downloader.py:48-83
    assert get_extension("http://x/a.PNG?q=1") == ".png"
    assert get_extension("http://x/a", "image/jpeg") == ".jpg"
    assert get_extension("http://img.youtube.com/vi/abc/0") == ".jpg"
    assert get_extension("http://x/a", "video/other-unknown") == ".mp4"
    assert get_extension("http://x/noext") is None


def test_media_type_classify():
    # unknown → 'other' (reference: src/media_downloader.py:105-123)
    assert get_media_type(".jpg") == "images"
    assert get_media_type(".mp4") == "videos"
    assert get_media_type(".pdf") == "documents"
    assert get_media_type(".xyz") == "other"
    assert get_media_type(None) == "other"
    assert is_valid_extension(".mp3")
    assert not is_valid_extension(".xyz")


def test_data_url_decode():
    # reference: src/media_downloader.py:217-304
    data, mime = decode_data_url("data:image/png;base64,aGVsbG8=")
    assert data == b"hello" and mime == "image/png"
    data, mime = decode_data_url("data:,plain")
    assert data == b"plain"
    assert decode_data_url("nope") is None


def test_content_hash_name():
    # reference: src/media_downloader.py:181-188
    n = content_hash_name(b"hello", ".png")
    assert n.endswith(".png") and len(n) == 14
    assert n == content_hash_name(b"hello", ".png")


def test_extract_by_regex():
    assert extract_by_regex("a1 b2", r"[a-z](\d)") == ["1", "2"]
