"""URL canonicalization, hashing and classification (the M11/M15/M16/M17
operators from SURVEY.md §2.3).

These are *spec-level pure functions*: both the sequential oracle
(``oracle.py``) and the distributed engine import the same definitions, so
parity tests exercise the distributed orchestration (ordering, dedup,
politeness, resume), not string munging.

Reference behavior being unified (SURVEY.md §1.1c): the reference resolves
relative URLs two different ways — RFC-3986 ``urljoin`` on the media path
(reference: src/media_downloader.py:142) and naive string concatenation on
the link path (reference: src/parser.py:76-80).  The crawl canonicalizer
uses ``urljoin`` everywhere; the naive-concat quirk is preserved verbatim in
``htmlparse.extract_links`` for HTML-function parity.
"""

from __future__ import annotations

import hashlib
import re
from urllib.parse import urljoin, urlsplit, urlunsplit

# Reference URL-validity regex (reference: src/web_interface.py:153).
URL_VALID_RE = re.compile(r"^https?://[^\s/$.?#].[^\s]*$")

# Vectorized fast-path detector (one RE2 pass via pyarrow.compute
# ``extract_regex``): absolute http URLs that are ALREADY canonical —
# lowercase host, no userinfo/port/query/fragment, path of printable ASCII
# only (\x21-\x7e minus '?' '#'; RE2's \s is ASCII-only, so Unicode
# whitespace that ``canonicalize()`` would strip must fall back too).
# ``canonicalize()`` is the identity on exactly this set (tested against
# adversarial URLs in test_urlnorm) and the ``h`` group equals
# ``host_of()``.  Shared by the link-expansion stage (stages/spans.py) and
# the seed loader (pipelines/crawl.py); rows that do not match fall back to
# the exact per-row function.
FAST_CANONICAL_RE = (
    r"^http://(?P<h>[a-z0-9.\-]+)(?P<p>/[\x21\x22\x24-\x3e\x40-\x7e]*)$"
)

_DEFAULT_PORTS = {"http": "80", "https": "443"}


def canonicalize(url: str, base_url: str | None = None) -> str | None:
    """Canonical form: resolve against base, lowercase scheme+host, strip
    fragment and default port, '' path → '/'.  Returns None for URLs the
    crawler cannot fetch (javascript:, mailto:, data:, malformed).
    """
    if url is None:
        return None
    url = url.strip()
    if not url:
        return None
    low = url.lower()
    if low.startswith(("javascript:", "mailto:", "data:", "#")):
        return None
    if base_url:
        url = urljoin(base_url, url)
    try:
        parts = urlsplit(url)
    except ValueError:
        return None
    scheme = parts.scheme.lower()
    if scheme not in ("http", "https"):
        return None
    host = parts.hostname
    if not host:
        return None
    host = host.lower()
    if parts.port is not None and str(parts.port) != _DEFAULT_PORTS.get(scheme):
        netloc = f"{host}:{parts.port}"
    else:
        netloc = host
    path = parts.path or "/"
    return urlunsplit((scheme, netloc, path, parts.query, ""))


def host_of(url: str) -> str:
    try:
        return (urlsplit(url).hostname or "").lower()
    except ValueError:
        return ""


def path_of(url: str) -> str:
    try:
        return urlsplit(url).path or "/"
    except ValueError:
        return "/"


def url_hash64(url: str) -> int:
    """Stable 64-bit hash of the canonical URL — the cuckoo-filter /
    dedup / partitioning key.  blake2b-8 is stable across processes and
    Python versions (unlike ``hash()``); at cluster scale swap in xxhash64
    — the contract is only "stable uint64".
    """
    return int.from_bytes(
        hashlib.blake2b(url.encode("utf-8"), digest_size=8).digest(), "big"
    )


def url_hashes(urls) -> list[int]:
    """Batched helper (one C-level blake2b call per URL; cheap relative to
    fetch/parse; swap for a vectorized xxhash at cluster scale)."""
    frm = int.from_bytes
    b2b = hashlib.blake2b
    return [frm(b2b(u.encode("utf-8"), digest_size=8).digest(), "big") for u in urls]


def is_valid_url(url: str) -> bool:
    """Reference validity filter M17 (reference: src/web_interface.py:153)."""
    return bool(URL_VALID_RE.match(url or ""))


# ---------------------------------------------------------------------------
# Site-id extraction (M15) — URL-format dispatch, pure per-row functions.
# ---------------------------------------------------------------------------

def extract_youtube_id(url: str) -> str | None:
    """YouTube video-id extraction (reference: src/youtube_downloader.py:32-56):
    handles youtu.be/<id>, /watch?v=<id>, /embed/<id>, /shorts/<id>."""
    if not url:
        return None
    if "youtu.be/" in url:
        return url.split("youtu.be/")[1].split("?")[0].split("/")[0] or None
    if "watch?v=" in url:
        return url.split("watch?v=")[1].split("&")[0] or None
    for marker in ("/embed/", "/shorts/"):
        if marker in url:
            return url.split(marker)[1].split("?")[0].split("/")[0] or None
    return None


def extract_soundcloud_id(url: str) -> str | None:
    """SoundCloud track-id extraction (reference:
    src/soundcloud_downloader.py:34-71): '<artist>/<track>' path, skipping
    /sets/, profile and discover pages."""
    if not url or "soundcloud.com" not in url:
        return None
    path = path_of(url).strip("/")
    parts = [p for p in path.split("/") if p]
    if len(parts) != 2 or parts[1] in ("sets", "tracks", "popular-tracks"):
        return None
    if parts[0] in ("discover", "search", "you", "stream"):
        return None
    return f"{parts[0]}/{parts[1]}"


def host_kind(host: str) -> str:
    """Site-dispatch routing column replacing the reference's control flow
    (reference: src/scraper.py:755-942): youtube | soundcloud | generic."""
    if "youtube.com" in host or "youtu.be" in host:
        return "youtube"
    if "soundcloud.com" in host:
        return "soundcloud"
    return "generic"
