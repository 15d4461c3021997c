"""HTML parsing / extraction functions — reference parser semantics.

Re-implements the reference's per-record parse operators (SURVEY.md §2.3
M1–M14) as pure functions over raw HTML strings, suitable for vectorized
use inside ``map_batches``.  BeautifulSoup is not available here; the
implementations use ``html.parser`` + regexes but preserve the reference's
observable quirks:

- M1 ``parse_html``: selector projection with the 1-match→scalar squeeze
  and 0-match→None (reference: src/parser.py:10-39, 34-35);
- M3 ``extract_links``: ``javascript:`` skipped; *naive string-concat*
  relative resolution, NOT urljoin (reference: src/parser.py:71-80);
- M5 ``extract_images``: same naive resolution (reference: src/parser.py:126-157);
- M10 ``discover_media``: the six media regexes in category order
  images → videos → audio → iframes → doc-links (reference:
  src/media_downloader.py:326-340); ``html_to_spans`` re-expresses the
  same matches as one offset-ordered interleaved span array (the engine's
  document model, BASELINE.json input_hint);
- M12/M13 extension inference + media-type classification incl.
  unknown → 'other' (reference: src/media_downloader.py:48-123);
- M14 data-URL decode (reference: src/media_downloader.py:217-304).
"""

from __future__ import annotations

import base64
import hashlib
import json
import mimetypes
import re
from html.parser import HTMLParser
from urllib.parse import urljoin

# ---------------------------------------------------------------------------
# Extension lists (reference: src/config.yaml:16-52).
# ---------------------------------------------------------------------------

MEDIA_EXTENSIONS: dict[str, tuple[str, ...]] = {
    "images": (".jpg", ".jpeg", ".png", ".gif", ".bmp", ".webp", ".svg", ".ico"),
    "videos": (".mp4", ".webm", ".ogg", ".avi", ".mov", ".wmv", ".flv", ".mkv"),
    "audio": (".mp3", ".wav", ".aac", ".flac", ".m4a", ".wma"),
    "documents": (".pdf", ".doc", ".docx", ".xls", ".xlsx", ".ppt", ".pptx", ".txt"),
}

_ALL_MEDIA_EXT = tuple(e for exts in MEDIA_EXTENSIONS.values() for e in exts)

# The six discovery regexes (reference: src/media_downloader.py:326-340).
_RE_IMG = re.compile(r'<img[^>]+src=["\']([^"\']+)["\']', re.I)
_RE_VIDEO_SRC = re.compile(r'<video[^>]*>.*?<source[^>]+src=["\']([^"\']+)["\']', re.I | re.S)
_RE_VIDEO = re.compile(r'<video[^>]+src=["\']([^"\']+)["\']', re.I)
_RE_AUDIO_SRC = re.compile(r'<audio[^>]*>.*?<source[^>]+src=["\']([^"\']+)["\']', re.I | re.S)
_RE_AUDIO = re.compile(r'<audio[^>]+src=["\']([^"\']+)["\']', re.I)
_RE_IFRAME = re.compile(r'<iframe[^>]+src=["\']([^"\']+)["\']', re.I)
# quirk parity: the reference's <a href> media regex hardcodes ONLY these
# eight extensions (src/media_downloader.py:340) — NOT the full config.yaml
# list — so a page linking e.g. foo.docx yields no doc_link span
_RE_DOC_LINK = re.compile(
    r'<a[^>]+href=["\']([^"\']+\.(?:jpg|jpeg|png|gif|mp4|webm|mp3|pdf))["\']',
    re.I,
)
_RE_A_HREF = re.compile(r'<a\b[^>]*\bhref=["\']([^"\']*)["\'][^>]*>(.*?)</a>', re.I | re.S)
_RE_TAG = re.compile(r"<[^>]+>")
_WS = re.compile(r"\s+")


# ---------------------------------------------------------------------------
# M8 clean_text (reference: src/parser.py:209-226)
# ---------------------------------------------------------------------------

def clean_text(text: str) -> str:
    """Collapse all whitespace runs to single spaces and strip."""
    if not text:
        return ""
    return _WS.sub(" ", text).strip()


# ---------------------------------------------------------------------------
# M9 extract_by_regex (reference: src/parser.py:228-239)
# ---------------------------------------------------------------------------

def extract_by_regex(text: str, pattern: str) -> list[str]:
    return re.findall(pattern, text or "")


# ---------------------------------------------------------------------------
# M2 extract_text (reference: src/parser.py:41-52): visible text,
# space-separated, stripped; script/style contents excluded.
# ---------------------------------------------------------------------------

class _TextExtractor(HTMLParser):
    _SKIP = {"script", "style"}

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.parts: list[str] = []
        self._skip_depth = 0

    def handle_starttag(self, tag, attrs):
        if tag in self._SKIP:
            self._skip_depth += 1

    def handle_endtag(self, tag):
        if tag in self._SKIP and self._skip_depth:
            self._skip_depth -= 1

    def handle_data(self, data):
        if not self._skip_depth:
            s = data.strip()
            if s:
                self.parts.append(s)


def extract_text(html: str) -> str:
    p = _TextExtractor()
    p.feed(html or "")
    return clean_text(" ".join(p.parts))


# ---------------------------------------------------------------------------
# M3 extract_links (reference: src/parser.py:54-87) — the NAIVE resolution
# quirk is intentional parity: absolute kept; '/x' → base + href;
# other relative → base + '/' + href; 'javascript:' skipped.
# ---------------------------------------------------------------------------

def extract_links(html: str, base_url: str = "") -> list[dict]:
    out = []
    for m in _RE_A_HREF.finditer(html or ""):
        href, inner = m.group(1), m.group(2)
        if href.startswith("javascript:"):
            continue
        if href.startswith(("http://", "https://")):
            url = href
        elif href.startswith("/"):
            url = base_url + href
        else:
            url = base_url + "/" + href
        out.append({"url": url, "text": clean_text(_RE_TAG.sub(" ", inner))})
    return out


# ---------------------------------------------------------------------------
# M5 extract_images (reference: src/parser.py:126-157)
# ---------------------------------------------------------------------------

_RE_IMG_TAG = re.compile(r"<img\b[^>]*>", re.I)
_RE_ATTR = r'\b{name}=["\']([^"\']*)["\']'


def _attr(tag: str, name: str) -> str | None:
    m = re.search(_RE_ATTR.format(name=name), tag, re.I)
    return m.group(1) if m else None


def extract_images(html: str, base_url: str = "") -> list[dict]:
    out = []
    for m in _RE_IMG_TAG.finditer(html or ""):
        src = _attr(m.group(0), "src")
        if not src:
            continue
        if src.startswith(("http://", "https://", "data:")):
            url = src
        elif src.startswith("/"):
            url = base_url + src
        else:
            url = base_url + "/" + src
        out.append({"url": url, "alt": _attr(m.group(0), "alt") or ""})
    return out


# ---------------------------------------------------------------------------
# M6 extract_metadata (reference: src/parser.py:159-185)
# ---------------------------------------------------------------------------

_RE_TITLE = re.compile(r"<title[^>]*>(.*?)</title>", re.I | re.S)
_RE_META = re.compile(r"<meta\b[^>]*>", re.I)


def extract_metadata(html: str) -> dict[str, str]:
    meta: dict[str, str] = {}
    m = _RE_TITLE.search(html or "")
    if m:
        meta["title"] = clean_text(m.group(1))
    for t in _RE_META.finditer(html or ""):
        tag = t.group(0)
        key = _attr(tag, "name") or _attr(tag, "property")
        content = _attr(tag, "content")
        if key and content is not None:
            meta[key] = content
    return meta


# ---------------------------------------------------------------------------
# M7 extract_json_ld (reference: src/parser.py:187-207)
# ---------------------------------------------------------------------------

_RE_JSON_LD = re.compile(
    r'<script[^>]+type=["\']application/ld\+json["\'][^>]*>(.*?)</script>', re.I | re.S
)


def extract_json_ld(html: str) -> list:
    out = []
    for m in _RE_JSON_LD.finditer(html or ""):
        try:
            out.append(json.loads(m.group(1)))
        except (json.JSONDecodeError, ValueError):
            continue
    return out


# ---------------------------------------------------------------------------
# M4 extract_tables (reference: src/parser.py:89-124): header row (<th>)
# first, then data rows of cell strings.
# ---------------------------------------------------------------------------

_RE_TABLE = re.compile(r"<table\b.*?</table>", re.I | re.S)
_RE_TR = re.compile(r"<tr\b.*?</tr>", re.I | re.S)
_RE_CELL = re.compile(r"<(t[hd])\b[^>]*>(.*?)</\1>", re.I | re.S)


def extract_tables(html: str) -> list[list[list[str]]]:
    tables = []
    for tm in _RE_TABLE.finditer(html or ""):
        rows = []
        for rm in _RE_TR.finditer(tm.group(0)):
            cells = [clean_text(_RE_TAG.sub(" ", c.group(2))) for c in _RE_CELL.finditer(rm.group(0))]
            if cells:
                rows.append(cells)
        if rows:
            tables.append(rows)
    return tables


# ---------------------------------------------------------------------------
# M1 parse_html — selector projection with the 1-match→scalar squeeze
# (reference: src/parser.py:10-39).  Minimal selector subset: 'tag',
# '.class', '#id', 'tag.class', 'tag#id'.
# ---------------------------------------------------------------------------

class _SelectorExtractor(HTMLParser):
    def __init__(self, selectors: dict[str, str]):
        super().__init__(convert_charrefs=True)
        self.wanted = {k: _parse_selector(v) for k, v in selectors.items()}
        self.hits: dict[str, list[str]] = {k: [] for k in selectors}
        self._active: list[tuple[str, str]] = []  # (key, tag) stack entries

    def handle_starttag(self, tag, attrs):
        ad = dict(attrs)
        classes = set((ad.get("class") or "").split())
        for key, (stag, sclass, sid) in self.wanted.items():
            if stag and tag != stag:
                continue
            if sclass and sclass not in classes:
                continue
            if sid and ad.get("id") != sid:
                continue
            self._active.append((key, tag))
            self.hits[key].append("")

    def handle_endtag(self, tag):
        for i in range(len(self._active) - 1, -1, -1):
            if self._active[i][1] == tag:
                del self._active[i]
                break

    def handle_data(self, data):
        for key, _ in self._active:
            self.hits[key][-1] += data


def _parse_selector(sel: str) -> tuple[str | None, str | None, str | None]:
    sel = sel.strip()
    tag = cls = sid = None
    m = re.match(r"^([a-zA-Z][\w-]*)?(?:\.([\w-]+))?(?:#([\w-]+))?$", sel)
    if m:
        tag, cls, sid = m.group(1), m.group(2), m.group(3)
    return tag, cls, sid


def parse_html(html: str, selectors: dict[str, str] | None = None):
    """Selector projection: {key: selector} → {key: text | [texts] | None}.
    Exactly-one match → scalar; zero → None (reference: src/parser.py:34-35).
    Without selectors → full visible text (reference: src/parser.py:37-39).
    """
    if not selectors:
        return extract_text(html)
    p = _SelectorExtractor(selectors)
    p.feed(html or "")
    out = {}
    for key, vals in p.hits.items():
        vals = [clean_text(v) for v in vals if clean_text(v)]
        out[key] = None if not vals else (vals[0] if len(vals) == 1 else vals)
    return out


# ---------------------------------------------------------------------------
# M10 media discovery — category order (reference parity) AND offset order
# (the span model).
# ---------------------------------------------------------------------------

def discover_media(html: str, page_url: str = "") -> dict[str, list[str]]:
    """Category-ordered discovery exactly like the reference: images →
    videos → audio → iframes → doc-links, each category in ascending byte
    offset; absolute via RFC urljoin (reference: src/media_downloader.py:142)."""
    html = html or ""
    cats = {
        "images": [m.group(1) for m in _RE_IMG.finditer(html)],
        "videos": [m.group(1) for m in _RE_VIDEO_SRC.finditer(html)]
        + [m.group(1) for m in _RE_VIDEO.finditer(html)],
        "audio": [m.group(1) for m in _RE_AUDIO_SRC.finditer(html)]
        + [m.group(1) for m in _RE_AUDIO.finditer(html)],
        "iframes": [m.group(1) for m in _RE_IFRAME.finditer(html)],
        "documents": [m.group(1) for m in _RE_DOC_LINK.finditer(html)],
    }
    if page_url:
        cats = {k: [urljoin(page_url, u) for u in v] for k, v in cats.items()}
    return cats


_SPAN_PATTERNS = (
    ("image", _RE_IMG),
    ("video", _RE_VIDEO_SRC),
    ("video", _RE_VIDEO),
    ("audio", _RE_AUDIO_SRC),
    ("audio", _RE_AUDIO),
    ("iframe", _RE_IFRAME),
    ("doc_link", _RE_DOC_LINK),
)


def html_to_spans(html: str, page_url: str = "") -> list[dict]:
    """One interleaved, offset-ordered span array per document — the engine's
    document model (BASELINE.json input_hint).  Media matches come from the
    same regexes as ``discover_media``; page links (kind='link') from
    ``<a href>``; text segments are the visible text between matches."""
    html = html or ""
    marks: list[tuple[int, int, str, str]] = []  # (start, end, kind, ref)
    taken: list[tuple[int, int]] = []
    for kind, pat in _SPAN_PATTERNS:
        for m in pat.finditer(html):
            s, e = m.start(), m.end()
            if any(s < te and ts < e for ts, te in taken):
                continue  # e.g. <video><source> already matched
            taken.append((s, e))
            ref = urljoin(page_url, m.group(1)) if page_url else m.group(1)
            marks.append((s, e, kind, ref))
    for m in _RE_A_HREF.finditer(html):
        s, e = m.start(), m.end()
        if any(s < te and ts < e for ts, te in taken):
            continue
        href = m.group(1)
        if href.startswith("javascript:"):
            continue
        ref = urljoin(page_url, href) if page_url else href
        marks.append((s, e, "link", ref))
    marks.sort()
    spans: list[dict] = []
    cursor = 0
    for s, e, kind, ref in marks:
        txt = extract_text(html[cursor:s])
        if txt:
            spans.append({"kind": "text", "text": txt, "media_ref": "", "offset": cursor})
        spans.append({"kind": kind, "text": "", "media_ref": ref, "offset": s})
        cursor = e
    txt = extract_text(html[cursor:])
    if txt:
        spans.append({"kind": "text", "text": txt, "media_ref": "", "offset": cursor})
    return spans


# ---------------------------------------------------------------------------
# M12 extension inference (reference: src/media_downloader.py:48-83)
# ---------------------------------------------------------------------------

def get_extension(url: str, content_type: str | None = None) -> str | None:
    path = (url or "").split("?")[0].split("#")[0]
    dot = path.rfind(".")
    if dot != -1 and "/" not in path[dot:]:
        ext = path[dot:].lower()
        if ext in _ALL_MEDIA_EXT:
            return ext
    if content_type:
        guess = mimetypes.guess_extension(content_type.split(";")[0].strip())
        if guess:
            return ".jpg" if guess == ".jpe" else guess
    if "youtube" in (url or "") and "/vi/" in (url or ""):
        return ".jpg"  # reference special case (src/media_downloader.py:66-70)
    if content_type:
        klass = content_type.split("/")[0]
        return {"image": ".jpg", "video": ".mp4", "audio": ".mp3"}.get(klass)
    return None


# ---------------------------------------------------------------------------
# M13 media-type classification (reference: src/media_downloader.py:85-123):
# unknown extension → 'other' (the newer copy's behavior).
# ---------------------------------------------------------------------------

def get_media_type(ext: str | None) -> str:
    if ext:
        e = ext.lower()
        for mtype, exts in MEDIA_EXTENSIONS.items():
            if e in exts:
                return mtype
    return "other"


def is_valid_extension(ext: str | None) -> bool:
    return bool(ext) and ext.lower() in _ALL_MEDIA_EXT


# ---------------------------------------------------------------------------
# M14 data-URL decode (reference: src/media_downloader.py:217-304) and
# K6 content-hash naming (reference: src/media_downloader.py:181-188).
# ---------------------------------------------------------------------------

_RE_DATA_URL = re.compile(r"^data:([^;,]+)?(;base64)?,(.*)$", re.S)


def decode_data_url(data_url: str) -> tuple[bytes, str] | None:
    """→ (payload bytes, mime type) or None if malformed."""
    m = _RE_DATA_URL.match(data_url or "")
    if not m:
        return None
    mime = m.group(1) or "text/plain"
    payload = m.group(3)
    try:
        data = base64.b64decode(payload) if m.group(2) else payload.encode("utf-8")
    except (ValueError, Exception):
        return None
    return data, mime


def content_hash_name(content: bytes, ext: str) -> str:
    """md5-of-bytes filename → identical bytes collapse to one file
    (exact content dedup, reference: src/media_downloader.py:181-188)."""
    return hashlib.md5(content).hexdigest()[:10] + ext
