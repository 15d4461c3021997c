"""Site-specific extractors (SURVEY.md §2.3 M21–M23) as pure parse
functions routed by the ``host_kind`` column — data, not control flow
(the reference dispatches inside the Playwright scraper,
src/scraper.py:755-942).

- M21 YouTube watch/shorts extraction (reference: src/scraper.py:490-626):
  id/title/channel/views/description from the page's meta tags and the
  ``ytInitialData`` JSON blob — same signals the reference scrapes from
  the DOM, expressed as regex/meta parsing suitable for ``map_batches``.
- M22 thumbnail URL synthesis (reference: src/scraper.py:628-648): the
  five fixed ``img.youtube.com/vi/{id}/*.jpg`` variants.
- M23 SoundCloud track extraction (reference: src/scraper.py:650-743):
  title/artist/plays/likes/artwork from meta tags.
"""

from __future__ import annotations

import json
import re

import pyarrow as pa

from ..htmlparse import extract_metadata
from ..urlnorm import extract_soundcloud_id, extract_youtube_id, host_kind, host_of

THUMBNAIL_VARIANTS = (
    "maxresdefault.jpg",
    "sddefault.jpg",
    "hqdefault.jpg",
    "mqdefault.jpg",
    "default.jpg",
)


def youtube_thumbnail_urls(video_id: str) -> list[str]:
    """M22: the reference's five fixed thumbnail candidates, best-first
    (reference: src/scraper.py:628-648)."""
    return [
        f"https://img.youtube.com/vi/{video_id}/{variant}"
        for variant in THUMBNAIL_VARIANTS
    ]


_RE_YT_INITIAL_DATA = re.compile(r"var ytInitialData\s*=\s*(\{.*?\});", re.S)
_RE_VIEWS = re.compile(r"([\d,.]+)\s*views")


def extract_youtube_watch(html: str, url: str = "") -> dict:
    """M21: watch-page record — id, title, channel, views, description.

    Signal order mirrors the reference's fallback chain
    (src/scraper.py:490-626): structured meta tags first, then the
    ``ytInitialData`` blob, then visible-text patterns."""
    meta = extract_metadata(html or "")
    out = {
        "video_id": extract_youtube_id(url) or meta.get("videoId"),
        "title": meta.get("og:title") or meta.get("title"),
        "channel": meta.get("og:video:tag") or None,
        "views": None,
        "description": meta.get("og:description") or meta.get("description"),
    }
    m = _RE_YT_INITIAL_DATA.search(html or "")
    if m:
        try:
            data = json.loads(m.group(1))
            vd = (
                data.get("contents", {})
                .get("twoColumnWatchNextResults", {})
                .get("results", {})
            )
            out["_has_initial_data"] = True
            # owner/channel name commonly lives under videoOwnerRenderer
            blob = json.dumps(vd)
            cm = re.search(r'"ownerChannelName"\s*:\s*"([^"]+)"', blob) or re.search(
                r'"author"\s*:\s*"([^"]+)"', m.group(1)
            )
            if cm and not out["channel"]:
                out["channel"] = cm.group(1)
            vm = re.search(r'"viewCount"\s*:\s*"?(\d+)"?', m.group(1))
            if vm:
                out["views"] = int(vm.group(1))
        except (json.JSONDecodeError, ValueError):
            pass
    if out["views"] is None:
        vm = _RE_VIEWS.search(html or "")
        if vm:
            out["views"] = int(vm.group(1).replace(",", "").split(".")[0])
    return out


def extract_soundcloud_track(html: str, url: str = "") -> dict:
    """M23: track record — {url, title, artist, plays, likes, artwork_url}
    (reference record shape: src/scraper.py:697-704)."""
    meta = extract_metadata(html or "")
    title = meta.get("og:title") or meta.get("twitter:title") or meta.get("title")
    artist = None
    if title and " by " in title:
        title, artist = title.rsplit(" by ", 1)
    plays = meta.get("soundcloud:play_count")
    likes = meta.get("soundcloud:like_count")
    return {
        "url": url,
        "track_id": extract_soundcloud_id(url),
        "title": title,
        "artist": artist or meta.get("og:audio:artist"),
        "plays": int(plays) if plays and plays.isdigit() else None,
        "likes": int(likes) if likes and likes.isdigit() else None,
        "artwork_url": meta.get("og:image"),
    }


def site_extract_batch(batch: pa.Table, html_col: str = "html", url_col: str = "url") -> pa.Table:
    """Routed site extraction for ``map_batches``: adds ``host_kind`` and a
    ``site_data`` JSON column (youtube/soundcloud records; empty for
    generic hosts) — the reference's dispatch (src/scraper.py:755-942)
    expressed as a data column."""
    htmls = batch.column(html_col).to_pylist()
    urls = batch.column(url_col).to_pylist()
    kinds, blobs = [], []
    for html, url in zip(htmls, urls):
        kind = host_kind(host_of(url))
        kinds.append(kind)
        if kind == "youtube":
            blobs.append(json.dumps(extract_youtube_watch(html, url)))
        elif kind == "soundcloud":
            blobs.append(json.dumps(extract_soundcloud_track(html, url)))
        else:
            blobs.append("")
    batch = batch.append_column("host_kind", pa.array(kinds, pa.string()))
    return batch.append_column("site_data", pa.array(blobs, pa.string()))
