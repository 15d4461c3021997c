"""Fetch-backend and sink registries (SURVEY.md §2.10).

The reference exposes two factory surfaces: a scraper-backend registry
with fallback-to-simple (reference: src/scraper.py:39-57) and a storage
registry with fallback-to-CSV (reference: src/storage.py:14-30).  Here
both become small dict registries over engine components:

- fetch backends map a mode name to the callable used for the bucketed
  lookup join.  All sandbox modes resolve to the same synthetic-web
  lookup (the reference's five HTTP/browser backends differ only in HOW
  they talk to the network, which the sandbox replaces with the web
  table); the registry preserves the mode-selection surface so pipeline
  specs using ``scraper_mode: playwright`` etc. run unchanged.
- sinks map a format to a ``Dataset`` writer; parquet is the engine
  default (fixed Arrow schema — no CSV append drift, SURVEY.md §1.1i).
"""

from __future__ import annotations

import logging

logger = logging.getLogger(__name__)

# reference mode names (src/scraper.py:39-57)
FETCH_MODES = ("simple", "selenium", "scrapy", "pyppeteer", "playwright")


def get_fetcher(mode: str, web_dir: str):
    """→ per-bucket fetch callable for the requested mode; unknown modes
    fall back to 'simple' with a warning (reference behavior)."""
    from ..stages.fetch import make_bucket_fetcher

    if mode not in FETCH_MODES:
        logger.warning("unknown scraper mode %r — falling back to 'simple'", mode)
    return make_bucket_fetcher(web_dir)


def get_sink(fmt: str):
    """→ ``(ds, path) -> None`` writer; unknown formats fall back to
    parquet with a warning (reference falls back to CSV — parquet is this
    engine's schema-stable equivalent)."""
    import ray.data  # noqa: F401  (Dataset methods bound below)

    from .sqlite_sink import write_sqlite

    sinks = {
        "parquet": lambda ds, path: ds.write_parquet(path),
        "csv": lambda ds, path: ds.write_csv(path),
        "json": lambda ds, path: ds.write_json(path),
        # reference K4 storage backend (src/storage.py:90-150): single-file
        # driver-streamed SQLite; see sqlite_sink.write_sqlite_partitioned
        # for the per-block scale path
        "sqlite": lambda ds, path: write_sqlite(ds, path),
    }
    if fmt not in sinks:
        logger.warning("unknown sink format %r — falling back to parquet", fmt)
    return sinks.get(fmt, sinks["parquet"])


def get_loader(fmt: str):
    """→ ``(path) -> Dataset`` readback for each sink format (S9,
    reference src/storage.py load methods); unknown formats fall back to
    parquet with a warning, mirroring ``get_sink``."""
    from .loaders import load_csv, load_json, load_parquet
    from .sqlite_sink import read_sqlite

    loaders = {
        "parquet": load_parquet,
        "csv": load_csv,
        "json": load_json,
        "sqlite": read_sqlite,
    }
    if fmt not in loaders:
        logger.warning("unknown loader format %r — falling back to parquet", fmt)
    return loaders.get(fmt, loaders["parquet"])
