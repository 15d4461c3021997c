"""Seed-list sources (SURVEY.md §2.1 S1–S3) and table readers (S9).

- S1: pipeline spec (dict with ``urls``) → seeds Dataset, seed_rank =
  list position (reference: src/main.py:56-69);
- S2: URL file — one URL per line, blanks and ``#`` comments stripped
  (reference: src/cli.py:77-84);
- S3: single URL → 1-row seeds (reference: src/main.py:243-251);
- S9: reading back written tables is plain ``ray.data.read_parquet`` —
  the engine's resume path (pipelines/crawl.py) is the production use.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data

from ..schemas import SEEDS_SCHEMA


def seeds_from_urls(urls: list[str]) -> "ray.data.Dataset":
    """S1/S3: ordered URL list → seeds Dataset (seed_rank = position)."""
    t = pa.Table.from_arrays(
        [
            pa.array(list(urls), pa.string()),
            pa.array(range(len(urls)), pa.int64()),
        ],
        schema=SEEDS_SCHEMA,
    )
    return ray.data.from_arrow(t)


def parse_url_lines(batch: pa.Table) -> pa.Table:
    """S2 line filter: strip, drop blanks and '#' comments (vectorized)."""
    import pyarrow.compute as pc

    text = pc.utf8_trim_whitespace(batch.column("text"))
    keep = pc.and_(
        pc.greater(pc.utf8_length(text), 0),
        pc.invert(pc.starts_with(text, "#")),
    )
    return pa.Table.from_arrays([text.filter(keep)], names=["url"])


def seeds_from_file(path: str) -> "ray.data.Dataset":
    """S2: read_text → filter → ordered seeds.

    Note: seed_rank must reflect file order, so ranking pins a single
    global order via a driver-side pass — seed lists are small by
    definition (they bootstrap the crawl), so this is not a scale concern.
    """
    # one block: block order across a parallel read is not a contract,
    # and seed_rank must follow file order exactly
    ds = ray.data.read_text(path, override_num_blocks=1).map_batches(
        parse_url_lines, batch_format="pyarrow"
    )
    # streamed drain (one batch resident at a time) — bootstrap-sized
    # either way, but no at-once take_all of the whole file
    urls: list[str] = []
    for b in ds.iter_batches(batch_format="pyarrow"):
        urls.extend(b.column("url").to_pylist())
    return seeds_from_urls(urls)
