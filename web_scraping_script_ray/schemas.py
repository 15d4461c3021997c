"""Fixed Arrow schemas for every logical table in the engine.

The reference (``src/main.py``, ``src/storage.py``) builds dynamic Python
dicts per URL and lets each sink re-derive a schema per batch (schema drift,
SURVEY.md §1.1i).  Here every table is declared up front and all transforms
run over zero-copy ``pyarrow`` batches.
"""

from __future__ import annotations

import pyarrow as pa

# ---------------------------------------------------------------------------
# The synthetic web: interleaved text + media documents (BASELINE.json
# input_hint; span kinds mirror the reference's extraction classes,
# reference: src/media_downloader.py:326-340 and src/parser.py:68-85).
# ---------------------------------------------------------------------------

SPAN_KINDS = ("text", "image", "video", "audio", "iframe", "doc_link", "link")

SPAN_STRUCT = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),       # non-empty iff kind == 'text'
        ("media_ref", pa.string()),  # target URL iff kind != 'text'
        ("offset", pa.int32()),      # byte offset, strictly increasing per row
    ]
)

WEB_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),  # canonical URL
        ("spans", pa.list_(SPAN_STRUCT)),
    ]
)

# ---------------------------------------------------------------------------
# Crawl bookkeeping tables.
# ---------------------------------------------------------------------------

SEEDS_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("seed_rank", pa.int64()),  # 0-based position in the seed list
    ]
)

ROBOTS_SCHEMA = pa.schema(
    [
        ("host", pa.string()),
        ("disallow", pa.list_(pa.string())),  # path prefixes; empty = allow all
        ("crawl_delay", pa.float64()),        # seconds of virtual time
    ]
)

# Frontier candidates (one crawl round's input).  ``disc_primary`` /
# ``disc_secondary`` encode discovery order: round 0 → (seed_rank, 0);
# later rounds → (crawl_seq of discovering page, span index of the link).
FRONTIER_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("host", pa.string()),
        ("url_hash", pa.uint64()),
        ("depth", pa.int32()),
        ("disc_primary", pa.int64()),
        ("disc_secondary", pa.int64()),
        ("discovered_by", pa.string()),
        ("n_disc", pa.int64()),  # discoverers this round (priority signal)
    ]
)

# Crawled output: frontier columns + schedule + fetch result.
CRAWLED_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("host", pa.string()),
        ("url_hash", pa.uint64()),
        ("depth", pa.int32()),
        ("crawl_seq", pa.int64()),      # global deterministic crawl order
        ("round", pa.int32()),
        ("fetch_time", pa.float64()),   # virtual politeness clock time
        ("discovered_by", pa.string()),
        ("ok", pa.bool_()),
        ("nbytes", pa.int64()),
        ("spans", pa.list_(SPAN_STRUCT)),
        ("attempts", pa.int32()),       # fetch attempts consumed (retry)
    ]
)

METRICS_SCHEMA = pa.schema(
    [
        ("host", pa.string()),
        ("fetched", pa.int64()),
        ("errors", pa.int64()),
        ("bytes", pa.int64()),
    ]
)

SEEN_SCHEMA = pa.schema(
    [
        ("url_hash", pa.uint64()),
        ("url", pa.string()),
    ]
)

HOST_CLOCK_SCHEMA = pa.schema(
    [
        ("host", pa.string()),
        ("next_time", pa.float64()),
        ("fetched", pa.int64()),  # cumulative scheduled fetches (page cap)
    ]
)


def empty_table(schema: pa.Schema) -> pa.Table:
    return schema.empty_table()
