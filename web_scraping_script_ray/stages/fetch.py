"""Fetch stage: URL → document body, as a bucketed lookup join.

The reference's fetch is an HTTP GET with a per-instance session
(reference: src/scraper.py:137-181, session state src/scraper.py:112-121).
In this engine "fetching" a URL is a keyed lookup into the synthetic-web
table (SURVEY.md §7.0); the *shape* is the production one: a stateful
``map_batches`` actor pool whose per-actor ``__init__`` cost (session /
browser / dataset handles) is amortized across batches — the actor-pool
answer to the reference rebuilding scrapers per URL (src/cli.py:133).

The web table is laid out as ``web/bucket=k/`` with
``k = url_hash(doc_id) % n_buckets``, so a batch of frontier URLs touches
only its buckets and each bucket read is a predicate-pushdown parquet scan
(``doc_id ∈ batch``).  At 100 TB the same layout makes this a Lance
take-by-key; the frontier batch is always the small side — no shuffle.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads

from ..schemas import WEB_SCHEMA
from ..urlnorm import url_hash64


class WebFetcher:
    """Actor-pool callable: adds ``ok``, ``nbytes``, ``spans`` to frontier
    batches by looking up ``url`` in the bucketed web table."""

    def __init__(self, web_dir: str, n_buckets: int):
        # once per actor: open one pyarrow dataset handle per bucket
        self.n_buckets = n_buckets
        self.buckets = {
            b: pads.dataset(os.path.join(web_dir, "web", f"bucket={b}"))
            for b in range(n_buckets)
            if os.path.isdir(os.path.join(web_dir, "web", f"bucket={b}"))
        }

    def lookup(self, urls: list[str], hashes: np.ndarray) -> dict[str, list]:
        """url -> spans for the found subset."""
        bucket_ids = (np.asarray(hashes, dtype=np.uint64) % np.uint64(self.n_buckets)).astype(int)
        found: dict[str, list] = {}
        for b in np.unique(bucket_ids):
            dset = self.buckets.get(int(b))
            if dset is None:
                continue
            want = [urls[i] for i in np.where(bucket_ids == b)[0]]
            t = dset.to_table(filter=pc.field("doc_id").isin(want))
            for u, s in zip(t.column("doc_id").to_pylist(), t.column("spans").to_pylist()):
                found[u] = s
        return found

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        hashes = batch.column("url_hash").to_numpy(zero_copy_only=False)
        found = self.lookup(urls, hashes)
        span_type = WEB_SCHEMA.field("spans").type
        ok = np.array([u in found for u in urls], dtype=bool)
        spans = [found.get(u, []) for u in urls]
        nbytes = np.array(
            [sum(len(s["text"]) + len(s["media_ref"]) for s in sp) for sp in spans],
            dtype=np.int64,
        )
        batch = batch.append_column("ok", pa.array(ok))
        batch = batch.append_column("nbytes", pa.array(nbytes, pa.int64()))
        batch = batch.append_column("spans", pa.array(spans, span_type))
        return batch


def lookup_one(web_dir: str, n_buckets: int, url: str) -> list | None:
    """Single-URL convenience lookup (tests / debugging)."""
    f = WebFetcher(web_dir, n_buckets)
    return f.lookup([url], np.array([url_hash64(url)], np.uint64)).get(url)
