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
import ray

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
        return append_fetch_columns(batch, self.lookup(urls, hashes))


def lookup_one(web_dir: str, n_buckets: int, url: str) -> list | None:
    """Single-URL convenience lookup (tests / debugging)."""
    f = WebFetcher(web_dir, n_buckets)
    return f.lookup([url], np.array([url_hash64(url)], np.uint64)).get(url)


def append_fetch_columns(batch: pa.Table, found: dict[str, list]) -> pa.Table:
    """Shared result assembly: frontier batch + url→spans lookup results →
    ``ok`` / ``nbytes`` / ``spans`` columns."""
    urls = batch.column("url").to_pylist()
    span_type = WEB_SCHEMA.field("spans").type
    ok = np.array([u in found for u in urls], dtype=bool)
    spans = [found.get(u, []) for u in urls]
    nbytes = np.array(
        [sum(len(s["text"]) + len(s["media_ref"]) for s in sp) for sp in spans],
        dtype=np.int64,
    )
    batch = batch.append_column("ok", pa.array(ok))
    batch = batch.append_column("nbytes", pa.array(nbytes, pa.int64()))
    return batch.append_column("spans", pa.array(spans, span_type))


# per-worker decoded-bucket cache: a crawl touches every bucket every
# round, and parquet decode was re-paid each time.  Worker processes
# persist across rounds, so a small FIFO of decoded bucket tables turns
# round 2+ reads into an index_in over in-memory Arrow.  Oversized
# buckets (beyond what a 1-CPU task should pin) bypass the cache — at
# 100 TB the bucket store is Lance take-by-key, not a RAM cache.
_BUCKET_CACHE: dict[tuple[str, int], pa.Table] = {}
_BUCKET_CACHE_ORDER: list[tuple[str, int]] = []
_BUCKET_CACHE_TOTAL_BYTES = 512 << 20  # per-worker TOTAL budget
_BUCKET_CACHE_BYTES = [0]


# per-worker flaky-table cache (url_hash → fails, hash-sorted): the
# synthetic stand-in for network transience, tiny (O(p_flaky · n_docs))
# and immutable, so one decode per worker serves every round
_FLAKY_CACHE: dict[str, "tuple[np.ndarray, np.ndarray] | None"] = {}


def _load_flaky(web_dir: str):
    if web_dir in _FLAKY_CACHE:
        return _FLAKY_CACHE[web_dir]
    path = os.path.join(web_dir, "flaky.parquet")
    out = None
    if os.path.exists(path):
        t = pads.dataset(path).to_table()
        h = t.column("url_hash").to_numpy(zero_copy_only=False).astype(np.uint64)
        f = t.column("fails").to_numpy(zero_copy_only=False).astype(np.int32)
        order = np.argsort(h)
        out = (h[order], f[order])
    _FLAKY_CACHE[web_dir] = out
    return out


def _fails_of(web_dir: str, hashes: np.ndarray) -> np.ndarray:
    """Per-row first-attempt failure count (0 = healthy) from the flaky
    table, via one searchsorted over the hash-sorted index."""
    fl = _load_flaky(web_dir)
    n = len(hashes)
    if fl is None or n == 0 or len(fl[0]) == 0:
        return np.zeros(n, np.int32)
    fh, ff = fl
    pos = np.searchsorted(fh, hashes)
    pos = np.minimum(pos, len(fh) - 1)
    hit = fh[pos] == hashes
    out = np.zeros(n, np.int32)
    out[hit] = ff[pos[hit]]
    return out


# per-worker etag-shard cache (conditional-GET refresh model): the prior
# crawl's (url_hash → content fingerprint) store, bucketed exactly like
# the web table, so a refresh round's bucket task reads only its own
# shard — at 100 TB this is the doc store's own fingerprint column read
# back as a Lance take-by-key, never a broadcast.
_ETAG_CACHE: dict[tuple[str, int], "tuple[np.ndarray, np.ndarray] | None"] = {}


def _load_etags(etag_dir: str, bucket: int):
    key = (etag_dir, bucket)
    if key in _ETAG_CACHE:
        return _ETAG_CACHE[key]
    path = os.path.join(etag_dir, f"bucket={bucket}")
    out = None
    if os.path.isdir(path):
        t = pads.dataset(path).to_table()
        h = t.column("url_hash").to_numpy(zero_copy_only=False).astype(np.uint64)
        e = t.column("etag").to_numpy(zero_copy_only=False).astype(np.uint64)
        order = np.argsort(h)
        out = (h[order], e[order])
    _ETAG_CACHE[key] = out
    return out


def _load_bucket(web_dir: str, bucket: int) -> pa.Table | None:
    key = (web_dir, bucket)
    t = _BUCKET_CACHE.get(key)
    if t is not None:
        return t
    path = os.path.join(web_dir, "web", f"bucket={bucket}")
    if not os.path.isdir(path):
        return None
    t = pads.dataset(path).to_table()
    # bound the TOTAL cache footprint per worker, not just per table —
    # evict FIFO until the new entry fits; tables larger than half the
    # budget bypass the cache entirely
    if t.nbytes <= _BUCKET_CACHE_TOTAL_BYTES // 2:
        while (
            _BUCKET_CACHE_ORDER
            and _BUCKET_CACHE_BYTES[0] + t.nbytes > _BUCKET_CACHE_TOTAL_BYTES
        ):
            old = _BUCKET_CACHE_ORDER.pop(0)
            dropped = _BUCKET_CACHE.pop(old, None)
            if dropped is not None:
                _BUCKET_CACHE_BYTES[0] -= dropped.nbytes
        _BUCKET_CACHE[key] = t
        _BUCKET_CACHE_ORDER.append(key)
        _BUCKET_CACHE_BYTES[0] += t.nbytes
    return t


def fetch_rows_in_bucket(
    web_dir: str,
    bucket: int,
    group: pa.Table,
    max_nbytes: int | None = None,
    max_retries: int = 0,
    etag_dir: str | None = None,
) -> pa.Table:
    """Lookup-join ``group`` (frontier rows whose url_hash maps to
    ``bucket``) against that ONE web bucket; appends ok/nbytes/spans.

    The span payloads never round-trip through Python: lookup is
    ``pc.index_in`` + Arrow ``take``; misses become empty span lists via
    offset surgery; ``nbytes`` is a vectorized utf8-length reduction.
    At 100 TB the scan becomes a Lance take-by-key on the bucket.

    ``max_nbytes`` models the reference's ``max_file_size`` guard
    (reference: src/media_downloader.py:156-159 content-length pre-check
    and :174-179 mid-download abort): documents over the cap come back
    ``ok=False`` with empty spans — their size is known (recorded in
    ``nbytes``) but their content is rejected, exactly like an aborted
    download."""
    span_type = WEB_SCHEMA.field("spans").type
    n = group.num_rows
    urls = group.column("url")
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    t = None
    if n:
        bucket_tbl = _load_bucket(web_dir, bucket)
        if bucket_tbl is not None:
            sel = pc.index_in(bucket_tbl.column("doc_id"), value_set=urls)
            t = bucket_tbl.filter(pc.is_valid(sel))
    if t is None or t.num_rows == 0:
        group = group.append_column("ok", pa.array(np.zeros(n, dtype=bool)))
        group = group.append_column("nbytes", pa.array(np.zeros(n, np.int64), pa.int64()))
        empty = pa.ListArray.from_arrays(
            pa.array(np.zeros(n + 1, np.int32), pa.int32()),
            pa.array([], span_type.value_type),
        )
        group = group.append_column("spans", empty)
        # every row is a miss: with retries on, each consumed all attempts
        att = np.full(n, max_retries if max_retries > 0 else 1, np.int32)
        group = group.append_column("attempts", pa.array(att, pa.int32()))
        if etag_dir is not None:
            group = group.append_column(
                "not_modified", pa.array(np.zeros(n, dtype=bool))
            )
        return group

    idx = pc.index_in(urls, value_set=t.column("doc_id").combine_chunks())
    ok_np = pc.is_valid(idx).to_numpy(zero_copy_only=False)
    spans_src = t.column("spans")
    if isinstance(spans_src, pa.ChunkedArray):
        spans_src = spans_src.combine_chunks()
    # rows that hit, in group order -> flat child values
    taken_ok = spans_src.take(idx.filter(pc.is_valid(idx)))
    flat = pc.list_flatten(taken_ok)
    lengths = np.zeros(n, dtype=np.int64)
    lengths[ok_np] = pc.list_value_length(taken_ok).to_numpy(zero_copy_only=False)
    offsets = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(lengths, out=offsets[1:])
    spans_out = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), flat)
    # nbytes = sum chars(text) + chars(media_ref) per row (vectorized)
    span_chars = (
        pc.utf8_length(pc.struct_field(flat, "text")).to_numpy(zero_copy_only=False)
        + pc.utf8_length(pc.struct_field(flat, "media_ref")).to_numpy(zero_copy_only=False)
    ).astype(np.int64)
    nbytes = np.zeros(n, dtype=np.int64)
    parents = pc.list_parent_indices(spans_out).to_numpy(zero_copy_only=False)
    np.add.at(nbytes, parents, span_chars)
    # transient-failure model (reference: tenacity @retry on fetch,
    # src/scraper.py:137): a flaky doc fails its first ``fails`` attempts.
    # With retries on, fails < max_retries recovers (ok, attempts=fails+1);
    # fails >= max_retries exhausts the budget (content dropped).  With
    # retries off the first failed attempt is final.  Misses (404s) burn
    # every attempt — tenacity retries exceptions indiscriminately.
    attempts = np.ones(n, np.int32)
    drop = np.zeros(n, dtype=bool)
    hashes = group.column("url_hash").to_numpy(zero_copy_only=False).astype(np.uint64)
    fails = _fails_of(web_dir, hashes)
    flaky = (fails > 0) & ok_np
    if max_retries > 0:
        attempts[~ok_np] = max_retries
        recovered = flaky & (fails < max_retries)
        attempts[recovered] = fails[recovered] + 1
        exhausted = flaky & (fails >= max_retries)
        attempts[exhausted] = max_retries
        drop |= exhausted
    else:
        drop |= flaky
    if drop.any():
        # failed fetch: content never arrived
        nbytes = np.where(drop, 0, nbytes)
    strip = drop.copy()
    if max_nbytes is not None:
        # over-size rows keep their (known) nbytes but lose content —
        # the mid-download abort, never retried (a deliberate rejection,
        # not an exception; reference src/media_downloader.py:174-179)
        over = nbytes > max_nbytes
        strip |= over
        ok_np = ok_np & ~over
    ok_np = ok_np & ~drop
    if strip.any():
        flat = flat.filter(pa.array(~strip[parents]))
        kept = np.where(strip, 0, lengths)
        offsets = np.zeros(n + 1, dtype=np.int32)
        np.cumsum(kept, out=offsets[1:])
        spans_out = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), flat)
    nm = None
    if etag_dir is not None:
        # conditional GET (HTTP 304 semantics, the refresh-crawl model):
        # a row whose NEW content fingerprint equals the prior crawl's
        # etag is "not modified" — the fetch still spent its politeness
        # slot (the server was contacted) but the body never transfers:
        # spans drop, nbytes goes 0, ok stays True.  Changed / brand-new
        # rows carry full content (200), misses stay ok=False (404/410).
        nm = np.zeros(n, dtype=bool)
        et = _load_etags(etag_dir, bucket)
        if et is not None and len(et[0]) and ok_np.any():
            from ..functions.hashing import span_content_hashes

            ch = span_content_hashes(spans_out)
            pos = np.searchsorted(et[0], hashes)
            pos = np.minimum(pos, len(et[0]) - 1)
            found = et[0][pos] == hashes
            nm = ok_np & found & (ch == et[1][pos])
        if nm.any():
            parents2 = pc.list_parent_indices(spans_out).to_numpy(zero_copy_only=False)
            flat2 = pc.list_flatten(spans_out).filter(pa.array(~nm[parents2]))
            lens2 = pc.list_value_length(spans_out).to_numpy(zero_copy_only=False)
            lens2 = np.where(nm, 0, lens2)
            offs2 = np.zeros(n + 1, dtype=np.int32)
            np.cumsum(lens2, out=offs2[1:])
            spans_out = pa.ListArray.from_arrays(pa.array(offs2, pa.int32()), flat2)
            nbytes = np.where(nm, 0, nbytes)
    group = group.append_column("ok", pa.array(ok_np))
    group = group.append_column("nbytes", pa.array(nbytes, pa.int64()))
    group = group.append_column("spans", spans_out)
    group = group.append_column("attempts", pa.array(attempts, pa.int32()))
    if nm is not None:
        group = group.append_column("not_modified", pa.array(nm))
    return group


def make_bucket_fetcher(
    web_dir: str,
    max_nbytes: int | None = None,
    max_retries: int = 0,
    etag_dir: str | None = None,
):
    """Per-bucket lookup join for ``groupby('bucket').map_groups`` — the
    PARTITION fetch path (used when a round is too large to broadcast):
    the frontier is hash-partitioned by ``url_hash % n_buckets`` so each
    web bucket is scanned exactly once per round; the web table itself
    never shuffles."""

    def fetch_group(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return group
        b = int(group.column("bucket")[0].as_py())
        return fetch_rows_in_bucket(
            web_dir, b, group.drop_columns(["bucket"]), max_nbytes, max_retries,
            etag_dir,
        )

    return fetch_group


def _bucket_rows(block_refs: list, bucket: int, n_buckets: int) -> pa.Table:
    """Select this bucket's frontier rows: filter each shared block before
    concatenating, so a task materializes only ~1/n_buckets of the frontier
    instead of a full copy per bucket."""
    pieces = []
    for b in ray.get(list(block_refs)):
        if b.num_rows == 0:
            continue
        h = b.column("url_hash").to_numpy(zero_copy_only=False).astype(np.uint64)
        mask = (h % np.uint64(n_buckets)).astype(np.int64) == bucket
        if mask.any():
            pieces.append(b.filter(pa.array(mask)))
    if not pieces:
        from ..schemas import FRONTIER_SCHEMA

        t = FRONTIER_SCHEMA.empty_table()
        t = t.append_column("fetch_time", pa.array([], pa.float64()))
        return t.append_column("crawl_seq", pa.array([], pa.int64()))
    return pa.concat_tables(pieces).combine_chunks()


@ray.remote
def fetch_bucket_broadcast(
    web_dir: str, bucket: int, n_buckets: int, block_refs: list, parse: bool = False
) -> pa.Table:
    """BROADCAST fetch path: one task per bucket; the whole (light)
    scheduled frontier is shared via the object store (zero-copy on-node),
    each task masks out its bucket's rows and scans only its bucket — no
    shuffle at all.  Right whenever the round frontier fits the object
    store comfortably (<= a few million rows); beyond that the engine
    switches to the partition path (make_bucket_fetcher)."""
    group = _bucket_rows(block_refs, bucket, n_buckets)
    out = fetch_rows_in_bucket(web_dir, bucket, group)
    if parse:
        # fetched-AND-parsed in one task: the per-worker parser singleton
        # amortizes setup across rounds with no actor-pool ramp-up
        from .parse import get_parser

        out = get_parser().append_parse_columns(out)
    return out


@ray.remote(num_returns=2)
def crawl_bucket_task(
    web_dir: str,
    bucket: int,
    n_buckets: int,
    block_refs: list,
    rnd: int,
    parse: bool,
    crawled_dir: str,
    parsed_dir: str | None,
    frontier_dir: str | None,
    max_nbytes: int | None = None,
    max_retries: int = 0,
    pen_table: list | None = None,
    etag_dir: str | None = None,
    sink_compression: str | None = None,
):
    """Fused per-bucket round superstage: fetch (bucketed lookup join) +
    parse + parquet sinks (crawled/parsed/frontier partitions) + metrics
    partials + link expansion, in ONE raw task.

    Fusing the five consumers collapses per-round driver coordination
    from three extra Dataset executions (hundreds of task completions
    the driver must schedule under the GIL — a fixed, non-scaling cost)
    to just these n_buckets tasks.  Returns (frontier_table_for_bucket,
    meta) where meta carries n_next and the per-host metric partials.
    Output files are per-bucket partitions → a failed run resumes by
    round manifest, never re-writing finished rounds."""
    import time as _time

    import pyarrow.parquet as _pq

    from ..schemas import CRAWLED_SCHEMA
    from .spans import expand_links

    _t0 = _time.time()
    _tt: dict = {}
    _sub = os.environ.get("GRAFT_BUCKET_TRACE", "") == "1"

    def _mark(name):
        if _sub:
            now = _time.time()
            _tt[name] = round(now - (_mark.last if hasattr(_mark, "last") else _t0), 3)
            _mark.last = now

    group = _bucket_rows(block_refs, bucket, n_buckets)
    _mark("bucket_rows")
    out = fetch_rows_in_bucket(
        web_dir, bucket, group, max_nbytes, max_retries, etag_dir
    )
    _mark("fetch")
    out = out.append_column(
        "round", pa.array(np.full(out.num_rows, rnd, dtype=np.int32))
    )
    keep = list(CRAWLED_SCHEMA.names)
    if etag_dir is not None:
        keep.append("not_modified")
    crawled = out.select(keep)
    _pq_kw = {"compression": sink_compression} if sink_compression else {}
    if out.num_rows:
        _pq.write_table(
            crawled,
            os.path.join(crawled_dir, f"part-{bucket:05d}.parquet"),
            **_pq_kw,
        )
    _mark("write_crawled")
    if parse and out.num_rows:
        from .parse import PARSE_COLUMNS, get_parser

        parsed = get_parser().append_parse_columns(crawled).select(
            ["url", "crawl_seq", "round", *PARSE_COLUMNS]
        )
        _mark("parse")
        if parsed_dir is not None:
            _pq.write_table(
                parsed,
                os.path.join(parsed_dir, f"part-{bucket:05d}.parquet"),
                **_pq_kw,
            )
        _mark("write_parsed")

    # per-host metric partials (host, fetched, errors, bytes) + retry
    # backoff penalties (host, seconds of virtual wait to charge the clock)
    mets: list = []
    pens: list = []
    if out.num_rows:
        hosts = np.asarray(out.column("host").to_pylist(), dtype=object)
        okc = out.column("ok").to_numpy(zero_copy_only=False)
        nb = out.column("nbytes").to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(hosts, return_inverse=True)
        f = np.zeros(len(uniq), np.int64)
        e = np.zeros(len(uniq), np.int64)
        by = np.zeros(len(uniq), np.int64)
        np.add.at(f, inv, okc.astype(np.int64))
        np.add.at(e, inv, (~okc).astype(np.int64))
        np.add.at(by, inv, nb * okc.astype(np.int64))
        mets = list(zip(uniq.tolist(), f.tolist(), e.tolist(), by.tolist()))
        if max_retries > 0 and pen_table is not None:
            att = out.column("attempts").to_numpy(zero_copy_only=False)
            row_pen = np.asarray(pen_table, np.int64)[att - 1]
            p = np.zeros(len(uniq), np.int64)
            np.add.at(p, inv, row_pen)
            pens = [(h, int(v)) for h, v in zip(uniq.tolist(), p.tolist()) if v > 0]

    if frontier_dir is None:
        # budget exhausted or depth cap reached — expanding links the
        # engine will never fetch is pure waste
        from ..schemas import FRONTIER_SCHEMA

        return FRONTIER_SCHEMA.empty_table(), {
            "n_next": 0,
            "metrics": mets,
            "pen": pens,
            "n_rows": out.num_rows,
            "wall": _time.time() - _t0,
        }
    _mark("metrics")
    frontier = expand_links(crawled)
    _mark("expand")
    if frontier.num_rows:
        _pq.write_table(
            frontier, os.path.join(frontier_dir, f"part-{bucket:05d}.parquet")
        )
    _mark("write_frontier")
    meta = {
        "n_next": frontier.num_rows,
        "metrics": mets,
        "pen": pens,
        "n_rows": out.num_rows,
        "wall": _time.time() - _t0,
    }
    if _sub:
        meta["sub"] = _tt
    return frontier, meta
