"""Refresh (re)crawl: conditional-GET revisits + corpus maintenance.

The reference script has no freshness story — rerunning it refetches and
rewrites everything (reference: src/main.py:79 seed loop, src/storage.py
append-only sinks).  At 100 TB that is the difference between a nightly
job and an impossible one, so the engine makes refresh a first-class
pipeline over the SAME politeness/seen/schedule machinery:

1. **Revisit seeds** = the prior crawl's URL list in crawl_seq order —
   streamed from its own parquet (never driver-resident), exactly like
   round-0 seeds.
2. **Etag store** = (url_hash → content fingerprint) of the prior
   corpus, bucketed by ``url_hash % n_buckets`` like the web table, so a
   refresh bucket task reads ONLY its own shard (at 100 TB this is the
   doc store's fingerprint column read back as a Lance take-by-key —
   never a broadcast, never a shuffle).
3. **Conditional GET** (stages/fetch.py etag hook): an unchanged page
   costs its politeness slot but transfers no body (ok=True, nbytes=0,
   spans=[], not_modified=True) and expands no links; changed pages
   return full content; vanished pages come back ok=False.  New URLs
   enter ONLY through changed pages' links — the refresh naturally
   crawls the delta frontier.
4. **Corpus merge**: per-bucket carry tasks produce the refreshed
   snapshot — new content for changed/new pages, prior bytes carried
   for 304s, tombstones for gone pages — so downstream dedup/training
   pipelines always see one consistent table.

Sequential twin: ``oracle.run_oracle(web2, budget, seeds=..., etags=...)``
(tests/test_crawl_refresh.py pins engine == oracle on both schedule
plans).
"""

from __future__ import annotations

import glob
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray

from ..functions.hashing import span_content_hashes
from ..synthweb import Budget
from .crawl import CrawlEngine

# status codes of the refresh diff (snapshot_diff's crawl-native form)
STATUSES = ("unchanged", "changed", "new", "gone", "error")


def _crawled_files(out_dir: str, bucket: int | None = None) -> list[str]:
    pat = (
        f"part-{bucket:05d}.parquet" if bucket is not None else "part-*.parquet"
    )
    return sorted(glob.glob(os.path.join(out_dir, "crawled", "round-*", pat)))


def build_refresh_inputs(prior_out_dir: str, dest_dir: str, n_buckets: int) -> dict:
    """From a finished crawl's output, derive the two refresh inputs:

    - ``seeds.parquet`` dir: (url, seed_rank = prior crawl_seq) — ALL
      previously crawled URLs re-enter (errors retry; the engine's
      first-wins dedup keeps the earliest rank per URL).
    - ``etags/bucket=k/``: (url_hash, etag) for every ok page with
      content — the conditional-GET reference store.

    Both are map_batches streams over the prior crawled parquet; nothing
    lands on the driver."""
    files = _crawled_files(prior_out_dir)
    if not files:
        raise ValueError(f"no crawled output under {prior_out_dir}")
    seeds_dir = os.path.join(dest_dir, "seeds.parquet")
    etag_dir = os.path.join(dest_dir, "etags")
    ds = ray.data.read_parquet(files)

    def to_seed(b: pa.Table) -> pa.Table:
        return pa.table(
            {"url": b.column("url"), "seed_rank": b.column("crawl_seq")}
        )

    ds.map_batches(to_seed, batch_format="pyarrow").write_parquet(seeds_dir)

    def to_etag(b: pa.Table) -> pa.Table:
        ok = b.column("ok").to_numpy(zero_copy_only=False)
        has = pc.list_value_length(b.column("spans")).to_numpy(
            zero_copy_only=False
        ) > 0
        t = b.filter(pa.array(ok & has))
        uh = t.column("url_hash").to_numpy(zero_copy_only=False).astype(np.uint64)
        return pa.table(
            {
                "url_hash": pa.array(uh, pa.uint64()),
                "etag": pa.array(span_content_hashes(t.column("spans")), pa.uint64()),
                "bucket": pa.array(
                    (uh % np.uint64(n_buckets)).astype(np.int64), pa.int64()
                ),
            }
        )

    ds.map_batches(to_etag, batch_format="pyarrow").write_parquet(
        etag_dir, partition_cols=["bucket"]
    )
    return {"seeds_path": seeds_dir, "etag_dir": etag_dir}


def build_refresh_inputs_from_corpus(
    corpus_dir: str, dest_dir: str, n_buckets: int, order: str = "url"
) -> dict:
    """Corpus-mode refresh inputs — the CHAINED maintenance loop: a
    refreshed snapshot (``materialize_corpus`` output: url, url_hash,
    spans, src) is itself the prior for the next epoch's refresh.
    Seeds rank by a deterministic total order; etags fingerprint the
    corpus spans directly.

    ``order``:
    - ``"url"``: plain URL sort (the oracle twin is one line).
    - ``"change_first"``: pages that CHANGED last epoch (src =
      'refetched') rank before carried/stale pages, URL-sorted within
      each class — change-frequency-aware revisit scheduling (Cho &
      Garcia-Molina freshness ordering): under a truncating budget the
      crawler spends its politeness slots where content actually moves,
      and within each host's run the likely-changed pages fetch first."""
    from ..stages.rank import zip_with_index

    seeds_dir = os.path.join(dest_dir, "seeds.parquet")
    etag_dir = os.path.join(dest_dir, "etags")
    ds = ray.data.read_parquet(corpus_dir)
    if order == "change_first":

        def keyed(b: pa.Table) -> pa.Table:
            changed = pc.equal(b.column("src"), pa.scalar("refetched"))
            cls = pc.if_else(changed, pa.scalar(0), pa.scalar(1)).cast(pa.int64())
            return pa.table({"__cls": cls, "url": b.column("url")})

        seeds, _ = zip_with_index(
            ds.map_batches(keyed, batch_format="pyarrow"),
            ["__cls", "url"],
            col="seed_rank",
        )
        seeds = seeds.drop_columns(["__cls"])
    else:
        seeds, _ = zip_with_index(
            ds.select_columns(["url"]), ["url"], col="seed_rank"
        )
    seeds.write_parquet(seeds_dir)

    def to_etag(b: pa.Table) -> pa.Table:
        uh = b.column("url_hash").to_numpy(zero_copy_only=False).astype(np.uint64)
        return pa.table(
            {
                "url_hash": pa.array(uh, pa.uint64()),
                "etag": pa.array(span_content_hashes(b.column("spans")), pa.uint64()),
                "bucket": pa.array(
                    (uh % np.uint64(n_buckets)).astype(np.int64), pa.int64()
                ),
            }
        )

    ds.map_batches(to_etag, batch_format="pyarrow").write_parquet(
        etag_dir, partition_cols=["bucket"]
    )
    return {"seeds_path": seeds_dir, "etag_dir": etag_dir}


def refresh_crawl(
    web_dir: str,
    prior_out_dir: str,
    out_dir: str,
    budget: Budget | None = None,
    seed_order: str = "url",
    resume: bool = False,
    **engine_kw,
) -> tuple[CrawlEngine, dict]:
    """Run a refresh epoch: revisit every previously crawled URL against
    (a possibly mutated) ``web_dir`` with conditional-GET semantics, and
    crawl whatever NEW frontier changed pages expose — all through the
    standard engine (politeness, robots, seen-set, budgets, checkpoints
    and both schedule plans apply unchanged).  ``prior_out_dir`` may be
    a crawl output (has ``crawled/``) or a materialized corpus snapshot
    — refreshes chain either way; ``seed_order`` picks the corpus-mode
    revisit ranking ("url" or change-history-aware "change_first")."""
    with open(os.path.join(web_dir, "params.json")) as f:
        n_buckets = json.load(f)["n_buckets"]
    dest = os.path.join(out_dir, "refresh_inputs")
    if resume and os.path.isdir(os.path.join(dest, "etags")):
        # the derivation is deterministic, but write_parquet into a
        # non-empty dir would APPEND a second copy — a resumed run reuses
        # the inputs it checkpointed, exactly like the round manifests
        inputs = {
            "seeds_path": os.path.join(dest, "seeds.parquet"),
            "etag_dir": os.path.join(dest, "etags"),
        }
    elif os.path.isdir(os.path.join(prior_out_dir, "crawled")):
        inputs = build_refresh_inputs(prior_out_dir, dest, n_buckets)
    else:
        inputs = build_refresh_inputs_from_corpus(
            prior_out_dir, dest, n_buckets, order=seed_order
        )
    # A refresh's round 0 is the WORST-CASE frontier — every previously
    # crawled URL at once — so the schedule-plan crossover sits far below
    # the discovery crawl's default (one 7.5M-row revisit round measured
    # 51.8k URLs/s distributed vs 39.7k on the single-task small path;
    # BASELINE.md session-6).  Default the switch lower; callers override.
    engine_kw.setdefault("schedule_small_limit", 2_000_000)
    eng = CrawlEngine(
        web_dir,
        out_dir,
        budget,
        seeds_path=inputs["seeds_path"],
        etag_dir=inputs["etag_dir"],
        **engine_kw,
    )
    info = eng.run(resume=resume)
    info["refresh_inputs"] = inputs
    return eng, info


def classify_statuses(refresh_out_dir: str, etag_dir: str) -> "ray.data.Dataset":
    """(url, url_hash, status) per refreshed row — the crawl-native
    snapshot diff.  ``status``: unchanged (304) / changed (200, prior
    etag exists) / new (200, never seen before) / gone (fetch miss on a
    previously-held page) / error (miss on a page we never held — e.g. a
    dangling link discovered this epoch).  Prior membership resolves
    against the bucketed etag store via the same per-worker shard cache
    the fetch path uses — no broadcast, no shuffle."""
    from ..stages.fetch import _load_etags

    files = _crawled_files(refresh_out_dir)
    ds = ray.data.read_parquet(files)

    def add_status(b: pa.Table) -> pa.Table:
        n = b.num_rows
        uh = b.column("url_hash").to_numpy(zero_copy_only=False).astype(np.uint64)
        ok = b.column("ok").to_numpy(zero_copy_only=False)
        nm = b.column("not_modified").to_numpy(zero_copy_only=False)
        # prior-membership probe, bucket-sharded (shard count from layout)
        prior = np.zeros(n, dtype=bool)
        shards = sorted(glob.glob(os.path.join(etag_dir, "bucket=*")))
        n_buckets = len(shards)
        if n_buckets:
            bids = (uh % np.uint64(n_buckets)).astype(np.int64)
            for bid in np.unique(bids):
                et = _load_etags(etag_dir, int(bid))
                if et is None or not len(et[0]):
                    continue
                sel = bids == bid
                pos = np.searchsorted(et[0], uh[sel])
                pos = np.minimum(pos, len(et[0]) - 1)
                prior[sel] = et[0][pos] == uh[sel]
        status = np.where(
            nm,
            "unchanged",
            np.where(
                ok,
                np.where(prior, "changed", "new"),
                np.where(prior, "gone", "error"),
            ),
        )
        return pa.table(
            {
                "url": b.column("url"),
                "url_hash": b.column("url_hash"),
                "status": pa.array(status.tolist(), pa.string()),
            }
        )

    return ds.map_batches(add_status, batch_format="pyarrow")


@ray.remote
def _merge_bucket_task(
    prior_out_dir: str, refresh_out_dir: str, bucket: int, dest_dir: str
) -> dict:
    """Per-bucket corpus merge: latest content per URL.  Reads only this
    bucket's part files from both crawls (the crawled sink is already
    bucket-partitioned) — the merge never shuffles and each task's
    working set is one bucket."""
    from ..schemas import WEB_SCHEMA

    def load(out_dir: str) -> pa.Table | None:
        files = _crawled_files(out_dir, bucket)
        if not files:
            # corpus-mode prior (chained refresh): flat bucket part files,
            # every row live — synthesize the ok column the merge keys on
            cf = os.path.join(out_dir, f"part-{bucket:05d}.parquet")
            if not os.path.exists(cf):
                return None
            t = pq.read_table(cf)
            return t.append_column(
                "ok", pa.array(np.ones(t.num_rows, dtype=bool))
            )
        return pa.concat_tables([pq.read_table(f) for f in files], promote_options="permissive")

    prior = load(prior_out_dir)
    new = load(refresh_out_dir)
    span_type = WEB_SCHEMA.field("spans").type

    def with_src(t: pa.Table, src: str) -> pa.Table:
        return pa.table(
            {
                "url": t.column("url"),
                "url_hash": t.column("url_hash"),
                "spans": t.column("spans").combine_chunks()
                if isinstance(t.column("spans"), pa.ChunkedArray)
                else t.column("spans"),
                "src": pa.array([src] * t.num_rows, pa.string()),
            }
        )

    pieces: list[pa.Table] = []
    counts = {"carried": 0, "refetched": 0, "stale": 0}
    prior_ok = None
    if prior is not None:
        prior_ok = prior.filter(prior.column("ok"))
    if new is not None:
        nok = new.column("ok").to_numpy(zero_copy_only=False)
        nnm = (
            new.column("not_modified").to_numpy(zero_copy_only=False)
            if "not_modified" in new.column_names
            else np.zeros(new.num_rows, dtype=bool)
        )
        # 200s: changed or brand-new pages carry their fresh content;
        # !ok rows (gone / error) tombstone out of the merge entirely
        refetched = new.filter(pa.array(nok & ~nnm))
        pieces.append(with_src(refetched, "refetched"))
        counts["refetched"] = refetched.num_rows
        # 304s: body never transferred — carry the prior crawl's bytes
        nm_rows = new.filter(pa.array(nnm))
        if nm_rows.num_rows and prior_ok is not None and prior_ok.num_rows:
            idx = pc.index_in(
                nm_rows.column("url_hash").combine_chunks(),
                value_set=prior_ok.column("url_hash").combine_chunks(),
            )
            hit = pc.is_valid(idx)
            nm_rows = nm_rows.filter(hit)
            carried_spans = (
                prior_ok.column("spans").combine_chunks().take(idx.filter(hit))
            )
            t = pa.table(
                {
                    "url": nm_rows.column("url"),
                    "url_hash": nm_rows.column("url_hash"),
                    "spans": carried_spans,
                    "src": pa.array(["carried"] * nm_rows.num_rows, pa.string()),
                }
            )
            pieces.append(t)
            counts["carried"] = t.num_rows
    # stale carry: prior ok pages the refresh never revisited (budget cut)
    if prior_ok is not None and prior_ok.num_rows:
        if new is not None and new.num_rows:
            seen = pc.is_in(
                prior_ok.column("url_hash").combine_chunks(),
                value_set=new.column("url_hash").combine_chunks(),
            )
            stale = prior_ok.filter(pc.invert(seen))
        else:
            stale = prior_ok
        pieces.append(with_src(stale, "stale"))
        counts["stale"] = stale.num_rows
    if pieces:
        t = pa.concat_tables(pieces, promote_options="none")
    else:
        t = pa.table(
            {
                "url": pa.array([], pa.string()),
                "url_hash": pa.array([], pa.uint64()),
                "spans": pa.array([], span_type),
                "src": pa.array([], pa.string()),
            }
        )
    if t.num_rows:
        pq.write_table(t, os.path.join(dest_dir, f"part-{bucket:05d}.parquet"))
    return {"bucket": bucket, "rows": t.num_rows, **counts}


def materialize_corpus(
    prior_out_dir: str,
    refresh_out_dir: str,
    dest_dir: str,
    n_buckets: int,
) -> dict:
    """Merge the prior corpus with a refresh crawl into one refreshed
    snapshot at ``dest_dir`` (url, spans, src ∈ carried/refetched/stale),
    one parquet per bucket — resumable partition layout.  At 100 TB the
    same merge is a Lance row-level upsert keyed by url_hash; here the
    per-bucket carry task IS that upsert, bucket-local by construction."""
    os.makedirs(dest_dir, exist_ok=True)
    metas = ray.get(
        [
            _merge_bucket_task.remote(prior_out_dir, refresh_out_dir, b, dest_dir)
            for b in range(n_buckets)
        ]
    )
    return {
        "rows": sum(m["rows"] for m in metas),
        "carried": sum(m["carried"] for m in metas),
        "refetched": sum(m["refetched"] for m in metas),
        "stale": sum(m["stale"] for m in metas),
    }


def _write_status_shards(
    statuses: "ray.data.Dataset", dest_dir: str, n_buckets: int
) -> None:
    """(url_hash, status) bucketed like the etag store, so downstream
    probes read only their shard."""

    def add_bucket(b: pa.Table) -> pa.Table:
        uh = b.column("url_hash").to_numpy(zero_copy_only=False).astype(np.uint64)
        return pa.table(
            {
                "url_hash": pa.array(uh, pa.uint64()),
                "status": b.column("status"),
                "bucket": pa.array(
                    (uh % np.uint64(n_buckets)).astype(np.int64), pa.int64()
                ),
            }
        )

    statuses.map_batches(add_bucket, batch_format="pyarrow").write_parquet(
        dest_dir, partition_cols=["bucket"]
    )


_STATUS_CACHE: dict[tuple[str, int], "tuple[np.ndarray, np.ndarray] | None"] = {}
_STATUS_CODE = {"unchanged": 0, "changed": 1, "new": 2, "gone": 3, "error": 4}


def _load_statuses(status_dir: str, bucket: int):
    import pyarrow.dataset as pads

    key = (status_dir, bucket)
    if key in _STATUS_CACHE:
        return _STATUS_CACHE[key]
    path = os.path.join(status_dir, f"bucket={bucket}")
    out = None
    if os.path.isdir(path):
        t = pads.dataset(path).to_table()
        h = t.column("url_hash").to_numpy(zero_copy_only=False).astype(np.uint64)
        s = np.array(
            [_STATUS_CODE[x] for x in t.column("status").to_pylist()], np.int8
        )
        order = np.argsort(h)
        out = (h[order], s[order])
    _STATUS_CACHE[key] = out
    return out


def _status_of(status_dir: str, n_buckets: int, uh: np.ndarray) -> np.ndarray:
    """Vectorized status-code lookup (-1 = not revisited, i.e. stale)."""
    out = np.full(len(uh), -1, np.int8)
    bids = (uh % np.uint64(n_buckets)).astype(np.int64)
    for bid in np.unique(bids):
        sh = _load_statuses(status_dir, int(bid))
        if sh is None or not len(sh[0]):
            continue
        sel = bids == bid
        pos = np.searchsorted(sh[0], uh[sel])
        pos = np.minimum(pos, len(sh[0]) - 1)
        hit = sh[0][pos] == uh[sel]
        vals = np.full(int(sel.sum()), -1, np.int8)
        vals[hit] = sh[1][pos[hit]]
        out[sel] = vals
    return out


# refresh rows get crawl_seq offset into a disjoint range so the two
# epochs' sequence keys (dedup order, shard hashing) can never collide
_REFRESH_SEQ_OFFSET = 1 << 40


def refresh_training_set(
    prior_out_dir: str,
    refresh_out_dir: str,
    etag_dir: str,
    export_dir: str,
    min_quality: float = 0.0,
    langs: list[str] | None = None,
    n_shards: int = 16,
    shuffle_seed: int | None = None,
) -> dict:
    """INCREMENTAL dataset maintenance — the composition a 100-TB corpus
    actually needs after a refresh: rebuild the training export without
    re-parsing the unchanged 90+%.

    The updated parsed view routes rows by refresh status (bucketed
    status shards, per-worker cached — no broadcast):

    - prior parsed rows carry over where the page was unchanged (304) or
      never revisited (stale); changed/gone/error rows drop out;
    - refresh parsed rows enter where the fetch returned new content
      (changed or brand-new pages); 304/miss rows drop (their parse
      columns are empty — the body never transferred);
    - refresh rows take a disjoint crawl_seq range (epoch offset) so
      dedup order and shard membership stay collision-free.

    Then the standard filter → SimHash first-wins dedup → hash-sharded
    export runs over the union (same knobs as ``build_training_set``)."""
    from ..stages.rank import dedup_first_wins
    from ..urlnorm import url_hash64
    from .postprocess import export_shards

    with_statuses = os.path.join(refresh_out_dir, "status_shards")
    n_buckets = len(glob.glob(os.path.join(etag_dir, "bucket=*"))) or 16
    if not os.path.isdir(with_statuses):
        _write_status_shards(
            classify_statuses(refresh_out_dir, etag_dir), with_statuses, n_buckets
        )

    def route(keep_codes: tuple, seq_offset: int):
        def fn(b: pa.Table) -> pa.Table:
            uh = np.fromiter(
                (url_hash64(u) for u in b.column("url").to_pylist()),
                np.uint64,
                count=b.num_rows,
            )
            st = _status_of(with_statuses, n_buckets, uh)
            mask = np.isin(st, keep_codes)
            t = b.filter(pa.array(mask))
            if seq_offset and t.num_rows:
                seq = t.column("crawl_seq").to_numpy(zero_copy_only=False)
                t = t.set_column(
                    t.column_names.index("crawl_seq"),
                    "crawl_seq",
                    pa.array(seq + seq_offset, pa.int64()),
                )
            return t

        return fn

    carried = ray.data.read_parquet(
        os.path.join(prior_out_dir, "parsed")
    ).map_batches(route((_STATUS_CODE["unchanged"], -1), 0), batch_format="pyarrow")
    fresh = ray.data.read_parquet(
        os.path.join(refresh_out_dir, "parsed")
    ).map_batches(
        route((_STATUS_CODE["changed"], _STATUS_CODE["new"]), _REFRESH_SEQ_OFFSET),
        batch_format="pyarrow",
    )
    ds = carried.union(fresh)

    def keep(batch: pa.Table) -> pa.Table:
        mask = pc.greater_equal(batch.column("quality"), min_quality)
        if langs is not None:
            mask = pc.and_(
                mask, pc.is_in(batch.column("lang_pred"), value_set=pa.array(langs))
            )
        return batch.filter(mask)

    filtered = ds.map_batches(keep, batch_format="pyarrow")
    deduped = dedup_first_wins(filtered, "simhash", ["crawl_seq"])
    manifest = export_shards(
        deduped,
        export_dir,
        n_shards=n_shards,
        key_col="crawl_seq",
        resume=False,
        shuffle_seed=shuffle_seed,
    )
    return {
        "kept_rows": manifest["rows"],
        "manifest": dict(manifest),
    }


# ---------------------------------------------------------------------------
# Persisted near-dup signature index: incremental MinHash maintenance.
# ---------------------------------------------------------------------------
#
# The parse stage computes every page's MinHash signature exactly once
# (stages/parse.py "sig" column); this index persists those signatures
# beside the etag store so a refresh epoch maintains near-dup state
# WITHOUT re-running LSH over the unchanged corpus majority:
#   epoch 1: build_neardup_index projects (url, url_hash, crawl_seq,
#            sig) off the parsed shards — nothing recomputed;
#   epoch N: update_neardup_index carries unchanged/stale rows VERBATIM
#            (neither function ever constructs a MinHasher), admits
#            changed/new rows with the signatures the refresh parse
#            already produced, and drops superseded/gone rows;
#   probing: refresh_neardup_pairs derives band keys from the stored
#            signatures (a cheap deterministic mix, not a re-signing)
#            and runs functions.dedup.probe_neardup_pairs — one coarse
#            band-row exchange, pair work proportional to the epoch's
#            changed/new slice.


def _sig_index_rows(
    parsed: "ray.data.Dataset", n_buckets: int, seq_offset: int = 0
) -> "ray.data.Dataset":
    from ..urlnorm import url_hash64

    def fn(b: pa.Table) -> pa.Table:
        uh = np.fromiter(
            (url_hash64(u) for u in b.column("url").to_pylist()),
            np.uint64,
            count=b.num_rows,
        )
        seq = (
            b.column("crawl_seq").to_numpy(zero_copy_only=False).astype(np.int64)
        )
        return pa.table(
            {
                "url": b.column("url"),
                "url_hash": pa.array(uh, pa.uint64()),
                "crawl_seq": pa.array(seq + seq_offset, pa.int64()),
                "sig": b.column("sig"),
                "bucket": pa.array(
                    (uh % np.uint64(n_buckets)).astype(np.int64), pa.int64()
                ),
            }
        )

    return parsed.map_batches(fn, batch_format="pyarrow")


def _index_rows_written(index_dir: str) -> int:
    """Row count from parquet FOOTER metadata only — no data read."""
    total = 0
    for f in glob.glob(os.path.join(index_dir, "**", "*.parquet"), recursive=True):
        total += pq.read_metadata(f).num_rows
    return total


def build_neardup_index(out_dir: str, index_dir: str, n_buckets: int = 16) -> dict:
    """Epoch-1 build: one streaming projection pass over the crawl's
    parsed shards, written bucketed by ``url_hash % n_buckets`` (the
    etag-store layout, so maintenance tasks read only their shard)."""
    rows = _sig_index_rows(
        ray.data.read_parquet(os.path.join(out_dir, "parsed")), n_buckets
    )
    rows.write_parquet(index_dir, partition_cols=["bucket"])
    return {"rows": _index_rows_written(index_dir)}


def update_neardup_index(
    prior_index_dir: str,
    refresh_out_dir: str,
    status_dir: str,
    dest_index_dir: str,
    n_buckets: int = 16,
    seq_offset: int = _REFRESH_SEQ_OFFSET,
) -> dict:
    """Epoch-N maintenance.  Carried = prior rows whose page is NOT
    changed or gone this epoch (their ``sig`` bytes move untouched —
    the unchanged majority is never re-signed); fresh = refresh-parsed
    changed/new rows (signatures already computed by the refresh parse,
    crawl_seq offset into the disjoint epoch range).  Returns counts
    {"carried", "fresh", "rows"}."""

    def drop_superseded(b: pa.Table) -> pa.Table:
        uh = b.column("url_hash").to_numpy(zero_copy_only=False).astype(np.uint64)
        st = _status_of(status_dir, n_buckets, uh)
        keep = (st != _STATUS_CODE["changed"]) & (st != _STATUS_CODE["gone"])
        t = b.filter(pa.array(keep))
        # recompute bucket (hive partition col read-back types vary)
        uh2 = t.column("url_hash").to_numpy(zero_copy_only=False).astype(np.uint64)
        cols = {n: t.column(n) for n in ("url", "url_hash", "crawl_seq", "sig")}
        cols["bucket"] = pa.array(
            (uh2 % np.uint64(n_buckets)).astype(np.int64), pa.int64()
        )
        return pa.table(cols)

    def only_fresh(b: pa.Table) -> pa.Table:
        from ..urlnorm import url_hash64

        uh = np.fromiter(
            (url_hash64(u) for u in b.column("url").to_pylist()),
            np.uint64,
            count=b.num_rows,
        )
        st = _status_of(status_dir, n_buckets, uh)
        keep = np.isin(st, (_STATUS_CODE["changed"], _STATUS_CODE["new"]))
        return b.filter(pa.array(keep))

    carried = ray.data.read_parquet(prior_index_dir).map_batches(
        drop_superseded, batch_format="pyarrow"
    )
    # materialize once: the union write AND the fresh count both consume
    # it (a lazy dataset would re-run the status-filtered parse read)
    fresh = _sig_index_rows(
        ray.data.read_parquet(os.path.join(refresh_out_dir, "parsed")).map_batches(
            only_fresh, batch_format="pyarrow"
        ),
        n_buckets,
        seq_offset,
    ).materialize()
    carried.union(fresh).write_parquet(dest_index_dir, partition_cols=["bucket"])
    rows = _index_rows_written(dest_index_dir)
    fresh_rows = fresh.count()
    return {"rows": rows, "fresh": fresh_rows, "carried": rows - fresh_rows}


def refresh_neardup_pairs(
    index_dir: str,
    refresh_out_dir: str,
    status_dir: str,
    n_buckets: int = 16,
    threshold: float = 0.7,
    seq_offset: int = _REFRESH_SEQ_OFFSET,
) -> "ray.data.Dataset":
    """Near-dup pairs INVOLVING this epoch's changed/new pages, probed
    against the persisted index: both sides get band keys derived from
    their STORED signatures (``band_keys_matrix`` — a deterministic mix
    over the sig rows, no text, no re-signing), then one coarse
    ``probe_neardup_pairs`` exchange.  Pair ids are crawl_seq (epoch
    ranges are disjoint by the seq offset).  The index passed in must
    already be this epoch's maintained index MINUS the probe rows —
    i.e. call with the PRIOR index dir (superseded rows are filtered
    here the same way update_neardup_index drops them)."""
    from ..functions.dedup import _cached_minhasher, probe_neardup_pairs

    mh = dict(num_perm=128, n_bands=16)

    def with_bands(b: pa.Table) -> pa.Table:
        col = b.column("sig")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        sig = col.values.to_numpy(zero_copy_only=False).reshape(
            b.num_rows, mh["num_perm"]
        )
        bands = _cached_minhasher(**mh).band_keys_matrix(sig)
        n = b.num_rows
        band_col = pa.ListArray.from_arrays(
            pa.array(
                np.arange(n + 1, dtype=np.int64) * mh["n_bands"], pa.int32()
            ),
            pa.array(bands.ravel(), pa.uint64()),
        )
        return pa.table(
            {"doc_id": b.column("crawl_seq"), "sig": col, "bands": band_col}
        )

    def not_superseded(b: pa.Table) -> pa.Table:
        uh = b.column("url_hash").to_numpy(zero_copy_only=False).astype(np.uint64)
        st = _status_of(status_dir, n_buckets, uh)
        keep = (st != _STATUS_CODE["changed"]) & (st != _STATUS_CODE["gone"])
        return b.filter(pa.array(keep))

    def only_fresh(b: pa.Table) -> pa.Table:
        from ..urlnorm import url_hash64

        uh = np.fromiter(
            (url_hash64(u) for u in b.column("url").to_pylist()),
            np.uint64,
            count=b.num_rows,
        )
        st = _status_of(status_dir, n_buckets, uh)
        keep = np.isin(st, (_STATUS_CODE["changed"], _STATUS_CODE["new"]))
        return b.filter(pa.array(keep))

    index = (
        ray.data.read_parquet(index_dir)
        .map_batches(not_superseded, batch_format="pyarrow")
        .map_batches(with_bands, batch_format="pyarrow")
    )
    probe = _sig_index_rows(
        ray.data.read_parquet(os.path.join(refresh_out_dir, "parsed")).map_batches(
            only_fresh, batch_format="pyarrow"
        ),
        n_buckets,
        seq_offset,
    ).map_batches(with_bands, batch_format="pyarrow")
    return probe_neardup_pairs(index, probe, id_col="doc_id", threshold=threshold)
