"""Deterministic synthetic-web generator (FIXTURES.md F1–F4).

Produces the input Lance/Parquet tables for the crawl engine: a ``web``
table of interleaved text+media documents (exactly the ``input_hint``
schema), a ``seeds`` list, per-host ``robots`` rules and a crawl ``budget``.

Design for determinism AND parallel generation:

- documents are generated in fixed chunks of ``CHUNK`` docs; chunk ``c`` is
  seeded with ``(seed, c)`` — output is identical whether chunks are built
  in a driver loop or fanned out as Ray tasks;
- host assignment is *closed-form*: hosts own contiguous doc-index ranges
  sized by a Zipf-ish weight vector (hot host 0 holds ≥20% of docs —
  FIXTURES.md F1 skew requirement), so "a random doc on host h" needs no
  global state;
- all URLs are pure functions of the doc index, so link targets across
  chunks never require coordination.

The ``web`` table is written hash-bucketed by ``url_hash(doc_id) % n_buckets``
(one directory per bucket) — the layout the fetch stage's lookup join keys
on, and the layout that makes output resumable/prunable at 100 TB scale.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .schemas import ROBOTS_SCHEMA, SEEDS_SCHEMA, WEB_SCHEMA
from .urlnorm import url_hash64

CHUNK = 10_000

_VOCAB = np.array(
    [
        w + str(i)
        for i in range(20)
        for w in ("data", "page", "crawl", "media", "span", "link", "text", "web", "node", "ref")
    ]
)

_MEDIA_KINDS = ("image", "video", "audio", "iframe", "doc_link")
_MEDIA_EXT = {"image": "jpg", "video": "mp4", "audio": "mp3", "iframe": "html", "doc_link": "pdf"}


@dataclass(frozen=True)
class WebParams:
    n_docs: int = 1_000
    n_hosts: int = 20
    seed: int = 42
    n_buckets: int = 16
    hot_frac: float = 0.22     # share of docs on host 0
    zipf_s: float = 1.1
    max_links: int = 10
    p_cross_host: float = 0.05
    p_dangling: float = 0.01
    p_private: float = 0.04    # docs under /private/ (robots-disallowed on h0001)
    n_seeds: int = 8           # seed-list size (spread across the doc space)
    p_redirect: float = 0.0    # share of docs reachable via a 3xx alias URL
    sitemap_frac: float = 0.0  # per-host sitemap.xml listing this doc share
    p_flaky: float = 0.0       # share of docs that fail 1..3 fetch attempts
    # ---- freshness epochs (recrawl model): epoch 0 is the original web;
    # epoch >= 1 applies closed-form per-doc mutations AFTER generation,
    # so unchanged docs stay byte-identical across epochs (the conditional-
    # GET contract) and epoch=0 webs keep every existing fixture unchanged.
    epoch: int = 0
    p_change: float = 0.0      # share of docs whose content changes this epoch
    p_gone: float = 0.0        # share of docs that 404 this epoch
    child_frac: float = 0.0    # share of CHANGED docs that link a NEW child page


def host_starts(p: WebParams) -> np.ndarray:
    """Contiguous doc-index range starts per host (closed-form host map)."""
    h = np.arange(p.n_hosts, dtype=np.float64)
    w = (h + 1.0) ** (-p.zipf_s)
    w[0] = 0.0
    w = w / w.sum() * (1.0 - p.hot_frac) if p.n_hosts > 1 else w
    w[0] = p.hot_frac if p.n_hosts > 1 else 1.0
    sizes = np.maximum(1, np.floor(w * p.n_docs)).astype(np.int64)
    # fix rounding so sizes sum to n_docs
    diff = p.n_docs - sizes.sum()
    sizes[0] += diff
    starts = np.zeros(p.n_hosts + 1, dtype=np.int64)
    np.cumsum(sizes, out=starts[1:])
    return starts


def host_of_doc(idx: np.ndarray, starts: np.ndarray) -> np.ndarray:
    return np.searchsorted(starts, idx, side="right") - 1


def _is_private(idx: np.ndarray, p: WebParams) -> np.ndarray:
    # cheap per-doc deterministic coin independent of chunk seeding
    return (idx * 2654435761 % 997) < int(p.p_private * 997)


def _has_alias(idx, p: WebParams):
    """Closed-form coin: doc ``idx`` is also served behind a 3xx alias URL.

    Intentionally NOT rng-driven so p_redirect=0 leaves every random draw
    (and therefore every existing fixture/golden crawl) byte-identical.
    """
    return (np.asarray(idx, dtype=np.int64) * 1183186591 % 1013) < int(
        p.p_redirect * 1013
    )


def alias_url(idx: int, starts: np.ndarray) -> str:
    """The 3xx alias form of doc ``idx`` (same host, /r/ path)."""
    h = int(host_of_doc(np.array([idx], np.int64), starts)[0])
    return f"http://h{h:04d}.example/r/{idx:07d}"


def _epoch_coin(idx, p: WebParams, mul: int, emul: int, mod: int, frac: float):
    """Closed-form per-(doc, epoch) coin — rng-free, so epoch=0 and
    frac=0 leave every existing fixture and golden byte-identical."""
    if p.epoch <= 0 or frac <= 0:
        return np.zeros(np.shape(np.asarray(idx)), dtype=bool)
    idx = np.asarray(idx, dtype=np.int64)
    return ((idx * mul + p.epoch * emul) % mod) < int(frac * mod)


def is_changed(idx, p: WebParams):
    """Doc content differs from the previous epoch (conditional-GET 200)."""
    return _epoch_coin(idx, p, 1327217885, 2654435761, 1021, p.p_change) & ~is_gone(
        idx, p
    )


def is_gone(idx, p: WebParams):
    """Doc 404s this epoch (tombstone in the refreshed corpus)."""
    return _epoch_coin(idx, p, 972663749, 370248451, 1031, p.p_gone)


def has_child(idx, p: WebParams):
    """A changed doc additionally links one brand-new child page — the
    discovery channel of a recrawl (new URLs only ever appear on pages
    whose content changed)."""
    return is_changed(idx, p) & _epoch_coin(
        idx, p, 2246822519, 1, 1033, p.child_frac
    )


def child_url(parent_idx: int, p: WebParams, starts: np.ndarray) -> str:
    h = int(host_of_doc(np.array([parent_idx], np.int64), starts)[0])
    return f"http://h{h:04d}.example/p2/{p.n_docs + parent_idx:07d}"


def flaky_fails(idx, p: WebParams):
    """Closed-form transient-failure model: doc ``idx`` fails its first
    ``fails`` fetch attempts (0 = healthy; 1..3 otherwise — with 3 total
    attempts, fails=3 means the fetch never succeeds this crawl)."""
    idx = np.asarray(idx, dtype=np.int64)
    flaky = (idx * 2860486313 % 1019) < int(p.p_flaky * 1019)
    return np.where(flaky, (idx % 3) + 1, 0).astype(np.int32)


def make_flaky(p: WebParams, starts: np.ndarray) -> pa.Table:
    """(url_hash, fails) for every flaky doc — the synthetic stand-in for
    network transience, consulted by the fetch stage at attempt time."""
    idx = np.arange(p.n_docs, dtype=np.int64)
    fails = flaky_fails(idx, p)
    sel = fails > 0
    urls = doc_url(idx[sel], p, starts)
    hashes = np.array([url_hash64(u) for u in urls], dtype=np.uint64)
    return pa.Table.from_arrays(
        [pa.array(hashes, pa.uint64()), pa.array(fails[sel], pa.int32())],
        names=["url_hash", "fails"],
    )


def sitemap_url(host: int) -> str:
    return f"http://h{host:04d}.example/sitemap.xml"


def sitemap_doc_idx(host: int, p: WebParams, starts: np.ndarray) -> np.ndarray:
    """The doc indices host ``host``'s sitemap lists (closed-form: every
    k-th doc of the host's contiguous range, k = round(1/sitemap_frac))."""
    if p.sitemap_frac <= 0:
        return np.empty(0, np.int64)
    step = max(1, int(round(1.0 / p.sitemap_frac)))
    return np.arange(starts[host], starts[host + 1], step, dtype=np.int64)


def doc_url(idx, p: WebParams, starts: np.ndarray):
    """Canonical URL of doc ``idx`` (vectorized over int arrays)."""
    idx = np.asarray(idx, dtype=np.int64)
    hosts = host_of_doc(idx, starts)
    priv = _is_private(idx, p)
    out = np.empty(len(idx), dtype=object)
    for i in range(len(idx)):
        seg = "private/p" if priv[i] else "p"
        out[i] = f"http://h{hosts[i]:04d}.example/{seg}/{idx[i]:07d}"
    return out


def gen_chunk(chunk_idx: int, p: WebParams, starts: np.ndarray) -> pa.Table:
    """Generate docs [chunk_idx*CHUNK, ...) as a WEB_SCHEMA Arrow table."""
    lo = chunk_idx * CHUNK
    hi = min(lo + CHUNK, p.n_docs)
    n = hi - lo
    if n <= 0:
        return WEB_SCHEMA.empty_table()
    rng = np.random.Generator(np.random.PCG64([p.seed, chunk_idx]))
    idx = np.arange(lo, hi, dtype=np.int64)
    urls = doc_url(idx, p, starts)
    hosts = host_of_doc(idx, starts)
    host_sizes = np.diff(starts)

    n_spans = rng.integers(2, 41, size=n)
    n_links = np.minimum(rng.integers(0, p.max_links + 1, size=n), n_spans - 1)

    kinds_flat: list[str] = []
    texts_flat: list[str] = []
    refs_flat: list[str] = []
    offs_flat: list[int] = []
    lengths: list[int] = []

    for i in range(n):
        ns, nl = int(n_spans[i]), int(n_links[i])
        # span kind layout: nl links + rest split text/media, shuffled
        rest = ns - nl
        kind_pool = ["link"] * nl
        media_n = int(rest * 0.35)
        kind_pool += list(rng.choice(_MEDIA_KINDS, size=media_n))
        kind_pool += ["text"] * (rest - media_n)
        order = rng.permutation(ns)
        kinds = [kind_pool[j] for j in order]

        # link targets: mostly same host (popularity-skewed), some cross-host,
        # ~1% dangling — duplicates across discoverers arise naturally.
        h = int(hosts[i])
        offset = 0
        for k in kinds:
            offset += int(rng.integers(5, 200))
            kinds_flat.append(k)
            offs_flat.append(offset)
            if k == "text":
                words = rng.choice(_VOCAB, size=int(rng.integers(1, 12)))
                texts_flat.append(" ".join(words))
                refs_flat.append("")
            elif k == "link":
                texts_flat.append("")
                u = rng.random()
                if u < p.p_dangling:
                    ref = f"http://h{h:04d}.example/p/{p.n_docs + int(rng.integers(0, 50)):07d}"
                elif u < p.p_dangling + p.p_cross_host:
                    th = int(rng.integers(0, p.n_hosts))
                    tgt = int(starts[th] + np.floor(host_sizes[th] * rng.random() ** 2))
                    ref = str(doc_url([tgt], p, starts)[0])
                else:
                    tgt = int(starts[h] + np.floor(host_sizes[h] * rng.random() ** 2))
                    ref = str(doc_url([tgt], p, starts)[0])
                # aliased targets are linked through their 3xx alias URL
                # (closed-form coin — no rng draw, so p_redirect=0 keeps
                # every existing fixture byte-identical)
                if p.p_redirect > 0 and u >= p.p_dangling and _has_alias(tgt, p):
                    ref = alias_url(tgt, starts)
                # exercise the canonicalizer: some raw refs carry fragments /
                # uppercase hosts; canonical form must still match the target
                v = rng.random()
                if v < 0.05:
                    ref = ref + "#frag"
                elif v < 0.08:
                    ref = ref.replace("http://h", "HTTP://H", 1)
                refs_flat.append(ref)
            else:
                texts_flat.append("")
                mid = int(rng.integers(0, max(4, p.n_docs // 4)))
                refs_flat.append(
                    f"http://cdn{mid % 7}.example/media/{mid:06d}.{_MEDIA_EXT[k]}"
                )
        lengths.append(ns)

    gone_all = is_gone(idx, p)
    if p.epoch > 0 and (p.p_change > 0 or p.p_gone > 0 or p.child_frac > 0):
        # freshness mutations, applied AFTER generation so every rng draw
        # above is identical across epochs: unchanged docs stay byte-
        # identical (the conditional-GET contract), changed docs gain a
        # leading revision text span (content hash moves, links intact),
        # gone docs drop out of the web table (fetch → 404), and some
        # changed docs append a link to a brand-new child page — the only
        # way new URLs enter an epoch.
        changed = is_changed(idx, p)
        child = has_child(idx, p)
        nk: list[str] = []
        nt: list[str] = []
        nr: list[str] = []
        no: list[int] = []
        nl: list[int] = []
        kept_urls: list[str] = []
        pos = 0
        for i in range(n):
            s0 = pos
            pos += lengths[i]
            if gone_all[i]:
                continue
            kept_urls.append(str(urls[i]))
            cnt = lengths[i]
            if changed[i]:
                nk.append("text")
                nt.append(f"rev{p.epoch} edition")
                nr.append("")
                no.append(0)
                cnt += 1
            nk.extend(kinds_flat[s0 : s0 + lengths[i]])
            nt.extend(texts_flat[s0 : s0 + lengths[i]])
            nr.extend(refs_flat[s0 : s0 + lengths[i]])
            no.extend(offs_flat[s0 : s0 + lengths[i]])
            if child[i]:
                nk.append("link")
                nt.append("")
                nr.append(child_url(int(idx[i]), p, starts))
                no.append(int(offs_flat[s0 + lengths[i] - 1]) + 7)
                cnt += 1
            nl.append(cnt)
        for i in range(n):
            if child[i]:
                kept_urls.append(child_url(int(idx[i]), p, starts))
                nk.append("text")
                nt.append(f"child of doc {int(idx[i])} rev{p.epoch}")
                nr.append("")
                no.append(0)
                nl.append(1)
        kinds_flat, texts_flat, refs_flat, offs_flat, lengths = nk, nt, nr, no, nl
        all_urls = kept_urls
        n = len(kept_urls)
    else:
        all_urls = list(urls)
    if p.p_redirect > 0:
        # alias rows for this chunk's aliased docs: one 'redirect' span
        # naming the canonical URL (an HTTP 3xx page, reference semantics:
        # requests follows these transparently; the crawl engine makes the
        # hop explicit so politeness/seen-set account for the alias fetch)
        aliased = idx[_has_alias(idx, p) & ~gone_all]
        canon = doc_url(aliased, p, starts)
        for j, a_idx in enumerate(aliased):
            all_urls.append(alias_url(int(a_idx), starts))
            kinds_flat.append("redirect")
            texts_flat.append("")
            refs_flat.append(str(canon[j]))
            offs_flat.append(0)
            lengths.append(1)
        n += len(aliased)

    if p.sitemap_frac > 0:
        # host h's /sitemap.xml row is owned by the chunk holding the
        # host's first doc — a real page whose spans are plain links to
        # every k-th doc of the host (closed-form; no rng draws, so
        # sitemap_frac=0 keeps existing fixtures byte-identical)
        for h in range(p.n_hosts):
            if not (lo <= int(starts[h]) < hi):
                continue
            listed = sitemap_doc_idx(h, p, starts)
            urls_listed = doc_url(listed, p, starts)
            all_urls.append(sitemap_url(h))
            for j, u2 in enumerate(urls_listed):
                kinds_flat.append("link")
                texts_flat.append("")
                refs_flat.append(str(u2))
                offs_flat.append(j + 1)
            lengths.append(len(listed))
            n += 1

    span_struct = pa.StructArray.from_arrays(
        [
            pa.array(kinds_flat, pa.string()),
            pa.array(texts_flat, pa.string()),
            pa.array(refs_flat, pa.string()),
            pa.array(offs_flat, pa.int32()),
        ],
        fields=list(WEB_SCHEMA.field("spans").type.value_type),
    )
    offsets = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(lengths, out=offsets[1:])
    spans = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), span_struct)
    return pa.Table.from_arrays([pa.array(all_urls, pa.string()), spans], schema=WEB_SCHEMA)


# ---------------------------------------------------------------------------
# Fixture tables: seeds, robots, budget (FIXTURES.md F2–F4).
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class Budget:
    max_rounds: int = 4
    max_urls: int = 10**9
    default_delay: float = 1.0
    per_host_parallel: int = 1  # per-host serial, like the reference's loop
    max_per_host: int = 0       # cumulative page cap per host; 0 = unlimited
                                # (crawler-trap guard; reference analogue:
                                # per-site pagination max_pages,
                                # src/config.yaml:123)
    # transient-failure retry (reference: tenacity @retry on fetch,
    # src/scraper.py:137 stop_after_attempt(3) wait_exponential;
    # src/config.yaml:104-108 retry_delay 5 s, timeout_multiplier 1.5).
    # 0 = retries off (default — byte-identical to the pre-retry engine).
    # Backoff waits charge the host's politeness clock at round close
    # (the virtual-clock analogue of tenacity's blocking sleeps).
    max_retries: int = 0
    retry_delay: float = 5.0
    retry_mult: float = 1.5
    # frontier priority: "discovery" reproduces the reference's BFS order;
    # "popularity" is the priority frontier — within each host's politeness
    # run, URLs discovered by MORE pages this round take the earlier slots
    # (n_disc, folded map-side in expand_links; north_star "priority
    # frontier ... groupby-aggregate-sort")
    priority: str = "discovery"

    def retry_penalties_micro(self) -> list[int]:
        """Backoff-wait total by attempts consumed: entry ``a-1`` is the
        clock charge for a fetch that took ``a`` attempts (``a-1`` waits of
        ``retry_delay · retry_mult^j``), in integer MICROSECONDS of virtual
        time — per-host sums stay integers (order-independent across the
        engine's per-bucket partials), so engine and oracle charge
        bit-identical clocks regardless of accumulation order."""
        out = []
        for a in range(1, max(self.max_retries, 1) + 1):
            pen = 0.0
            for j in range(a - 1):
                pen += self.retry_delay * self.retry_mult**j
            out.append(round(pen * 1e6))
        return out

    def to_json(self) -> str:
        return json.dumps(self.__dict__)

    @staticmethod
    def from_json(s: str) -> "Budget":
        return Budget(**json.loads(s))


def make_seeds(p: WebParams, starts: np.ndarray, n_seeds: int | None = None) -> pa.Table:
    """Seed list: first a doc per host (up to n_seeds), then — for larger
    seed lists (bench tier) — docs spread evenly across the doc space so
    round 0 is wide enough to exercise fetch parallelism."""
    n_seeds = p.n_seeds if n_seeds is None else n_seeds
    urls = []
    k = min(n_seeds, p.n_hosts)
    seed_idx = [int(starts[h]) for h in range(k)]
    if n_seeds > p.n_hosts:
        extra = np.unique(
            np.linspace(0, p.n_docs - 1, n_seeds - p.n_hosts).astype(np.int64)
        )
        taken = set(seed_idx)
        seed_idx.extend(int(i) for i in extra if int(i) not in taken)
    urls.extend(str(u) for u in doc_url(seed_idx, p, starts))
    # dangling seed + duplicate seed (first-wins dedup exercise)
    urls.append(f"http://h0000.example/p/{p.n_docs + 999:07d}")
    urls.append(urls[0])
    if p.sitemap_frac > 0:
        # sitemap ingestion: each host's /sitemap.xml joins the seed list
        # (a real crawl reads robots.txt's Sitemap: line; here the URL is
        # well-known) — the sitemap is itself a fetched page whose links
        # bulk-feed the frontier
        urls.extend(sitemap_url(h) for h in range(p.n_hosts))
    return pa.Table.from_arrays(
        [pa.array(urls, pa.string()), pa.array(range(len(urls)), pa.int64())],
        schema=SEEDS_SCHEMA,
    )


def make_robots(p: WebParams) -> pa.Table:
    hosts, disallow, delay = [], [], []
    hosts.append("h0000.example"); disallow.append([]); delay.append(0.5)
    if p.n_hosts > 1:
        hosts.append("h0001.example"); disallow.append(["/private/"]); delay.append(1.0)
    if p.n_hosts > 2:
        hosts.append("h0002.example"); disallow.append([]); delay.append(5.0)
    return pa.Table.from_arrays(
        [
            pa.array(hosts, pa.string()),
            pa.array(disallow, pa.list_(pa.string())),
            pa.array(delay, pa.float64()),
        ],
        schema=ROBOTS_SCHEMA,
    )


# ---------------------------------------------------------------------------
# Materialization: bucketed parquet layout (lance slot-in when available).
# ---------------------------------------------------------------------------

def _write_chunk(out_dir: str, p: WebParams, starts: np.ndarray, c: int) -> None:
    t = gen_chunk(c, p, starts)
    buckets = np.array([url_hash64(u) % p.n_buckets for u in t.column("doc_id").to_pylist()])
    for b in np.unique(buckets):
        sub = t.filter(pa.array(buckets == b))
        pq.write_table(
            sub, os.path.join(out_dir, "web", f"bucket={int(b)}", f"part-{c:05d}.parquet")
        )


def write_web(out_dir: str, p: WebParams, parallel: bool = False) -> None:
    """Materialize the synthetic web.  Chunk ``c`` is seeded ``(seed, c)``
    and link targets are closed-form, so parallel generation (one Ray task
    per chunk, ``parallel=True``) writes byte-identical tables to the
    sequential loop — tested in test_synthweb.py."""
    starts = host_starts(p)
    os.makedirs(out_dir, exist_ok=True)
    for b in range(p.n_buckets):
        os.makedirs(os.path.join(out_dir, "web", f"bucket={b}"), exist_ok=True)
    n_chunks = (p.n_docs + CHUNK - 1) // CHUNK
    if parallel and n_chunks > 1:
        import ray

        task = ray.remote(_write_chunk)
        ray.get([task.remote(out_dir, p, starts, c) for c in range(n_chunks)])
    else:
        for c in range(n_chunks):
            _write_chunk(out_dir, p, starts, c)
    pq.write_table(make_seeds(p, starts), os.path.join(out_dir, "seeds.parquet"))
    pq.write_table(make_robots(p), os.path.join(out_dir, "robots.parquet"))
    if p.p_flaky > 0:
        pq.write_table(make_flaky(p, starts), os.path.join(out_dir, "flaky.parquet"))
    with open(os.path.join(out_dir, "params.json"), "w") as f:
        json.dump(p.__dict__, f)


def fixture_dir(p: WebParams, root: str = "/tmp/synthweb", parallel: bool = False) -> str:
    """Deterministic cached fixture location; generate once per param set."""
    key = f"d{p.n_docs}_h{p.n_hosts}_s{p.seed}_b{p.n_buckets}_sd{p.n_seeds}"
    if p.p_redirect > 0:
        key += f"_rd{p.p_redirect}"
    if p.sitemap_frac > 0:
        key += f"_sm{p.sitemap_frac}"
    if p.p_flaky > 0:
        key += f"_fk{p.p_flaky}"
    if p.epoch > 0:
        key += f"_e{p.epoch}_ch{p.p_change}_go{p.p_gone}_cf{p.child_frac}"
    out = os.path.join(root, key)
    marker = os.path.join(out, "params.json")
    if not os.path.exists(marker):
        write_web(out, p, parallel=parallel)
    return out
