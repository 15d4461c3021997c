"""Sequential crawl oracle — the executable specification (SURVEY.md §5.2).

A tiny single-process simulator of the crawl semantics distilled from the
reference: seed-order iteration (reference: src/main.py:79), first-wins URL
dedup (reference: src/main.py:197-206), per-host politeness budget
generalizing the reference's global blocking delay (reference:
src/main.py:123, src/scraper.py:97-101), link expansion from ordered spans
(reference: src/parser.py:68-85 via the span model of
src/media_downloader.py:326-340), plus the robots rules the north rule adds.

Crawl-order contract (shared with the Ray engine, pipelines/crawl.py):

- BFS rounds from the seed list; round 0 = canonicalized seeds.
- Within a round: first-wins dedup on ``url_hash`` in discovery order
  ``(disc_primary, disc_secondary)``; drop already-seen; drop
  robots-disallowed (path-prefix match; disallowed URLs are never fetched
  and never enter the seen set).
- Virtual politeness clock per host ``T[h]`` (starts 0): the i-th surviving
  candidate of host h this round (in discovery order) gets
  ``fetch_time = T[h] + i * delay(h)``; after the round
  ``T[h] += fetched_h * delay(h)`` (only actually-fetched entries advance
  the clock).
- Global order within the round = sort by
  ``(fetch_time, host, disc_primary, disc_secondary)``; truncate to the
  remaining ``max_urls`` budget; ``crawl_seq`` is the global position.
- Fetch = lookup into the web table; missing/dangling → ``ok=false`` row
  (still consumes the politeness slot and enters the seen set).
- Round r+1 candidates = spans with ``kind='link'`` of round-r ``ok`` docs,
  canonicalized against the discovering URL;
  ``disc = (discoverer crawl_seq, span index)``.

Everything here is plain dicts and lists on one thread — the golden data
for pytest parity with the distributed engine.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.dataset as pads
import pyarrow.parquet as pq

from .functions.hashing import span_content_hash_py
from .schemas import CRAWLED_SCHEMA, METRICS_SCHEMA, SEEN_SCHEMA
from .synthweb import Budget
from .urlnorm import canonicalize, host_of, path_of, url_hash64


@dataclass
class OracleResult:
    crawled: list[dict] = field(default_factory=list)   # CRAWLED_SCHEMA rows
    seen: dict[int, str] = field(default_factory=dict)  # url_hash -> url
    metrics: dict[str, list[int]] = field(default_factory=dict)  # host -> [fetched, errors, bytes]

    def crawled_table(self) -> pa.Table:
        schema = CRAWLED_SCHEMA
        if self.crawled and "not_modified" in self.crawled[0]:
            schema = pa.schema(
                list(CRAWLED_SCHEMA) + [pa.field("not_modified", pa.bool_())]
            )
        return pa.Table.from_pylist(self.crawled, schema=schema)

    def seen_table(self) -> pa.Table:
        items = sorted(self.seen.items())
        return pa.Table.from_arrays(
            [pa.array([h for h, _ in items], pa.uint64()),
             pa.array([u for _, u in items], pa.string())],
            schema=SEEN_SCHEMA,
        )

    def metrics_table(self) -> pa.Table:
        hosts = sorted(self.metrics)
        return pa.Table.from_arrays(
            [pa.array(hosts, pa.string()),
             pa.array([self.metrics[h][0] for h in hosts], pa.int64()),
             pa.array([self.metrics[h][1] for h in hosts], pa.int64()),
             pa.array([self.metrics[h][2] for h in hosts], pa.int64())],
            schema=METRICS_SCHEMA,
        )


def load_web_dict(web_dir: str) -> dict[str, list[dict]]:
    """url -> span list. Test scales only; the oracle is allowed to hold
    the whole web in one dict — the engine is not."""
    ds = pads.dataset(os.path.join(web_dir, "web"))
    out: dict[str, list[dict]] = {}
    for batch in ds.to_batches():
        t = batch.to_pydict()
        for u, spans in zip(t["doc_id"], t["spans"]):
            out[u] = spans
    return out


def _robots_maps(robots: pa.Table, budget: Budget):
    dis = {}
    delay = {}
    for row in robots.to_pylist():
        dis[row["host"]] = list(row["disallow"] or [])
        delay[row["host"]] = float(row["crawl_delay"])
    return dis, (lambda h: delay.get(h, budget.default_delay)), (
        lambda h, p: any(p.startswith(pre) for pre in dis.get(h, ()))
    )


def run_oracle(
    web_dir: str,
    budget: Budget | None = None,
    seeds: list[dict] | None = None,
    etags: dict[int, int] | None = None,
) -> OracleResult:
    """``seeds`` overrides the web's seed file (url/seed_rank dicts) and
    ``etags`` (url_hash → prior content fingerprint) turns fetches into
    conditional GETs: a hit whose content hash equals its etag comes back
    ok=True, nbytes=0, spans=[], not_modified=True — the politeness slot
    is spent (the server was contacted) but no body transfers and no
    links expand.  Together these make this the sequential REFRESH-crawl
    oracle (engine twin: pipelines/refresh.py)."""
    budget = budget or Budget()
    web = load_web_dict(web_dir)
    if seeds is None:
        seeds = pq.read_table(os.path.join(web_dir, "seeds.parquet")).to_pylist()
    robots = pq.read_table(os.path.join(web_dir, "robots.parquet"))
    _, delay_of, disallowed = _robots_maps(robots, budget)

    res = OracleResult()
    clock: dict[str, float] = {}
    host_fetched: dict[str, int] = {}  # cumulative scheduled, for max_per_host

    # transient-failure retry model (engine twin: stages/fetch.py): doc →
    # first-attempt failure count; backoff charge table in integer micro-
    # seconds so accumulation order cannot diverge from the engine's
    flaky: dict[int, int] = {}
    fpath = os.path.join(web_dir, "flaky.parquet")
    if os.path.exists(fpath):
        ft = pq.read_table(fpath)
        flaky = dict(
            zip(ft.column("url_hash").to_pylist(), ft.column("fails").to_pylist())
        )
    mr = budget.max_retries
    pen_table = budget.retry_penalties_micro()

    # round-0 candidates from seeds
    cands = []
    for row in seeds:
        cu = canonicalize(row["url"])
        if cu is None:
            continue
        cands.append(
            dict(url=cu, host=host_of(cu), url_hash=url_hash64(cu), depth=0,
                 disc_primary=int(row["seed_rank"]), disc_secondary=0,
                 discovered_by="")
        )

    seq = 0
    for rnd in range(budget.max_rounds):
        if not cands or seq >= budget.max_urls:
            break
        # first-wins dedup in discovery order, then seen + robots filters;
        # n_disc counts this round's discoverers per URL (engine twin:
        # expand_links block partials + shard-stage fold) — all duplicates
        # of a hash share one URL, so robots commutes with the count
        cands.sort(key=lambda c: (c["disc_primary"], c["disc_secondary"]))
        n_disc: dict[int, int] = {}
        for c in cands:
            n_disc[c["url_hash"]] = n_disc.get(c["url_hash"], 0) + 1
        kept, in_round = [], set()
        for c in cands:
            h = c["url_hash"]
            if h in in_round or h in res.seen:
                continue
            if disallowed(c["host"], path_of(c["url"])):
                continue
            in_round.add(h)
            c["n_disc"] = n_disc[h]
            kept.append(c)
        if budget.priority == "popularity":
            # priority frontier: popular URLs take each host's earlier
            # politeness slots
            kept.sort(
                key=lambda c: (-c["n_disc"], c["disc_primary"], c["disc_secondary"])
            )
        # politeness schedule: per-host serial virtual clock; the per-host
        # page cap (budget.max_per_host, 0 = unlimited) drops each host's
        # over-quota discovery-order suffix unseen (rediscoverable, but
        # the quota never recovers)
        per_host_idx: dict[str, int] = {}
        capped = []
        for c in kept:
            i = per_host_idx.get(c["host"], 0)
            per_host_idx[c["host"]] = i + 1
            if budget.max_per_host > 0 and (
                host_fetched.get(c["host"], 0) + i >= budget.max_per_host
            ):
                continue
            c["fetch_time"] = clock.get(c["host"], 0.0) + i * delay_of(c["host"])
            capped.append(c)
        kept = capped
        if budget.priority == "popularity":
            kept.sort(key=lambda c: (c["fetch_time"], c["host"], -c["n_disc"],
                                     c["disc_primary"], c["disc_secondary"]))
        else:
            kept.sort(key=lambda c: (c["fetch_time"], c["host"],
                                     c["disc_primary"], c["disc_secondary"]))
        kept = kept[: budget.max_urls - seq]

        next_cands = []
        fetched_per_host: dict[str, int] = {}
        host_pen: dict[str, int] = {}
        for c in kept:
            c["crawl_seq"] = seq
            c["round"] = rnd
            seq += 1
            res.seen[c["url_hash"]] = c["url"]
            fetched_per_host[c["host"]] = fetched_per_host.get(c["host"], 0) + 1
            spans = web.get(c["url"])
            m = res.metrics.setdefault(c["host"], [0, 0, 0])
            # attempt accounting (engine twin: fetch_rows_in_bucket):
            # misses burn every attempt; flaky docs recover iff their
            # failure count is under the budget; retries-off means the
            # first failed attempt is final
            fails = flaky.get(c["url_hash"], 0) if spans is not None else 0
            if spans is None:
                c["attempts"] = mr if mr > 0 else 1
            elif fails > 0 and mr > 0 and fails < mr:
                c["attempts"] = fails + 1
            elif fails > 0 and mr > 0:
                c["attempts"] = mr
                spans = None  # exhausted: content never arrived
            elif fails > 0:
                c["attempts"] = 1
                spans = None
            else:
                c["attempts"] = 1
            if mr > 0:
                host_pen[c["host"]] = (
                    host_pen.get(c["host"], 0) + pen_table[c["attempts"] - 1]
                )
            if etags is not None:
                c["not_modified"] = False
            if spans is None:
                c["ok"], c["nbytes"], c["spans"] = False, 0, []
                m[1] += 1
            elif etags is not None and etags.get(c["url_hash"]) == (
                span_content_hash_py(spans)
            ):
                # conditional GET hit: slot spent, no body, no expansion
                c["ok"], c["nbytes"], c["spans"] = True, 0, []
                c["not_modified"] = True
                m[0] += 1
            else:
                c["ok"] = True
                c["nbytes"] = sum(len(s["text"]) + len(s["media_ref"]) for s in spans)
                c["spans"] = spans
                m[0] += 1
                m[2] += c["nbytes"]
                for si, s in enumerate(spans):
                    # 'redirect' = an HTTP 3xx alias page: its single span
                    # names the canonical target, which enters the frontier
                    # exactly like a discovered link (the alias fetch spent
                    # the politeness slot; the target is fetched next round)
                    if s["kind"] not in ("link", "redirect"):
                        continue
                    cu = canonicalize(s["media_ref"], base_url=c["url"])
                    if cu is None:
                        continue
                    next_cands.append(
                        dict(url=cu, host=host_of(cu), url_hash=url_hash64(cu),
                             depth=c["depth"] + 1, disc_primary=c["crawl_seq"],
                             disc_secondary=si, discovered_by=c["url"])
                    )
            res.crawled.append(c)
        for h, k in fetched_per_host.items():
            clock[h] = clock.get(h, 0.0) + k * delay_of(h)
            host_fetched[h] = host_fetched.get(h, 0) + k
        # retry backoff charge, a SEPARATE addition after the per-round
        # advance — same two-step float sequence as the engine's
        # schedule-time advance + _charge_retry_penalties
        for h, v in host_pen.items():
            if v:
                clock[h] = clock.get(h, 0.0) + v / 1e6
        cands = next_cands
    return res
