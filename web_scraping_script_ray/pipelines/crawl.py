"""The Ray-Data crawl engine: round-based BFS over the synthetic web.

Distributed re-expression of the reference's sequential seed loop
(reference: src/main.py:79-127) under the crawl-order contract specified in
``oracle.py`` — the oracle is the spec; this engine must match its crawl
order, URL-seen set and per-row span sequences exactly (north_rule).

Per round (a bounded, checkpointable DAG — Ray Data cannot express the
cyclic crawl dataflow natively, so the driver iterates rounds):

1. candidates → stateless ``map_batches`` filter: sharded-cuckoo seen
   probe (exact-confirmed) + robots path-prefix rules (broadcast via
   ``ray.put``);
2. first-wins dedup on ``url_hash`` in discovery order — one sort shuffle
   + a narrow block pass (``stages.rank.dedup_first_wins``);
3. politeness schedule — per-host virtual clocks from the sharded
   ``PolitenessScheduler`` actors; ``fetch_time = T[h] + i·d_h`` where the
   within-host rank i comes from ``per_key_rank`` (sort + narrow carry
   pass — the shuffle is on the light candidate table, never on document
   spans, and there is no per-host map_groups);
4. total order + budget truncation + ``crawl_seq`` via the distributed
   zipWithIndex (``stages.rank.zip_with_index``);
5. seen-set insert (distributed block→shard routing) and clock advance;
6. fetch — frontier hash-partitioned by ``url_hash % n_buckets``
   (``groupby('bucket')``, a shuffle of the SMALL side only) then a
   per-bucket lookup join (``make_bucket_fetcher``): each web bucket is
   scanned exactly once per round;
7. outputs: ``crawled/round-r/`` parquet, per-host metrics, link
   expansion → next round's frontier + ``frontier/round-(r+1)/`` parquet;
8. checkpoint: politeness clocks, cuckoo+exact seen shards, cumulative
   metrics, and a manifest written LAST — resume trusts only rounds whose
   manifest exists, giving identical output lineage after a kill.

Scale notes: each round materializes only that round's candidate table and
fetched block set (spillable, bounded by the frontier budget); driver
traffic is O(#blocks + #active-hosts) per round, never O(rows).
"""

from __future__ import annotations

import json
import logging
import os
import shutil
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data

from ..schemas import CRAWLED_SCHEMA, FRONTIER_SCHEMA, METRICS_SCHEMA
from ..stages.fetch import make_bucket_fetcher
from ..stages.rank import dedup_first_wins, per_key_rank, zip_with_index
from ..stages.spans import expand_links
from ..state.cuckoo import ShardedSeen
from ..state.politeness import PolitenessScheduler, RobotsRules
from ..synthweb import Budget
from ..urlnorm import canonicalize, host_of, path_of, url_hash64

logger = logging.getLogger(__name__)
_TRACE = os.environ.get("GRAFT_CRAWL_TRACE", "") == "1"


class _Trace:
    """Per-round stage timing (enabled with GRAFT_CRAWL_TRACE=1)."""

    def __init__(self, rnd: int):
        self.rnd = rnd
        self.t = time.time()

    def mark(self, stage: str) -> None:
        if _TRACE:
            now = time.time()
            print(f"[crawl r{self.rnd}] {stage}: {now - self.t:.2f}s", flush=True)
            self.t = now


class CrawlEngine:
    def __init__(
        self,
        web_dir: str,
        out_dir: str,
        budget: Budget | None = None,
        n_seen_shards: int = 8,
        n_politeness_shards: int = 4,
        fetch_concurrency: int = 4,
        fetch_batch_size: int = 4096,
        seen_capacity_per_shard: int = 1 << 20,
    ):
        self.web_dir = web_dir
        self.out_dir = out_dir
        self.budget = budget or Budget()
        with open(os.path.join(web_dir, "params.json")) as f:
            self.n_buckets = json.load(f)["n_buckets"]
        robots = pq.read_table(os.path.join(web_dir, "robots.parquet"))
        self.rules = RobotsRules(robots, self.budget.default_delay)
        self.rules_ref = ray.put(self.rules)
        self.seen = ShardedSeen(n_seen_shards, seen_capacity_per_shard)
        self.sched = PolitenessScheduler(n_politeness_shards)
        self.fetch_concurrency = fetch_concurrency
        self.fetch_batch_size = fetch_batch_size
        self.seq = 0
        self.metrics: dict[str, list[int]] = {}

    # ------------------------------------------------------------------ paths
    def _round_dir(self, kind: str, rnd: int) -> str:
        return os.path.join(self.out_dir, kind, f"round-{rnd}")

    def _manifest_path(self, rnd: int) -> str:
        return os.path.join(self._round_dir("state", rnd), "manifest.json")

    # ------------------------------------------------------------------ seeds
    def seed_candidates(self) -> "ray.data.Dataset":
        seeds = pq.read_table(os.path.join(self.web_dir, "seeds.parquet")).to_pylist()
        rows = {k: [] for k in FRONTIER_SCHEMA.names}
        for r in seeds:
            cu = canonicalize(r["url"])
            if cu is None:
                continue
            rows["url"].append(cu)
            rows["host"].append(host_of(cu))
            rows["url_hash"].append(url_hash64(cu))
            rows["depth"].append(0)
            rows["disc_primary"].append(int(r["seed_rank"]))
            rows["disc_secondary"].append(0)
            rows["discovered_by"].append("")
        t = pa.Table.from_arrays(
            [pa.array(rows[n], FRONTIER_SCHEMA.field(n).type) for n in FRONTIER_SCHEMA.names],
            schema=FRONTIER_SCHEMA,
        )
        return ray.data.from_arrow(t)

    # ------------------------------------------------------------------ round
    def run_round(self, rnd: int, cands: "ray.data.Dataset"):
        """One BFS wave; returns (next_candidates, next_count)."""
        tr = _Trace(rnd)
        seen, rules_ref = self.seen, self.rules_ref

        def not_seen_and_allowed(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return batch
            rules: RobotsRules = ray.get(rules_ref)
            hosts = np.asarray(batch.column("host").to_pylist())
            paths = np.asarray([path_of(u) for u in batch.column("url").to_pylist()])
            keep = rules.allowed_mask(hosts, paths)
            hashes = batch.column("url_hash").to_numpy(zero_copy_only=False)
            keep &= ~seen.probe(hashes)
            return batch.filter(pa.array(keep))

        cands = cands.map_batches(not_seen_and_allowed, batch_format="pyarrow")
        cands = dedup_first_wins(cands, "url_hash", ["disc_primary", "disc_secondary"])
        tr.mark("filter+dedup")

        # politeness: clocks of this round's active hosts.  Partial-unique
        # per block then a driver-side set union — O(blocks · hosts) tiny
        # rows, no shuffle (Dataset.unique would run a full aggregate).
        host_blocks = cands.map_batches(
            lambda t: pa.Table.from_arrays(
                [pa.compute.unique(t.column("host"))], names=["host"]
            ),
            batch_format="pyarrow",
        ).take_all()
        hosts = sorted({r["host"] for r in host_blocks})
        tr.mark("unique(host)")
        clocks = self.sched.get_clocks(hosts)
        delays = {h: self.rules.delay(h) for h in hosts}

        # fetch_time = clock[h] + i·d_h where i = within-host rank in
        # discovery order — one sort + narrow carry pass (per_key_rank)
        # instead of a per-host map_groups (2000 tiny pandas groups).
        ranked = per_key_rank(
            cands, "host", ["disc_primary", "disc_secondary"], out_col="host_rank"
        )
        sched_ref = ray.put((clocks, delays))

        def assign_fetch_time(batch: pa.Table) -> pa.Table:
            clocks_, delays_ = ray.get(sched_ref)
            hosts_ = batch.column("host").to_pylist()
            i = batch.column("host_rank").to_numpy(zero_copy_only=False).astype(np.float64)
            t0 = np.fromiter((clocks_[h] for h in hosts_), np.float64, len(hosts_))
            dh = np.fromiter((delays_[h] for h in hosts_), np.float64, len(hosts_))
            batch = batch.append_column(
                "fetch_time", pa.array(t0 + i * dh, pa.float64())
            )
            return batch.drop_columns(["host_rank"])

        scheduled_lazy = ranked.map_batches(assign_fetch_time, batch_format="pyarrow")
        remaining = self.budget.max_urls - self.seq
        scheduled, n_fetched = zip_with_index(
            scheduled_lazy,
            ["fetch_time", "host", "disc_primary", "disc_secondary"],
            col="crawl_seq",
            limit=remaining,
            base=self.seq,
        )
        tr.mark("schedule+rank")
        if n_fetched == 0:
            return None, 0
        self.seq += n_fetched

        # seen insert (distributed) + clock advance (small per-host agg)
        self.seen.add_blocks(scheduled.to_arrow_refs())
        counts = scheduled.groupby("host").count().to_pandas()
        self.sched.advance(
            {r["host"]: r["count()"] * delays[r["host"]] for _, r in counts.iterrows()}
        )
        tr.mark("seen+clocks")

        # fetch: bucket-partitioned lookup join — hash-partition the light
        # frontier by url_hash % n_buckets (groupby shuffle on the SMALL
        # side) so each web bucket is scanned exactly once per round.
        nb = np.uint64(self.n_buckets)

        def add_bucket(batch: pa.Table) -> pa.Table:
            h = batch.column("url_hash").to_numpy(zero_copy_only=False).astype(np.uint64)
            return batch.append_column("bucket", pa.array(h % nb, pa.uint64()))

        crawled = (
            scheduled.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(make_bucket_fetcher(self.web_dir), batch_format="pyarrow")
        )
        crawled = crawled.map_batches(
            lambda t, rnd=rnd: t.append_column(
                "round", pa.array(np.full(t.num_rows, rnd, dtype=np.int32))
            ),
            batch_format="pyarrow",
        ).select_columns(list(CRAWLED_SCHEMA.names))
        # one materialization per round: the round's working set is bounded
        # by the frontier budget and spillable; downstream consumers (sink,
        # metrics, expansion) then reuse blocks instead of re-fetching.
        crawled = crawled.materialize()
        tr.mark("fetch")

        out = self._round_dir("crawled", rnd)
        shutil.rmtree(out, ignore_errors=True)
        crawled.write_parquet(out)
        tr.mark("write")

        # per-host metrics: partial ints per batch → tiny groupby
        stats = (
            crawled.map_batches(
                lambda t: pa.Table.from_arrays(
                    [
                        t.column("host"),
                        t.column("ok").cast(pa.int64()),
                        pa.compute.subtract(1, t.column("ok").cast(pa.int64())),
                        pa.compute.multiply(
                            t.column("nbytes"), t.column("ok").cast(pa.int64())
                        ),
                    ],
                    names=["host", "fetched", "errors", "bytes"],
                ),
                batch_format="pyarrow",
            )
            .groupby("host")
            .sum(["fetched", "errors", "bytes"])
            .to_pandas()
        )
        for _, r in stats.iterrows():
            m = self.metrics.setdefault(r["host"], [0, 0, 0])
            m[0] += int(r["sum(fetched)"])
            m[1] += int(r["sum(errors)"])
            m[2] += int(r["sum(bytes)"])
        tr.mark("metrics")

        # expansion → next round's frontier
        nxt = crawled.map_batches(expand_links, batch_format="pyarrow").materialize()
        n_next = nxt.count()
        fdir = self._round_dir("frontier", rnd + 1)
        shutil.rmtree(fdir, ignore_errors=True)
        if n_next:
            nxt.write_parquet(fdir)
        tr.mark("expand")
        return nxt, n_next

    # ------------------------------------------------------------- checkpoint
    def _checkpoint(self, rnd: int) -> None:
        sdir = self._round_dir("state", rnd)
        tmp = sdir + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(sdir, ignore_errors=True)
        os.makedirs(tmp)
        pq.write_table(self.sched.dump_table(), os.path.join(tmp, "clocks.parquet"))
        dumps = self.seen.dump()
        pq.write_table(
            pa.Table.from_arrays(
                [
                    pa.array(range(len(dumps)), pa.int32()),
                    pa.array([d[0] for d in dumps], pa.binary()),
                    pa.array([d[1].tobytes() for d in dumps], pa.binary()),
                ],
                names=["shard", "cuckoo", "exact"],
            ),
            os.path.join(tmp, "seen.parquet"),
        )
        pq.write_table(self.metrics_table(), os.path.join(tmp, "metrics.parquet"))
        with open(os.path.join(tmp, "manifest.json"), "w") as f:
            json.dump({"round": rnd, "seq": self.seq}, f)
        os.rename(tmp, sdir)  # manifest becomes visible atomically

    def _load_checkpoint(self, rnd: int) -> None:
        sdir = self._round_dir("state", rnd)
        self.sched.load_table(pq.read_table(os.path.join(sdir, "clocks.parquet")))
        t = pq.read_table(os.path.join(sdir, "seen.parquet"))
        dumps = [
            (c, np.frombuffer(e, dtype=np.uint64))
            for c, e in zip(t.column("cuckoo").to_pylist(), t.column("exact").to_pylist())
        ]
        self.seen.load(dumps)
        self.metrics = {
            r["host"]: [r["fetched"], r["errors"], r["bytes"]]
            for r in pq.read_table(os.path.join(sdir, "metrics.parquet")).to_pylist()
        }
        with open(self._manifest_path(rnd)) as f:
            self.seq = json.load(f)["seq"]

    def last_complete_round(self) -> int | None:
        """Largest r with manifests for ALL rounds 0..r — a later round's
        checkpoint is not trusted if an earlier one is missing/corrupt."""
        done = set()
        state_root = os.path.join(self.out_dir, "state")
        if os.path.isdir(state_root):
            for d in os.listdir(state_root):
                if d.startswith("round-") and os.path.exists(
                    os.path.join(state_root, d, "manifest.json")
                ):
                    done.add(int(d.split("-")[1]))
        r = -1
        while r + 1 in done:
            r += 1
        return r if r >= 0 else None

    # --------------------------------------------------------------------- run
    def run(self, resume: bool = False) -> dict:
        start = 0
        cands = None
        if resume:
            last = self.last_complete_round()
            if last is not None:
                self._load_checkpoint(last)
                start = last + 1
                fdir = self._round_dir("frontier", start)
                if os.path.isdir(fdir):
                    cands = ray.data.read_parquet(fdir)
                else:
                    return self.summary(start)
        if cands is None and start == 0:
            cands = self.seed_candidates()
        rounds_run = 0
        for rnd in range(start, self.budget.max_rounds):
            if cands is None or self.seq >= self.budget.max_urls:
                break
            cands, n_next = self.run_round(rnd, cands)
            tck = _Trace(rnd)
            self._checkpoint(rnd)
            tck.mark("checkpoint")
            rounds_run += 1
            if n_next == 0:
                cands = None
        return self.summary(start + rounds_run)

    def summary(self, rounds: int) -> dict:
        return {
            "rounds": rounds,
            "fetched": self.seq,
            "seen": self.seen.size(),
            "hosts": len(self.metrics),
        }

    def metrics_table(self) -> pa.Table:
        hosts = sorted(self.metrics)
        return pa.Table.from_arrays(
            [
                pa.array(hosts, pa.string()),
                pa.array([self.metrics[h][0] for h in hosts], pa.int64()),
                pa.array([self.metrics[h][1] for h in hosts], pa.int64()),
                pa.array([self.metrics[h][2] for h in hosts], pa.int64()),
            ],
            schema=METRICS_SCHEMA,
        )

    def crawled_dataset(self) -> "ray.data.Dataset":
        return ray.data.read_parquet(os.path.join(self.out_dir, "crawled"))

    def shutdown(self) -> None:
        self.seen.shutdown()
        self.sched.shutdown()


def run_crawl(
    web_dir: str, out_dir: str, budget: Budget | None = None, resume: bool = False, **kw
) -> tuple[CrawlEngine, dict]:
    eng = CrawlEngine(web_dir, out_dir, budget, **kw)
    info = eng.run(resume=resume)
    return eng, info
