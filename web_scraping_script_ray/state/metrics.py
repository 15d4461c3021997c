"""Sharded per-host crawl metrics (north_rule A5 counters at scale).

The reference accumulates scrape counters in driver-process state
(reference: src/main.py:188-206 result tallies); a cumulative
host→(fetched, errors, bytes) dict is tens of GB of driver heap at a
10^8-host crawl.  Same pattern as ``PolitenessScheduler``: the
cumulative state shards across actors by ``hash(host) % n_shards``; the
driver only ever handles one round's ACTIVE-host partials (transient,
bounded by the round budget) or object refs to them.  Updates are
token-guarded so an RPC retried after an ambiguous actor failure is a
no-op rather than a double count.
"""

from __future__ import annotations

import pyarrow as pa
import ray

from .politeness import host_shard
from .util import retry_actor_get

METRICS_COLS = ("host", "fetched", "errors", "bytes")


class MetricsShard:
    """One shard of cumulative per-host (fetched, errors, bytes) — run
    as a Ray actor."""

    TOKEN_WINDOW = 64

    def __init__(self):
        self.m: dict[str, list[int]] = {}
        self._applied: set = set()
        self._applied_order: list = []

    def add(self, hosts, fetched, errors, nbytes, token=None) -> None:
        if token is not None:
            if token in self._applied:
                return
            self._applied.add(token)
            self._applied_order.append(token)
            if len(self._applied_order) > self.TOKEN_WINDOW:
                self._applied.discard(self._applied_order.pop(0))
        for h, f, e, b in zip(hosts, fetched, errors, nbytes):
            mm = self.m.setdefault(h, [0, 0, 0])
            mm[0] += int(f)
            mm[1] += int(e)
            mm[2] += int(b)

    def size(self) -> int:
        return len(self.m)

    def dump_table(self) -> pa.Table:
        hosts = sorted(self.m)
        return pa.Table.from_arrays(
            [
                pa.array(hosts, pa.string()),
                pa.array([self.m[h][0] for h in hosts], pa.int64()),
                pa.array([self.m[h][1] for h in hosts], pa.int64()),
                pa.array([self.m[h][2] for h in hosts], pa.int64()),
            ],
            names=list(METRICS_COLS),
        )

    def load_table(self, t: pa.Table) -> None:
        self.m = {
            h: [f, e, b]
            for h, f, e, b in zip(
                t.column("host").to_pylist(),
                t.column("fetched").to_pylist(),
                t.column("errors").to_pylist(),
                t.column("bytes").to_pylist(),
            )
        }


class ShardedMetrics:
    """Driver-side handle over ``n_shards`` MetricsShard actors.

    ``add_rows`` takes one round's active-host rows (transient — the
    cumulative table never lands on the driver); ``merge_partial_refs``
    routes per-block partial-table REFS through one remote merge task so
    even the round's rows skip the driver.  ``dump_table`` gathers the
    sorted cumulative table for checkpointing — the same bounded
    once-per-round gather the politeness clocks checkpoint does; a
    multi-node deployment would write per-shard parquet parts instead.
    """

    def __init__(self, n_shards: int = 4):
        import ray

        self.n_shards = n_shards
        actor = ray.remote(num_cpus=0)(MetricsShard)
        self.shards = [actor.remote() for _ in range(n_shards)]

    def add_rows(self, rows: list, token=None) -> None:
        """``rows`` = [(host, fetched, errors, bytes), ...] for ONE round."""
        groups: dict[int, list] = {}
        for r in rows:
            groups.setdefault(host_shard(r[0], self.n_shards), []).append(r)
        retry_actor_get(
            lambda: [
                self.shards[s].add.remote(
                    [r[0] for r in rs],
                    [r[1] for r in rs],
                    [r[2] for r in rs],
                    [r[3] for r in rs],
                    None if token is None else (token, s),
                )
                for s, rs in sorted(groups.items())
            ]
        )

    def merge_partial_refs(self, partial_refs: list, token=None) -> None:
        """Merge per-block (host, fetched, errors, bytes) partial tables
        into the shards via ONE remote task — no metric row touches the
        driver."""
        import ray

        ray.get(
            _merge_metrics_task.remote(self.shards, token, *partial_refs)
        )

    def size(self) -> int:
        import ray

        return sum(ray.get([s.size.remote() for s in self.shards]))

    def dump_table(self) -> pa.Table:
        import ray

        parts = ray.get([s.dump_table.remote() for s in self.shards])
        t = pa.concat_tables(parts)
        if t.num_rows == 0:
            return t
        return t.sort_by("host")

    def load_table(self, t: pa.Table) -> None:
        import ray

        hosts = t.column("host").to_pylist()
        groups: dict[int, list[int]] = {}
        for i, h in enumerate(hosts):
            groups.setdefault(host_shard(h, self.n_shards), []).append(i)
        refs = []
        for s, idx in groups.items():
            refs.append(
                self.shards[s].load_table.remote(t.take(pa.array(idx, pa.int64())))
            )
        ray.get(refs)

    def shutdown(self) -> None:
        import ray

        for s in self.shards:
            ray.kill(s)


@ray.remote
def _merge_metrics_task(shards: list, token, *partials) -> int:
    merged: dict[str, list[int]] = {}
    for t in partials:
        if t is None or t.num_rows == 0:
            continue
        for h, f, e, b in zip(
            t.column("host").to_pylist(),
            t.column("fetched").to_pylist(),
            t.column("errors").to_pylist(),
            t.column("bytes").to_pylist(),
        ):
            mm = merged.setdefault(h, [0, 0, 0])
            mm[0] += int(f)
            mm[1] += int(e)
            mm[2] += int(b)
    n = len(shards)
    groups: dict[int, list[str]] = {}
    for h in merged:
        groups.setdefault(host_shard(h, n), []).append(h)
    retry_actor_get(
        lambda: [
            shards[s].add.remote(
                hs,
                [merged[h][0] for h in hs],
                [merged[h][1] for h in hs],
                [merged[h][2] for h in hs],
                None if token is None else (token, s),
            )
            for s, hs in sorted(groups.items())
        ]
    )
    return 0
