"""Per-host politeness scheduler, sharded across Ray actors (north_rule T6).

Generalizes the reference's single global blocking delay (reference:
src/main.py:123, src/scraper.py:97-101 jittered sleep, src/scraper.py:157
extra sleep) into a deterministic per-host *virtual clock*: host ``h`` may
be fetched at times ``T[h], T[h]+d_h, T[h]+2·d_h, …`` within a round, where
``d_h`` is the robots crawl-delay (default from the crawl budget).  The
clocks are the only cross-round politeness state; they shard across actors
by ``hash(host) % n_shards`` and checkpoint to a host→next_time table.

Robots rules themselves are a small immutable table — broadcast via
``ray.put`` into the stateless robots-filter stage (SURVEY.md J1 pattern),
not actor state.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

from ..schemas import HOST_CLOCK_SCHEMA
from .util import retry_actor_get


def host_shard(host: str, n_shards: int) -> int:
    return zlib.crc32(host.encode("utf-8")) % n_shards


class PolitenessShard:
    """One shard of per-host clocks (run as a Ray actor)."""

    # retries only ever replay the most recent advances, so the token
    # window stays small and bounded — an unbounded set would leak one
    # entry per round for the life of a 10^10-URL crawl
    TOKEN_WINDOW = 64

    def __init__(self):
        self.clock: dict[str, float] = {}
        self.count: dict[str, int] = {}       # cumulative scheduled fetches
        self._applied: set = set()            # advance tokens already applied
        self._applied_order: list = []        # FIFO for the bounded window

    def get_clocks(self, hosts: list[str]) -> list[float]:
        return [self.clock.get(h, 0.0) for h in hosts]

    def get_clock_counts(self, hosts: list[str]):
        """(clock, cumulative fetched count) per host — one RPC serves both
        the fetch-time base and the per-host page-cap quota."""
        return (
            [self.clock.get(h, 0.0) for h in hosts],
            [self.count.get(h, 0) for h in hosts],
        )

    def advance(
        self, hosts: list[str], deltas: list[float], token=None, counts=None
    ) -> None:
        # token guard makes advance idempotent: a retried RPC whose first
        # attempt DID execute (actor-unavailable is ambiguous) is a no-op
        if token is not None:
            if token in self._applied:
                return
            self._applied.add(token)
            self._applied_order.append(token)
            if len(self._applied_order) > self.TOKEN_WINDOW:
                self._applied.discard(self._applied_order.pop(0))
        for h, d in zip(hosts, deltas):
            self.clock[h] = self.clock.get(h, 0.0) + d
        if counts is not None:
            for h, k in zip(hosts, counts):
                self.count[h] = self.count.get(h, 0) + int(k)

    def dump(self) -> tuple[dict[str, float], dict[str, int]]:
        return dict(self.clock), dict(self.count)

    def load(self, clock: dict[str, float], count: dict[str, int] | None = None) -> None:
        self.clock = dict(clock)
        self.count = dict(count or {})


class PolitenessScheduler:
    """Driver-side handle over ``n_shards`` PolitenessShard actors.

    Per round the engine asks for the clocks of the round's active hosts
    (O(hosts-in-round) RPC traffic, never O(frontier)) and advances them by
    ``fetched_h · d_h`` after budget truncation.  At 10^8-host scale the
    host→clock map becomes a Lance table joined by host bucket instead of a
    driver dict — same contract.
    """

    def __init__(self, n_shards: int = 4):
        import ray

        self.n_shards = n_shards
        self._advance_seq = 0
        actor = ray.remote(num_cpus=0)(PolitenessShard)
        self.shards = [actor.remote() for _ in range(n_shards)]

    def _group(self, hosts: list[str]):
        groups: dict[int, list[str]] = {}
        for h in hosts:
            groups.setdefault(host_shard(h, self.n_shards), []).append(h)
        return groups

    def get_clocks(self, hosts: list[str]) -> dict[str, float]:
        groups = self._group(hosts)
        items = sorted(groups.items())
        results = retry_actor_get(  # idempotent read
            lambda: [self.shards[s].get_clocks.remote(hs) for s, hs in items]
        )
        out: dict[str, float] = {}
        for (s, hs), vals in zip(items, results):
            for h, t in zip(hs, vals):
                out[h] = t
        return out

    def advance(self, deltas: dict[str, float], token=None) -> None:
        self._advance_seq += 1
        seq = self._advance_seq if token is None else token
        groups = self._group(list(deltas))
        retry_actor_get(
            lambda: [
                self.shards[s].advance.remote(
                    hs, [deltas[h] for h in hs], (seq, s)
                )
                for s, hs in groups.items()
            ]
        )

    def dump_table(self) -> pa.Table:
        import ray

        merged: dict[str, float] = {}
        merged_n: dict[str, int] = {}
        for d, dn in ray.get([s.dump.remote() for s in self.shards]):
            merged.update(d)
            merged_n.update(dn)
        hosts = sorted(merged)
        return pa.Table.from_arrays(
            [pa.array(hosts, pa.string()),
             pa.array([merged[h] for h in hosts], pa.float64()),
             pa.array([merged_n.get(h, 0) for h in hosts], pa.int64())],
            schema=HOST_CLOCK_SCHEMA,
        )

    def load_table(self, t: pa.Table) -> None:
        import ray

        hosts = t.column("host").to_pylist()
        clocks = dict(zip(hosts, t.column("next_time").to_pylist()))
        # pre-page-cap checkpoints have no fetched column — counts restart
        # at 0, which only matters when max_per_host is newly enabled
        counts = (
            dict(zip(hosts, t.column("fetched").to_pylist()))
            if "fetched" in t.column_names
            else {}
        )
        groups: dict[int, tuple[dict, dict]] = {}
        for h, v in clocks.items():
            g = groups.setdefault(host_shard(h, self.n_shards), ({}, {}))
            g[0][h] = v
            g[1][h] = counts.get(h, 0)
        ray.get(
            [self.shards[s].load.remote(d, dn) for s, (d, dn) in groups.items()]
        )

    def shutdown(self) -> None:
        import ray

        for s in self.shards:
            ray.kill(s)


class RobotsRules:
    """Immutable robots rules — built once, broadcast with ``ray.put``.

    ``disallowed(host, path)`` = any configured prefix matches;
    ``delay(host)`` = crawl_delay or the budget default.
    """

    def __init__(self, robots_table: pa.Table, default_delay: float):
        self.disallow: dict[str, tuple[str, ...]] = {}
        self.delays: dict[str, float] = {}
        for row in robots_table.to_pylist():
            self.disallow[row["host"]] = tuple(row["disallow"] or ())
            self.delays[row["host"]] = float(row["crawl_delay"])
        self.default_delay = float(default_delay)
        # sorted parallel arrays for the vectorized lookup (built once,
        # shipped with the ray.put broadcast); fixed-width unicode dtype
        # so searchsorted compares in C, not per-host Python
        keys = sorted(self.delays)
        self._delay_keys = np.asarray(keys, dtype="U")
        self._delay_vals = np.fromiter(
            (self.delays[k] for k in keys), np.float64, len(keys)
        )

    def delay(self, host: str) -> float:
        return self.delays.get(host, self.default_delay)

    def delays_vec(self, hosts: np.ndarray) -> np.ndarray:
        """Vectorized ``delay`` over a host array: ONE ``searchsorted``
        against the sorted rule table instead of a per-host dict get —
        removes the last per-unique-host Python loop from the
        schedule-carry hot path (``_shard_clock_carry``)."""
        out = np.full(len(hosts), self.default_delay, np.float64)
        keys = self._delay_keys
        if not len(keys) or not len(hosts):
            return out
        h = np.asarray(hosts, dtype="U")
        pos = np.searchsorted(keys, h)
        pos_c = np.minimum(pos, len(keys) - 1)
        hit = keys[pos_c] == h
        out[hit] = self._delay_vals[pos_c[hit]]
        return out

    def allowed_mask(self, hosts: np.ndarray, paths: np.ndarray) -> np.ndarray:
        out = np.ones(len(hosts), dtype=bool)
        dis = self.disallow
        for i, (h, p) in enumerate(zip(hosts, paths)):
            pre = dis.get(h)
            if pre and any(p.startswith(x) for x in pre):
                out[i] = False
        return out

    def allowed_mask_urls(self, hosts: np.ndarray, urls: list) -> np.ndarray:
        """Vectorized variant: only rows whose host actually has disallow
        rules need a path parse — for typical rule tables that is a tiny
        fraction, so the hot path is one ``np.isin`` over hosts."""
        out = np.ones(len(hosts), dtype=bool)
        ruled = [h for h, pre in self.disallow.items() if pre]
        if not ruled:
            return out
        candidates = np.isin(hosts, ruled)
        for i in np.where(candidates)[0]:
            pre = self.disallow.get(hosts[i])
            if pre:
                u = urls[i]
                cut = u.find("/", u.find("//") + 2)
                path = u[cut:] if cut != -1 else "/"
                # match against the urlsplit().path only — strip query and
                # fragment so this agrees with allowed_mask/path_of exactly
                for stop in ("?", "#"):
                    j = path.find(stop)
                    if j != -1:
                        path = path[:j]
                if any(path.startswith(x) for x in pre):
                    out[i] = False
        return out
