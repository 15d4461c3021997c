"""Cuckoo-filter URL-seen set, sharded across Ray actors (north_rule T7).

The reference has no URL-seen state at all (it never recurses; SURVEY.md
§2.7) — its observable semantics are post-hoc first-wins dedup on the URL
column (reference: src/main.py:197-206).  The north rule requires a sharded
*cuckoo filter* keyed by the canonical URL hash **and** an exactly-matching
final seen set.  Design:

- ``CuckooFilter``: numpy-backed, 4-slot buckets, 16-bit fingerprints
  (FPR ≈ 2·4/2^16 ≈ 1.2e-4), partial-key cuckoo hashing with the
  fingerprint-XOR alternate bucket.  Serializes to bytes for checkpoints.
- ``SeenShard`` (Ray actor): a cuckoo filter for fast negative probes plus
  an exact uint64 set used ONLY to confirm cuckoo-positive probes, so the
  final seen set is exact (north_rule: URL-seen set must match the oracle
  exactly).  At 10^10-URL scale the exact set becomes a per-shard sorted
  parquet spill probed only on the ~1e-4 cuckoo-positive path; in-memory
  here because the sandbox frontier is ≤1e6.
- ``ShardedSeen``: driver-side handle — routes ``url_hash % n_shards`` to
  shard actors, fans probe/add calls out in parallel.
"""

from __future__ import annotations

import numpy as np

from .util import retry_actor_get

_EMPTY = np.uint16(0)
_BUCKET_SLOTS = 4
_MAX_KICKS = 500


class CuckooFilter:
    """Approximate membership over uint64 keys."""

    def __init__(self, capacity: int, seed: int = 0x5EED):
        n_buckets = max(8, int(1 << int(np.ceil(np.log2(capacity / _BUCKET_SLOTS / 0.84 + 1)))))
        self.n_buckets = n_buckets
        self.table = np.zeros((n_buckets, _BUCKET_SLOTS), dtype=np.uint16)
        self.seed = seed
        self.count = 0
        self._rng = np.random.Generator(np.random.PCG64(seed))

    # fingerprint in [1, 2^16): 0 is the empty marker
    def _fp(self, keys: np.ndarray) -> np.ndarray:
        fp = ((keys >> np.uint64(48)) ^ (keys >> np.uint64(16))).astype(np.uint16)
        fp[fp == 0] = 1
        return fp

    @staticmethod
    def _mix(keys: np.ndarray) -> np.ndarray:
        """splitmix64 finalizer — full avalanche before bucket indexing.

        REQUIRED, found the hard way at 100M-doc scale: the shard router
        sends shard ``s`` only keys with ``key % n_shards == s``, so a
        plain ``key % n_buckets`` primary index (n_buckets a power of two
        ≥ n_shards) could only ever reach 1/n_shards of the buckets —
        the i1 side saturated and random-walk inserts failed at ~1/16 of
        nominal load, far below the 0.8 growth threshold.  Avalanching
        decorrelates the bucket index from any routing residue."""
        k = keys.astype(np.uint64).copy()
        k ^= k >> np.uint64(33)
        k *= np.uint64(0xFF51AFD7ED558CCD)
        k ^= k >> np.uint64(33)
        k *= np.uint64(0xC4CEB9FE1A85EC53)
        k ^= k >> np.uint64(33)
        return k

    def _i1(self, keys: np.ndarray) -> np.ndarray:
        return (self._mix(keys) % np.uint64(self.n_buckets)).astype(np.int64)

    def _i2(self, i1: np.ndarray, fp: np.ndarray) -> np.ndarray:
        # alternate bucket = i1 xor hash(fp)
        h = (fp.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(32)
        return ((i1.astype(np.uint64) ^ h) % np.uint64(self.n_buckets)).astype(np.int64)

    def add(self, keys: np.ndarray) -> None:
        """Vectorized bulk insert: 8 numpy passes (2 candidate buckets ×
        4 slots), each claiming every contested slot for its FIRST
        pending candidate (``np.unique`` first-occurrence); losers retry
        at the next slot/bucket — identical placement policy to the old
        per-key loop (i1 free slots, then i2, else evict).  Only keys
        still unplaced after all passes (both buckets full — rare below
        0.8 load) fall back to the per-key random-walk eviction.  This
        is the seen-set hot path: a crawl round bulk-adds each shard's
        new URL hashes, and every filter doubling re-adds the whole
        exact store."""
        keys = np.asarray(keys, dtype=np.uint64)
        if keys.size == 0:
            return
        fps, i1s = self._fp(keys), self._i1(keys)
        i2s = self._i2(i1s, fps)
        placed = np.zeros(len(keys), dtype=bool)
        for buckets in (i1s, i2s):
            for s in range(_BUCKET_SLOTS):
                rem = np.where(~placed)[0]
                if not len(rem):
                    break
                cand = rem[self.table[buckets[rem], s] == _EMPTY]
                if not len(cand):
                    continue
                # contested slots resolve by last-writer-wins fancy
                # assignment, then a read-back identifies the holders —
                # O(n) with no sort.  Two candidates with the SAME
                # bucket AND fingerprint both read back as placed and
                # share the entry; membership is unaffected (no delete
                # exists) and the filter just runs very slightly lighter.
                bc, fc = buckets[cand], fps[cand]
                self.table[bc, s] = fc
                won = self.table[bc, s] == fc
                placed[cand[won]] = True
        for i in np.where(~placed)[0]:
            self._insert_one(np.uint16(fps[i]), int(i1s[i]), int(i2s[i]))
        # one vector scan keeps count == occupied slots (shared-entry
        # placements would drift an incremental counter; deserialize
        # recounts from the table, so these must agree)
        self.count = int((self.table != _EMPTY).sum())

    def _insert_one(self, fp: np.uint16, i1: int, i2: int) -> None:
        for b in (i1, i2):
            row = self.table[b]
            free = np.where(row == _EMPTY)[0]
            if len(free):
                row[free[0]] = fp
                self.count += 1
                return
        # evict: random-walk cuckoo kicks
        b = i1 if self._rng.integers(2) else i2
        for _ in range(_MAX_KICKS):
            slot = int(self._rng.integers(_BUCKET_SLOTS))
            fp, self.table[b, slot] = self.table[b, slot], fp
            b = int(self._i2(np.array([b], np.int64), np.array([fp], np.uint16))[0])
            row = self.table[b]
            free = np.where(row == _EMPTY)[0]
            if len(free):
                row[free[0]] = fp
                self.count += 1
                return
        raise RuntimeError("cuckoo filter over capacity — resize the shard")

    def contains(self, keys: np.ndarray) -> np.ndarray:
        keys = np.asarray(keys, dtype=np.uint64)
        if keys.size == 0:
            return np.zeros(0, dtype=bool)
        fps, i1s = self._fp(keys), self._i1(keys)
        i2s = self._i2(i1s, fps)
        hit1 = (self.table[i1s] == fps[:, None]).any(axis=1)
        hit2 = (self.table[i2s] == fps[:, None]).any(axis=1)
        return hit1 | hit2

    def serialize(self) -> bytes:
        return self.table.tobytes()

    @classmethod
    def deserialize(cls, data: bytes, seed: int = 0x5EED) -> "CuckooFilter":
        arr = np.frombuffer(data, dtype=np.uint16).reshape(-1, _BUCKET_SLOTS).copy()
        f = cls.__new__(cls)
        f.n_buckets = arr.shape[0]
        f.table = arr
        f.seed = seed
        f.count = int((arr != _EMPTY).sum())
        f._rng = np.random.Generator(np.random.PCG64(seed))
        return f


class SeenShard:
    """One shard of the URL-seen set (run as a Ray actor).

    Probe path: cuckoo-negative → definitely new (no exact lookup);
    cuckoo-positive → confirm against the exact store, so false positives
    never drop a URL and the final seen set matches the oracle exactly.

    The exact store is a sorted uint64 array plus a small unsorted
    pending buffer (merged when it grows): probes are vectorized
    ``np.searchsorted`` / ``np.isin`` instead of per-key Python set
    lookups — crawl frontiers probe millions of keys per round and most
    positives are true duplicates, so the confirm path must be
    vectorized.  The pending buffer is a list of numpy chunks (adds are
    pre-deduped against the store, so append IS set-insert) — no Python
    int boxing anywhere on the add path.
    """

    _MERGE_AT = 65_536

    def __init__(self, capacity: int = 1 << 20):
        self.filter = CuckooFilter(capacity)
        self.sorted = np.empty(0, dtype=np.uint64)
        self.pending: list[np.ndarray] = []
        self.pending_n = 0

    def _merge(self) -> None:
        if self.pending_n:
            self.sorted = np.sort(np.concatenate([self.sorted, *self.pending]))
            self.pending = []
            self.pending_n = 0

    def _contains_exact(self, hashes: np.ndarray) -> np.ndarray:
        out = np.zeros(len(hashes), dtype=bool)
        if len(self.sorted):
            pos = np.searchsorted(self.sorted, hashes)
            in_range = pos < len(self.sorted)
            out[in_range] = self.sorted[pos[in_range]] == hashes[in_range]
        if self.pending_n:
            miss = np.where(~out)[0]
            if len(miss):
                h = hashes[miss]
                acc = np.zeros(len(miss), dtype=bool)
                for chunk in self.pending:  # each chunk is sorted (np.unique output)
                    pos = np.searchsorted(chunk, h)
                    in_range = pos < len(chunk)
                    acc[in_range] |= chunk[pos[in_range]] == h[in_range]
                out[miss] = acc
        return out

    def probe(self, hashes: np.ndarray) -> np.ndarray:
        """→ boolean mask: True = already seen."""
        hashes = np.asarray(hashes, dtype=np.uint64)
        maybe = self.filter.contains(hashes)
        out = np.zeros(len(hashes), dtype=bool)
        idx = np.where(maybe)[0]
        if len(idx):
            out[idx] = self._contains_exact(hashes[idx])
        return out

    def _maybe_grow(self, incoming: int) -> None:
        """Double the cuckoo filter when the next insert would push it
        past a safe load factor (0.80 of slots; random-walk kicks start
        failing near 0.95).  The filter is DERIVABLE state — the exact
        store is the truth — so growth is a local rebuild from
        ``sorted``: O(shard keys) once per doubling, amortized O(1) per
        insert.  This is what lets a fixed ``capacity_per_shard`` guess
        survive a 10^10-URL frontier instead of raising mid-crawl."""
        slots = self.filter.n_buckets * _BUCKET_SLOTS
        if self.filter.count + incoming <= int(0.80 * slots):
            return
        self._merge()
        new_cap = max(slots * 2, 2 * (self.filter.count + incoming))
        f = CuckooFilter(new_cap, seed=self.filter.seed)
        if len(self.sorted):
            f.add(self.sorted)
        self.filter = f

    def add(self, hashes: np.ndarray) -> int:
        hashes = np.unique(np.asarray(hashes, dtype=np.uint64))
        new_mask = ~self._contains_exact(hashes)
        new = hashes[new_mask]
        if len(new):
            self._maybe_grow(len(new))
            self.filter.add(new)
            self.pending.append(new)  # sorted: np.unique output
            self.pending_n += len(new)
            # amortized merge: a fixed threshold makes every crawl round
            # re-sort the WHOLE store (O(N^2 log N) over a crawl); merge
            # only when pending reaches a quarter of the sorted store
            # (geometric, O(N log N) total) or the chunk list would make
            # probes loop too much
            if (
                self.pending_n >= max(self._MERGE_AT, len(self.sorted) >> 2)
                or len(self.pending) > 64
            ):
                self._merge()
        return int(len(new))

    def size(self) -> int:
        return len(self.sorted) + self.pending_n

    def mem_bytes(self) -> int:
        """Resident bytes of this shard's state (cuckoo slots + exact
        store + pending chunks) — the per-shard memory audit the 10^10
        frontier story reports per round."""
        return int(
            self.filter.table.nbytes
            + self.sorted.nbytes
            + sum(c.nbytes for c in self.pending)
        )

    def dump(self) -> tuple[bytes, np.ndarray]:
        """Checkpoint payload: (cuckoo bytes, exact hashes)."""
        self._merge()
        return self.filter.serialize(), self.sorted.copy()

    def load(self, cuckoo_bytes: bytes, exact: np.ndarray) -> None:
        """Restore from a checkpoint.  The cuckoo filter is REBUILT from
        the exact hashes rather than deserialized: the filter is
        derivable state (``_maybe_grow`` already rebuilds it from
        ``sorted``), and trusting checkpoint bytes would silently restore
        stale bucket placements whenever the bucket-index mixing scheme
        changes between writer and reader builds — ``probe()``
        short-circuits on cuckoo negatives without consulting the exact
        store, so stale placements make a resumed crawl re-fetch seen
        URLs.  ``cuckoo_bytes`` is kept in the checkpoint format and used
        only as a CAPACITY hint (restore at least the checkpointed size,
        so a resumed shard doesn't immediately re-grow)."""
        self.sorted = np.unique(np.asarray(exact, dtype=np.uint64))
        self.pending = []
        self.pending_n = 0
        old_slots = (len(cuckoo_bytes) // (2 * _BUCKET_SLOTS)) * _BUCKET_SLOTS
        # 0.8×slots maps back to the SAME n_buckets through the ctor's
        # /0.84 headroom (so a resume is memory-neutral, not a doubling);
        # the len(sorted) floor only binds if the bytes are truncated —
        # the checkpointed filter held exactly these keys at ≤0.8 load
        cap = max(1024, int(old_slots * 0.8), len(self.sorted))
        f = CuckooFilter(cap)
        if len(self.sorted):
            f.add(self.sorted)
        self.filter = f


class ShardedSeen:
    """Driver-side handle over ``n_shards`` SeenShard actors.

    Shard routing: ``url_hash % n_shards``.  All fan-out calls run in
    parallel (one RPC per shard holding any of the batch's keys).
    """

    def __init__(self, n_shards: int = 8, capacity_per_shard: int = 1 << 20):
        import ray

        self.n_shards = n_shards
        actor = ray.remote(num_cpus=0)(SeenShard)
        self.shards = [actor.remote(capacity_per_shard) for _ in range(n_shards)]

    def _route(self, hashes: np.ndarray):
        hashes = np.asarray(hashes, dtype=np.uint64)
        sid = (hashes % np.uint64(self.n_shards)).astype(np.int64)
        return hashes, sid

    def probe(self, hashes: np.ndarray) -> np.ndarray:
        hashes, sid = self._route(hashes)
        out = np.zeros(len(hashes), dtype=bool)
        idxs = [np.where(sid == s)[0] for s in range(self.n_shards)]
        live = [s for s in range(self.n_shards) if len(idxs[s])]

        def calls():
            return [self.shards[s].probe.remote(hashes[idxs[s]]) for s in live]

        for s, mask in zip(live, retry_actor_get(calls)):  # idempotent
            out[idxs[s]] = mask
        return out

    def add(self, hashes: np.ndarray) -> None:
        hashes, sid = self._route(hashes)
        idxs = [np.where(sid == s)[0] for s in range(self.n_shards)]
        live = [s for s in range(self.n_shards) if len(idxs[s])]
        # set semantics -> re-issuing on actor timeout is safe
        retry_actor_get(
            lambda: [self.shards[s].add.remote(hashes[idxs[s]]) for s in live]
        )

    def add_blocks(self, block_refs, hash_col: str = "url_hash") -> None:
        """Distributed insert: one remote task per Arrow block routes its
        hashes to the shard actors — rows never pass through the driver."""
        import ray

        @ray.remote(num_cpus=0)
        def _add(t, shards, n_shards):
            h = t.column(hash_col).to_numpy(zero_copy_only=False).astype(np.uint64)
            sid = (h % np.uint64(n_shards)).astype(np.int64)
            from web_scraping_script_ray.state.util import retry_actor_get

            idxs = [np.where(sid == s)[0] for s in range(n_shards)]
            live = [s for s in range(n_shards) if len(idxs[s])]
            retry_actor_get(
                lambda: [shards[s].add.remote(h[idxs[s]]) for s in live]
            )
            return None

        ray.get([_add.remote(r, self.shards, self.n_shards) for r in block_refs])

    def size(self) -> int:
        import ray

        return sum(ray.get([s.size.remote() for s in self.shards]))

    def mem_report(self) -> dict:
        """Per-shard (keys, bytes) plus totals — O(n_shards) scalars."""
        import ray

        sizes = ray.get([s.size.remote() for s in self.shards])
        mems = ray.get([s.mem_bytes.remote() for s in self.shards])
        return {
            "shard_keys": sizes,
            "shard_bytes": mems,
            "total_keys": int(sum(sizes)),
            "total_bytes": int(sum(mems)),
        }

    def dump(self) -> list[tuple[bytes, np.ndarray]]:
        import ray

        return ray.get([s.dump.remote() for s in self.shards])

    def load(self, dumps: list[tuple[bytes, np.ndarray]]) -> None:
        import ray

        ray.get(
            [s.load.remote(cb, ex) for s, (cb, ex) in zip(self.shards, dumps)]
        )

    def shutdown(self) -> None:
        import ray

        for s in self.shards:
            ray.kill(s)
