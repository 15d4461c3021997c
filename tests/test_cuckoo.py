import numpy as np
import pytest

from web_scraping_script_ray.state.cuckoo import CuckooFilter, SeenShard


def _keys(n, seed=0):
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.integers(0, 2**63, size=n).astype(np.uint64)


def test_cuckoo_no_false_negatives():
    f = CuckooFilter(capacity=50_000)
    keys = _keys(40_000)
    f.add(keys)
    assert f.contains(keys).all()


def test_cuckoo_fpr_bound():
    f = CuckooFilter(capacity=50_000)
    f.add(_keys(40_000, seed=1))
    probe = _keys(100_000, seed=2)
    fpr = f.contains(probe).mean()
    assert fpr < 0.01  # 16-bit fingerprints → expected ~1e-4


def test_cuckoo_serialize_roundtrip():
    f = CuckooFilter(capacity=10_000)
    keys = _keys(5_000, seed=3)
    f.add(keys)
    g = CuckooFilter.deserialize(f.serialize())
    assert g.contains(keys).all()
    assert g.n_buckets == f.n_buckets
    assert g.count == f.count


def test_cuckoo_over_capacity_raises():
    f = CuckooFilter(capacity=64)
    with pytest.raises(RuntimeError):
        f.add(_keys(10_000, seed=4))


def test_seen_shard_exact_confirmation():
    s = SeenShard(capacity=10_000)
    a, b = _keys(1_000, seed=5), _keys(1_000, seed=6)
    assert s.add(a) == 1_000
    assert s.add(a) == 0  # idempotent
    assert s.probe(a).all()
    assert not s.probe(b).any()  # exact confirm kills cuckoo false positives
    assert s.size() == 1_000


def test_seen_shard_dump_load():
    s = SeenShard(capacity=10_000)
    keys = _keys(2_000, seed=7)
    s.add(keys)
    cuckoo, exact = s.dump()
    t = SeenShard(capacity=10_000)
    t.load(cuckoo, exact)
    assert t.probe(keys).all()
    assert t.size() == 2_000


def test_seen_shard_auto_grows_past_capacity():
    """A shard sized for 1k keys must absorb 100x that without raising:
    the filter doubles from the exact store when an insert would push it
    past 0.80 load, probes stay exact throughout, and a dump/load
    checkpoint round-trips the GROWN filter."""
    s = SeenShard(capacity=1_000)
    slots0 = s.filter.n_buckets
    all_keys = _keys(100_000, seed=8)
    for i in range(0, 100_000, 7_000):  # crawl-round-sized batches
        batch = all_keys[i : i + 7_000]
        assert s.add(batch) == len(np.unique(batch))
        assert s.probe(batch).all()
    assert s.filter.n_buckets > slots0  # it actually grew
    assert s.size() == len(np.unique(all_keys))
    assert s.probe(all_keys).all()
    assert not s.probe(_keys(50_000, seed=9)).any()  # still exact
    cuckoo, exact = s.dump()
    t = SeenShard(capacity=1_000)
    t.load(cuckoo, exact)
    assert t.probe(all_keys).all()
    assert t.filter.n_buckets == s.filter.n_buckets


def test_cuckoo_shard_aliased_keys_insert():
    """Regression (found by the 100M-doc run): shard routing gives every
    key of shard s the same low bits (key % n_shards == s).  Before the
    avalanche mix, i1 = key % n_buckets could reach only 1/n_shards of
    the buckets, so inserts blew past the random walk at ~1/16 of
    nominal load.  80k keys, all ≡ 5 (mod 16), into a 131k-slot filter
    (0.61 load) must insert and probe cleanly."""
    import numpy as np

    from web_scraping_script_ray.state.cuckoo import CuckooFilter

    f = CuckooFilter(100_000)
    rng = np.random.Generator(np.random.PCG64(3))
    keys = (
        rng.integers(0, 1 << 59, size=80_000, dtype=np.uint64) << np.uint64(4)
    ) | np.uint64(5)
    keys = np.unique(keys)
    f.add(keys)  # pre-fix: RuntimeError("cuckoo filter over capacity")
    assert f.contains(keys).all()


def test_seen_shard_load_rebuilds_filter_from_exact():
    """A checkpoint's cuckoo bytes may have been written by a build with
    a DIFFERENT bucket-index mixer (the splitmix64 _mix fix changed
    placements mid-project) — load() must not trust the placements.
    Simulate stale bytes by byte-shuffling a valid dump; probes must
    stay exact because load() rebuilds the filter from the exact
    hashes (probe() short-circuits on cuckoo negatives, so a trusted
    stale table would silently re-report seen URLs as new)."""
    s = SeenShard(capacity=1_000)
    keys = np.unique(_keys(20_000, seed=3))
    s.add(keys)
    cuckoo, exact = s.dump()
    stale = np.frombuffer(cuckoo, np.uint16).copy()
    np.random.default_rng(0).shuffle(stale)  # scramble placements
    t = SeenShard(capacity=1_000)
    t.load(stale.tobytes(), exact)
    assert t.probe(keys).all()  # no false negatives from stale bytes
    assert not t.probe(_keys(10_000, seed=4)).any()  # still exact
    # memory-neutral resume: same bucket count as the dumping shard
    assert t.filter.n_buckets == s.filter.n_buckets
