"""ShardedMetrics: token-guarded idempotency, partial-ref merge path,
dump/load round-trip (the round-3 driver-state shard)."""

import pyarrow as pa
import ray

from web_scraping_script_ray.state.metrics import ShardedMetrics


def _table(rows):
    return pa.Table.from_arrays(
        [
            pa.array([r[0] for r in rows], pa.string()),
            pa.array([r[1] for r in rows], pa.int64()),
            pa.array([r[2] for r in rows], pa.int64()),
            pa.array([r[3] for r in rows], pa.int64()),
        ],
        names=["host", "fetched", "errors", "bytes"],
    )


def test_add_rows_and_dump(ray_session):
    m = ShardedMetrics(3)
    m.add_rows([("a.com", 1, 0, 10), ("b.com", 2, 1, 20)], token=("r", 0))
    m.add_rows([("a.com", 3, 0, 30)], token=("r", 1))
    t = m.dump_table()
    assert t.column("host").to_pylist() == ["a.com", "b.com"]
    assert t.column("fetched").to_pylist() == [4, 2]
    assert t.column("bytes").to_pylist() == [40, 20]
    assert m.size() == 2
    m.shutdown()


def test_token_idempotency(ray_session):
    m = ShardedMetrics(2)
    rows = [("a.com", 1, 0, 10), ("b.com", 1, 0, 10)]
    m.add_rows(rows, token=("r", 0))
    m.add_rows(rows, token=("r", 0))  # replay — must be a no-op
    t = m.dump_table()
    assert t.column("fetched").to_pylist() == [1, 1]
    m.shutdown()


def test_merge_partial_refs(ray_session):
    m = ShardedMetrics(2)
    refs = [
        ray.put(_table([("a.com", 1, 0, 5), ("c.com", 2, 1, 7)])),
        ray.put(_table([("a.com", 4, 0, 5)])),
        ray.put(None),
    ]
    m.merge_partial_refs(refs, token=("r", 0))
    m.merge_partial_refs(refs, token=("r", 0))  # replay — no-op
    t = m.dump_table()
    assert t.column("host").to_pylist() == ["a.com", "c.com"]
    assert t.column("fetched").to_pylist() == [5, 2]
    assert t.column("errors").to_pylist() == [0, 1]
    m.shutdown()


def test_dump_load_round_trip(ray_session):
    m = ShardedMetrics(2)
    m.add_rows([("a.com", 1, 2, 3), ("b.com", 4, 5, 6), ("c.com", 7, 8, 9)])
    t = m.dump_table()
    m2 = ShardedMetrics(4)  # different shard count — load re-shards
    m2.load_table(t)
    assert m2.dump_table().equals(t)
    assert m2.size() == 3
    m.shutdown()
    m2.shutdown()
