"""Distributed global-rank assignment (zipWithIndex) for Ray Datasets.

Ray Data has no native row-number operator; the crawl engine needs a total
order (``crawl_seq``) over each round's scheduled candidates.  Pattern:

1. ``ds.sort(keys)`` — range-partitioning shuffle; the resulting block
   list is in global sort order;
2. per-block row counts via tiny remote tasks (one int per block to the
   driver — O(blocks), never O(rows));
3. prefix-sum offsets on the driver, then one remote task per block
   appends ``offset + arange(len)`` — rows never touch the driver.

This scales to arbitrarily large rounds: driver traffic is #blocks ints.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data


@ray.remote(num_cpus=0)
def _nrows(t: pa.Table) -> int:
    return t.num_rows


@ray.remote
def _with_rank(t: pa.Table, rank0: int, base: int, col: str, limit: int | None) -> pa.Table:
    rank = np.arange(rank0, rank0 + t.num_rows, dtype=np.int64)
    if limit is not None:
        t = t.slice(0, max(0, int(limit - rank0)))
        rank = rank[: t.num_rows]
    return t.append_column(col, pa.array(rank + base, pa.int64()))


def zip_with_index(
    ds: "ray.data.Dataset",
    sort_keys: list[str],
    col: str = "rank",
    limit: int | None = None,
    base: int = 0,
    descending: "list[bool] | None" = None,
) -> tuple["ray.data.Dataset", int]:
    """Total-order rank (``base + position``) by ``sort_keys``; rows whose
    0-based position ≥ ``limit`` are dropped (budget truncation fused into
    the same pass).  Returns (materialized dataset, surviving row count).
    """
    ds = ds.sort(sort_keys) if descending is None else ds.sort(
        sort_keys, descending=descending
    )
    refs = ds.to_arrow_refs()
    if not refs:
        return ds, 0
    counts = ray.get([_nrows.remote(r) for r in refs])
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int64)
    total = int(sum(counts))
    if limit is not None:
        total = min(total, int(limit))
        live = [(r, o) for r, o, c in zip(refs, offsets, counts) if o < limit and c]
    else:
        live = [(r, o) for r, o, c in zip(refs, offsets, counts) if c]
    if not live:
        return ds.limit(0), 0
    out = [_with_rank.remote(r, int(o), base, col, limit) for r, o in live]
    return ray.data.from_arrow_refs(out), total


# ---------------------------------------------------------------------------
# First-wins dedup over a sorted dataset (A3 semantics — keep the first
# occurrence in discovery order; reference: src/main.py:197-206).
# ---------------------------------------------------------------------------


@ray.remote(num_cpus=0)
def _last_key(t: pa.Table, keys: list[str]):
    if t.num_rows == 0:
        return None
    return tuple(t.column(k)[t.num_rows - 1].as_py() for k in keys)


@ray.remote
def _dedup_block(t: pa.Table, keys: list[str], prev_last) -> pa.Table:
    if t.num_rows == 0:
        return t
    cols = [t.column(k).to_numpy(zero_copy_only=False) for k in keys]
    first = np.zeros(len(cols[0]), dtype=bool)
    first[0] = True
    for c in cols:
        first[1:] |= c[1:] != c[:-1]
    if prev_last is not None:
        same_prev = np.ones(len(cols[0]), dtype=bool)
        for c, pv in zip(cols, prev_last):
            same_prev &= c == c.dtype.type(pv)
        first &= ~same_prev
    return t.filter(pa.array(first))


# ---------------------------------------------------------------------------
# Per-key rank over a sorted dataset (within-host politeness index) —
# replaces groupby(key).map_groups, whose per-group overhead dominates with
# thousands of small groups.  One range-partition sort + a narrow per-block
# pass; cross-block key runs are handled by carrying per-key counts from
# previous blocks (driver traffic O(keys-in-round + blocks), never O(rows)).
# ---------------------------------------------------------------------------


@ray.remote(num_cpus=0)
def _key_counts(t: pa.Table, key: str):
    if t.num_rows == 0:
        return [], []
    import pyarrow.compute as pc

    vc = pc.value_counts(t.column(key))
    return (
        pc.struct_field(vc, "values").to_pylist(),
        pc.struct_field(vc, "counts").to_pylist(),
    )


@ray.remote
def _rank_block(t: pa.Table, key: str, base: dict, out_col: str) -> pa.Table:
    if t.num_rows == 0:
        return t.append_column(out_col, pa.array([], pa.int64()))
    keys = np.asarray(t.column(key).to_pylist(), dtype=object)
    n = len(keys)
    change = np.ones(n, dtype=bool)
    change[1:] = keys[1:] != keys[:-1]
    run_starts = np.where(change)[0]
    run_ids = np.cumsum(change) - 1
    base_arr = np.array([base.get(k, 0) for k in keys[run_starts]], dtype=np.int64)
    rank = np.arange(n, dtype=np.int64) - run_starts[run_ids] + base_arr[run_ids]
    return t.append_column(out_col, pa.array(rank, pa.int64()))


def per_key_rank(
    ds: "ray.data.Dataset", key: str, order_cols: list[str], out_col: str = "key_rank"
) -> "ray.data.Dataset":
    """Append ``out_col`` = 0-based position of the row within its ``key``
    group, ordered by ``order_cols``.  Sorted by (key, *order_cols) on
    return."""
    ds = ds.sort([key, *order_cols])
    refs = ds.to_arrow_refs()
    if not refs:
        return ds
    summaries = ray.get([_key_counts.remote(r, key) for r in refs])
    running: dict = {}
    out = []
    for r, (ks, cs) in zip(refs, summaries):
        base = {k: running[k] for k in ks if k in running}
        out.append(_rank_block.remote(r, key, base, out_col))
        for k, c in zip(ks, cs):
            running[k] = running.get(k, 0) + c
    return ray.data.from_arrow_refs(out)


def dedup_first_wins(
    ds: "ray.data.Dataset", key: "str | list[str]", order_cols: list[str]
) -> "ray.data.Dataset":
    """Keep, per (possibly composite) ``key``, the row with the smallest
    ``order_cols`` tuple.

    Implementation: range-partitioning sort on (*keys, *order_cols), then a
    narrow per-block pass that drops repeats — a block consults only the
    previous block's last key tuple (O(blocks) driver traffic), so key
    groups spanning block boundaries dedup correctly without a second
    shuffle.  Composite keys are deduped as real tuples — no packed-integer
    key that could alias distinct values.
    """
    keys = [key] if isinstance(key, str) else list(key)
    ds = ds.sort([*keys, *order_cols])
    refs = ds.to_arrow_refs()
    if not refs:
        return ds
    lasts = ray.get([_last_key.remote(r, keys) for r in refs])
    prev = None
    out = []
    for r, last in zip(refs, lasts):
        out.append(_dedup_block.remote(r, keys, prev))
        if last is not None:
            prev = last
    return ray.data.from_arrow_refs(out)
