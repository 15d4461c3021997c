"""Distributed iterative graph operators (PageRank) over Ray Data.

A training-data pipeline ranks crawled pages by link authority before
sampling; the reference script has no graph step, so this is one of the
engine's scale extensions (SURVEY.md §8).  The implementation is the
canonical Ray-Data shape for an iterative message-passing algorithm:

- each iteration is one ``map_batches`` (scatter rank/out_degree along
  the edges) followed by one ``groupby().aggregate(Sum)`` with MAP-SIDE
  partial aggregation (``grouped_sum_count``) — only (dst, partial_sum)
  rows shuffle, never the node or edge payloads;
- every node also scatters a zero message to itself, so dangling /
  in-degree-0 nodes survive the groupby without a driver-side outer
  join;
- ranks are **fixed-point int64** (units of 1e-12): integer floor
  division makes the result independent of combine order AND exactly
  reproducible by a SQL oracle (float PageRank sums would hash-mismatch
  under Ray's nondeterministic partial-sum order).

At 100 TB the same plan holds: nodes and edges co-partitioned by
``hash(node_id)`` keep every scatter local, and the per-iteration
shuffle moves one partial row per (block, dst-key).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from .agg import grouped_sum_count

# Rank mass is SCALE units split across nodes; 0.15/0.85 damping applied
# as integer ops: new = (0.15*SCALE)//n + (85*incoming_sum)//100.
PR_SCALE = 1_000_000_000_000
_PR_A = 2654435761  # Knuth multiplicative-hash constants for the
_PR_B = 40503       # deterministic synthetic out-edges


def synth_out_edges(ids: np.ndarray, n_nodes: int, degree: int = 3) -> np.ndarray:
    """(len(ids), degree) int64 destination matrix for the deterministic
    synthetic link graph: dst_j(u) = (u*A + j*B) mod n, j=1..degree —
    exactly reproducible in SQL.  Stands in for the crawl link table."""
    ids = ids.astype(np.int64)
    return np.stack(
        [(ids * _PR_A + j * _PR_B) % n_nodes for j in range(1, degree + 1)],
        axis=1,
    )


def pagerank_fixed_point(
    nodes: "ray.data.Dataset",
    n_nodes: int,
    iters: int = 5,
    degree: int = 3,
    small_limit: int = 1_000_000,
) -> "ray.data.Dataset":
    """``iters`` rounds of damped PageRank over the synthetic out-edges of
    ``nodes`` (a Dataset with a ``doc_id`` column).  Returns (doc_id,
    pr_rank) with pr_rank in int64 1e-12 units.

    Size-selected like the crawl's two physical plans: at
    ``n_nodes <= small_limit`` the whole fixed point runs in ONE remote
    task on dense numpy arrays (5 chained Ray groupbys on a sub-million-
    node graph are pure scheduling overhead — measured 6.2 s for 500
    nodes at 32 CPUs vs ~0.5 s single-task); above it, the per-iteration
    scatter + map-side-combined groupby below is the plan that scales.
    Both paths use identical int64 arithmetic and agree bit-for-bit
    (pytest covers small == distributed == sequential reference)."""
    import ray.data

    if n_nodes and n_nodes <= small_limit:
        refs = nodes.select_columns(["doc_id"]).to_arrow_refs()
        out_ref = _pagerank_small_task.remote(refs, n_nodes, iters, degree)
        return ray.data.from_arrow_refs([out_ref])

    r0 = PR_SCALE // n_nodes
    base = (15 * PR_SCALE // 100) // n_nodes

    def init(batch: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [batch.column("doc_id"),
             pa.array(np.full(batch.num_rows, r0, np.int64), pa.int64())],
            names=["doc_id", "pr_rank"],
        )

    ranks = nodes.map_batches(init, batch_format="pyarrow")
    for _ in range(iters):
        def scatter(batch: pa.Table) -> pa.Table:
            ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
            r = batch.column("pr_rank").to_numpy(zero_copy_only=False).astype(np.int64)
            dsts = synth_out_edges(ids, n_nodes, degree)
            contrib = r // degree
            # degree edge messages per node + one zero self-message so
            # every node appears in the aggregate output
            out_dst = np.concatenate([dsts.ravel(), ids])
            out_c = np.concatenate(
                [np.repeat(contrib, degree), np.zeros(len(ids), np.int64)]
            )
            return pa.Table.from_arrays(
                [pa.array(out_dst, pa.int64()), pa.array(out_c, pa.int64())],
                names=["doc_id", "contrib"],
            )

        sums = grouped_sum_count(
            ranks.map_batches(scatter, batch_format="pyarrow"),
            ["doc_id"], ["contrib"], {"contrib": "s"},
        )

        def damp(batch: pa.Table) -> pa.Table:
            s = batch.column("s").to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.Table.from_arrays(
                [batch.column("doc_id"),
                 pa.array(base + (85 * s) // 100, pa.int64())],
                names=["doc_id", "pr_rank"],
            )

        ranks = sums.map_batches(damp, batch_format="pyarrow")
    return ranks


def _pagerank_small_kernel(
    ids: np.ndarray, n_nodes: int, iters: int, degree: int
) -> tuple[np.ndarray, np.ndarray]:
    """Single-process emulation of the distributed iteration: same message
    set (degree edge messages + one zero self-message), same int64 floor
    arithmetic, keys = union of destinations and senders each round —
    bit-for-bit the groupby path's semantics for any id set."""
    r0 = PR_SCALE // n_nodes
    base = (15 * PR_SCALE // 100) // n_nodes
    ids = np.sort(ids.astype(np.int64))
    r = np.full(len(ids), r0, np.int64)
    for _ in range(iters):
        dsts = synth_out_edges(ids, n_nodes, degree)
        out_dst = np.concatenate([dsts.ravel(), ids])
        out_c = np.concatenate(
            [np.repeat(r // degree, degree), np.zeros(len(ids), np.int64)]
        )
        keys = np.unique(out_dst)
        s = np.zeros(len(keys), np.int64)
        np.add.at(s, np.searchsorted(keys, out_dst), out_c)
        ids, r = keys, base + (85 * s) // 100
    return ids, r


@ray.remote
def _pagerank_small_task(refs: list, n_nodes: int, iters: int, degree: int):
    tables = [t for t in ray.get(list(refs)) if t.num_rows]
    ids = (
        np.concatenate(
            [t.column("doc_id").to_numpy(zero_copy_only=False) for t in tables]
        )
        if tables
        else np.zeros(0, np.int64)
    )
    ids, r = _pagerank_small_kernel(ids, n_nodes, iters, degree)
    return pa.Table.from_arrays(
        [pa.array(ids, pa.int64()), pa.array(r, pa.int64())],
        names=["doc_id", "pr_rank"],
    )
