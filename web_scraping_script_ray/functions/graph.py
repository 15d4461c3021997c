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
) -> "ray.data.Dataset":
    """``iters`` rounds of damped PageRank over the synthetic out-edges of
    ``nodes`` (a Dataset with a ``doc_id`` column).  Returns (doc_id,
    pr_rank) with pr_rank in int64 1e-12 units."""
    import ray.data  # noqa: F401  (typing only)

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
