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
import pyarrow.compute as pc
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


# ---------------------------------------------------------------------------
# Connected components (min-id label propagation) — the distributed keep
# policy for the near-dup family.  The driver union-find
# (functions/dedup.py:keep_mask_from_pairs) is O(pairs) Python on the
# driver: fine while pairs ≪ docs, a driver OOM on a duplicate-heavy
# 100-TB crawl (10^9+ pairs).  This is the scale plan: labels live in a
# Dataset, every iteration is two coarse-partition exchanges that move
# only (node, candidate-label) rows, and nothing ever lands on the
# driver but the per-iteration changed-row count.
# ---------------------------------------------------------------------------

_CC_HASH = np.uint64(2654435761)


def _cc_part(ids: np.ndarray, n_parts: int) -> np.ndarray:
    return ((ids.astype(np.uint64) * _CC_HASH) % np.uint64(n_parts)).astype(np.int64)


def connected_components_minid(
    pairs: "ray.data.Dataset",
    n_parts: int = 64,
    max_iters: int = 64,
) -> "ray.data.Dataset":
    """Connected components over an undirected edge Dataset with int64
    columns ``id_a``/``id_b`` → ``(doc_id, canonical_id)`` for every
    node incident to at least one edge, ``canonical_id`` = component min.

    Per iteration every node's label becomes ``min(own, labels of
    neighbors)`` — converges in (eccentricity from each component's min
    node) rounds; duplicate clusters are shallow so this is small, and a
    non-converged run at ``max_iters`` raises instead of returning wrong
    labels.  The partition key is COARSE (``hash(node) % n_parts``, the
    LSH band-grouping lesson: Ray's per-distinct-key groupby cost) and
    identical across stages so edge and label rows for a node always
    co-locate.  ``pytest tests/test_graph_quality.py`` forces this path
    against the driver union-find for equality."""
    import ray.data

    def sym(batch: pa.Table) -> pa.Table:
        a = batch.column("id_a").to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch.column("id_b").to_numpy(zero_copy_only=False).astype(np.int64)
        src = np.concatenate([a, b])
        dst = np.concatenate([b, a])
        return pa.Table.from_arrays(
            [
                pa.array(_cc_part(src, n_parts), pa.int64()),
                pa.array(src, pa.int64()),
                pa.array(dst, pa.int64()),
            ],
            names=["part", "src", "dst"],
        )

    edges = pairs.map_batches(sym, batch_format="pyarrow").materialize()

    def init_labels(batch: pa.Table) -> pa.Table:
        # per-block unique sources; global dedup happens in the first
        # merge round (labels are idempotent: (n, n) duplicates are
        # min-merged away)
        u = pc.unique(batch.column("src")).to_numpy(zero_copy_only=False)
        return pa.Table.from_arrays(
            [
                pa.array(_cc_part(u, n_parts), pa.int64()),
                pa.array(u, pa.int64()),
                pa.array(u, pa.int64()),
            ],
            names=["part", "node", "label"],
        )

    def dedup_min(g: pa.Table) -> pa.Table:
        t = g.select(["node", "label"]).group_by(["node"]).aggregate([("label", "min")])
        n = t.column("node").to_numpy(zero_copy_only=False)
        return pa.Table.from_arrays(
            [
                pa.array(_cc_part(n, n_parts), pa.int64()),
                t.column("node"),
                t.column("label_min"),
            ],
            names=["part", "node", "label"],
        )

    labels = (
        edges.map_batches(init_labels, batch_format="pyarrow")
        .groupby("part")
        .map_groups(dedup_min, batch_format="pyarrow")
        .materialize()
    )

    # one unified row shape so edges and labels can union through a single
    # exchange: edge rows (src, dst), label rows (node, label)
    def tag_edges(batch: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [
                batch.column("part"),
                batch.column("src"),
                batch.column("dst"),
                pa.array(np.ones(batch.num_rows, np.int8), pa.int8()),
            ],
            names=["part", "k1", "k2", "is_edge"],
        )

    def tag_labels(batch: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [
                batch.column("part"),
                batch.column("node"),
                batch.column("label"),
                pa.array(np.zeros(batch.num_rows, np.int8), pa.int8()),
            ],
            names=["part", "k1", "k2", "is_edge"],
        )

    edges_tagged = edges.map_batches(tag_edges, batch_format="pyarrow").materialize()

    def propagate(g: pa.Table) -> pa.Table:
        """Within one part: edge rows look up their src's label, emit
        (dst, label) messages pre-minimized per dst (map-side combine)."""
        is_edge = g.column("is_edge").to_numpy(zero_copy_only=False).astype(bool)
        lab_t = g.filter(pa.array(~is_edge))
        edg_t = g.filter(pa.array(is_edge))
        if edg_t.num_rows == 0 or lab_t.num_rows == 0:
            return pa.table(
                {
                    "part": pa.array([], pa.int64()),
                    "node": pa.array([], pa.int64()),
                    "cand": pa.array([], pa.int64()),
                }
            )
        at = pc.index_in(edg_t.column("k1"), value_set=lab_t.column("k1").combine_chunks())
        lab = lab_t.column("k2").combine_chunks().take(at)
        msgs = pa.Table.from_arrays(
            [edg_t.column("k2"), lab], names=["node", "cand"]
        )
        m = msgs.group_by(["node"]).aggregate([("cand", "min")])
        n = m.column("node").to_numpy(zero_copy_only=False)
        return pa.Table.from_arrays(
            [
                pa.array(_cc_part(n, n_parts), pa.int64()),
                m.column("node"),
                m.column("cand_min"),
            ],
            names=["part", "node", "cand"],
        )

    def merge(g: pa.Table) -> pa.Table:
        """Within one part: new label = min(current, candidates); a
        ``changed`` column carries the convergence signal out."""
        cur = g.filter(pc.equal(g.column("is_cur"), pa.scalar(1, pa.int8())))
        t = (
            g.select(["node", "val"])
            .group_by(["node"])
            .aggregate([("val", "min")])
        )
        at = pc.index_in(t.column("node"), value_set=cur.column("node").combine_chunks())
        old = cur.column("val").combine_chunks().take(at)
        new = t.column("val_min")
        changed = pc.cast(pc.not_equal(new, old), pa.int64())
        n = t.column("node").to_numpy(zero_copy_only=False)
        return pa.Table.from_arrays(
            [
                pa.array(_cc_part(n, n_parts), pa.int64()),
                t.column("node"),
                new,
                changed,
            ],
            names=["part", "node", "label", "changed"],
        )

    for _ in range(max_iters):
        msgs = (
            labels.map_batches(tag_labels, batch_format="pyarrow")
            .union(edges_tagged)
            .groupby("part")
            .map_groups(propagate, batch_format="pyarrow")
        )

        def tag_cur(batch: pa.Table) -> pa.Table:
            return pa.Table.from_arrays(
                [
                    batch.column("part"),
                    batch.column("node"),
                    batch.column("label"),
                    pa.array(np.ones(batch.num_rows, np.int8), pa.int8()),
                ],
                names=["part", "node", "val", "is_cur"],
            )

        def tag_msg(batch: pa.Table) -> pa.Table:
            return pa.Table.from_arrays(
                [
                    batch.column("part"),
                    batch.column("node"),
                    batch.column("cand"),
                    pa.array(np.zeros(batch.num_rows, np.int8), pa.int8()),
                ],
                names=["part", "node", "val", "is_cur"],
            )

        # union doubles the block count and sort-shuffle preserves it, so
        # an unbounded loop doubles blocks EVERY round (measured: jump
        # wall 1.3 s → 23.8 s over 5 rounds from task-count explosion
        # alone) — re-bound to n_parts before materializing
        merged = (
            labels.map_batches(tag_cur, batch_format="pyarrow")
            .union(msgs.map_batches(tag_msg, batch_format="pyarrow"))
            .groupby("part")
            .map_groups(merge, batch_format="pyarrow")
            .repartition(n_parts)
            .materialize()
        )
        n_changed = merged.sum("changed")
        labels = merged.drop_columns(["changed"]).materialize()
        if not n_changed:
            return labels.select_columns(["node", "label"]).map_batches(
                lambda b: b.rename_columns(["doc_id", "canonical_id"]),
                batch_format="pyarrow",
            )
        # pointer jumping (label shortcutting): label[x] ← label[label[x]].
        # One-hop propagation alone needs diameter rounds (a 40-node dup
        # chain = 40 exchanges); two jumps per round shrink label chains
        # geometrically → O(log diameter) rounds total.  Jumps only
        # accelerate: a label value is always a touched node in the same
        # component with a ≤ id, so min-composition preserves the merge
        # operator's fixed point (= component min, checked above).
        for _ in range(2):
            labels = _cc_jump(labels, n_parts).repartition(n_parts).materialize()
    raise RuntimeError(
        f"connected_components_minid did not converge in {max_iters} iterations"
    )


def _cc_jump(labels: "ray.data.Dataset", n_parts: int) -> "ray.data.Dataset":
    """One pointer-jumping exchange: co-locate each (x, l) row with the
    (l, m) row for its label via ``hash(l)``, set label[x] = min(l, m),
    re-key the output by ``hash(x)`` for the next stage."""

    def tag_src(batch: pa.Table) -> pa.Table:
        lab = batch.column("label").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.Table.from_arrays(
            [
                pa.array(_cc_part(lab, n_parts), pa.int64()),
                batch.column("node"),
                batch.column("label"),
                pa.array(np.zeros(batch.num_rows, np.int8), pa.int8()),
            ],
            names=["part", "node", "label", "is_ref"],
        )

    def tag_ref(batch: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [
                batch.column("part"),  # already hash(node)
                batch.column("node"),
                batch.column("label"),
                pa.array(np.ones(batch.num_rows, np.int8), pa.int8()),
            ],
            names=["part", "node", "label", "is_ref"],
        )

    def jump_part(g: pa.Table) -> pa.Table:
        is_ref = pc.equal(g.column("is_ref"), pa.scalar(1, pa.int8()))
        refs = g.filter(is_ref)
        srcs = g.filter(pc.invert(is_ref))
        at = pc.index_in(
            srcs.column("label"), value_set=refs.column("node").combine_chunks()
        )
        m = pc.coalesce(
            refs.column("label").combine_chunks().take(at), srcs.column("label")
        )
        new = pc.min_element_wise(srcs.column("label"), m)
        n = srcs.column("node").to_numpy(zero_copy_only=False)
        return pa.Table.from_arrays(
            [
                pa.array(_cc_part(n, n_parts), pa.int64()),
                srcs.column("node"),
                new.cast(pa.int64()),
            ],
            names=["part", "node", "label"],
        )

    return (
        labels.map_batches(tag_src, batch_format="pyarrow")
        .union(labels.map_batches(tag_ref, batch_format="pyarrow"))
        .groupby("part")
        .map_groups(jump_part, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# Triangle counting (degree-ordered node-iterator) — string-node graphs.
# ---------------------------------------------------------------------------

def _str_part(a, b, n_parts: int) -> list[int]:
    import zlib

    return [
        zlib.crc32((x + "\x1f" + y).encode()) % n_parts for x, y in zip(a, b)
    ]


def triangle_count(
    edges: "ray.data.Dataset",
    u_col: str = "u",
    v_col: str = "v",
    n_parts: int = 64,
    per_node: bool = False,
    force_plan: str | None = None,
) -> "ray.data.Dataset":
    """Exact triangle count of an undirected simple graph (node-iterator
    with DEGREE ordering — Latapy 2008), nodes are strings.

    ``edges`` must be deduplicated undirected edges with ``u < v`` and no
    self-loops.  Every stage is a coarse co-partition exchange — nothing
    is ever driver-resident, including the degree table:

      1. degrees: per-block (node, count) partials → one groupby.
      2. attach deg(u) then deg(v): two exchanges, each co-partitioning
         the edge list with the degree rows on ``crc32(node) % n_parts``
         and gathering with one ``index_in`` per partition.
      3. orient each edge toward the (deg, node)-larger endpoint: max
         out-degree drops to O(sqrt(m)), which bounds step 4.
      4. wedges: groupby head ``a``; each group sorts its neighbors by
         (deg, node) and emits all ordered pairs — O(d_out²) per node,
         the degree orientation's whole point.
      5. close: wedges co-partition with oriented edges on the pair key;
         a wedge that matches an edge is exactly one triangle (each
         triangle has one unique (deg,node)-smallest vertex).

    Returns one row: (edges, triangles).

    Size-selected like PageRank (``force_plan`` pins ``"single"`` /
    ``"distributed"`` for tests): at ≤ ``_TRI_SINGLE_LIMIT`` edges the
    whole count runs in ONE remote task on numpy arrays — six chained
    exchanges on a sub-million-edge graph are pure scheduling overhead
    (measured ~35 s for 4k edges at 32 CPUs vs ~1 s single-task).
    ``per_node=True`` returns (node, tri) rows instead (only nodes with
    tri > 0 on the single path; the coefficient join left-fills zeros).
    """
    if force_plan != "distributed":
        edges_mat = edges.materialize()
        m = edges_mat.count()
        if force_plan == "single" or m <= _TRI_SINGLE_LIMIT:
            refs = edges_mat.select_columns([u_col, v_col]).to_arrow_refs()
            out_ref = _tri_single_task.remote(refs, u_col, v_col, per_node)
            import ray.data

            return ray.data.from_arrow_refs([out_ref])
        edges = edges_mat

    def deg_partial(batch: pa.Table) -> pa.Table:
        nodes = pa.array(
            batch.column(u_col).to_pylist() + batch.column(v_col).to_pylist(),
            pa.string(),
        )
        t = pa.table({"node": nodes})
        out = t.group_by(["node"]).aggregate([([], "count_all")])
        return out.rename_columns(["node", "__d"])

    degrees = edges.map_batches(deg_partial, batch_format="pyarrow")

    import zlib

    def node_part(values) -> pa.Array:
        return pa.array(
            [zlib.crc32(x.encode()) % n_parts for x in values], pa.int64()
        )

    def attach(edge_ds, key_col: str, out_deg: str):
        """co-partition edges (on key_col) with degree partials; gather.
        Both tagged sides emit the SAME column list in the same order:
        [part, is_deg, key_col, __deg_in, *other edge fields]."""
        schema = edge_ds.schema().base_schema
        other_fields = [(f.name, f.type) for f in schema if f.name != key_col]
        names = ["part", "is_deg", key_col, "__deg_in"] + [n for n, _ in other_fields]

        def tag_edges(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            arrays = [
                node_part(batch.column(key_col).to_pylist()),
                pa.array(np.zeros(n, np.int8), pa.int8()),
                batch.column(key_col),
                pa.nulls(n, pa.int64()),
            ] + [batch.column(c) for c, _ in other_fields]
            return pa.Table.from_arrays(arrays, names=names)

        def tag_deg(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            arrays = [
                node_part(batch.column("node").to_pylist()),
                pa.array(np.ones(n, np.int8), pa.int8()),
                batch.column("node"),
                batch.column("__d").cast(pa.int64()),
            ] + [pa.nulls(n, typ) for _, typ in other_fields]
            return pa.Table.from_arrays(arrays, names=names)

        def merge(g: pa.Table) -> pa.Table:
            is_deg = pc.equal(g.column("is_deg"), pa.scalar(1, pa.int8()))
            dt = g.filter(is_deg)
            et = g.filter(pc.invert(is_deg))
            # sum the per-block degree partials for this partition's nodes
            dsum = (
                dt.select([key_col, "__deg_in"])
                .group_by([key_col])
                .aggregate([("__deg_in", "sum")])
            )
            at = pc.index_in(
                et.column(key_col), value_set=dsum.column(key_col).combine_chunks()
            )
            deg = dsum.column("__deg_in_sum").combine_chunks().take(at)
            keep = [key_col] + [n for n, _ in other_fields]
            return et.select(keep).append_column(out_deg, deg.cast(pa.int64()))

        return (
            edge_ds.map_batches(tag_edges, batch_format="pyarrow")
            .union(degrees.map_batches(tag_deg, batch_format="pyarrow"))
            .groupby("part")
            .map_groups(merge, batch_format="pyarrow")
        )

    with_du = attach(edges, u_col, "du")
    with_both = attach(with_du, v_col, "dv")

    def orient(batch: pa.Table) -> pa.Table:
        u = np.array(batch.column(u_col).to_pylist(), dtype=object)
        v = np.array(batch.column(v_col).to_pylist(), dtype=object)
        du = batch.column("du").to_numpy(zero_copy_only=False).astype(np.int64)
        dv = batch.column("dv").to_numpy(zero_copy_only=False).astype(np.int64)
        u_first = (du < dv) | ((du == dv) & (u < v))
        a = np.where(u_first, u, v)
        b = np.where(u_first, v, u)
        db = np.where(u_first, dv, du)
        return pa.Table.from_arrays(
            [
                node_part(list(a)),
                pa.array(list(a), pa.string()),
                pa.array(list(b), pa.string()),
                pa.array(db, pa.int64()),
            ],
            names=["part", "a", "b", "db"],
        )

    oriented = with_both.map_batches(orient, batch_format="pyarrow")

    def wedges(g: pa.Table) -> pa.Table:
        a = np.array(g.column("a").to_pylist(), dtype=object)
        b = np.array(g.column("b").to_pylist(), dtype=object)
        db = g.column("db").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((b, db, a))  # group by head a, then (deg, node)
        a, b = a[order], b[order]
        w1, w2, heads = [], [], []
        i = 0
        n = len(a)
        while i < n:
            j = i
            while j < n and a[j] == a[i]:
                j += 1
            nb = b[i:j]
            if len(nb) > 1:
                ii, jj = np.triu_indices(len(nb), k=1)
                w1.extend(nb[ii])
                w2.extend(nb[jj])
                heads.extend([a[i]] * len(ii))
            i = j
        return pa.Table.from_arrays(
            [
                pa.array(_str_part(w1, w2, n_parts), pa.int64()),
                pa.array(w1, pa.string()),
                pa.array(w2, pa.string()),
                pa.array(heads, pa.string()),
                pa.array(np.zeros(len(w1), np.int8), pa.int8()),
            ],
            names=["part", "w1", "w2", "head", "is_edge"],
        )

    def edge_keys(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_pylist()
        b = batch.column("b").to_pylist()
        return pa.Table.from_arrays(
            [
                pa.array(_str_part(a, b, n_parts), pa.int64()),
                pa.array(a, pa.string()),
                pa.array(b, pa.string()),
                pa.array([""] * len(a), pa.string()),
                pa.array(np.ones(len(a), np.int8), pa.int8()),
            ],
            names=["part", "w1", "w2", "head", "is_edge"],
        )

    oriented = oriented.materialize()  # consumed twice (wedges + closing keys)
    wedge_ds = oriented.groupby("part").map_groups(wedges, batch_format="pyarrow")

    def close_part(g: pa.Table) -> pa.Table:
        is_edge = pc.equal(g.column("is_edge"), pa.scalar(1, pa.int8()))
        et = g.filter(is_edge)
        wt = g.filter(pc.invert(is_edge))
        empty_nodes = pa.table(
            {
                "node": pa.array([], pa.string()),
                "tri": pa.array([], pa.int64()),
            }
        )
        if et.num_rows == 0 or wt.num_rows == 0:
            if per_node:
                return empty_nodes
            return pa.table({"triangles": pa.array([0], pa.int64())})
        lt = wt.select(["w1", "w2", "head"])
        rt = et.select(["w1", "w2"]).append_column(
            "__hit", pa.array(np.ones(et.num_rows, np.int8), pa.int8())
        )
        j = lt.join(rt, keys=["w1", "w2"], join_type="inner")
        if not per_node:
            return pa.table({"triangles": pa.array([j.num_rows], pa.int64())})
        if j.num_rows == 0:
            return empty_nodes
        # each matched wedge is one triangle {head, w1, w2} — credit all 3
        nodes = pa.array(
            j.column("head").to_pylist()
            + j.column("w1").to_pylist()
            + j.column("w2").to_pylist(),
            pa.string(),
        )
        out = pa.table({"node": nodes}).group_by(["node"]).aggregate(
            [([], "count_all")]
        )
        return out.rename_columns(["node", "tri"])

    counts = (
        wedge_ds.union(oriented.map_batches(edge_keys, batch_format="pyarrow"))
        .groupby("part")
        .map_groups(close_part, batch_format="pyarrow")
    )

    if per_node:
        # per-partition (node, tri) partials: one more coarse groupby on
        # crc32(node) merges a node's credits from different pair-partitions
        def node_tag(batch: pa.Table) -> pa.Table:
            return batch.append_column(
                "npart", node_part(batch.column("node").to_pylist())
            )

        def node_merge(g: pa.Table) -> pa.Table:
            out = g.select(["node", "tri"]).group_by(["node"]).aggregate(
                [("tri", "sum")]
            )
            return out.rename_columns(["node", "tri"])

        return (
            counts.map_batches(node_tag, batch_format="pyarrow")
            .groupby("npart")
            .map_groups(node_merge, batch_format="pyarrow")
        )

    def final(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"triangles": pa.array([int(pc.sum(batch.column("triangles")).as_py() or 0)], pa.int64())}
        )

    # the per-partition counts are O(n_parts) rows — one tiny final task
    return counts.repartition(1).map_batches(final, batch_format="pyarrow")


# single-task triangle path below this many edges (the pagerank-style
# size selection: a 4k-edge fixture doesn't need 6 exchanges)
_TRI_SINGLE_LIMIT = 2_000_000


def _triangles_single(
    u: list[str], v: list[str], per_node: bool
) -> "tuple[int, dict[str, int]]":
    """Exact triangle count in one task: same degree ordering, numpy."""
    uu = np.array(u, dtype=object)
    vv = np.array(v, dtype=object)
    nodes, inv = np.unique(np.concatenate([uu, vv]), return_inverse=True)
    n = len(nodes)
    a_id, b_id = inv[: len(uu)], inv[len(uu) :]
    deg = np.bincount(np.concatenate([a_id, b_id]), minlength=n)
    # orient toward the (deg, id)-larger endpoint
    key = deg.astype(np.int64) * (n + 1) + np.arange(n, dtype=np.int64)
    swap = key[a_id] > key[b_id]
    src = np.where(swap, b_id, a_id)
    dst = np.where(swap, a_id, b_id)
    packed = np.sort(src.astype(np.int64) * n + dst)
    order = np.lexsort((key[dst], src))
    src_s, dst_s = src[order], dst[order]
    tri_total = 0
    tri_node = np.zeros(n, np.int64)
    starts = np.flatnonzero(np.r_[True, src_s[1:] != src_s[:-1]])
    bounds = np.r_[starts, len(src_s)]
    for si in range(len(starts)):
        lo, hi = bounds[si], bounds[si + 1]
        nb = dst_s[lo:hi]
        if len(nb) < 2:
            continue
        ii, jj = np.triu_indices(len(nb), k=1)
        cand = nb[ii].astype(np.int64) * n + nb[jj]
        pos = np.searchsorted(packed, cand)
        hit = (pos < len(packed)) & (packed[np.minimum(pos, len(packed) - 1)] == cand)
        h = int(hit.sum())
        tri_total += h
        if per_node and h:
            head = src_s[lo]
            tri_node[head] += h
            np.add.at(tri_node, nb[ii[hit]], 1)
            np.add.at(tri_node, nb[jj[hit]], 1)
    return tri_total, {
        str(nodes[i]): int(tri_node[i]) for i in np.flatnonzero(tri_node)
    }


@ray.remote
def _tri_single_task(refs: list, u_col: str, v_col: str, per_node: bool):
    tables = [t for t in ray.get(list(refs)) if t.num_rows]
    u, v = [], []
    for t in tables:
        u.extend(t.column(u_col).to_pylist())
        v.extend(t.column(v_col).to_pylist())
    total, node_tri = _triangles_single(u, v, per_node)
    if per_node:
        items = sorted(node_tri.items())
        return pa.Table.from_arrays(
            [
                pa.array([k for k, _ in items], pa.string()),
                pa.array([c for _, c in items], pa.int64()),
            ],
            names=["node", "tri"],
        )
    return pa.table({"triangles": pa.array([total], pa.int64())})


# ---------------------------------------------------------------------------
# k-core decomposition (parallel peeling).
# ---------------------------------------------------------------------------

# single-task k-core below this many edges — same size selection as
# triangles/PageRank: a few-thousand-edge graph doesn't need 3 exchanges
# per peeling round
_KCORE_SINGLE_LIMIT = 2_000_000


def _kcore_kernel(
    u: "np.ndarray", v: "np.ndarray", k: int
) -> "tuple[np.ndarray, np.ndarray]":
    """Peel (node-array, core-degree) of the k-core on factorized ids."""
    nodes, inv = np.unique(np.concatenate([u, v]), return_inverse=True)
    n = len(nodes)
    a, b = inv[: len(u)], inv[len(u) :]
    e_alive = np.ones(len(a), bool)
    n_alive = np.ones(n, bool)
    while True:
        deg = np.bincount(a[e_alive], minlength=n) + np.bincount(
            b[e_alive], minlength=n
        )
        drop = n_alive & (deg < k)
        if not drop.any():
            break
        n_alive &= ~drop
        e_alive &= n_alive[a] & n_alive[b]
    deg = np.bincount(a[e_alive], minlength=n) + np.bincount(
        b[e_alive], minlength=n
    )
    keep = n_alive & (deg >= k)
    return nodes[keep], deg[keep].astype(np.int64)


@ray.remote
def _kcore_single_task(refs: list, u_col: str, v_col: str, k: int):
    tables = [t for t in ray.get(list(refs)) if t.num_rows]
    u: list[str] = []
    v: list[str] = []
    for t in tables:
        u.extend(t.column(u_col).to_pylist())
        v.extend(t.column(v_col).to_pylist())
    if not u:
        return pa.table(
            {"node": pa.array([], pa.string()), "core_deg": pa.array([], pa.int64())}
        )
    nodes, deg = _kcore_kernel(
        np.array(u, dtype=object), np.array(v, dtype=object), k
    )
    order = np.argsort(nodes)
    return pa.Table.from_arrays(
        [
            pa.array(list(nodes[order]), pa.string()),
            pa.array(deg[order], pa.int64()),
        ],
        names=["node", "core_deg"],
    )


def kcore(
    edges: "ray.data.Dataset",
    k: int,
    u_col: str = "u",
    v_col: str = "v",
    n_parts: int = 16,
    force_plan: str | None = None,
    max_rounds: int = 200,
) -> "ray.data.Dataset":
    """k-core of an undirected simple graph: the maximal induced subgraph
    in which every node has degree >= k (Seidman 1983), by PARALLEL
    PEELING — every round simultaneously deletes ALL nodes of current
    degree < k, which converges in O(peeling-depth) rounds (logarithmic
    on power-law graphs) instead of the sequential peel's O(n).

    ``edges`` must be deduplicated undirected string edges (u < v, no
    self-loops) — the `_web_link_edges` contract.  Per round, entirely
    as coarse exchanges with nothing driver-resident but ONE counter:

      1. degrees of the surviving subgraph: per-block (node, count)
         partials -> one groupby (only partials shuffle);
      2. alive = nodes with deg >= k (a filter on the degree rows);
      3. induce: two union+groupby semi-joins co-partition the edge
         list with the alive nodes on ``crc32(node) % n_parts`` and
         keep edges whose endpoint is alive (one ``is_in`` per
         partition per side).

    The loop stops when no node fell below k; the last degree table IS
    the answer (node, core_deg).  Size-selected like PageRank and
    triangles: at <= ``_KCORE_SINGLE_LIMIT`` edges the whole peel runs
    in ONE remote task on numpy bincounts (``force_plan`` pins
    ``"single"`` / ``"distributed"`` for the parity test).  At 100 TB
    the distributed path's per-round cost is 3 coarse exchanges over
    the *surviving* edges — monotonically shrinking — and the driver
    never sees a node list, only the per-round alive count.
    """
    import zlib

    import ray.data as rd

    if force_plan != "distributed":
        edges_mat = edges.materialize()
        m = edges_mat.count()
        if force_plan == "single" or m <= _KCORE_SINGLE_LIMIT:
            refs = edges_mat.select_columns([u_col, v_col]).to_arrow_refs()
            return rd.from_arrow_refs([_kcore_single_task.remote(refs, u_col, v_col, k)])
        edges = edges_mat

    def node_part(values) -> pa.Array:
        return pa.array(
            [zlib.crc32(x.encode()) % n_parts for x in values], pa.int64()
        )

    def degrees_of(edge_ds):
        def deg_partial(batch: pa.Table) -> pa.Table:
            nodes = pa.array(
                batch.column(u_col).to_pylist() + batch.column(v_col).to_pylist(),
                pa.string(),
            )
            out = pa.table({"node": nodes}).group_by(["node"]).aggregate(
                [([], "count_all")]
            )
            return out.rename_columns(["node", "deg"])

        return (
            edge_ds.map_batches(deg_partial, batch_format="pyarrow")
            .groupby("node")
            .sum("deg")
            .map_batches(
                lambda b: b.rename_columns(["node", "deg"]),
                batch_format="pyarrow",
            )
        )

    def semi(edge_ds, key_col: str, alive_ds):
        """Keep edges whose ``key_col`` endpoint is in ``alive_ds`` —
        union + one coarse groupby, is_in per partition (no driver set)."""
        other = v_col if key_col == u_col else u_col

        def tag_e(batch: pa.Table) -> pa.Table:
            return pa.Table.from_arrays(
                [
                    node_part(batch.column(key_col).to_pylist()),
                    pa.array(np.zeros(batch.num_rows, np.int8), pa.int8()),
                    batch.column(key_col).cast(pa.string()),
                    batch.column(other).cast(pa.string()),
                ],
                names=["part", "is_alive", "key", "other"],
            )

        def tag_a(batch: pa.Table) -> pa.Table:
            return pa.Table.from_arrays(
                [
                    node_part(batch.column("node").to_pylist()),
                    pa.array(np.ones(batch.num_rows, np.int8), pa.int8()),
                    batch.column("node").cast(pa.string()),
                    pa.array([""] * batch.num_rows, pa.string()),
                ],
                names=["part", "is_alive", "key", "other"],
            )

        def keep(g: pa.Table) -> pa.Table:
            is_a = pc.equal(g.column("is_alive"), pa.scalar(1, pa.int8()))
            alive_keys = g.filter(is_a).column("key").combine_chunks()
            e = g.filter(pc.invert(is_a))
            mask = pc.is_in(e.column("key").combine_chunks(), value_set=alive_keys)
            e = e.filter(mask)
            if key_col == u_col:
                return pa.table({u_col: e.column("key"), v_col: e.column("other")})
            return pa.table({u_col: e.column("other"), v_col: e.column("key")})

        return (
            edge_ds.map_batches(tag_e, batch_format="pyarrow")
            .union(alive_ds.map_batches(tag_a, batch_format="pyarrow"))
            .groupby("part")
            .map_groups(keep, batch_format="pyarrow")
        )

    empty = rd.from_arrow(
        pa.table(
            {"node": pa.array([], pa.string()), "core_deg": pa.array([], pa.int64())}
        )
    )
    def alive_only(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.greater_equal(batch.column("deg"), pa.scalar(k))).select(
            ["node"]
        )

    cur = edges
    for _ in range(max_rounds):
        deg = degrees_of(cur).materialize()
        n_total = deg.count()
        alive = deg.map_batches(alive_only, batch_format="pyarrow").materialize()
        n_alive = alive.count()
        if n_alive == n_total:  # nobody fell below k: converged
            return deg.map_batches(
                lambda b: b.rename_columns(["node", "core_deg"]),
                batch_format="pyarrow",
            )
        if n_alive == 0:
            return empty
        cur = semi(semi(cur, u_col, alive), v_col, alive).materialize()
        if cur.count() == 0:
            return empty
    raise RuntimeError(f"k-core did not converge in {max_rounds} rounds")


# ---------------------------------------------------------------------------
# Personalized PageRank (restart vector on a seed set).
# ---------------------------------------------------------------------------


def _ppr_small_kernel(
    ids: np.ndarray, n_nodes: int, n_seeds: int, seed_mod: int, iters: int, degree: int
) -> tuple[np.ndarray, np.ndarray]:
    """Single-process emulation with the same int64 floor arithmetic as
    the distributed path; teleport mass lands ONLY on seed nodes
    (doc_id % seed_mod == 0), uniformly 1/n_seeds."""
    ids = np.sort(ids.astype(np.int64))
    seed = ids % seed_mod == 0
    r = np.where(seed, PR_SCALE // n_seeds, 0).astype(np.int64)
    base_seed = (15 * PR_SCALE // 100) // n_seeds
    for _ in range(iters):
        dsts = synth_out_edges(ids, n_nodes, degree)
        out_dst = np.concatenate([dsts.ravel(), ids])
        out_c = np.concatenate(
            [np.repeat(r // degree, degree), np.zeros(len(ids), np.int64)]
        )
        keys = np.unique(out_dst)
        s = np.zeros(len(keys), np.int64)
        np.add.at(s, np.searchsorted(keys, out_dst), out_c)
        base = np.where(keys % seed_mod == 0, base_seed, 0).astype(np.int64)
        ids, r = keys, base + (85 * s) // 100
    return ids, r


@ray.remote
def _ppr_small_task(
    refs: list, n_nodes: int, n_seeds: int, seed_mod: int, iters: int, degree: int
):
    tables = [t for t in ray.get(list(refs)) if t.num_rows]
    ids = (
        np.concatenate(
            [t.column("doc_id").to_numpy(zero_copy_only=False) for t in tables]
        )
        if tables
        else np.zeros(0, np.int64)
    )
    ids, r = _ppr_small_kernel(ids, n_nodes, n_seeds, seed_mod, iters, degree)
    return pa.Table.from_arrays(
        [pa.array(ids, pa.int64()), pa.array(r, pa.int64())],
        names=["doc_id", "ppr_rank"],
    )


def ppr_fixed_point(
    nodes: "ray.data.Dataset",
    n_nodes: int,
    n_seeds: int,
    seed_mod: int = 17,
    iters: int = 5,
    degree: int = 3,
    small_limit: int = 1_000_000,
) -> "ray.data.Dataset":
    """Personalized PageRank: damped fixed point whose 0.15 teleport mass
    restarts ONLY on the seed set (doc_id % seed_mod == 0, mass
    1/n_seeds each) — the similarity-to-seeds ranking used to expand a
    curated crawl list (seed pages' neighborhoods score high, unrelated
    pages decay toward 0).  Same deterministic synthetic out-edge graph,
    same int64 1e-12-unit floor arithmetic, same size-selected two plans
    as ``pagerank_fixed_point`` (ONE numpy task under ``small_limit``
    nodes, else scatter + map-side-combined groupby per iteration where
    only (dst, partial-sum) rows cross the exchange).  Returns (doc_id,
    ppr_rank)."""
    import ray.data

    if n_nodes and n_nodes <= small_limit:
        refs = nodes.select_columns(["doc_id"]).to_arrow_refs()
        out_ref = _ppr_small_task.remote(
            refs, n_nodes, n_seeds, seed_mod, iters, degree
        )
        return ray.data.from_arrow_refs([out_ref])

    base_seed = (15 * PR_SCALE // 100) // n_seeds

    def init(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        r = np.where(ids % seed_mod == 0, PR_SCALE // n_seeds, 0).astype(np.int64)
        return pa.Table.from_arrays(
            [batch.column("doc_id"), pa.array(r, pa.int64())],
            names=["doc_id", "ppr_rank"],
        )

    ranks = nodes.map_batches(init, batch_format="pyarrow")
    for _ in range(iters):

        def scatter(batch: pa.Table) -> pa.Table:
            ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
            r = batch.column("ppr_rank").to_numpy(zero_copy_only=False).astype(np.int64)
            dsts = synth_out_edges(ids, n_nodes, degree)
            contrib = r // degree
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
            ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
            s = batch.column("s").to_numpy(zero_copy_only=False).astype(np.int64)
            base = np.where(ids % seed_mod == 0, base_seed, 0).astype(np.int64)
            return pa.Table.from_arrays(
                [batch.column("doc_id"), pa.array(base + (85 * s) // 100, pa.int64())],
                names=["doc_id", "ppr_rank"],
            )

        ranks = sums.map_batches(damp, batch_format="pyarrow")
    return ranks


# ---------------------------------------------------------------------------
# Single-task fast paths for small-graph statistics (size selection).
# ---------------------------------------------------------------------------

# same rationale as triangles/kcore: chained exchanges on a few-thousand-
# edge graph are pure scheduling overhead; ONE numpy task is ~10x faster
_GSTAT_SINGLE_EDGE_LIMIT = 2_000_000
_REACH2_SINGLE_NODE_LIMIT = 5_000  # n^2 bool matrix stays <= 25 MB


def gstat_single_or(
    edges: "ray.data.Dataset",
    u_col: str,
    v_col: str,
    task,
    force_plan: str | None,
    extra_args: tuple = (),
):
    """Shared size-selection gate for the small-graph statistics: returns
    ``(result_dataset, edges)`` where ``result_dataset`` is the single-
    task answer when the edge count is under ``_GSTAT_SINGLE_EDGE_LIMIT``
    (or force_plan == 'single'), else None with the materialized edges
    for the caller's distributed plan."""
    import ray.data as rd

    if force_plan == "distributed":
        return None, edges
    edges_mat = edges.materialize()
    if force_plan == "single" or edges_mat.count() <= _GSTAT_SINGLE_EDGE_LIMIT:
        refs = edges_mat.select_columns([u_col, v_col]).to_arrow_refs()
        return rd.from_arrow_refs([task.remote(refs, u_col, v_col, *extra_args)]), edges_mat
    return None, edges_mat


@ray.remote
def _assort_single_task(refs: list, u_col: str, v_col: str):
    tables = [t for t in ray.get(list(refs)) if t.num_rows]
    u: list[str] = []
    v: list[str] = []
    for t in tables:
        u.extend(t.column(u_col).to_pylist())
        v.extend(t.column(v_col).to_pylist())
    uu = np.array(u, dtype=object)
    vv = np.array(v, dtype=object)
    nodes, inv = np.unique(np.concatenate([uu, vv]), return_inverse=True)
    a, b = inv[: len(uu)], inv[len(uu) :]
    deg = np.bincount(np.concatenate([a, b]), minlength=len(nodes)).astype(np.int64)
    du, dv = deg[a], deg[b]
    m = 2 * len(a)
    sx = int(du.sum() + dv.sum())
    sxx = int((du * du).sum() + (dv * dv).sum())
    sxy = int(2 * (du * dv).sum())
    return pa.table(
        {
            "m": pa.array([m], pa.int64()),
            "sum_x": pa.array([sx], pa.int64()),
            "sum_xx": pa.array([sxx], pa.int64()),
            "sum_xy": pa.array([sxy], pa.int64()),
        }
    )


@ray.remote
def _reach2_single_task(
    refs: list, u_col: str, v_col: str, dense_limit: int | None = None
):
    tables = [t for t in ray.get(list(refs)) if t.num_rows]
    u: list[str] = []
    v: list[str] = []
    for t in tables:
        u.extend(t.column(u_col).to_pylist())
        v.extend(t.column(v_col).to_pylist())
    uu = np.array(u, dtype=object)
    vv = np.array(v, dtype=object)
    nodes, inv = np.unique(np.concatenate([uu, vv]), return_inverse=True)
    n = len(nodes)
    a, b = inv[: len(uu)], inv[len(uu) :]
    if n <= (_REACH2_SINGLE_NODE_LIMIT if dense_limit is None else dense_limit):
        adj = np.zeros((n, n), bool)
        adj[a, b] = True
        adj[b, a] = True
        # within-2-hops = 1-hop OR 2-hop; bool matmul then drop self
        # int32 accumulator: a uint8 matmul wraps mod 256 and silently
        # drops pairs with a multiple-of-256 common-neighbor count
        two = (adj.astype(np.int32) @ adj.astype(np.int32)) > 0
        r = adj | two
        np.fill_diagonal(r, False)
        counts = r.sum(axis=1).astype(np.int64)
    else:
        # sparse path: per-node union of neighbor-of-neighbor lists
        src = np.concatenate([a, b])
        dst = np.concatenate([b, a])
        order = np.argsort(src, kind="stable")
        src_s, dst_s = src[order], dst[order]
        starts = np.searchsorted(src_s, np.arange(n + 1))
        nbrs = [dst_s[starts[i] : starts[i + 1]] for i in range(n)]
        counts = np.zeros(n, np.int64)
        for i in range(n):
            if len(nbrs[i]) == 0:
                continue
            pool = np.concatenate([nbrs[i]] + [nbrs[j] for j in nbrs[i]])
            uniq = np.unique(pool)
            counts[i] = len(uniq) - (1 if i in uniq else 0)
    return pa.Table.from_arrays(
        [pa.array(list(nodes), pa.string()), pa.array(counts, pa.int64())],
        names=["node", "reach2"],
    )


# ---------------------------------------------------------------------------
# HITS (hubs & authorities) over the deterministic synthetic out-edges.
# ---------------------------------------------------------------------------


# HITS uses its own 1e9 scale: raw (pre-normalization) scores are bounded
# by degree * SCALE = 3e9, so score * SCALE <= 3e18 stays inside int64 in
# BOTH the numpy kernel and the distributed batches (PR_SCALE=1e12 would
# overflow at the normalization multiply)
HITS_SCALE = 1_000_000_000


def _hits_small_kernel(
    ids: np.ndarray, n_nodes: int, iters: int, degree: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Single-process HITS with integer sum-normalization: each half-step
    rescales scores to total PR_SCALE via floor division — deterministic,
    combine-order-independent, and exactly reproducible in SQL (HUGEINT
    sums).  Keys = all ids (the synthetic graph maps ids onto 0..n-1)."""
    ids = np.sort(ids.astype(np.int64))
    n = len(ids)
    auth = np.full(n, HITS_SCALE // max(n, 1), np.int64)
    hub = np.zeros(n, np.int64)
    for _ in range(iters):
        dsts = synth_out_edges(ids, n_nodes, degree)
        pos = np.searchsorted(ids, dsts.ravel())
        ok = (pos < n) & (ids[np.minimum(pos, n - 1)] == dsts.ravel())
        # hub_i = sum of auth over out-neighbors present in the id set
        contrib = np.where(ok, auth[np.minimum(pos, n - 1)], 0)
        hub = contrib.reshape(n, degree).sum(axis=1)
        th = int(hub.sum())
        if th > 0:
            hub = (hub * HITS_SCALE) // th
        # auth_i = sum of hub over in-neighbors
        auth_new = np.zeros(n, np.int64)
        np.add.at(auth_new, pos[ok], np.repeat(hub, degree)[ok])
        ta = int(auth_new.sum())
        if ta > 0:
            auth_new = (auth_new * HITS_SCALE) // ta
        auth = auth_new
    return ids, hub, auth


@ray.remote
def _hits_small_task(refs: list, n_nodes: int, iters: int, degree: int):
    tables = [t for t in ray.get(list(refs)) if t.num_rows]
    ids = (
        np.concatenate(
            [t.column("doc_id").to_numpy(zero_copy_only=False) for t in tables]
        )
        if tables
        else np.zeros(0, np.int64)
    )
    ids, hub, auth = _hits_small_kernel(ids, n_nodes, iters, degree)
    return pa.Table.from_arrays(
        [
            pa.array(ids, pa.int64()),
            pa.array(hub, pa.int64()),
            pa.array(auth, pa.int64()),
        ],
        names=["doc_id", "hub", "auth"],
    )


def hits_fixed_point(
    nodes: "ray.data.Dataset",
    n_nodes: int,
    iters: int = 5,
    degree: int = 3,
    small_limit: int = 1_000_000,
) -> "ray.data.Dataset":
    """Kleinberg's HITS over the deterministic synthetic link graph:
    hub(i) = Σ auth(out-neighbors), auth(i) = Σ hub(in-neighbors), each
    half-step sum-normalized to HITS_SCALE total with INTEGER floor
    division (the repo's standard trick: no float norm, so partial-sum
    order can't change the result and a SQL oracle reproduces it
    bit-for-bit).  Size-selected like PageRank: one numpy task under
    ``small_limit`` nodes, else per-iteration scatter + map-side-
    combined groupby where only (node, partial-sum) rows cross the
    exchange; the per-half-step normalization total is ONE driver
    scalar (a Dataset sum), not a data structure."""
    import ray.data

    if n_nodes and n_nodes <= small_limit:
        refs = nodes.select_columns(["doc_id"]).to_arrow_refs()
        out_ref = _hits_small_task.remote(refs, n_nodes, iters, degree)
        return ray.data.from_arrow_refs([out_ref])

    a0 = HITS_SCALE // max(n_nodes, 1)

    def init(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.Table.from_arrays(
            [
                batch.column("doc_id"),
                pa.array(np.zeros(n, np.int64), pa.int64()),
                pa.array(np.full(n, a0, np.int64), pa.int64()),
            ],
            names=["doc_id", "hub", "auth"],
        )

    state = nodes.map_batches(init, batch_format="pyarrow")
    for _ in range(iters):
        # ---- hub half-step: gather auth along OUT edges -----------------
        # each node needs auth of its out-neighbors: scatter a REQUEST is
        # equivalent to scattering (dst <- auth(src)) along REVERSED edges
        # of the in-neighbor relation; with the synthetic closed-form
        # edges we instead scatter each node's auth to its IN-neighbors'
        # hub accumulators by sending along reversed out-edges.  Concretely
        # hub(src) needs auth(dst): send (src, auth(dst)) — dst knows its
        # in-neighbors only implicitly, so route via the edge key dst:
        # tag each edge (src, dst) by dst, join with auth at dst, then
        # groupby src.  Two exchanges per half-step, partials combined.
        def edge_requests(batch: pa.Table) -> pa.Table:
            ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
            dsts = synth_out_edges(ids, n_nodes, degree)
            return pa.table(
                {
                    "dst": pa.array(dsts.ravel(), pa.int64()),
                    "src": pa.array(np.repeat(ids, degree), pa.int64()),
                }
            )

        def tag_auth(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "dst": batch.column("doc_id"),
                    "src": pa.array(
                        np.full(batch.num_rows, -1, np.int64), pa.int64()
                    ),
                    "auth": batch.column("auth"),
                }
            )

        def tag_edge(batch: pa.Table) -> pa.Table:
            return batch.append_column(
                "auth", pa.array(np.full(batch.num_rows, -1, np.int64), pa.int64())
            )

        edges = nodes.map_batches(edge_requests, batch_format="pyarrow")

        def gather_hub(g: pa.Table) -> pa.Table:
            is_auth = pc.equal(g.column("src"), pa.scalar(-1, pa.int64()))
            at = g.filter(is_auth)
            et = g.filter(pc.invert(is_auth))
            idx = pc.index_in(
                et.column("dst").combine_chunks(),
                value_set=at.column("dst").combine_chunks(),
            )
            vals = at.column("auth").take(idx)
            t = pa.table({"doc_id": et.column("src"), "v": vals})
            out = t.group_by(["doc_id"]).aggregate([("v", "sum")])
            return out.rename_columns(["doc_id", "hub_part"])

        def add_part(batch: pa.Table) -> pa.Table:
            d = batch.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
            return batch.append_column(
                "part", pa.array(d % 64, pa.int64())
            )

        hub_parts = (
            edges.map_batches(tag_edge, batch_format="pyarrow")
            .union(state.map_batches(tag_auth, batch_format="pyarrow"))
            .map_batches(add_part, batch_format="pyarrow")
            .groupby("part")
            .map_groups(gather_hub, batch_format="pyarrow")
        )
        hub_sums = grouped_sum_count(
            hub_parts, ["doc_id"], ["hub_part"], {"hub_part": "h"}
        )
        # zero self-message so isolated nodes survive
        zeros = nodes.map_batches(
            lambda b: pa.table(
                {
                    "doc_id": b.column("doc_id"),
                    "h": pa.array(np.zeros(b.num_rows, np.int64), pa.int64()),
                    "n_rows": pa.array(np.zeros(b.num_rows, np.int64), pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        hub_all = (
            hub_sums.union(zeros)
            .groupby("doc_id")
            .sum("h")
            .map_batches(
                lambda b: b.rename_columns(["doc_id", "hub"]),
                batch_format="pyarrow",
            )
            .materialize()
        )
        th = int(hub_all.sum("hub") or 0)

        def norm_hub(batch: pa.Table, _t=th) -> pa.Table:
            h = batch.column("hub").to_numpy(zero_copy_only=False).astype(np.int64)
            if _t > 0:
                h = (h * HITS_SCALE) // _t
            return pa.table({"doc_id": batch.column("doc_id"), "hub": pa.array(h, pa.int64())})

        hubs = hub_all.map_batches(norm_hub, batch_format="pyarrow").materialize()

        # ---- auth half-step: scatter hub along OUT edges ----------------
        def scatter_auth(batch: pa.Table) -> pa.Table:
            ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
            h = batch.column("hub").to_numpy(zero_copy_only=False).astype(np.int64)
            dsts = synth_out_edges(ids, n_nodes, degree)
            out_dst = np.concatenate([dsts.ravel(), ids])
            out_v = np.concatenate(
                [np.repeat(h, degree), np.zeros(len(ids), np.int64)]
            )
            return pa.table(
                {"doc_id": pa.array(out_dst, pa.int64()), "v": pa.array(out_v, pa.int64())}
            )

        auth_all = grouped_sum_count(
            hubs.map_batches(scatter_auth, batch_format="pyarrow"),
            ["doc_id"], ["v"], {"v": "a"},
        )

        # restrict to the NODE SET before normalizing: the kernel only
        # accumulates dsts inside the id set, so out-of-set destinations
        # must not contribute to the normalization total either (they
        # only coincide when nodes == 0..n-1 contiguous)
        def tag_sum(batch: pa.Table) -> pa.Table:
            d = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table(
                {"part": pa.array(d % 64, pa.int64()),
                 "doc_id": batch.column("doc_id"),
                 "a": batch.column("a").cast(pa.int64()),
                 "is_m": pa.array(np.zeros(batch.num_rows, np.int8), pa.int8())}
            )

        def tag_members(batch: pa.Table) -> pa.Table:
            d = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table(
                {"part": pa.array(d % 64, pa.int64()),
                 "doc_id": batch.column("doc_id"),
                 "a": pa.array(np.zeros(batch.num_rows, np.int64), pa.int64()),
                 "is_m": pa.array(np.ones(batch.num_rows, np.int8), pa.int8())}
            )

        def member_only(g: pa.Table) -> pa.Table:
            is_m = pc.equal(g.column("is_m"), pa.scalar(1, pa.int8()))
            mt = g.filter(is_m)
            st = g.filter(pc.invert(is_m))
            mask = pc.is_in(
                st.column("doc_id").combine_chunks(),
                value_set=mt.column("doc_id").combine_chunks(),
            )
            return st.filter(mask).select(["doc_id", "a"])

        auth_sums = (
            auth_all.map_batches(tag_sum, batch_format="pyarrow")
            .union(hubs.map_batches(tag_members, batch_format="pyarrow"))
            .groupby("part")
            .map_groups(member_only, batch_format="pyarrow")
            .materialize()
        )
        ta = int(auth_sums.sum("a") or 0)

        def norm_auth(batch: pa.Table, _t=ta) -> pa.Table:
            a = batch.column("a").to_numpy(zero_copy_only=False).astype(np.int64)
            if _t > 0:
                a = (a * HITS_SCALE) // _t
            return pa.table({"doc_id": batch.column("doc_id"), "auth": pa.array(a, pa.int64())})

        auths = auth_sums.map_batches(norm_auth, batch_format="pyarrow").materialize()

        # ---- recombine state (co-partition join on doc_id) --------------
        def tag_h(batch: pa.Table) -> pa.Table:
            return pa.table(
                {"doc_id": batch.column("doc_id"), "hub": batch.column("hub"),
                 "auth": pa.array(np.full(batch.num_rows, -1, np.int64), pa.int64()),
                 "is_h": pa.array(np.ones(batch.num_rows, np.int8), pa.int8())}
            )

        def tag_a(batch: pa.Table) -> pa.Table:
            return pa.table(
                {"doc_id": batch.column("doc_id"),
                 "hub": pa.array(np.full(batch.num_rows, -1, np.int64), pa.int64()),
                 "auth": batch.column("auth"),
                 "is_h": pa.array(np.zeros(batch.num_rows, np.int8), pa.int8())}
            )

        def zip_state(g: pa.Table) -> pa.Table:
            is_h = pc.equal(g.column("is_h"), pa.scalar(1, pa.int8()))
            ht = g.filter(is_h)
            at = g.filter(pc.invert(is_h))
            idx = pc.index_in(
                ht.column("doc_id").combine_chunks(),
                value_set=at.column("doc_id").combine_chunks(),
            )
            return pa.table(
                {"doc_id": ht.column("doc_id"), "hub": ht.column("hub"),
                 "auth": at.column("auth").take(idx)}
            )

        def add_id_part(batch: pa.Table) -> pa.Table:
            d = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
            return batch.append_column("part", pa.array(d % 64, pa.int64()))

        state = (
            hubs.map_batches(tag_h, batch_format="pyarrow")
            .union(auths.map_batches(tag_a, batch_format="pyarrow"))
            .map_batches(add_id_part, batch_format="pyarrow")
            .groupby("part")
            .map_groups(zip_state, batch_format="pyarrow")
        )
    return state


# ---------------------------------------------------------------------------
# Multi-source BFS levels (hop distance from a seed set).
# ---------------------------------------------------------------------------


@ray.remote
def _bfs_single_task(refs: list, u_col: str, v_col: str, prefix: str):
    tables = [t for t in ray.get(list(refs)) if t.num_rows]
    u: list[str] = []
    v: list[str] = []
    for t in tables:
        u.extend(t.column(u_col).to_pylist())
        v.extend(t.column(v_col).to_pylist())
    if not u:
        return pa.table(
            {"node": pa.array([], pa.string()), "level": pa.array([], pa.int64())}
        )
    nodes, inv = np.unique(
        np.concatenate([np.array(u, object), np.array(v, object)]),
        return_inverse=True,
    )
    n = len(nodes)
    a, b = inv[: len(u)], inv[len(u) :]
    seed_mask = np.array([str(x).startswith(prefix) for x in nodes])
    level = np.full(n, -1, np.int64)
    level[seed_mask] = 0
    frontier = np.flatnonzero(seed_mask)
    d = 0
    while len(frontier):
        d += 1
        in_f = np.zeros(n, bool)
        in_f[frontier] = True
        nxt = np.unique(np.concatenate([b[in_f[a]], a[in_f[b]]]))
        nxt = nxt[level[nxt] < 0]
        level[nxt] = d
        frontier = nxt
    keep = level >= 0
    return pa.Table.from_arrays(
        [
            pa.array(list(nodes[keep]), pa.string()),
            pa.array(level[keep], pa.int64()),
        ],
        names=["node", "level"],
    )


def bfs_levels(
    edges: "ray.data.Dataset",
    seed_prefix: str,
    u_col: str = "u",
    v_col: str = "v",
    n_parts: int = 16,
    force_plan: str | None = None,
    max_depth: int = 200,
) -> "ray.data.Dataset":
    """Hop distance from a seed set (nodes whose id starts with
    ``seed_prefix``) over an undirected string graph — multi-source BFS,
    the generalization the crawl's own frontier rounds instantiate.
    Unreachable nodes are omitted.

    Size-selected like the other graph statistics: ONE numpy task under
    ``_GSTAT_SINGLE_EDGE_LIMIT`` edges; above it, per level the frontier
    expands through a co-partition semi-join (edges tagged by the
    frontier endpoint), the candidate set dedups in a coarse groupby,
    and already-assigned nodes subtract in a second co-partition —
    nothing driver-resident but the per-level count.  Level count =
    graph diameter from the seeds (logarithmic on web-ish graphs)."""
    res, edges = gstat_single_or(
        edges, u_col, v_col, _bfs_single_task, force_plan, (seed_prefix,)
    )
    if res is not None:
        return res

    import zlib

    def node_part(values) -> pa.Array:
        return pa.array(
            [zlib.crc32(x.encode()) % n_parts for x in values], pa.int64()
        )

    def sym(batch: pa.Table) -> pa.Table:
        uu = batch.column(u_col)
        vv = batch.column(v_col)
        if isinstance(uu, pa.ChunkedArray):
            uu = uu.combine_chunks()
        if isinstance(vv, pa.ChunkedArray):
            vv = vv.combine_chunks()
        src = pa.concat_arrays([uu, vv])
        dst = pa.concat_arrays([vv, uu])
        return pa.table(
            {"part": node_part(src.to_pylist()), "src": src, "dst": dst}
        )

    adj = edges.map_batches(sym, batch_format="pyarrow").materialize()

    def init_nodes(batch: pa.Table) -> pa.Table:
        s = batch.column("src")
        if isinstance(s, pa.ChunkedArray):
            s = s.combine_chunks()
        mask = pc.starts_with(s, seed_prefix)
        t = batch.filter(mask)
        out = t.select(["src"]).group_by(["src"]).aggregate([])
        return pa.table(
            {
                "part": node_part(out.column("src").to_pylist()),
                "node": out.column("src"),
                "level": pa.array(np.zeros(out.num_rows, np.int64), pa.int64()),
            }
        )

    def dedup_nodes(g: pa.Table) -> pa.Table:
        out = g.group_by(["part", "node"]).aggregate([("level", "min")])
        return out.rename_columns(["part", "node", "level"])

    assigned = (
        adj.map_batches(init_nodes, batch_format="pyarrow")
        .groupby("part")
        .map_groups(dedup_nodes, batch_format="pyarrow")
        .materialize()
    )
    frontier = assigned
    n_assigned = assigned.count()
    for depth in range(1, max_depth + 1):
        # expand: co-partition adj (by src) with the frontier; emit dsts
        def tag_f(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "part": batch.column("part"),
                    "src": batch.column("node"),
                    "dst": pa.array([""] * batch.num_rows, pa.string()),
                    "is_f": pa.array(np.ones(batch.num_rows, np.int8), pa.int8()),
                }
            )

        def tag_adj(batch: pa.Table) -> pa.Table:
            return batch.append_column(
                "is_f", pa.array(np.zeros(batch.num_rows, np.int8), pa.int8())
            )

        def expand(g: pa.Table) -> pa.Table:
            is_f = pc.equal(g.column("is_f"), pa.scalar(1, pa.int8()))
            ft = g.filter(is_f)
            et = g.filter(pc.invert(is_f))
            mask = pc.is_in(
                et.column("src").combine_chunks(),
                value_set=ft.column("src").combine_chunks(),
            )
            dsts = et.filter(mask).select(["dst"]).group_by(["dst"]).aggregate([])
            return pa.table(
                {
                    "part": node_part(dsts.column("dst").to_pylist()),
                    "node": dsts.column("dst"),
                }
            )

        cand = (
            adj.map_batches(tag_adj, batch_format="pyarrow")
            .union(frontier.map_batches(tag_f, batch_format="pyarrow"))
            .groupby("part")
            .map_groups(expand, batch_format="pyarrow")
        )

        # subtract assigned: co-partition candidates with assigned nodes
        def tag_c(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "part": batch.column("part"),
                    "node": batch.column("node"),
                    "is_a": pa.array(np.zeros(batch.num_rows, np.int8), pa.int8()),
                }
            )

        def tag_a(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "part": batch.column("part"),
                    "node": batch.column("node"),
                    "is_a": pa.array(np.ones(batch.num_rows, np.int8), pa.int8()),
                }
            )

        def fresh(g: pa.Table, _d=depth) -> pa.Table:
            is_a = pc.equal(g.column("is_a"), pa.scalar(1, pa.int8()))
            at = g.filter(is_a)
            ct = g.filter(pc.invert(is_a))
            dedup = ct.select(["part", "node"]).group_by(["part", "node"]).aggregate([])
            mask = pc.is_in(
                dedup.column("node").combine_chunks(),
                value_set=at.column("node").combine_chunks(),
            )
            new = dedup.filter(pc.invert(mask))
            return new.append_column(
                "level", pa.array(np.full(new.num_rows, _d, np.int64), pa.int64())
            )

        new_frontier = (
            cand.map_batches(tag_c, batch_format="pyarrow")
            .union(assigned.map_batches(tag_a, batch_format="pyarrow"))
            .groupby("part")
            .map_groups(fresh, batch_format="pyarrow")
            .materialize()
        )
        n_new = new_frontier.count()
        if n_new == 0:
            break
        assigned = assigned.union(new_frontier).materialize()
        frontier = new_frontier
        n_assigned += n_new
    return assigned.select_columns(["node", "level"])


# ---------------------------------------------------------------------------
# Weighted single-source shortest paths (Bellman-Ford relaxation).
# ---------------------------------------------------------------------------

def edge_weights_md5(u, v, mod: int = 9) -> np.ndarray:
    """Deterministic integer weight 1..mod per undirected edge (u, v):
    1 + (md5-prefix-u64 of "u|v") % mod — the same md5-prefix rule every
    oracle-able hash in this repo uses, so a SQL engine reproduces the
    weights exactly (``1 + ('0x'||substr(md5(u||'|'||v),1,16))::UBIGINT
    % mod``)."""
    import hashlib

    md5 = hashlib.md5
    out = np.fromiter(
        (
            1 + int.from_bytes(md5((a + "|" + b).encode()).digest()[:8], "big") % mod
            for a, b in zip(u, v)
        ),
        dtype=np.int64,
        count=len(u),
    )
    return out


_SSSP_INF = 1 << 60


@ray.remote
def _sssp_single_task(refs: list, u_col: str, v_col: str, prefix: str, wmod: int):
    """One-task numpy Bellman-Ford to the exact fixed point."""
    tables = [t for t in ray.get(list(refs)) if t.num_rows]
    u: list[str] = []
    v: list[str] = []
    for t in tables:
        u.extend(t.column(u_col).to_pylist())
        v.extend(t.column(v_col).to_pylist())
    if not u:
        return pa.table(
            {"node": pa.array([], pa.string()), "dist": pa.array([], pa.int64())}
        )
    w = edge_weights_md5(u, v, wmod)
    nodes, inv = np.unique(
        np.concatenate([np.array(u, object), np.array(v, object)]),
        return_inverse=True,
    )
    n = len(nodes)
    a, b = inv[: len(u)], inv[len(u) :]
    dist = np.full(n, _SSSP_INF, np.int64)
    seed = np.array([str(x).startswith(prefix) for x in nodes])
    dist[seed] = 0
    while True:
        nd = dist.copy()
        np.minimum.at(nd, b, np.where(dist[a] < _SSSP_INF, dist[a] + w, _SSSP_INF))
        np.minimum.at(nd, a, np.where(dist[b] < _SSSP_INF, dist[b] + w, _SSSP_INF))
        if (nd == dist).all():
            break
        dist = nd
    keep = dist < _SSSP_INF
    return pa.Table.from_arrays(
        [
            pa.array(list(nodes[keep]), pa.string()),
            pa.array(dist[keep], pa.int64()),
        ],
        names=["node", "dist"],
    )


def sssp_weighted(
    edges: "ray.data.Dataset",
    seed_prefix: str,
    u_col: str = "u",
    v_col: str = "v",
    weight_mod: int = 9,
    n_parts: int = 16,
    force_plan: str | None = None,
    max_iters: int = 500,
) -> "ray.data.Dataset":
    """Weighted shortest distance from a seed set (nodes whose id starts
    with ``seed_prefix``) over an undirected string graph with
    deterministic md5 edge weights 1..``weight_mod`` — Bellman-Ford run
    to its exact fixed point.  Unreachable nodes are omitted.

    Size-selected like ``bfs_levels``: ONE numpy task under
    ``_GSTAT_SINGLE_EDGE_LIMIT`` edges; above it, each relaxation round
    is two co-partition exchanges — (1) the CHANGED frontier joins the
    src-partitioned adjacency and emits per-dst minimum candidates,
    (2) candidates merge with the dst-partitioned distance table and
    only strict improvements survive as the next frontier.  Rounds ≤
    the hop length of the longest shortest path (≈ weighted diameter /
    min weight); each round's exchange carries only frontier-adjacent
    edges and one (part, node, dist) row per touched node — raw edges
    never reshuffle after the initial adjacency materialization."""
    res, edges = gstat_single_or(
        edges, u_col, v_col, _sssp_single_task, force_plan, (seed_prefix, weight_mod)
    )
    if res is not None:
        return res

    import zlib

    def node_part(values) -> pa.Array:
        return pa.array(
            [zlib.crc32(x.encode()) % n_parts for x in values], pa.int64()
        )

    def sym(batch: pa.Table) -> pa.Table:
        uu = batch.column(u_col)
        vv = batch.column(v_col)
        if isinstance(uu, pa.ChunkedArray):
            uu = uu.combine_chunks()
        if isinstance(vv, pa.ChunkedArray):
            vv = vv.combine_chunks()
        w = edge_weights_md5(uu.to_pylist(), vv.to_pylist(), weight_mod)
        src = pa.concat_arrays([uu, vv])
        dst = pa.concat_arrays([vv, uu])
        ww = pa.array(np.concatenate([w, w]), pa.int64())
        return pa.table(
            {
                "part": node_part(src.to_pylist()),
                "src": src,
                "dst": dst,
                "w": ww,
            }
        )

    # adjacency partitioned by SRC: a frontier node's relaxations all
    # happen inside its own partition group
    adj = edges.map_batches(sym, batch_format="pyarrow").materialize()

    def init_nodes(batch: pa.Table) -> pa.Table:
        s = batch.column("src")
        if isinstance(s, pa.ChunkedArray):
            s = s.combine_chunks()
        mask = pc.starts_with(s, seed_prefix)
        t = batch.filter(mask)
        out = t.select(["src"]).group_by(["src"]).aggregate([])
        return pa.table(
            {
                "part": node_part(out.column("src").to_pylist()),
                "node": out.column("src"),
                "dist": pa.array(np.zeros(out.num_rows, np.int64), pa.int64()),
            }
        )

    def dedup_nodes(g: pa.Table) -> pa.Table:
        out = g.group_by(["part", "node"]).aggregate([("dist", "min")])
        return out.rename_columns(["part", "node", "dist"])

    assigned = (
        adj.map_batches(init_nodes, batch_format="pyarrow")
        .groupby("part")
        .map_groups(dedup_nodes, batch_format="pyarrow")
        .materialize()
    )
    frontier = assigned
    for _ in range(max_iters):
        # relax: co-partition adj (by src) with the changed frontier;
        # emit per-dst min candidate distances within the group
        def tag_f(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "part": batch.column("part"),
                    "src": batch.column("node"),
                    "dst": pa.array([""] * batch.num_rows, pa.string()),
                    "w": batch.column("dist"),  # carries dist in the w slot
                    "is_f": pa.array(np.ones(batch.num_rows, np.int8), pa.int8()),
                }
            )

        def tag_adj(batch: pa.Table) -> pa.Table:
            return batch.append_column(
                "is_f", pa.array(np.zeros(batch.num_rows, np.int8), pa.int8())
            )

        def relax(g: pa.Table) -> pa.Table:
            is_f = pc.equal(g.column("is_f"), pa.scalar(1, pa.int8()))
            ft = g.filter(is_f)
            et = g.filter(pc.invert(is_f))
            if ft.num_rows == 0 or et.num_rows == 0:
                return pa.table(
                    {
                        "part": pa.array([], pa.int64()),
                        "node": pa.array([], pa.string()),
                        "dist": pa.array([], pa.int64()),
                    }
                )
            fsrc = ft.column("src").combine_chunks()
            idx = pc.index_in(et.column("src").combine_chunks(), value_set=fsrc)
            hit = pc.is_valid(idx)
            et = et.filter(hit)
            fdist = ft.column("w").to_numpy(zero_copy_only=False)
            base = fdist[idx.filter(hit).to_numpy(zero_copy_only=False)]
            cand = base + et.column("w").to_numpy(zero_copy_only=False)
            out = pa.table(
                {"node": et.column("dst"), "dist": pa.array(cand, pa.int64())}
            )
            out = out.group_by(["node"]).aggregate([("dist", "min")])
            out = out.rename_columns(["node", "dist"])
            return pa.table(
                {
                    "part": node_part(out.column("node").to_pylist()),
                    "node": out.column("node"),
                    "dist": out.column("dist"),
                }
            )

        cand = (
            adj.map_batches(tag_adj, batch_format="pyarrow")
            .union(frontier.map_batches(tag_f, batch_format="pyarrow"))
            .groupby("part")
            .map_groups(relax, batch_format="pyarrow")
        )

        # merge: co-partition candidates with the assigned table; keep
        # strict improvements (or first sightings) as the new frontier
        def tag_c(batch: pa.Table) -> pa.Table:
            return batch.append_column(
                "is_a", pa.array(np.zeros(batch.num_rows, np.int8), pa.int8())
            )

        def tag_a(batch: pa.Table) -> pa.Table:
            return batch.append_column(
                "is_a", pa.array(np.ones(batch.num_rows, np.int8), pa.int8())
            )

        def improved(g: pa.Table) -> pa.Table:
            is_a = pc.equal(g.column("is_a"), pa.scalar(1, pa.int8()))
            at = g.filter(is_a)
            ct = g.filter(pc.invert(is_a))
            if ct.num_rows == 0:
                return pa.table(
                    {
                        "part": pa.array([], pa.int64()),
                        "node": pa.array([], pa.string()),
                        "dist": pa.array([], pa.int64()),
                    }
                )
            best = ct.group_by(["part", "node"]).aggregate([("dist", "min")])
            best = best.rename_columns(["part", "node", "dist"])
            anode = at.column("node").combine_chunks()
            idx = pc.index_in(best.column("node").combine_chunks(), value_set=anode)
            old = np.full(best.num_rows, _SSSP_INF, np.int64)
            ok = pc.is_valid(idx).to_numpy(zero_copy_only=False)
            if ok.any():
                adist = at.column("dist").to_numpy(zero_copy_only=False)
                old[ok] = adist[
                    idx.filter(pc.is_valid(idx)).to_numpy(zero_copy_only=False)
                ]
            new = best.column("dist").to_numpy(zero_copy_only=False)
            return best.filter(pa.array(new < old))

        new_frontier = (
            cand.map_batches(tag_c, batch_format="pyarrow")
            .union(assigned.map_batches(tag_a, batch_format="pyarrow"))
            .groupby("part")
            .map_groups(improved, batch_format="pyarrow")
            .materialize()
        )
        if new_frontier.count() == 0:
            break

        # fold improvements into the distance table (per-part min merge)
        assigned = (
            assigned.union(new_frontier)
            .groupby("part")
            .map_groups(dedup_nodes, batch_format="pyarrow")
            .materialize()
        )
        frontier = new_frontier
    return assigned.select_columns(["node", "dist"])
