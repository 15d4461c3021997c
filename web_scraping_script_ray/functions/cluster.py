"""Embedding clustering (distributed Lloyd's k-means) and SemDeDup.

Training-data pipelines cluster document embeddings to stratify corpus
mixtures and to bound the cost of semantic near-dedup: SemDeDup (Abbas
et al. 2023, arXiv:2303.09540) runs pairwise similarity only WITHIN a
k-means cluster, turning an O(N²) all-pairs problem into K problems of
O((N/K)²).  Both halves are implemented here Ray-Data-first:

- ``kmeans_fit``: Lloyd iterations where each pass is one streaming
  ``map_batches`` over the embedding table emitting per-block partial
  sums — exactly (k × dim + k) int64 cells per block cross the wire,
  never a vector row.  Centroids are broadcast via ``ray.put`` once per
  iteration.  At 100 TB each pass re-reads the column-pruned parquet
  (embedding + id only); nothing materializes.
- ``semdedup``: assign each vector to its centroid (stateless broadcast
  matmul per batch), then ``groupby(cluster).map_groups`` runs the
  within-cluster epsilon-ball first-wins rule.  The shuffle moves each
  vector exactly once, keyed by cluster; per-group pairwise cost is
  bounded by the cluster size (pick k ∝ N/target_cluster_rows).

Determinism / oracle exactness: embeddings are quantized ONCE to
non-negative int64 (``floor(x·10⁶ + 0.5) + 2²⁰`` — the offset keeps every
value positive so floor-division semantics agree between numpy and
DuckDB, whose ``//`` truncates toward zero for negatives).  All distance
and centroid arithmetic is then exact integer math (magnitudes < 2⁵³,
so the DuckDB oracle can mirror it bit-for-bit with DOUBLE lists and
``list_inner_product``).  Initial centroids are the k smallest ids.

Reference parity note: the reference repo has no clustering; this is a
round-3 LLM-pipeline addition per the build brief (dedup family).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

QUANT_SCALE = 1_000_000.0
QUANT_OFFSET = 1 << 20  # embeddings are unit-ish; |x|·10⁶ < 2²⁰ keeps q > 0


def quantize(emb: np.ndarray) -> np.ndarray:
    """float embedding matrix → exact non-negative int64 grid."""
    return (np.floor(np.asarray(emb, dtype=np.float64) * QUANT_SCALE + 0.5)
            + QUANT_OFFSET).astype(np.int64)


def _qmat(batch: pa.Table, vec_col: str) -> np.ndarray:
    flat = batch.column(vec_col).combine_chunks()
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    values = np.asarray(flat.values, dtype=np.float64)
    n = len(batch)
    return quantize(values.reshape(n, -1)) if n else values.reshape(0, 0)


def _assign(q: np.ndarray, cent: np.ndarray) -> np.ndarray:
    """argmin_j ||q - c_j||² — exact int64; ties break to the lowest
    cluster id (numpy argmin first-index rule == SQL ORDER BY d2, cl)."""
    d2 = ((q * q).sum(1)[:, None] - 2 * (q @ cent.T)
          + (cent * cent).sum(1)[None, :])
    return np.argmin(d2, axis=1)


def _init_centroids(ds: "ray.data.Dataset", id_col: str, vec_col: str,
                    k: int) -> np.ndarray:
    """Quantized vectors of the k smallest ids: per-block partial top-k
    (only k rows leave each block), tiny driver-side final merge."""
    def partial(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        take = np.argsort(ids, kind="stable")[:k]
        return batch.take(pa.array(np.sort(take)))

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: r[id_col])
    rows = rows[:k]
    return quantize(np.stack([np.asarray(r[vec_col], dtype=np.float64)
                              for r in rows]))


def kmeans_fit(
    ds: "ray.data.Dataset",
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Distributed Lloyd's: returns the final (k, dim) int64 centroids.

    Each iteration: broadcast centroids (``ray.put``), one map_batches
    pass emits per-block partials (cluster, count, per-dim sums), the
    driver reduces k·#blocks tiny rows and floor-divides.  Empty
    clusters keep their previous centroid (COALESCE in the oracle)."""
    cent = _init_centroids(ds, id_col, vec_col, k)
    dim = cent.shape[1]

    for _ in range(iters):
        cref = ray.put(cent)

        def partial(batch: pa.Table, *, _cref=cref) -> pa.Table:
            c = ray.get(_cref)
            q = _qmat(batch, vec_col)
            if q.shape[0] == 0:
                return pa.table({
                    "cl": pa.array([], pa.int32()),
                    "n": pa.array([], pa.int64()),
                    "s": pa.array([], pa.list_(pa.int64())),
                })
            a = _assign(q, c)
            cls, ns, ss = [], [], []
            for j in np.unique(a):
                m = a == j
                cls.append(int(j))
                ns.append(int(m.sum()))
                ss.append(q[m].sum(0, dtype=np.int64).tolist())
            return pa.table({
                "cl": pa.array(cls, pa.int32()),
                "n": pa.array(ns, pa.int64()),
                "s": pa.array(ss, pa.list_(pa.int64())),
            })

        # k rows per block — a bounded partial-aggregate, safe to collect.
        parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
        sums = np.zeros((k, dim), dtype=np.int64)
        counts = np.zeros(k, dtype=np.int64)
        for r in parts:
            sums[r["cl"]] += np.asarray(r["s"], dtype=np.int64)
            counts[r["cl"]] += r["n"]
        nxt = cent.copy()
        nz = counts > 0
        nxt[nz] = sums[nz] // counts[nz, None]
        cent = nxt
    return cent


def kmeans_assign(
    ds: "ray.data.Dataset",
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    carry_quantized: bool = False,
) -> "ray.data.Dataset":
    """Stateless assignment pass → {id_col, cluster[, q]} (one broadcast
    matmul per batch; embedding column dropped unless carried)."""
    cref = ray.put(np.asarray(centroids, dtype=np.int64))

    def stage(batch: pa.Table) -> pa.Table:
        c = ray.get(cref)
        q = _qmat(batch, vec_col)
        a = (_assign(q, c) if q.shape[0] else
             np.array([], dtype=np.int64)).astype(np.int32)
        cols = {
            id_col: batch.column(id_col),
            "cluster": pa.array(a, pa.int32()),
        }
        if carry_quantized:
            cols["q"] = pa.array(q.tolist(), pa.list_(pa.int64()))
        return pa.table(cols)

    return ds.map_batches(stage, batch_format="pyarrow")


def semdedup(
    ds: "ray.data.Dataset",
    k: int = 8,
    iters: int = 3,
    tau: int = 1_300_000_000_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> "ray.data.Dataset":
    """SemDeDup keep/drop flags → {id_col, cluster, kept}.

    ``kept`` is False iff SOME same-cluster vector with a smaller id lies
    within quantized-L2² ``tau`` (first-wins by id; the earlier vector
    need not itself be kept — the rule is a plain NOT EXISTS, which keeps
    it order-independent and SQL-exact).  tau is in quantized units:
    raw-L2² · 10¹² (default ≙ raw distance ~1.14)."""
    cent = kmeans_fit(ds, k=k, iters=iters, id_col=id_col, vec_col=vec_col)
    assigned = kmeans_assign(ds, cent, id_col=id_col, vec_col=vec_col,
                             carry_quantized=True)

    def per_cluster(group: pa.Table) -> pa.Table:
        ids = group.column(id_col).to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        q = np.asarray(
            group.column("q").combine_chunks().values, dtype=np.int64
        ).reshape(len(group), -1)[order]
        n = len(ids)
        kept = np.ones(n, dtype=bool)
        gram = (q * q).sum(1)
        # no sequential dependence (earlier vector need not be kept), so
        # the whole rule is one chunked pairwise pass, not a row loop
        chunk = max(1, (16 << 20) // max(n * 8, 1))  # ≤16 MB of d2 per slab
        for lo in range(1, n, chunk):
            hi = min(lo + chunk, n)
            d2 = (gram[lo:hi, None] - 2 * (q[lo:hi] @ q.T) + gram[None, :])
            near = d2 <= tau
            # only columns strictly before the row index count
            col = np.arange(n)[None, :]
            row = np.arange(lo, hi)[:, None]
            kept[lo:hi] = ~(near & (col < row)).any(axis=1)
        return pa.table({
            id_col: pa.array(ids[order]),
            "cluster": group.column("cluster").take(pa.array(order)),
            "kept": pa.array(kept),
        })

    return assigned.groupby("cluster").map_groups(
        per_cluster, batch_format="pyarrow"
    )
