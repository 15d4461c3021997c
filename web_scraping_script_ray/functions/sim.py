"""Similarity search over an embedding column (list<float>).

Baseline: brute-force cosine top-k — the query matrix is broadcast once
(``ray.put``), every batch does one numpy matmul and emits only its
block-local top-k per query (partial top-k), and a tiny
``groupby(qid).map_groups`` merge produces the global top-k.  The shuffle
moves O(#blocks · q · k) candidate rows, never the embedding table.

Scale path: IVF — seeded k-means-style centroids built from a sample,
vectors assigned to their nearest centroid (one broadcast matmul per
batch), searches probe only the ``nprobe`` nearest centroid partitions.
Recall < 1 by design; the brute-force path is the exact oracle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data


def _normalize(mat: np.ndarray) -> np.ndarray:
    mat = np.asarray(mat, dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def _stack_vecs(batch: pa.Table, vec_col: str) -> np.ndarray:
    return np.stack(batch.column(vec_col).to_numpy(zero_copy_only=False))


def _select_topk(vals: np.ndarray, ids: np.ndarray, kk: int) -> np.ndarray:
    """Indices of the top-``kk`` values with the oracle's deterministic
    tie-break (value DESC, id ASC).  A bare argpartition keeps an
    ARBITRARY kk among rows tied at the boundary value, which diverges
    from ``ORDER BY cos DESC, vec_id`` whenever > kk candidates tie
    (e.g. duplicated embeddings); here the boundary ties are widened and
    resolved by a lexsort over just the candidate set."""
    n = len(vals)
    if kk >= n:
        cand = np.arange(n)
    else:
        part = np.argpartition(-vals, kk - 1)
        thresh = vals[part[kk - 1]]
        cand = np.flatnonzero(vals >= thresh)
    order = np.lexsort((ids[cand], -vals[cand]))[:kk]
    return cand[order]


def _partial_topk(batch: pa.Table, qref, k: int, id_col: str, vec_col: str) -> pa.Table:
    """Block-local top-k per query → (qid, id, cos) candidate rows."""
    qids, qmat = ray.get(qref) if isinstance(qref, ray.ObjectRef) else qref
    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    mat = _normalize(_stack_vecs(batch, vec_col))
    sims = qmat @ mat.T  # (q, B)
    kk = min(k, sims.shape[1])
    out_q, out_i, out_c = [], [], []
    for qi in range(sims.shape[0]):
        sel = _select_topk(sims[qi], ids, kk)
        out_q.append(np.full(len(sel), qids[qi], dtype=np.int64))
        out_i.append(ids[sel].astype(np.int64))
        out_c.append(sims[qi, sel])
    return pa.Table.from_arrays(
        [
            pa.array(np.concatenate(out_q), pa.int64()),
            pa.array(np.concatenate(out_i), pa.int64()),
            pa.array(np.concatenate(out_c), pa.float64()),
        ],
        names=["qid", "vec_id", "cos"],
    )


def _final_topk(g: pa.Table, k: int) -> pa.Table:
    cos = g.column("cos").to_numpy(zero_copy_only=False)
    ids = g.column("vec_id").to_numpy(zero_copy_only=False)
    # deterministic order: (-cos, vec_id) — ties broken by id
    order = np.lexsort((ids, -cos))[:k]
    return g.take(pa.array(order))


def ann_topk(
    ds: "ray.data.Dataset",
    queries: np.ndarray,
    qids: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> "ray.data.Dataset":
    """Exact cosine top-k: → (qid, vec_id, cos), k rows per query.

    ``queries``: (q, d) matrix; ``qids``: (q,) int ids for labeling.
    ``exclude_self`` drops vec_id == qid matches (self-search).
    """
    qmat = _normalize(queries)
    qref = ray.put((np.asarray(qids, dtype=np.int64), qmat))
    cands = ds.map_batches(
        lambda b: _partial_topk(b, qref, k + (1 if exclude_self else 0), id_col, vec_col),
        batch_format="pyarrow",
    )
    if exclude_self:
        cands = cands.map_batches(
            lambda b: b.filter(
                pa.array(
                    b.column("qid").to_numpy(zero_copy_only=False)
                    != b.column("vec_id").to_numpy(zero_copy_only=False)
                )
            ),
            batch_format="pyarrow",
        )
    return cands.groupby("qid").map_groups(
        lambda g: _final_topk(g, k), batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) index: coarse quantizer + partitioned search.
# ---------------------------------------------------------------------------

class IVFIndex:
    """Coarse centroids + an assignment column; search probes nprobe lists.

    Build: sample → seeded Lloyd iterations on the driver (centroids are
    tiny: n_lists × d), then one broadcast matmul per batch assigns every
    vector to its list.  At 100 TB the assigned table is written
    partitioned by ``ivf_list`` so a probe reads only its partitions.
    """

    def __init__(self, centroids: np.ndarray):
        self.centroids = _normalize(centroids)

    @staticmethod
    def train(
        ds: "ray.data.Dataset",
        n_lists: int = 16,
        vec_col: str = "embedding",
        sample_rows: int = 4096,
        iters: int = 10,
        seed: int = 13,
        id_col: str = "vec_id",
    ) -> "IVFIndex":
        # deterministic SPREAD sample: a modular hash filter keeps rows
        # from every block (limit() alone would take the first file's
        # vectors only — biased centroids at scale), then cap the count
        total = ds.count()
        if total > sample_rows:
            thresh = max(1, (1009 * sample_rows) // total + 1)

            def spread(batch: pa.Table) -> pa.Table:
                ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
                return batch.filter(pa.array((ids * 2654435761) % 1009 < thresh))

            sampled = ds.map_batches(spread, batch_format="pyarrow").limit(sample_rows)
        else:
            sampled = ds
        sample = sampled.to_pandas()[vec_col]
        mat = _normalize(np.stack(sample.to_numpy()))
        rng = np.random.Generator(np.random.PCG64(seed))
        cent = mat[rng.choice(len(mat), size=min(n_lists, len(mat)), replace=False)]
        for _ in range(iters):
            assign = (mat @ cent.T).argmax(axis=1)
            for c in range(len(cent)):
                members = mat[assign == c]
                if len(members):
                    cent[c] = members.mean(axis=0)
            cent = _normalize(cent)
        return IVFIndex(cent)

    def assign(
        self, ds: "ray.data.Dataset", id_col: str = "vec_id", vec_col: str = "embedding"
    ) -> "ray.data.Dataset":
        cref = ray.put(self.centroids)

        def assign_batch(batch: pa.Table) -> pa.Table:
            cent = ray.get(cref) if isinstance(cref, ray.ObjectRef) else cref
            mat = _normalize(_stack_vecs(batch, vec_col))
            lists = (mat @ cent.T).argmax(axis=1).astype(np.int32)
            return batch.append_column("ivf_list", pa.array(lists, pa.int32()))

        return ds.map_batches(assign_batch, batch_format="pyarrow")

    def search(
        self,
        assigned: "ray.data.Dataset",
        queries: np.ndarray,
        qids: np.ndarray,
        k: int = 10,
        nprobe: int = 4,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        exclude_self: bool = True,
        round_cos: bool = True,
    ) -> "ray.data.Dataset":
        """Probe the ``nprobe`` nearest lists per query; exact cosine
        within the probed subset (recall < 1 vs brute force).

        ``round_cos=False`` keeps full-precision scores so the
        ``nprobe = n_lists`` instantiation reproduces brute-force top-k
        bit-for-bit (the merge tie-breaks on raw cos) — the SQL-oracled
        full-probe query uses this."""
        qmat = _normalize(queries)
        probe = np.argsort(-(qmat @ self.centroids.T), axis=1)[:, :nprobe]
        # rows searched per query = union of probed lists; implement as one
        # filtered pass: a batch keeps rows whose list is probed by ≥1 query
        wanted_lists = np.unique(probe)
        qref = ray.put((np.asarray(qids, dtype=np.int64), qmat, probe))

        def probe_batch(batch: pa.Table) -> pa.Table:
            lists = batch.column("ivf_list").to_numpy(zero_copy_only=False)
            keep = np.isin(lists, wanted_lists)
            if not keep.any():
                return pa.Table.from_arrays(
                    [pa.array([], pa.int64()), pa.array([], pa.int64()), pa.array([], pa.float64())],
                    names=["qid", "vec_id", "cos"],
                )
            sub = batch.filter(pa.array(keep))
            qids_, qmat_, probe_ = ray.get(qref) if isinstance(qref, ray.ObjectRef) else qref
            ids = sub.column(id_col).to_numpy(zero_copy_only=False)
            sublists = sub.column("ivf_list").to_numpy(zero_copy_only=False)
            mat = _normalize(_stack_vecs(sub, vec_col))
            sims = qmat_ @ mat.T
            out_q, out_i, out_c = [], [], []
            for qi in range(len(qids_)):
                mask = np.isin(sublists, probe_[qi])
                if exclude_self:
                    mask &= ids != qids_[qi]
                idx = np.where(mask)[0]
                if not len(idx):
                    continue
                kk = min(k, len(idx))
                sel = idx[_select_topk(sims[qi, idx], ids[idx], kk)]
                out_q.append(np.full(len(sel), qids_[qi], dtype=np.int64))
                out_i.append(ids[sel].astype(np.int64))
                out_c.append(np.round(sims[qi, sel], 6) if round_cos else sims[qi, sel])
            if not out_q:
                return pa.Table.from_arrays(
                    [pa.array([], pa.int64()), pa.array([], pa.int64()), pa.array([], pa.float64())],
                    names=["qid", "vec_id", "cos"],
                )
            return pa.Table.from_arrays(
                [
                    pa.array(np.concatenate(out_q), pa.int64()),
                    pa.array(np.concatenate(out_i), pa.int64()),
                    pa.array(np.concatenate(out_c), pa.float64()),
                ],
                names=["qid", "vec_id", "cos"],
            )

        cands = assigned.map_batches(probe_batch, batch_format="pyarrow")
        return cands.groupby("qid").map_groups(
            lambda g: _final_topk(g, k), batch_format="pyarrow"
        )


# ---------------------------------------------------------------------------
# Random-hyperplane (sign) LSH ANN — the SQL-oracle-able approximate path.
# ---------------------------------------------------------------------------

def rademacher_planes(dim: int, n_planes: int, seed: int = 271) -> np.ndarray:
    """Deterministic ±1 hyperplanes (Charikar, STOC'02 sign-LSH).  ±1
    entries (not gaussians) so the plane values embed exactly as SQL
    literals and ``list_dot_product`` reproduces the bucket bit-for-bit."""
    rng = np.random.default_rng(seed)
    return (rng.integers(0, 2, (dim, n_planes)) * 2 - 1).astype(np.float64)


def lsh_buckets(mat: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """bucket = Σ_j 2^j · [dot(v, plane_j) ≥ 0] over the RAW (unnormalized)
    vectors — sign is norm-invariant, and skipping the normalize keeps the
    SQL side a plain ``list_dot_product``."""
    dots = np.asarray(mat, dtype=np.float64) @ planes
    bits = (dots >= 0).astype(np.int64)
    return bits @ (1 << np.arange(planes.shape[1], dtype=np.int64))


def ann_lsh_topk(
    ds: "ray.data.Dataset",
    queries: np.ndarray,
    qids: np.ndarray,
    planes: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> "ray.data.Dataset":
    """Sign-LSH bucketed ANN: candidates = vectors in the query's bucket,
    exact cosine top-k within them → (qid, vec_id, cos, bucket).

    One streaming pass: each block computes its rows' buckets (one
    matmul), keeps only rows bucket-matching ≥1 query, emits block-local
    top-k per query; a tiny groupby merges.  At 100 TB the bucket column
    is precomputed once and the table written partitioned by bucket, so a
    probe reads only its partition — same layout contract as IVF
    (`IVFIndex` above), but with a train-free, SQL-checkable quantizer.
    """
    qmat_n = _normalize(queries)
    qbuck = lsh_buckets(np.asarray(queries, dtype=np.float64), planes)
    qref = ray.put((np.asarray(qids, dtype=np.int64), qmat_n, qbuck, planes))

    def probe_batch(batch: pa.Table) -> pa.Table:
        qids_, qmat_, qbuck_, planes_ = (
            ray.get(qref) if isinstance(qref, ray.ObjectRef) else qref
        )
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        raw = _stack_vecs(batch, vec_col)
        buck = lsh_buckets(raw, planes_)
        keep = np.isin(buck, qbuck_)
        empty = pa.Table.from_arrays(
            [
                pa.array([], pa.int64()),
                pa.array([], pa.int64()),
                pa.array([], pa.float64()),
                pa.array([], pa.int64()),
            ],
            names=["qid", "vec_id", "cos", "bucket"],
        )
        if not keep.any():
            return empty
        ids, buck, raw = ids[keep], buck[keep], raw[keep]
        mat = _normalize(raw)
        sims = qmat_ @ mat.T
        out_q, out_i, out_c, out_b = [], [], [], []
        for qi in range(len(qids_)):
            mask = buck == qbuck_[qi]
            if exclude_self:
                mask &= ids != qids_[qi]
            idx = np.where(mask)[0]
            if not len(idx):
                continue
            kk = min(k, len(idx))
            sel = idx[_select_topk(sims[qi, idx], ids[idx], kk)]
            out_q.append(np.full(len(sel), qids_[qi], dtype=np.int64))
            out_i.append(ids[sel].astype(np.int64))
            out_c.append(sims[qi, sel])
            out_b.append(buck[sel])
        if not out_q:
            return empty
        return pa.Table.from_arrays(
            [
                pa.array(np.concatenate(out_q), pa.int64()),
                pa.array(np.concatenate(out_i), pa.int64()),
                pa.array(np.concatenate(out_c), pa.float64()),
                pa.array(np.concatenate(out_b), pa.int64()),
            ],
            names=["qid", "vec_id", "cos", "bucket"],
        )

    cands = ds.map_batches(probe_batch, batch_format="pyarrow")
    return cands.groupby("qid").map_groups(
        lambda g: _final_topk(g, k), batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# Exact kNN-graph self-join (the brute-force baseline the approximate
# paths — ann_lsh_topk, IVFIndex, SemDeDup clusters — are graded
# against).  Each vector's k nearest neighbors under quantized-integer
# L2² (exact; the same qv/qn arithmetic DuckDB reproduces bit-for-bit).
#
# Physical plan: one pass quantizes each block ONCE into (id, q) tables;
# those block refs stay in the object store and every map task streams
# the OTHER blocks through a running vectorized top-k merge — the table
# is never broadcast as one object, never shuffled, and per-task memory
# is O(batch × (k + block)).  Compute is the O(n²) the operator IS; at
# web scale you run the LSH/IVF paths and use this as the recall oracle
# on samples.  Ties break (d2, neighbor_id) ascending in both engines.
# ---------------------------------------------------------------------------


def knn_graph(
    ds: "ray.data.Dataset",
    id_col: str,
    vec_col: str,
    k: int = 5,
) -> "ray.data.Dataset":
    """k exact nearest neighbors (excluding self) per vector →
    (id, neighbor_id, rank, d2) with rank 1..k by (d2, neighbor_id)."""
    from .cluster import _qmat

    def qprep(batch: pa.Table) -> pa.Table:
        q = _qmat(batch, vec_col)
        lst = pa.FixedSizeListArray.from_arrays(
            pa.array(q.reshape(-1), pa.int64()), q.shape[1] if len(q) else 0
        )
        return pa.Table.from_arrays([batch.column(id_col), lst],
                                    names=[id_col, "__q"])

    qds = ds.map_batches(qprep, batch_format="pyarrow").materialize()
    refs = qds.to_arrow_refs()

    def _unpack(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        col = t.column("__q")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        q = np.asarray(col.values, dtype=np.int64).reshape(len(t), -1)
        return ids, q

    def topk_batch(batch: pa.Table) -> pa.Table:
        ids_a, qa = _unpack(batch)
        n_a = len(ids_a)
        if n_a == 0:
            return pa.Table.from_arrays(
                [pa.array([], pa.int64())] * 4,
                names=[id_col, "neighbor_id", "rank", "d2"],
            )
        na2 = (qa * qa).sum(1)
        big = np.iinfo(np.int64).max
        best_d = np.full((n_a, k), big, dtype=np.int64)
        best_id = np.full((n_a, k), big, dtype=np.int64)
        for ref in refs:
            t = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
            ids_b, qb = _unpack(t)
            if len(ids_b) == 0:
                continue
            nb2 = (qb * qb).sum(1)
            d2 = na2[:, None] - 2 * (qa @ qb.T) + nb2[None, :]
            d2[ids_a[:, None] == ids_b[None, :]] = big  # exclude self
            cand_d = np.concatenate([best_d, d2], axis=1)
            cand_id = np.concatenate(
                [best_id, np.broadcast_to(ids_b, (n_a, len(ids_b)))], axis=1
            )
            # rowwise (d2, id)-ascending: stable sort by id, then by d2
            o1 = np.argsort(cand_id, axis=1, kind="stable")
            d_s = np.take_along_axis(cand_d, o1, 1)
            i_s = np.take_along_axis(cand_id, o1, 1)
            o2 = np.argsort(d_s, axis=1, kind="stable")[:, :k]
            best_d = np.take_along_axis(d_s, o2, 1)
            best_id = np.take_along_axis(i_s, o2, 1)
        valid = best_id != big  # fewer than k others exist
        rank = np.broadcast_to(np.arange(1, k + 1, dtype=np.int64), (n_a, k))
        src = np.broadcast_to(ids_a[:, None], (n_a, k))
        m = valid.reshape(-1)
        return pa.Table.from_arrays(
            [
                pa.array(src.reshape(-1)[m], pa.int64()),
                pa.array(best_id.reshape(-1)[m], pa.int64()),
                pa.array(rank.reshape(-1)[m], pa.int64()),
                pa.array(best_d.reshape(-1)[m], pa.int64()),
            ],
            names=[id_col, "neighbor_id", "rank", "d2"],
        )

    return qds.map_batches(topk_batch, batch_format="pyarrow")
