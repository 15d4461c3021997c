"""Distributed k-means + SemDeDup: partition invariance, exactness vs a
single-machine reference, and the cluster-bounded dedup semantics."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from web_scraping_script_ray.functions.cluster import (
    QUANT_OFFSET,
    kmeans_assign,
    kmeans_fit,
    quantize,
    semdedup,
)


def _vecs(n=600, dim=16, k_true=5, seed=3):
    rng = np.random.default_rng(seed)
    centers = rng.normal(0, 1.0, (k_true, dim))
    assign = rng.integers(0, k_true, n)
    emb = centers[assign] + rng.normal(0, 0.05, (n, dim))
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": pa.array(
                emb.astype(np.float32).tolist(), pa.list_(pa.float32())
            ),
        }
    ), emb.astype(np.float32)


def _reference_kmeans(emb, k, iters):
    """Single-process Lloyd over the same integer grid."""
    q = quantize(np.asarray(emb, dtype=np.float64))
    cent = q[:k].copy()  # vec_ids are 0..n-1 → k smallest ids = first k

    def assign(qm, c):
        d2 = (qm * qm).sum(1)[:, None] - 2 * (qm @ c.T) + (c * c).sum(1)[None, :]
        return np.argmin(d2, axis=1)

    for _ in range(iters):
        a = assign(q, cent)
        for j in range(k):
            m = a == j
            if m.sum():
                cent[j] = q[m].sum(0) // int(m.sum())
    return cent, assign(q, cent)


def test_quantize_nonnegative_and_exact():
    x = np.array([[-0.9999995, 0.0, 0.4583735]], dtype=np.float64)
    q = quantize(x)
    assert (q >= 0).all()
    assert q[0, 1] == QUANT_OFFSET


def test_kmeans_matches_reference_and_partition_invariant(ray_session):
    tbl, emb = _vecs()
    cent_ref, a_ref = _reference_kmeans(emb, k=6, iters=3)

    for parts in (1, 7):
        ds = ray.data.from_arrow(tbl).repartition(parts)
        cent = kmeans_fit(ds, k=6, iters=3)
        assert (cent == cent_ref).all(), parts
        out = (
            kmeans_assign(ds, cent)
            .to_pandas()
            .sort_values("vec_id")
            .reset_index(drop=True)
        )
        assert (out["cluster"].to_numpy() == a_ref).all(), parts


def test_kmeans_empty_cluster_keeps_centroid(ray_session):
    # two far groups, k=3: the third centroid (init = vec 2, inside group A)
    # empties out after reassignment and must stay where it was
    emb = np.zeros((40, 4), dtype=np.float32)
    emb[20:] = 10.0
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(40), pa.int64()),
            "embedding": pa.array(emb.tolist(), pa.list_(pa.float32())),
        }
    )
    ds = ray.data.from_arrow(tbl)
    cent = kmeans_fit(ds, k=3, iters=2)
    cent_ref, _ = _reference_kmeans(emb, k=3, iters=2)
    assert (cent == cent_ref).all()


def test_semdedup_first_wins_within_cluster(ray_session):
    # duplicate vectors: only the smallest vec_id of each identical group
    # survives; distinct vectors all survive
    base = np.eye(4, dtype=np.float32) * 0.3
    emb = np.concatenate([base, base[:2]])  # ids 4,5 duplicate ids 0,1
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(6), pa.int64()),
            "embedding": pa.array(emb.tolist(), pa.list_(pa.float32())),
        }
    )
    out = (
        semdedup(ray.data.from_arrow(tbl).repartition(3), k=2, iters=2, tau=10)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert out["kept"].tolist() == [True, True, True, True, False, False]


def test_semdedup_not_exists_rule_is_chain_free(ray_session):
    # a--b within tau, b--c within tau, a--c outside: b is dropped by a,
    # and c is dropped by b EVEN THOUGH b itself is dropped (NOT EXISTS
    # over all earlier rows, not only kept ones)
    emb = np.array([[0.0], [1.0], [2.0]], dtype=np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array([0, 1, 2], pa.int64()),
            "embedding": pa.array(emb.tolist(), pa.list_(pa.float32())),
        }
    )
    tau = int(1.5e12)  # covers d=1.0 (1e12) but not d=2.0 (4e12)
    out = (
        semdedup(ray.data.from_arrow(tbl), k=1, iters=1, tau=tau)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert out["kept"].tolist() == [True, False, False]


def test_semdedup_partition_invariant(ray_session):
    tbl, _ = _vecs(n=300, dim=8, seed=11)
    tau = int(0.02e12)
    a = (
        semdedup(ray.data.from_arrow(tbl), k=4, iters=2, tau=tau)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    b = (
        semdedup(ray.data.from_arrow(tbl).repartition(9), k=4, iters=2, tau=tau)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert a.equals(b)
    assert (~a["kept"]).sum() > 0  # tau chosen so the test exercises drops
