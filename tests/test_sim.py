"""Similarity-search tests: brute-force top-k correctness vs numpy oracle;
IVF recall and candidate-subset property."""

import numpy as np
import pyarrow as pa
import pytest

from web_scraping_script_ray.functions.sim import IVFIndex, ann_topk


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    yield


@pytest.fixture(scope="module")
def emb_ds():
    import ray.data

    rng = np.random.default_rng(11)
    # 10 clusters of 30 vectors — IVF-friendly structure
    centers = rng.standard_normal((10, 32)) * 3
    vecs = np.concatenate(
        [c + rng.standard_normal((30, 32)) * 0.5 for c in centers]
    ).astype(np.float32)
    t = pa.Table.from_arrays(
        [
            pa.array(range(len(vecs)), pa.int64()),
            pa.array([v.tolist() for v in vecs], pa.list_(pa.float32())),
        ],
        names=["vec_id", "embedding"],
    )
    return ray.data.from_arrow(t).repartition(5), vecs


def numpy_topk(vecs, qi, k):
    v = vecs.astype(np.float64)
    v = v / np.linalg.norm(v, axis=1, keepdims=True)
    sims = v @ v[qi]
    sims[qi] = -2  # exclude self
    order = np.lexsort((np.arange(len(v)), -sims))
    return order[:k].tolist()


def test_ann_topk_matches_numpy_oracle(emb_ds):
    ds, vecs = emb_ds
    qids = np.array([0, 30, 60])
    out = ann_topk(ds, vecs[qids], qids, k=5).to_pandas()
    assert len(out) == 15
    for qi in qids:
        mine = out[out.qid == qi].sort_values("cos", ascending=False).vec_id.tolist()
        assert set(mine) == set(numpy_topk(vecs, qi, 5)), qi


def test_ivf_assign_partitions_all(emb_ds):
    ds, vecs = emb_ds
    index = IVFIndex.train(ds, n_lists=10)
    assigned = index.assign(ds)
    df = assigned.to_pandas()
    assert len(df) == len(vecs)
    assert df.ivf_list.nunique() > 1
    assert df.ivf_list.between(0, 9).all()


def test_ivf_search_recall(emb_ds):
    ds, vecs = emb_ds
    index = IVFIndex.train(ds, n_lists=10)
    assigned = index.assign(ds).materialize()
    qids = np.array([0, 30, 60, 90])
    got = index.search(assigned, vecs[qids], qids, k=5, nprobe=3).to_pandas()
    recalls = []
    for qi in qids:
        mine = set(got[got.qid == qi].vec_id.tolist())
        truth = set(numpy_topk(vecs, qi, 5))
        recalls.append(len(mine & truth) / 5)
    # clustered data + 3 probes → high recall
    assert np.mean(recalls) >= 0.8, recalls


def test_topk_tie_break_matches_oracle_order(ray_session):
    """>k candidates tied at the same cosine: per-block selection must
    keep the LOWEST vec_ids (ORDER BY cos DESC, vec_id), not an
    arbitrary argpartition subset — even when ids arrive descending."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from web_scraping_script_ray.functions.sim import ann_topk

    n = 31
    vec = np.array([1.0, 0.0, 0.0])
    ids = np.arange(n, 0, -1, dtype=np.int64)  # descending in the block
    t = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array([vec.tolist()] * n, pa.list_(pa.float64())),
        }
    )
    ds = ray.data.from_arrow(t).repartition(3)
    out = (
        ann_topk(ds, vec[None, :], np.array([999]), k=10)
        .to_pandas()
        .sort_values("vec_id")
    )
    assert out["vec_id"].tolist() == list(range(1, 11))
