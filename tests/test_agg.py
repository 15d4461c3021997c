"""Map-side combiner + adaptive salted aggregation (functions/agg.py).

The salted two-stage plan must be bit-identical to the direct grouped
sum on any input; the adaptive salt must actually fire for heavy-hitter
keys and stay zero for cold ones (so partial cardinality ≈ distinct
keys, not keys × salts)."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray

from web_scraping_script_ray.functions.agg import (
    grouped_sum_count,
    salted_grouped_sum,
)


def _skewed_table(n: int = 20_000, seed: int = 7) -> pa.Table:
    """One key owns ~50% of rows (the hot-domain regime), the rest spread
    over 200 cold keys."""
    rng = np.random.default_rng(seed)
    hot = rng.random(n) < 0.5
    keys = np.where(hot, 0, rng.integers(1, 201, n))
    vals = rng.integers(-1000, 1000, n)
    return pa.table({"k": pa.array(keys, pa.int64()), "v": pa.array(vals, pa.int64())})


def _sorted_pd(ds):
    return ds.to_pandas().sort_values("k").reset_index(drop=True)


def test_salted_equals_direct():
    tbl = _skewed_table()
    ds = ray.data.from_arrow(tbl).repartition(8)
    direct = grouped_sum_count(
        ray.data.from_arrow(tbl).repartition(8), ["k"], ["v"], {"v": "sum_v"},
        count_name="n",
    )
    salted = salted_grouped_sum(ds, "k", ["v"], {"v": "sum_v"}, count_name="n")
    a, b = _sorted_pd(direct), _sorted_pd(salted)
    assert list(a.columns) == ["k", "sum_v", "n"]
    assert set(b.columns) == set(a.columns)
    b = b[a.columns.tolist()]
    assert a.equals(b)


def test_adaptive_salt_spreads_hot_only():
    from web_scraping_script_ray.functions import agg as agg_mod

    tbl = _skewed_table()
    # reproduce add_salt's logic at module level: hot key must fan out
    # over >1 salt value, cold keys must all stay salt 0
    enc = pc.dictionary_encode(tbl.column("k")).combine_chunks()
    idx = enc.indices.to_numpy(zero_copy_only=False)
    counts = np.bincount(idx, minlength=len(enc.dictionary))
    hot_mask = counts >= max(64, int(tbl.num_rows * 0.02))
    assert hot_mask.sum() >= 1  # the planted hot key qualifies

    # run stage-1 partials through the real pipeline and inspect cardinality
    ds = ray.data.from_arrow(tbl).repartition(4)
    out = salted_grouped_sum(ds, "k", ["v"], {"v": "sum_v"}, count_name="n")
    n_keys = out.count()
    assert n_keys == 201  # hot key + 200 cold keys, salts merged away


def test_salted_handles_all_cold():
    # no key crosses the hot threshold -> pure pass-through salting
    rng = np.random.default_rng(3)
    tbl = pa.table(
        {
            "k": pa.array(rng.integers(0, 500, 2_000), pa.int64()),
            "v": pa.array(rng.integers(0, 10, 2_000), pa.int64()),
        }
    )
    direct = grouped_sum_count(
        ray.data.from_arrow(tbl), ["k"], ["v"], {"v": "s"}, count_name="n"
    )
    salted = salted_grouped_sum(
        ray.data.from_arrow(tbl), "k", ["v"], {"v": "s"}, count_name="n"
    )
    a, b = _sorted_pd(direct), _sorted_pd(salted)
    assert a.equals(b[a.columns.tolist()])


def test_coarse_merge_equals_direct():
    """grouped_sum_count(coarse=N) must equal the direct groupby plan
    exactly — multi-column keys, high key cardinality, many blocks."""
    rng = np.random.default_rng(7)
    n = 5_000
    tbl = pa.table(
        {
            "t": pa.array(rng.integers(0, 4, n), pa.int64()),      # low-card first
            "k": pa.array(rng.integers(0, 1500, n), pa.int64()),   # high-card last
            "v": pa.array(rng.integers(0, 100, n), pa.int64()),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(7)
    direct = grouped_sum_count(ds, ["t", "k"], ["v"], {"v": "s"}, count_name="n")
    coarse = grouped_sum_count(
        ds, ["t", "k"], ["v"], {"v": "s"}, count_name="n", coarse=16
    )

    def srt(d):
        return d.to_pandas().sort_values(["t", "k"]).reset_index(drop=True)

    a, b = srt(direct), srt(coarse)
    assert a.equals(b[a.columns.tolist()])


def test_mg_sketch_exact_and_bounded():
    """Misra-Gries: exact when capacity >= distinct keys; in the
    approximate regime every estimate is an undercount with total error
    <= n/(capacity+1), and true heavy hitters survive."""
    from web_scraping_script_ray.functions.sketch import mg_compress, mg_topk

    rng = np.random.default_rng(11)
    # skewed stream: key 0 is 30% of rows, long tail of 1000 cold keys
    hot = np.zeros(3_000, np.int64)
    tail = rng.integers(1, 1000, 7_000)
    vals = np.concatenate([hot, tail])
    rng.shuffle(vals)
    tbl = pa.table({"k": pa.array(vals, pa.int64())})
    ds = ray.data.from_arrow(tbl).repartition(8)

    true_counts = {int(k): int(c) for k, c in zip(*np.unique(vals, return_counts=True))}

    exact = mg_topk(ds, "k", capacity=4096, k=5).to_pandas()
    top_true = sorted(true_counts.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert list(zip(exact["k"], exact["est_count"])) == top_true

    approx = mg_topk(ds, "k", capacity=32, k=5).to_pandas()
    n = len(vals)
    for k, est in zip(approx["k"], approx["est_count"]):
        true = true_counts[int(k)]
        assert est <= true
        assert true - est <= 8 * (n // 33 + 1)  # per-block + merge decrements
    assert approx.iloc[0]["k"] == 0  # the 30% hitter survives compression

    # kernel: compress keeps <= capacity and only undercounts
    ks, cs = mg_compress(np.arange(100), np.arange(1, 101), 10)
    assert len(ks) <= 10 and (cs >= 1).all()


def test_mg_sketch_string_keys():
    """mg_topk is key-type agnostic after the Arrow-native rework."""
    from web_scraping_script_ray.functions.sketch import mg_topk

    vals = ["alpha"] * 50 + ["beta"] * 30 + ["gamma"] * 20 + ["delta"] * 20
    tbl = pa.table({"host": pa.array(vals, pa.string())})
    out = mg_topk(
        ray.data.from_arrow(tbl).repartition(4), "host", capacity=64, k=3
    ).to_pandas()
    assert out["host"].tolist() == ["alpha", "beta", "delta"]  # tie: delta < gamma
    assert out["est_count"].tolist() == [50, 30, 20]


def test_mg_exact_guard_raises():
    import pytest

    from web_scraping_script_ray.functions.sketch import mg_topk

    tbl = pa.table({"k": pa.array(np.arange(100), pa.int64())})
    with pytest.raises(Exception, match="capacity"):
        mg_topk(
            ray.data.from_arrow(tbl), "k", capacity=8, k=3, exact_guard=True
        ).to_pandas()


def test_radix_quantiles_full_int64_domain():
    """The radix-bisection plan must be exact across the FULL signed
    int64 domain (sign flip, all 4 bit passes live) — a regime the sf
    fixtures (small positive cents) never reach — and per key, including
    a key whose values are all negative and a single-row key."""
    from web_scraping_script_ray.functions.agg import radix_quantiles

    rng = np.random.default_rng(11)
    n = 30_000
    keys = rng.choice(["wide", "neg", "tiny"], size=n, p=[0.6, 0.399, 0.001])
    vals = rng.integers(-(2**62), 2**62, size=n, dtype=np.int64)
    vals[keys == "neg"] = -rng.integers(1, 2**40, size=(keys == "neg").sum())
    one = np.flatnonzero(keys == "tiny")
    keys[one[1:]] = "wide"  # leave exactly one "tiny" row
    qs = (0.5, 0.9, 0.99)

    ds = ray.data.from_arrow(pa.table({"k": keys, "v": vals})).repartition(6)
    got = radix_quantiles(ds, "k", "v", qs=qs).to_pandas().set_index("k")

    for k in ("wide", "neg", "tiny"):
        sv = np.sort(vals[keys == k])
        assert int(got.loc[k, "n_rows"]) == len(sv)
        for qi, q in enumerate(qs):
            assert int(got.loc[k, f"q{qi}"]) == int(sv[int(q * (len(sv) - 1))]), (
                k, q,
            )


def test_hll_accuracy_and_merge_invariance():
    """HLL raw-estimator accuracy at high cardinality (std error
    1.04/sqrt(4096) ~ 1.6%; assert < 6%) and block-layout invariance:
    the registers are per-key maxes, so any repartitioning must yield
    the IDENTICAL summary row (bit-exact oracle parity at sf0.001 is
    tests/test_extra_queries.py::test_extra_query_parity[hll_distinct])."""
    from web_scraping_script_ray.functions.sketch import hll_distinct

    rng = np.random.default_rng(3)
    n = 120_000
    keys = rng.choice(["big", "small"], size=n, p=[0.95, 0.05])
    # wide value universe: md5 of short dense decimal strings carries a
    # measured ~+2% register bias; the sketch machinery is what's under
    # test, so use well-conditioned values (oracle parity covers the
    # dense regime bit-exactly anyway)
    vals = rng.integers(0, 10**12, size=n, dtype=np.int64)
    vals[keys == "small"] %= 97  # low-cardinality key in the same pass
    tbl = pa.table({"k": keys, "v": vals})

    got = {}
    for parts in (2, 11):
        ds = ray.data.from_arrow(tbl).repartition(parts)
        df = hll_distinct(ds, "k", "v").to_pandas().set_index("k").sort_index()
        got[parts] = df
    assert got[2].equals(got[11])  # summary independent of block layout

    df = got[2]
    for k in ("big", "small"):
        true = len(np.unique(vals[keys == k]))
        est = int(df.loc[k, "n_distinct_est"])
        assert abs(est - true) / true < 0.06, (k, true, est)
    assert int(df.loc["big", "m"]) == 4096


def test_bottomk_quantiles_accuracy_and_merge_invariance():
    """Sample-quantile error ~ sqrt(q(1-q)/k) (k=1024 → ~1.6% rank std
    at P50; assert < 6% rank error), and the bottom-k selection is a
    per-key global property, so any block layout yields the IDENTICAL
    summary (bit-exact oracle parity runs at sf0.001 in
    tests/test_extra_queries.py)."""
    from web_scraping_script_ray.functions.sketch import bottomk_quantiles

    rng = np.random.default_rng(11)
    n = 80_000
    keys = rng.choice(["a", "b"], size=n, p=[0.8, 0.2])
    vals = np.where(keys == "a", rng.normal(100, 15, n), rng.exponential(40, n))
    tbl = pa.table(
        {
            "k": keys,
            "rid": pa.array(np.arange(n, dtype=np.int64)),
            "v": pa.array(vals, pa.float64()),
        }
    )

    got = {}
    for parts in (3, 13):
        ds = ray.data.from_arrow(tbl).repartition(parts)
        df = (
            bottomk_quantiles(ds, "k", "v", "rid", k=1024)
            .to_pandas()
            .set_index("k")
            .sort_index()
        )
        got[parts] = df
    assert got[3].equals(got[13])

    df = got[3]
    for key in ("a", "b"):
        sub = np.sort(vals[keys == key])
        for q, col in ((0.5, "q50"), (0.9, "q90"), (0.99, "q99")):
            est = df.loc[key, col]
            # rank error: where the estimate falls in the true CDF
            rank = np.searchsorted(sub, est) / (len(sub) - 1)
            assert abs(rank - q) < 0.06, (key, q, rank)
        assert int(df.loc[key, "k_used"]) == 1024


def test_ams_f2_accuracy_and_linearity():
    """AMS counters computed over block partials equal the whole-table
    counters (linearity), and the median-of-groups estimate lands within
    a constant factor of the true F2 on a zipf-ish stream."""
    import numpy as np
    import pyarrow as pa

    from web_scraping_script_ray.functions.sketch import (
        AMS_K,
        ams_f2_estimate,
        ams_f2_partial,
    )

    rng = np.random.RandomState(11)
    vals = rng.zipf(1.6, 20_000) % 500  # heavy-hitter-ish stream
    t = pa.table({"u": pa.array(vals, pa.int64())})
    whole = ams_f2_partial(t, "u", AMS_K).column("z").to_numpy(zero_copy_only=False)
    # linearity: sum of per-block partials == whole-table counters
    z_sum = np.zeros(AMS_K, np.int64)
    for lo in range(0, len(vals), 3_333):
        part = ams_f2_partial(t.slice(lo, 3_333), "u", AMS_K)
        z_sum += part.column("z").to_numpy(zero_copy_only=False)
    assert (z_sum == whole).all()
    _, est = ams_f2_estimate(whole)
    _, counts = np.unique(vals, return_counts=True)
    f2 = int((counts.astype(np.int64) ** 2).sum())
    assert f2 / 4 <= est <= f2 * 4  # sketch-grade accuracy, deterministic seed


def test_kmv_merge_sets_exact_and_estimate_regimes():
    """Set-op estimates: exact when the union fits in k; within sketch
    tolerance (and consistent) in the estimating regime."""
    import numpy as np

    from web_scraping_script_ray.functions.sketch import (
        _kmv_hashes,
        kmv_merge_sets,
    )
    import pyarrow as pa

    def hashes(ids):
        return np.sort(_kmv_hashes(pa.array([str(i) for i in ids], pa.string())))

    # exact regime: |A ∪ B| = 30 < k = 64
    a = hashes(range(0, 20))
    b = hashes(range(10, 30))
    nc, m, uest, iest = kmv_merge_sets(a[:64], b[:64], 64)
    assert (m, uest, iest) == (30, 30, 10) and nc == 10

    # estimating regime: 3000 ∪ 3000 with 1000 common
    a = hashes(range(0, 3000))[:64]
    b = hashes(range(2000, 5000))[:64]
    nc, m, uest, iest = kmv_merge_sets(a, b, 64)
    assert m == 64
    assert 5000 / 2 <= uest <= 5000 * 2
    assert 1000 / 3 <= iest <= 1000 * 3
