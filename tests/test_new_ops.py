"""KMV sketch, sign-LSH ANN, running sum and grouped exact-median ops."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from web_scraping_script_ray.functions.sketch import kmv_distinct
from web_scraping_script_ray.functions.sim import (
    ann_lsh_topk,
    lsh_buckets,
    rademacher_planes,
)


def _events(n=30_000, n_users=2_000, seed=5) -> pa.Table:
    rng = np.random.default_rng(seed)
    return pa.table(
        {
            "event_type": pa.array(
                np.array(["a", "b", "c"])[rng.integers(0, 3, n)], pa.string()
            ),
            "user_id": pa.array(rng.integers(0, n_users, n), pa.int64()),
        }
    )


def test_kmv_accuracy_and_exact_small():
    tbl = _events()
    out = (
        kmv_distinct(ray.data.from_arrow(tbl).repartition(8), "event_type", "user_id", k=64)
        .to_pandas()
        .set_index("event_type")
    )
    truth = (
        tbl.to_pandas().groupby("event_type")["user_id"].nunique()
    )
    for t in ["a", "b", "c"]:
        est = out.loc[t, "n_distinct_est"]
        # KMV std-err ~ 1/sqrt(k-1) = 12.6%; 3 sigma bound
        assert abs(est - truth[t]) / truth[t] < 0.38, (t, est, truth[t])

    # below k distinct values the sketch is exact
    small = pa.table(
        {
            "event_type": pa.array(["x"] * 100, pa.string()),
            "user_id": pa.array(np.arange(100) % 40, pa.int64()),
        }
    )
    out2 = kmv_distinct(ray.data.from_arrow(small), "event_type", "user_id", k=64).to_pandas()
    assert out2.loc[0, "n_distinct_est"] == 40


def test_kmv_partition_invariant():
    """Mergeability: the estimate is a pure function of the value SET —
    identical regardless of block layout."""
    tbl = _events(seed=9)
    a = kmv_distinct(ray.data.from_arrow(tbl), "event_type", "user_id", k=64).to_pandas()
    b = kmv_distinct(
        ray.data.from_arrow(tbl).repartition(16), "event_type", "user_id", k=64
    ).to_pandas()
    a = a.sort_values("event_type").reset_index(drop=True)
    b = b.sort_values("event_type").reset_index(drop=True)
    assert a.equals(b)


def test_ann_lsh_bucket_semantics():
    rng = np.random.default_rng(11)
    n, d = 400, 64
    mat = rng.standard_normal((n, d)).astype(np.float32)
    ids = np.arange(n, dtype=np.int64)
    planes = rademacher_planes(d, 4, seed=271)
    ds = ray.data.from_arrow(
        pa.table({"vec_id": ids, "embedding": pa.array(list(mat), pa.list_(pa.float32()))})
    ).repartition(4)
    qids = ids[:3]
    out = ann_lsh_topk(ds, mat[:3], qids, planes, k=5).to_pandas()
    buckets = lsh_buckets(mat.astype(np.float64), planes)
    for _, row in out.iterrows():
        # every candidate shares its query's bucket; never the query itself
        assert row["bucket"] == buckets[int(row["qid"])]
        assert row["vec_id"] != row["qid"]
    assert (out.groupby("qid").size() <= 5).all()
    # cos equals the exact normalized dot for each returned pair
    norm = mat.astype(np.float64)
    norm = norm / np.linalg.norm(norm, axis=1, keepdims=True)
    for _, row in out.iterrows():
        expect = float(norm[int(row["qid"])] @ norm[int(row["vec_id"])])
        assert abs(row["cos"] - expect) < 1e-9


def test_running_sum_matches_pandas():
    from web_scraping_script_ray.pipelines.queries import q_running_sum

    out = (
        q_running_sum("/root/testdata/sf0.001")
        .to_pandas()
        .sort_values(["user_id", "event_id"])
        .reset_index(drop=True)
    )
    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet")
    ev["cents"] = np.round(ev["value"] * 100).astype(np.int64)
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    ev["run_cents"] = ev.groupby("user_id")["cents"].cumsum()
    ev = ev.sort_values(["user_id", "event_id"]).reset_index(drop=True)
    assert len(out) == len(ev)
    assert (out["run_cents"].values == ev["run_cents"].values).all()


def test_group_stats_matches_numpy():
    from web_scraping_script_ray.pipelines.queries import q_group_stats

    out = q_group_stats("/root/testdata/sf0.001").to_pandas().set_index("l_returnflag")
    li = pd.read_parquet("/root/testdata/sf0.001/lineitem.parquet")
    li["cents"] = np.round(li["l_extendedprice"] * 100).astype(np.int64)
    for flag, grp in li.groupby("l_returnflag"):
        assert out.loc[flag, "n_rows"] == len(grp)
        assert out.loc[flag, "median_cents"] == float(np.median(grp["cents"]))
        assert out.loc[flag, "min_cents"] == grp["cents"].min()
        assert out.loc[flag, "max_cents"] == grp["cents"].max()


# ---------------------------------------------------------------------------
# Forced-path equality for the size-selected plans (VERDICT r2 item 3):
# each broadcast plan's shuffle fallback must produce the identical
# result at sf0.001, where the size gate would normally pick broadcast.
# ---------------------------------------------------------------------------

_SF = "/root/testdata/sf0.001"


def test_customers_no_orders_plans_agree(ray_session):
    from web_scraping_script_ray.pipelines.queries import q_customers_no_orders

    a = (
        q_customers_no_orders(_SF, force_plan="broadcast")
        .to_pandas()
        .sort_values("c_custkey")
        .reset_index(drop=True)
    )
    b = (
        q_customers_no_orders(_SF, force_plan="shuffle")
        .to_pandas()
        .sort_values("c_custkey")
        .reset_index(drop=True)
    )
    assert len(a) > 0
    assert a.c_custkey.tolist() == b.c_custkey.tolist()
    assert a.c_name.tolist() == b.c_name.tolist()


def test_tfidf_plans_agree(ray_session):
    from web_scraping_script_ray.pipelines.queries import q_tfidf_top

    a = (
        q_tfidf_top(_SF, force_plan="broadcast")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        q_tfidf_top(_SF, force_plan="join")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(a) > 0
    for col in ("doc_id", "term", "tf", "df"):
        assert a[col].tolist() == b[col].tolist(), col


def test_line_dedup_plans_agree(ray_session):
    from web_scraping_script_ray.pipelines.queries import q_line_dedup

    a = (
        q_line_dedup(_SF, force_plan="broadcast")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        q_line_dedup(_SF, force_plan="shuffle")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(a) > 0
    for col in ("doc_id", "n_chunks", "n_dup_chunks", "n_kept_tokens", "clean_fp"):
        assert a[col].tolist() == b[col].tolist(), col


def test_above_avg_orders_plans_agree(ray_session):
    """Forced-path equality: the broadcast searchsorted-probe plan and
    the native hash-join plan select the same order rows."""
    from web_scraping_script_ray.pipelines.queries import q_above_avg_orders

    sf = "/root/testdata/sf0.001"
    a = (
        q_above_avg_orders(sf, force_plan="bcast").to_pandas()
        .sort_values(["o_orderkey"]).reset_index(drop=True)
    )
    b = (
        q_above_avg_orders(sf, force_plan="native").to_pandas()
        .sort_values(["o_orderkey"]).reset_index(drop=True)
    )
    assert len(a) > 0 and a.equals(b)


def test_lm_score_plans_agree(ray_session):
    from web_scraping_script_ray.pipelines.queries import q_lm_score

    a = (
        q_lm_score(_SF, force_plan="broadcast")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        q_lm_score(_SF, force_plan="join")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(a) > 0
    for col in ("doc_id", "n_bigrams", "sum_ulogp"):
        assert a[col].tolist() == b[col].tolist(), col


def test_pack_segments_reconstructs_stream(ray_session):
    """Every pack except the last must be exactly full; per-doc segment
    totals must equal the doc's token count; pack boundaries never
    overlap (the global token stream tiles)."""
    from web_scraping_script_ray.pipelines.queries import (
        _PACK_CAPACITY,
        q_pack_sequences,
    )

    df = q_pack_sequences(_SF).to_pandas()
    per_pack = df.groupby("pack_id")["seg_tokens"].sum()
    assert (per_pack.iloc[:-1] == _PACK_CAPACITY).all()
    assert 0 < per_pack.iloc[-1] <= _PACK_CAPACITY
    assert (df["seg_tokens"] > 0).all()
    # a doc's segments are contiguous pack ids
    g = df.sort_values(["doc_id", "pack_id"]).groupby("doc_id")["pack_id"]
    assert ((g.max() - g.min() + 1) == g.count()).all()


def test_redact_pii_idempotent():
    from web_scraping_script_ray.functions.text import redact_pii

    t = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(
                [
                    "mail a.b-c_d@x-y.co or +44-123-4567 via 192.168.0.1",
                    "no pii at all",
                ]
            ),
        }
    )
    out = redact_pii(t)
    assert out.column("n_email").to_pylist() == [1, 0]
    assert out.column("n_phone").to_pylist() == [1, 0]
    assert out.column("n_ip").to_pylist() == [1, 0]
    red = out.column("text_redacted").to_pylist()
    assert red[0] == "mail <EMAIL> or <PHONE> via <IP>"
    # redacting already-redacted text is a no-op
    t2 = pa.table({"doc_id": pa.array([0, 1], pa.int64()), "text": pa.array(red)})
    assert redact_pii(t2).column("text_redacted").to_pylist() == red


def test_bloom_semi_join_exact_and_fp_bound(ray_session):
    """bloom_semi_join must equal a plain membership filter (the confirm
    join removes every bloom false positive), and the prefilter alone
    must hold the analytic FP bound (1-e^{-kn/m})^k ~ 4e-4 here."""
    from web_scraping_script_ray.functions.joins import (
        bloom_bitmap_from_keys,
        bloom_semi_join,
        bloom_test_keys,
    )

    rng = np.random.default_rng(7)
    dim_keys = np.unique(rng.integers(0, 10**12, size=5_000, dtype=np.int64))
    universe = np.unique(
        np.concatenate(
            [rng.integers(0, 10**12, size=100_000, dtype=np.int64), dim_keys]
        )
    )
    non_members = np.setdiff1d(universe, dim_keys)

    bm = bloom_bitmap_from_keys(dim_keys, 1 << 17, 4)
    assert bloom_test_keys(dim_keys, bm, 4).all()  # no false negatives
    fp = bloom_test_keys(non_members, bm, 4).mean()
    assert fp < 0.005, fp

    fact_keys = rng.choice(universe, size=20_000)
    fact = ray.data.from_arrow(
        pa.table(
            {
                "fk": pa.array(fact_keys, pa.int64()),
                "payload": pa.array(np.arange(len(fact_keys), dtype=np.int64)),
            }
        )
    ).repartition(7)
    dim = ray.data.from_arrow(
        pa.table({"dk": pa.array(dim_keys, pa.int64())})
    ).repartition(3)

    got = (
        bloom_semi_join(fact, "fk", dim, "dk", m_bits=1 << 17, k=4)
        .to_pandas()
        .sort_values(["payload"])
        .reset_index(drop=True)
    )
    member = np.isin(fact_keys, dim_keys)
    want = (
        pd.DataFrame({"fk": fact_keys[member],
                      "payload": np.arange(len(fact_keys), dtype=np.int64)[member]})
        .sort_values(["payload"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[["fk", "payload"]], want)


def test_skew_join_plans_agree(ray_session):
    """plain ≡ split, and a mid threshold exercises BOTH legs at once."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from web_scraping_script_ray.functions.joins import skew_join
    from web_scraping_script_ray.pipelines.queries import _read, q_skew_split_join

    def norm(res):
        df = res.to_pandas().sort_values(["event_id"]).reset_index(drop=True)
        return df[["event_id", "user_id", "event_type", "c_mktsegment"]]

    a = norm(q_skew_split_join(_SF, force_plan="plain"))
    b = norm(q_skew_split_join(_SF, force_plan="split"))
    assert len(a) == 1000
    assert a.equals(b)

    # threshold between user frequencies → hot AND cold legs both carry rows
    events = _read(_SF, "events", ["event_id", "user_id", "event_type"]).map_batches(
        lambda t: t.append_column(
            "c_custkey",
            pc.add(t.column("user_id"), pa.scalar(1, pa.int64())).cast(pa.int64()),
        ),
        batch_format="pyarrow",
    )
    dim = _read(_SF, "customer", ["c_custkey", "c_mktsegment"]).map_batches(
        lambda t: t.rename_columns(["ck", "c_mktsegment"]), batch_format="pyarrow"
    )
    mixed = skew_join(
        events, "c_custkey", dim, "ck", dim_cols=["c_mktsegment"],
        hot_min_count=70, force_plan="split",
    ).select_columns(["event_id", "user_id", "event_type", "c_mktsegment"])
    c = norm(mixed)
    assert a.equals(c)

    # sanity: with that threshold some users are hot and some cold
    counts = a.user_id.value_counts()
    assert (counts >= 70).any() and (counts < 70).any()


def test_incremental_dedup_plans_agree(ray_session):
    from web_scraping_script_ray.pipelines.queries import q_incremental_dedup

    def norm(res):
        return res.to_pandas().sort_values("doc_id").reset_index(drop=True)

    a = norm(q_incremental_dedup(_SF, force_plan="broadcast"))
    b = norm(q_incremental_dedup(_SF, force_plan="partition"))
    # snapshot = doc_id%3==0 (167 docs of 500), overlap %6==0 dropped (84)
    assert len(a) > 0
    assert (a.doc_id % 3 == 0).all()
    assert not (a.doc_id % 6 == 0).any()
    assert a.equals(b)


def test_setsim_join_random_vs_bruteforce(ray_session):
    """Random tiny corpora: prefix-filtered join == brute-force Jaccard."""
    import hashlib

    import numpy as np
    import pyarrow as pa
    import ray.data

    from web_scraping_script_ray.functions.dedup import setsim_join

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(8)]  # tiny vocab → real overlaps
    for trial in range(3):
        texts = [
            " ".join(rng.choice(vocab, size=rng.integers(3, 7)))
            for _ in range(40)
        ]
        ds = ray.data.from_arrow(
            pa.table({"doc_id": list(range(40)), "text": texts})
        )
        got = setsim_join(ds, "text", "doc_id", t_num=1, t_den=2).to_pandas()
        if len(got):
            got = got.sort_values(["id_a", "id_b"]).reset_index(drop=True)
        sets = [frozenset(t.lower().split()) for t in texts]
        want = []
        for a in range(40):
            for b in range(a + 1, 40):
                inter = len(sets[a] & sets[b])
                union = len(sets[a] | sets[b])
                if union and inter * 2 >= union:
                    want.append((a, b, inter * 1_000_000 // union))
        want.sort()
        got_t = (
            list(zip(got.id_a, got.id_b, got.jac_micro)) if len(got) else []
        )
        assert got_t == want, f"trial {trial}: {len(got_t)} vs {len(want)}"
        assert want, f"trial {trial} planted no pairs — test would be vacuous"


def test_skew_join_drops_hot_keys_missing_from_dim(ray_session):
    """INNER semantics on the hot leg: a hot fact key absent from the dim
    produces no rows (must not surface nulls or crash)."""
    import pyarrow as pa
    import ray.data

    from web_scraping_script_ray.functions.joins import skew_join

    fact = ray.data.from_arrow(
        pa.table({"k": [1] * 50 + [2] * 50 + [3] * 5, "x": list(range(105))})
    )
    dim = ray.data.from_arrow(
        pa.table({"dk": [1, 3], "label": ["one", "three"]})
    )
    out = (
        skew_join(fact, "k", dim, "dk", dim_cols=["label"],
                  hot_min_count=30, force_plan="split")
        .to_pandas()
        .sort_values("x")
        .reset_index(drop=True)
    )
    # key 2 is hot but missing from dim → dropped; 1 (hot) and 3 (cold) join
    assert sorted(out.k.unique().tolist()) == [1, 3]
    assert len(out) == 55
    assert set(out[out.k == 1].label) == {"one"}
    assert set(out[out.k == 3].label) == {"three"}


def test_triangle_count_random_vs_bruteforce(ray_session):
    import itertools

    import numpy as np
    import pyarrow as pa
    import ray.data

    from web_scraping_script_ray.functions.graph import triangle_count

    rng = np.random.default_rng(11)
    nodes = [f"n{i:02d}" for i in range(18)]
    pairs = list(itertools.combinations(nodes, 2))
    chosen = [pairs[i] for i in rng.choice(len(pairs), size=60, replace=False)]
    edges = ray.data.from_arrow(
        pa.table({"u": [u for u, _ in chosen], "v": [v for _, v in chosen]})
    )
    es = set(chosen)
    want = sum(
        1
        for a, b, c in itertools.combinations(nodes, 3)
        if (a, b) in es and (b, c) in es and (a, c) in es
    )
    got = triangle_count(edges, "u", "v").to_pandas().triangles.tolist()
    assert got == [want]


def test_edit1_join_random_vs_bruteforce(ray_session):
    """Random short strings over a tiny alphabet: deletion-blocked join
    == brute-force Levenshtein-1, each true pair exactly once."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from web_scraping_script_ray.functions.joins import edit1_self_join

    def lev(a: str, b: str) -> int:
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    rng = np.random.default_rng(5)
    alphabet = list("abc")
    strings = sorted(
        {
            "".join(rng.choice(alphabet, size=rng.integers(1, 6)))
            for _ in range(120)
        }
    )
    ds = ray.data.from_arrow(pa.table({"s": strings})).repartition(3)
    got = edit1_self_join(ds, "s", n_parts=8).to_pandas()
    got_t = sorted(zip(got.a, got.b, got.edit_op))
    want = []
    for i in range(len(strings)):
        for j in range(i + 1, len(strings)):
            if lev(strings[i], strings[j]) == 1:
                op = "sub" if len(strings[i]) == len(strings[j]) else "indel"
                want.append((strings[i], strings[j], op))
    want.sort()
    assert got_t == want
    assert any(op == "sub" for _, _, op in want)
    assert any(op == "indel" for _, _, op in want)


def test_cm_sketch_bounds_and_merge():
    """Count-Min kernel: estimates never undercount, and summing block
    partials equals sketching the whole stream (linearity)."""
    import numpy as np
    import pyarrow as pa

    from web_scraping_script_ray.functions.sketch import (
        cm_estimate,
        cm_partial_counters,
    )

    rng = np.random.default_rng(3)
    toks = [f"t{rng.integers(0, 300):03d}" for _ in range(5000)]
    true = {}
    for t in toks:
        true[t] = true.get(t, 0) + 1
    keys = sorted(true)
    counts = np.array([true[k] for k in keys], np.int64)
    whole = cm_partial_counters(pa.array(keys, pa.string()), counts)
    # split the same counts into 3 arbitrary partials
    parts = np.zeros_like(whole)
    for i in range(3):
        sel = np.arange(i, len(keys), 3)
        parts += cm_partial_counters(
            pa.array([keys[j] for j in sel], pa.string()), counts[sel]
        )
    np.testing.assert_array_equal(whole, parts)
    est = cm_estimate(whole, keys)
    assert (est >= counts).all()
    # with 300 keys in 4x1024 buckets most estimates are exact
    assert (est == counts).mean() > 0.9


def test_containment_join_random_vs_bruteforce(ray_session):
    """Random tiny corpora: one-sided prefix-filtered containment join
    == brute-force |A∩B|/|A| on unigram token sets."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from web_scraping_script_ray.functions.dedup import containment_join

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(10)]
    for trial in range(2):
        texts = [
            " ".join(rng.choice(vocab, size=rng.integers(2, 8)))
            for _ in range(35)
        ]
        ds = ray.data.from_arrow(
            pa.table({"doc_id": list(range(35)), "text": texts})
        )
        got = containment_join(ds, "text", "doc_id", t_num=3, t_den=4).to_pandas()
        got_t = sorted(zip(got.id_a, got.id_b, got.cont_micro))
        sets = [frozenset(t.lower().split()) for t in texts]
        want = []
        for a in range(35):
            for b in range(35):
                if a == b:
                    continue
                inter = len(sets[a] & sets[b])
                if inter * 4 >= 3 * len(sets[a]):
                    want.append((a, b, inter * 1_000_000 // len(sets[a])))
        want.sort()
        assert got_t == want, f"trial {trial}: {len(got_t)} vs {len(want)}"
        assert want, f"trial {trial} planted no pairs"


def test_setsim_df_order_matches_hash_order(ray_session):
    """order='df' (ascending-document-frequency prefixes) returns the
    exact same pair set as the hash order — the total order changes
    only candidate counts, never the verified result."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from web_scraping_script_ray.functions.dedup import setsim_join

    rng = np.random.default_rng(21)
    vocab = [f"w{i}" for i in range(9)]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(3, 8)))
        for _ in range(50)
    ]
    ds = ray.data.from_arrow(pa.table({"doc_id": list(range(50)), "text": texts}))
    a = (
        setsim_join(ds, t_num=1, t_den=2)
        .to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
    )
    b = (
        setsim_join(ds, t_num=1, t_den=2, order="df")
        .to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
    )
    assert len(a) > 0
    assert a.equals(b)


def test_snapshot_diff_one_sided_partitions(ray_session):
    """A part group holding only one snapshot side must classify, not
    crash (the empty-array searchsorted trap)."""
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    import web_scraping_script_ray.pipelines.queries as qq

    # doc_ids chosen so some part (id % 64) groups hold only one
    # snapshot side: % 5 == 4 -> new-only (added), % 5 == 0 -> old-only
    # (removed), % 7 == 0 -> revised (changed)
    ids = [0, 4, 65, 69, 7]

    with tempfile.TemporaryDirectory() as d:
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(ids, pa.int64()),
                    "text": pa.array([f"t{i}" for i in ids], pa.string()),
                }
            ),
            os.path.join(d, "documents.parquet"),
        )
        out = qq.q_snapshot_diff(d).to_pandas()
    got = dict(zip(out.doc_id, out.status))
    # %5==4 -> added; %5==0 -> removed; 7 %7==0 -> changed
    assert got[4] == "added" and got[69] == "added"
    assert got[0] == "removed" and got[65] == "removed"
    assert got[7] == "changed"


def test_token_truncate_preserves_under_cap_rows(ray_session):
    """token_truncate must leave rows under the cap byte-identical
    (case and whitespace preserved); only over-cap rows are rewritten."""
    import pyarrow as pa
    import ray.data

    from web_scraping_script_ray.pipelines.postprocess import apply_ops

    texts = ["Hello  World\nSecond Line", "a b c d e f g h"]
    ds = ray.data.from_arrow(pa.table({"seq": [0, 1], "text": texts}))
    out = (
        apply_ops(ds, [{"type": "token_truncate", "column": "text", "max_tokens": 4}])
        .to_pandas().sort_values("seq").reset_index(drop=True)
    )
    assert out.text[0] == "Hello  World\nSecond Line"  # 4 tokens: untouched
    assert out.text[1] == "a b c d"  # truncated (rejoined form)


def test_interval_coverage_random_vs_bruteforce(ray_session):
    """Random event times (with duplicates and cross-window gaps): the
    telescoped sweep == brute-force union of [t, t+300s) intervals."""
    import os
    import tempfile

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    import web_scraping_script_ray.pipelines.queries as qq

    rng = np.random.default_rng(13)
    rows = []
    for uid in range(6):
        n = rng.integers(1, 25)
        ts = rng.integers(0, 3_000, size=n) * 1_000_000  # us, dense+sparse
        rows.extend((uid, int(t)) for t in ts)
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array(range(len(rows)), pa.int64()),
                    "ts": pa.array(
                        [t for _, t in rows], pa.timestamp("us")
                    ),
                    "user_id": pa.array([u for u, _ in rows], pa.int64()),
                    "event_type": pa.array(["e"] * len(rows), pa.string()),
                    "value": pa.array([0.0] * len(rows), pa.float64()),
                    "props": pa.array(["{}"] * len(rows), pa.string()),
                }
            ),
            os.path.join(d, "events.parquet"),
        )
        out = qq.q_interval_coverage(d).to_pandas()
    got = dict(zip(out.user_id, out.covered_us))
    L = 300 * 1_000_000
    for uid in range(6):
        ivs = sorted(t for u, t in rows if u == uid)
        covered, end = 0, -1
        for t in ivs:
            s, e = max(t, end), t + L
            if e > s:
                covered += e - s
            end = max(end, e)
        assert got[uid] == covered, uid


def test_containment_broadcast_vs_bruteforce(ray_session):
    """Probe-broadcast containment == brute-force |A∩B|/|A| over two
    random datasets (unigram sets), self-pairs excluded."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from web_scraping_script_ray.functions.dedup import containment_probe_broadcast

    rng = np.random.default_rng(29)
    vocab = [f"w{i}" for i in range(10)]
    corpus = [" ".join(rng.choice(vocab, size=rng.integers(2, 9))) for _ in range(40)]
    ds = ray.data.from_arrow(
        pa.table({"doc_id": list(range(40)), "text": corpus})
    ).repartition(3)
    probe_ids = [3, 7, 11]
    probe = ray.data.from_arrow(
        pa.table({"doc_id": probe_ids, "text": [corpus[i] for i in probe_ids]})
    )
    got = containment_probe_broadcast(
        ds, probe, "text", "doc_id", t_num=3, t_den=4
    ).to_pandas()
    got_t = sorted(zip(got.id_a, got.id_b, got.cont_micro))
    sets = [frozenset(t.lower().split()) for t in corpus]
    want = []
    for a in probe_ids:
        for b in range(40):
            if a == b:
                continue
            inter = len(sets[a] & sets[b])
            if inter * 4 >= 3 * len(sets[a]):
                want.append((a, b, inter * 1_000_000 // len(sets[a])))
    want.sort()
    assert got_t == want
    assert want


def test_basket_pairs_vs_bruteforce(ray_session):
    """Vectorized per-basket pair generation == brute-force itertools,
    including duplicate rows (deduped per basket) and support filter."""
    import itertools

    import numpy as np
    import pyarrow as pa
    import ray.data

    from web_scraping_script_ray.functions.joins import basket_pairs

    rng = np.random.RandomState(5)
    baskets = rng.randint(0, 40, 600)
    items = rng.randint(0, 25, 600)
    t = pa.table(
        {"b": pa.array(baskets, pa.int64()), "i": pa.array(items, pa.int64())}
    )
    ds = ray.data.from_arrow(t).repartition(4)

    ref: dict = {}
    for bk in np.unique(baskets):
        its = sorted(set(items[baskets == bk].tolist()))
        for x, y in itertools.combinations(its, 2):
            ref[(x, y)] = ref.get((x, y), 0) + 1
    ref = {k: v for k, v in ref.items() if v >= 3}

    out = basket_pairs(ds, "b", "i", min_support=3).to_pandas()
    got = {
        (int(r.item_u), int(r.item_v)): int(r.n_baskets)
        for r in out.itertuples()
    }
    assert got == ref and len(ref) > 10


def test_nb_classify_plans_agree(ray_session):
    from web_scraping_script_ray.pipelines.queries import q_nb_classify

    a = (
        q_nb_classify(_SF, force_plan="broadcast")
        .to_pandas()
        .sort_values(["lang", "pred"])
        .reset_index(drop=True)
    )
    b = (
        q_nb_classify(_SF, force_plan="join")
        .to_pandas()
        .sort_values(["lang", "pred"])
        .reset_index(drop=True)
    )
    assert len(a) > 0
    assert a["n_docs"].sum() > 300  # every eval doc classified
    for col in ("lang", "pred", "n_docs"):
        assert a[col].tolist() == b[col].tolist(), col


def test_embed_cov_full_dim_and_pca(ray_session):
    """q_embed_cov at the full 64 dims: the distributed sufficient
    statistics reconstruct the exact covariance of the micro-quantized
    vectors, and power iteration on top recovers numpy's top principal
    component (the PCA consumer the docstring promises)."""
    import pyarrow.parquet as pq

    from web_scraping_script_ray.pipelines.queries import q_embed_cov

    out = q_embed_cov(_SF, d=64).to_pandas()
    assert len(out) == 64 * 65 // 2

    tbl = pq.read_table(_SF + "/embeddings.parquet")
    x = np.stack(tbl.column("embedding").to_pylist()).astype(np.float64)
    q = np.floor(x * 1e6)
    n = len(q)

    # exact integer sufficient statistics
    si_ref = q.sum(axis=0)
    gram_ref = q.T @ q
    for r in out.itertuples():
        i, j = int(r.i) - 1, int(r.j) - 1
        assert int(r.n) == n
        assert int(r.si) == int(si_ref[i])
        assert int(r.sj) == int(si_ref[j])
        assert int(r.sij) == int(gram_ref[i, j])

    # covariance reconstruction + power-iteration top eigenvector
    C = np.zeros((64, 64))
    for r in out.itertuples():
        i, j = int(r.i) - 1, int(r.j) - 1
        cov = (r.sij - r.si * r.sj / n) / n
        C[i, j] = C[j, i] = cov
    ref = (gram_ref - np.outer(si_ref, si_ref) / n) / n
    assert np.allclose(C, ref)

    v = np.ones(64) / 8.0
    for _ in range(500):
        v2 = C @ v
        v = v2 / np.linalg.norm(v2)
    _w, V = np.linalg.eigh(ref)
    assert abs(float(V[:, -1] @ v)) > 0.99


def test_explain_tool_lists_all_queries():
    """tools/explain.py --list enumerates every registered query (no
    Ray session needed for the listing path)."""
    import subprocess
    import sys

    from web_scraping_script_ray.pipelines.queries import EXTRA_QUERIES, QUERIES

    out = subprocess.run(
        [sys.executable, "tools/explain.py", "--list"],
        capture_output=True, text=True, cwd="/root/repo", timeout=120,
    )
    assert out.returncode == 0
    names = set(out.stdout.split())
    assert names == set(QUERIES) | set(EXTRA_QUERIES)


def test_readability_filter_op_matches_flesch_query(ray_session):
    """The YAML readability_filter op keeps exactly the doc_ids whose
    q_flesch score lands in the requested milli band."""
    import ray.data as rd

    from web_scraping_script_ray.pipelines.postprocess import apply_ops
    from web_scraping_script_ray.pipelines.queries import q_flesch

    scores = q_flesch(_SF).to_pandas().set_index("doc_id")["flesch_milli"]
    lo, hi = int(scores.quantile(0.25)), int(scores.quantile(0.75))
    expected = set(scores[(scores >= lo) & (scores <= hi)].index)

    ds = rd.read_parquet(_SF + "/documents.parquet")
    out = apply_ops(
        ds, [{"type": "readability_filter", "min_milli": lo, "max_milli": hi}]
    ).to_pandas()
    assert set(out["doc_id"]) == expected and len(expected) > 10


def test_sorted_neighborhood_carry_partition_invariant(ray_session):
    """The windowed self-join must produce identical pairs no matter how
    the sorted run is blocked — pins the cross-block carry (first-w-rows
    heads of following blocks) against a many-tiny-blocks layout."""
    from web_scraping_script_ray.pipelines import queries as Q

    sf = "/root/testdata/sf0.001"
    base = Q.q_sorted_neighborhood(sf).to_pandas()

    orig = Q._read

    def small_read(sf_dir, table, cols, **kw):
        kw["rows_per_block"] = 7  # force ~22 blocks over 150 customers
        return orig(sf_dir, table, cols, **kw)

    Q._read, tiny = small_read, None
    try:
        tiny = Q.q_sorted_neighborhood(sf).to_pandas()
    finally:
        Q._read = orig
    assert len(base) > 0
    assert base.reset_index(drop=True).equals(tiny.reset_index(drop=True))


def test_cdc_dedup_op_removes_shifted_boilerplate(ray_session):
    """The cdc_dedup post-processing op drops corpus-duplicated CDC
    chunks even when a prefix insertion shifts their byte positions
    (where fixed blocks would miss), keeps unique bytes verbatim, and
    preserves non-text columns."""
    import pyarrow as pa
    import ray.data

    from web_scraping_script_ray.pipelines.postprocess import apply_ops

    boiler = " ".join(f"boiler{i:03d} plate{i * 3 % 50:02d}" for i in range(120))
    uniq0 = "zero unique head text here . "
    uniq1 = "PREFIX SHIFT! completely different opening for doc one . "
    rows = pa.table(
        {
            "rid": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(
                [uniq0 + boiler, uniq1 + boiler, "untouched standalone doc"],
                pa.string(),
            ),
            "tag": pa.array(["a", "b", "c"], pa.string()),
        }
    )
    out = (
        apply_ops(
            ray.data.from_arrow(rows),
            [{"type": "cdc_dedup", "id_col": "rid", "column": "text"}],
        )
        .to_pandas()
        .sort_values("rid")
        .set_index("rid")
    )
    assert list(out.index) == [0, 1, 2]
    assert out.loc[2, "text"] == "untouched standalone doc"  # byte-exact
    assert out.loc[2, "tag"] == "c"
    # the shared boilerplate tail is mostly gone from BOTH docs despite
    # the shifted prefix in doc 1 (CDC's whole point)...
    assert len(out.loc[0, "text"]) < 0.5 * len(uniq0 + boiler)
    assert len(out.loc[1, "text"]) < 0.5 * len(uniq1 + boiler)
    # ...and each doc's unique opening survives verbatim at offset 0
    assert out.loc[0, "text"].startswith(uniq0[:20])
    assert out.loc[1, "text"].startswith(uniq1[:20])


def test_batch_levenshtein_matches_scalar():
    """_batch_levenshtein is exactly the scalar DP over random unicode
    strings of mixed lengths (incl. empties)."""
    import random

    from web_scraping_script_ray.pipelines.queries import (
        _batch_levenshtein,
        _levenshtein,
    )

    rng = random.Random(7)
    alpha = "abcde#01234é"
    a = ["".join(rng.choice(alpha) for _ in range(rng.randint(0, 12))) for _ in range(400)]
    b = ["".join(rng.choice(alpha) for _ in range(rng.randint(0, 12))) for _ in range(400)]
    got = _batch_levenshtein(a, b)
    want = [_levenshtein(x, y) for x, y in zip(a, b)]
    assert got.tolist() == want


def test_greedy_cover_plans_agree(ray_session):
    """Forced-path equality: the single-task greedy loop equals the
    exchange-per-round plan (gains, picks, tie-breaks)."""
    import web_scraping_script_ray.pipelines.queries as Q

    sf = "/root/testdata/sf0.001"
    a = Q.q_greedy_cover(sf).to_pandas().reset_index(drop=True)
    b = Q.q_greedy_cover(sf, force_plan="rounds").to_pandas().reset_index(drop=True)
    assert len(a) > 0 and a.equals(b)


def test_ship_lag_plans_agree(ray_session):
    """Forced-path equality: broadcast searchsorted lookup join vs the
    native hash join produce identical percentile tables."""
    import web_scraping_script_ray.pipelines.queries as Q

    sf = "/root/testdata/sf0.001"
    a = (
        Q.q_ship_lag(sf, force_plan="bcast").to_pandas()
        .sort_values("priority").reset_index(drop=True)
    )
    b = (
        Q.q_ship_lag(sf, force_plan="native").to_pandas()
        .sort_values("priority").reset_index(drop=True)
    )
    assert len(a) > 0 and a.equals(b)


def test_gini_hosts_plans_agree(ray_session):
    """Forced-path equality: single-task gini fold equals the
    partial/rank/fold exchange plan."""
    import web_scraping_script_ray.pipelines.queries as Q

    sf = "/root/testdata/sf0.001"
    a = Q.q_gini_hosts(sf).to_pandas().reset_index(drop=True)
    b = Q.q_gini_hosts(sf, force_plan="exchange").to_pandas().reset_index(drop=True)
    assert len(a) == 1 and a.equals(b)


def test_unique_key_lookup_join_empty_right(ray_session):
    """An empty right side must not crash the broadcast plan — it
    size-selects to the native join and returns zero rows."""
    import pyarrow as pa
    import ray.data as rd

    from web_scraping_script_ray.functions.joins import unique_key_lookup_join

    left = rd.from_arrow(pa.table({"k": [1, 2, 3], "x": [10, 20, 30]}))
    right = rd.from_arrow(
        pa.table({"k": pa.array([], pa.int64()), "y": pa.array([], pa.int64())})
    )
    out = unique_key_lookup_join(left, right, "k", "k")
    assert out.count() == 0


def test_rich_club_plans_agree(ray_session):
    """Forced-path equality: broadcast club probe vs the two-pass
    co-partition semi-join."""
    import web_scraping_script_ray.pipelines.queries as Q

    sf = "/root/testdata/sf0.001"
    a = Q.q_rich_club(sf, force_plan="bcast").to_pandas().reset_index(drop=True)
    b = Q.q_rich_club(sf, force_plan="copart").to_pandas().reset_index(drop=True)
    assert len(a) == 1 and a.equals(b)


def test_bloom_or_merge_tree_equals_driver_loop(ray_session):
    """Forced-path equality (house pattern): the distributed tree reduce
    + streaming driver fold (bloom_or_merge) must produce the
    bit-identical bitmap — and key total — of the naive take_all()
    driver OR loop it replaced (OR is associative/commutative, so any
    reduction tree is exact; this pins the implementation)."""
    import ray

    from web_scraping_script_ray.functions.joins import (
        bloom_bitmap_from_keys,
        bloom_or_merge,
    )

    m_bits = 1 << 14
    rng = np.random.default_rng(7)
    tables, merged_naive, n_naive = [], np.zeros(m_bits // 64, np.uint64), 0
    for _ in range(37):
        keys = rng.integers(0, 1 << 40, size=int(rng.integers(1, 500))).astype(
            np.int64
        )
        bm = bloom_bitmap_from_keys(keys, m_bits, 4)
        merged_naive |= bm
        n_naive += len(np.unique(keys))
        tables.append(
            pa.table(
                {
                    "bm": pa.array([bm.tobytes()], pa.large_binary()),
                    "n": pa.array([len(np.unique(keys))], pa.int64()),
                }
            )
        )
    merged, total = bloom_or_merge(
        ray.data.from_arrow(tables), m_bits, fanin=8, count_col="n"
    )
    assert np.array_equal(merged, merged_naive)
    assert total == n_naive
    merged2, none_total = bloom_or_merge(ray.data.from_arrow(tables), m_bits, fanin=8)
    assert np.array_equal(merged2, merged_naive)
    assert none_total is None


def test_rich_club_empty_graph_matches_oracle_shape(ray_session, monkeypatch):
    """Edge case outside the tested corpora: an EMPTY link graph must
    still return the single (k, 0, 0, 0) row the SQL oracle's
    scalar-subquery plan yields (ec.repartition(1) over zero rows would
    otherwise emit zero rows)."""
    import ray

    import web_scraping_script_ray.pipelines.queries as Q

    empty = ray.data.from_arrow(
        pa.table({"u": pa.array([], pa.string()), "v": pa.array([], pa.string())})
    )
    monkeypatch.setattr(Q, "_web_link_edges", lambda sf: empty)
    df = Q.q_rich_club("/root/testdata/sf0.001").to_pandas()
    assert len(df) == 1
    row = df.iloc[0]
    assert row["k"] == Q._RICH_CLUB_K
    assert row["n_club"] == 0 and row["e_club"] == 0 and row["phi_micro"] == 0


def test_bpe_train_plans_agree_and_known_merges(ray_session):
    """Forced single-task == forced distributed per-round plan on the
    sf0.001 corpus (house size-switch pattern), plus a hand-checkable
    fixture: the classic low/lower/newest/widest corpus must train the
    textbook first merges with the (count DESC, pair ASC) tie-break."""
    import ray

    import web_scraping_script_ray.pipelines.queries as Q
    from web_scraping_script_ray.functions.bpe import bpe_train

    sf = "/root/testdata/sf0.001"
    a = Q.q_bpe_train(sf, force_plan="single").to_pandas()
    b = Q.q_bpe_train(sf, force_plan="distributed").to_pandas()
    assert len(a) == Q._BPE_TRAIN_MERGES
    assert a.equals(b)
    # vocabulary shrinks the right way: each merge's symbol is usable by
    # later merges (ranks strictly increasing, counts positive)
    assert a["rank"].tolist() == list(range(1, len(a) + 1))
    assert (a["n"] > 0).all()

    docs = pa.table(
        {
            "doc_id": pa.array(range(4), pa.int64()),
            "text": pa.array(
                [
                    "low low low low low",
                    "lower lower",
                    "newest newest newest newest newest newest",
                    "widest widest widest",
                ]
            ),
        }
    )
    out = bpe_train(ray.data.from_arrow(docs), n_merges=4).to_pandas()
    # pair counts: (e,s)=(s,t)=9, (l,o)=(o,w)=7, ... → (e,s) wins rank 1
    # by the ASC tie-break, then es+t=9, then (l,o) before (o,w)
    assert out[["lhs", "rhs"]].values.tolist() == [
        ["e", "s"],
        ["es", "t"],
        ["l", "o"],
        ["lo", "w"],
    ]
    assert out["n"].tolist() == [9, 9, 7, 7]


def test_bpe_encode_all_plans_agree(ray_session):
    """All four trainer×lookup plan combinations of bpe_encode_counts
    produce identical per-doc counts on the sf0.001 corpus (forced-path
    equality for BOTH size switches)."""
    import ray

    from web_scraping_script_ray.functions.bpe import bpe_encode_counts

    sf = "/root/testdata/sf0.001"
    ds = ray.data.read_parquet(
        f"{sf}/documents.parquet", columns=["doc_id", "text"]
    )
    frames = {}
    for plan in ("single", "distributed"):
        for lk in ("broadcast", "join"):
            frames[(plan, lk)] = (
                bpe_encode_counts(ds, n_merges=6, force_plan=plan, force_lookup=lk)
                .to_pandas()
                .sort_values("doc_id")
                .reset_index(drop=True)
            )
    base = frames[("single", "broadcast")]
    assert len(base) == 500 and (base["n_tokens"] > 0).all()
    for k, v in frames.items():
        assert base.equals(v), k


def test_bpe_properties_hypothesis():
    """Property tests for the sequential BPE kernel (the semantics both
    distributed plans are pinned to): (1) total corpus token count is
    monotone NON-INCREASING in n_merges (each merge can only shorten or
    keep every word); (2) every word's final symbols concatenate back to
    the word exactly; (3) merge counts are positive and each merged
    symbol is the concatenation of its pair."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from web_scraping_script_ray.functions.bpe import _merge_rounds_seq

    word = st.text(alphabet="abcdef", min_size=1, max_size=10)
    corpus = st.lists(
        st.tuples(word, st.integers(min_value=1, max_value=50)),
        min_size=1,
        max_size=12,
    )

    @settings(max_examples=60, deadline=None)
    @given(corpus=corpus, k=st.integers(min_value=0, max_value=8))
    def check(corpus, k):
        seen = {}
        for w, c in corpus:
            seen[w] = seen.get(w, 0) + c
        words = sorted(seen)
        counts = [seen[w] for w in words]
        prev_total = None
        for n in range(k + 1):
            merges, seqs = _merge_rounds_seq(words, counts, n)
            assert all(s and "".join(s) == w for w, s in zip(words, seqs))
            total = sum(len(s) * c for s, c in zip(seqs, counts))
            if prev_total is not None:
                assert total <= prev_total
            prev_total = total
        for rank, lhs, rhs, n_pair in merges:
            assert n_pair > 0 and rank >= 1

    check()
