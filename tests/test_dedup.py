"""Dedup-family tests: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding cosine — planted-duplicate fixtures with known answers."""

import numpy as np
import pyarrow as pa
import pytest

from web_scraping_script_ray.functions.dedup import (
    MinHasher,
    embedding_neardup_pairs,
    exact_dedup,
    keep_mask_from_pairs,
    minhash_lsh_pairs,
    ngram_jaccard,
    sig_jaccard_estimate,
    simhash64,
    simhash_pairs,
)

BASE = [
    "the quick brown fox jumps over the lazy dog again and again today",
    "pack my box with five dozen liquor jugs before noon tomorrow morning",
    "how vexingly quick daft zebras jump when startled by loud noises",
    "sphinx of black quartz judge my vow said the curious old linguist",
]


def docs_table(rows):
    ids, texts = zip(*rows)
    return pa.Table.from_arrays(
        [pa.array(ids, pa.int64()), pa.array(texts, pa.string())],
        names=["doc_id", "text"],
    )


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    yield


def _planted_rows():
    # 20 docs, distinct-by-suffix; exact copies of docs 0..2 at 100..102
    rows = [(i, f"{t} unique suffix {i}") for i, t in enumerate(BASE * 5)]
    for i in range(3):
        rows.append((100 + i, rows[i][1]))
    return rows


def test_ngram_jaccard_exact_values():
    assert ngram_jaccard("a b c d", "a b c d") == 1.0
    assert ngram_jaccard("a b c", "x y z") == 0.0
    j = ngram_jaccard(BASE[0], BASE[0].replace("lazy", "sleepy"))
    assert 0.4 < j < 0.9


def test_minhash_signature_estimates_jaccard():
    mh = MinHasher()
    a = BASE[0]
    b = BASE[0].replace("lazy", "sleepy")
    est = sig_jaccard_estimate(mh.signature(a), mh.signature(b))
    true = ngram_jaccard(a, b)
    assert abs(est - true) < 0.2
    assert sig_jaccard_estimate(mh.signature(a), mh.signature(a)) == 1.0


def test_minhash_lsh_finds_planted_dups():
    import ray.data

    ds = ray.data.from_arrow(docs_table(_planted_rows())).repartition(4)
    pairs = minhash_lsh_pairs(ds, threshold=0.95).to_pandas()
    found = {(r.id_a, r.id_b) for r in pairs.itertuples()}
    for i in range(3):
        assert (i, 100 + i) in found  # every planted exact copy detected
    # all surviving pairs estimate ≥ threshold
    assert (pairs.est_jaccard >= 0.95).all()


def test_simhash_identical_and_near():
    a = simhash64(BASE[0])
    assert a == simhash64(BASE[0])
    b = simhash64(BASE[0].replace("lazy", "sleepy"))
    ham = bin(a ^ b).count("1")
    assert ham < 20  # similar docs → close hashes
    c = simhash64(BASE[1])
    assert bin(a ^ c).count("1") > ham


def test_simhash_pairs_finds_exact_dups():
    import ray.data

    rows = [(i, t + f" unique{i}") for i, t in enumerate(BASE * 3)]
    rows.append((500, rows[0][1]))  # exact dup of id 0
    ds = ray.data.from_arrow(docs_table(rows)).repartition(3)
    pairs = simhash_pairs(ds, max_dist=3).to_pandas()
    assert ((pairs.id_a == 0) & (pairs.id_b == 500)).any()


def test_exact_dedup_first_wins():
    import ray.data

    rows = [(3, "dup"), (1, "dup"), (2, "other"), (7, "dup")]
    ds = ray.data.from_arrow(docs_table(rows))
    out = exact_dedup(ds, "text", ["doc_id"]).to_pandas()
    assert sorted(out.doc_id.tolist()) == [1, 2]  # min doc_id kept per text


def test_keep_mask_union_find():
    pairs = pa.Table.from_arrays(
        [pa.array([1, 2, 5], pa.int64()), pa.array([2, 3, 6], pa.int64())],
        names=["id_a", "id_b"],
    )
    out = keep_mask_from_pairs(pairs, np.array([1, 2, 3, 4, 5, 6]))
    keep = dict(zip(out.column("id").to_pylist(), out.column("keep").to_pylist()))
    canon = dict(zip(out.column("id").to_pylist(), out.column("canonical_id").to_pylist()))
    assert keep == {1: True, 2: False, 3: False, 4: True, 5: True, 6: False}
    assert canon[3] == 1 and canon[6] == 5


def test_embedding_neardup_exact_and_lsh():
    import ray.data

    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((40, 16)).astype(np.float32)
    vecs[7] = vecs[3] + 0.01 * rng.standard_normal(16).astype(np.float32)  # planted
    t = pa.Table.from_arrays(
        [
            pa.array(range(40), pa.int64()),
            pa.array([v.tolist() for v in vecs], pa.list_(pa.float32())),
        ],
        names=["vec_id", "embedding"],
    )
    ds = ray.data.from_arrow(t).repartition(4)
    exact = embedding_neardup_pairs(ds, threshold=0.98).to_pandas()
    assert ((exact.id_a == 3) & (exact.id_b == 7)).any()
    # LSH path finds the planted pair too (high-sim pairs collide w.h.p.)
    lsh = embedding_neardup_pairs(ds, threshold=0.98, n_planes=4).to_pandas()
    assert ((lsh.id_a == 3) & (lsh.id_b == 7)).any()
    # LSH candidates are a subset of exact pairs
    e = {(r.id_a, r.id_b) for r in exact.itertuples()}
    l = {(r.id_a, r.id_b) for r in lsh.itertuples()}
    assert l <= e


def test_embedding_neardup_auto_lsh_switch_and_recall():
    """Above auto_lsh_rows the exact path must NOT be used (no full-table
    broadcast); the LSH path's recall vs exact is bounded below."""
    import ray.data

    rng = np.random.default_rng(11)
    base = rng.standard_normal((30, 16)).astype(np.float32)
    vecs = [base[i % 30] + 0.02 * rng.standard_normal(16).astype(np.float32) for i in range(120)]
    t = pa.Table.from_arrays(
        [
            pa.array(range(120), pa.int64()),
            pa.array([v.tolist() for v in vecs], pa.list_(pa.float32())),
        ],
        names=["vec_id", "embedding"],
    )
    ds = ray.data.from_arrow(t).repartition(4)
    exact = embedding_neardup_pairs(ds, threshold=0.98).to_pandas()
    # force the auto-switch with a tiny threshold: implies the LSH plan
    auto = embedding_neardup_pairs(
        ds, threshold=0.98, auto_lsh_rows=50, auto_planes=6
    ).to_pandas()
    e = {(r.id_a, r.id_b) for r in exact.itertuples()}
    a = {(r.id_a, r.id_b) for r in auto.itertuples()}
    assert a <= e                       # LSH candidates ⊆ exact pairs
    assert len(e) > 20
    assert len(a) / len(e) >= 0.5       # stated recall bound at 6 planes


def test_exact_substring_planted_spans():
    """Two docs share a planted 12-token run (>= k=8): both get ONE
    merged span covering exactly the shared run; a third unrelated doc
    gets nothing.  Within-doc repeats count toward the >=2 threshold."""
    import ray

    from web_scraping_script_ray.functions.dedup import exact_substring_spans

    shared = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima"
    rows = [
        (1, f"intro one two {shared} outro"),
        (2, f"{shared} trailing words here now"),
        (3, "totally different words with no overlap at all whatsoever done"),
    ]
    ds = ray.data.from_arrow(docs_table(rows)).repartition(2)
    out = (
        exact_substring_spans(ds, k=8)
        .to_pandas()
        .sort_values(["doc_id", "span_start"])
        .reset_index(drop=True)
    )
    assert out["doc_id"].tolist() == [1, 2]
    # doc 1: shared run starts after 3 intro tokens, spans 12 tokens
    assert out.loc[0, ["span_start", "span_end", "span_toks"]].tolist() == [3, 15, 12]
    # doc 2: run starts at 0
    assert out.loc[1, ["span_start", "span_end", "span_toks"]].tolist() == [0, 12, 12]


def test_exact_substring_plans_agree():
    """Forced broadcast == forced shuffle on the sf0.001 corpus."""
    from web_scraping_script_ray.pipelines.queries import q_exact_substring

    sf = "/root/testdata/sf0.001"
    frames = {}
    for plan in ("broadcast", "shuffle"):
        frames[plan] = (
            q_exact_substring(sf, force_plan=plan)
            .to_pandas()
            .sort_values(["doc_id", "span_start"])
            .reset_index(drop=True)
        )
    assert len(frames["broadcast"]) > 0
    assert frames["broadcast"].equals(frames["shuffle"])

def test_minhash_verify_plans_agree():
    """Forced driver verify == forced distributed (co-partitioned) verify
    on the sf0.001 corpus — pins the _minhash_pairs_impl size switch."""
    from web_scraping_script_ray.pipelines.queries import _minhash_pairs_impl

    sf = "/root/testdata/sf0.001"
    frames = {}
    for plan in ("driver", "distributed"):
        frames[plan] = (
            _minhash_pairs_impl(sf, force_path=plan)
            .to_pandas()
            .sort_values(["id_a", "id_b"])
            .reset_index(drop=True)
        )
    assert len(frames["driver"]) > 0
    assert frames["driver"].equals(frames["distributed"])


def test_lsh_verify_pairs_planted():
    """lsh_verify_pairs verifies a hand-planted candidate list exactly:
    the true near-dup pair survives, the decoy pair is rejected, and a
    pair of contentless docs is dropped (empty union)."""
    import ray

    from web_scraping_script_ray.functions.dedup import lsh_verify_pairs, ngram_jaccard

    rows = [
        (0, BASE[0]),
        (1, BASE[0] + " extra"),
        (2, BASE[1]),
        (3, ""),
        (4, ""),
    ]
    docs = ray.data.from_arrow(docs_table(rows))
    cand = ray.data.from_arrow(
        pa.table(
            {
                "id_a": pa.array([0, 0, 3], pa.int64()),
                "id_b": pa.array([1, 2, 4], pa.int64()),
            }
        )
    )
    out = (
        lsh_verify_pairs(docs, cand, threshold=0.7, n_parts=8)
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    assert out[["id_a", "id_b"]].values.tolist() == [[0, 1]]
    expect = np.floor(ngram_jaccard(rows[0][1], rows[1][1]) * 1e6) / 1e6
    assert out.loc[0, "jaccard"] == expect


def test_minhash_perperm_matches_perdoc_reference():
    """Hypothesis: the per-permutation reduceat signature kernel is
    bit-identical to the straightforward per-doc (a·s+b).min() reference
    over random shingle multisets, including empty docs."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from web_scraping_script_ray.functions.dedup import MinHasher

    mh = MinHasher(num_perm=32, n_bands=8)

    @settings(max_examples=30, deadline=None)
    @given(
        st.lists(
            st.lists(
                st.integers(min_value=0, max_value=2**64 - 1), max_size=20
            ),
            min_size=1,
            max_size=12,
        )
    )
    def check(doc_shingles):
        import numpy as np

        # feed pre-shingled hashes through the kernel by flattening the
        # doc lists into (flat, offsets) with k=1 (identity shingling)
        flat = np.array(
            [h for d in doc_shingles for h in d], dtype=np.uint64
        )
        offsets = np.zeros(len(doc_shingles) + 1, np.int64)
        np.cumsum([len(d) for d in doc_shingles], out=offsets[1:])
        mh1 = MinHasher(num_perm=32, n_bands=8, k=1)
        got = mh1.signatures_from_hashes(flat, offsets)
        # reference: per-doc matrix min over the SAME shingle transform
        from web_scraping_script_ray.functions.hashing import (
            shingle_hash_flat,
        )

        sh, soff = shingle_hash_flat(flat, offsets, 1)
        with np.errstate(over="ignore"):
            want = np.zeros((len(doc_shingles), 32), np.uint64)
            for i in range(len(doc_shingles)):
                seg = sh[soff[i] : soff[i + 1]]
                if len(seg):
                    want[i] = (
                        mh1.a[:, None] * seg[None, :] + mh1.b[:, None]
                    ).min(axis=1)
        assert np.array_equal(got, want)

    check()


def test_cdc_dedup_non_ascii_byte_chunks():
    """CDC boundaries are BYTE offsets — chunk identity and rebuild must
    slice the utf-8 bytes, not the str (char slicing misaligns the two
    for non-ASCII text).  Oracle: an independent byte-rule
    implementation in this test — chunk every doc's bytes at
    _cdc_bounds, count chunk contents corpus-wide, keep <2-occurrence
    chunks, concatenate and surrogateescape-decode."""
    import ray

    from web_scraping_script_ray.functions.dedup import _cdc_bounds, cdc_dedup_text

    rng = np.random.default_rng(11)
    boiler = "héllo wörld — çafé naïve über straße " * 30
    alphabet = list("αβγδεζ abcdefμσж")
    uniq = ["".join(rng.choice(alphabet) for _ in range(700)) for _ in range(3)]
    rows = [(0, uniq[0] + boiler), (1, boiler + uniq[1]), (2, uniq[2])]
    mask = 16

    # independent local oracle over bytes
    from collections import Counter

    chunks_of = {}
    counts = Counter()
    for i, t in rows:
        tb = t.encode("utf-8")
        b = _cdc_bounds(t, mask)
        ch = [tb[a:e] for a, e in zip(b[:-1].tolist(), b[1:].tolist())]
        chunks_of[i] = ch
        counts.update(ch)
    expect = {
        i: b"".join(c for c in ch if counts[c] < 2).decode("utf-8", "surrogateescape")
        for i, ch in chunks_of.items()
    }
    assert expect[0] != rows[0][1]  # the shared boilerplate really deduped
    # (no full-round-trip claim for doc 2: tiny content-defined chunks
    # from a small alphabet CAN repeat within one doc and get dropped —
    # the oracle equality below is the contract)
    assert len(expect[0]) < len(rows[0][1])  # shared boiler mass removed
    assert any(c in expect[2] for c in "αβγδεζ")  # non-ASCII survives rebuild

    out = (
        cdc_dedup_text(
            ray.data.from_arrow(docs_table(rows)), "doc_id", "text", mask=mask
        )
        .to_pandas()
        .set_index("doc_id")["text"]
        .to_dict()
    )
    assert out == expect


def test_incremental_neardup_verify_plans_agree():
    """Forced driver verify == forced distributed verify for the
    incremental probe's candidate set (pins the _exact_verify_pairs
    composition the same way test_minhash_verify_plans_agree pins the
    full-corpus path)."""
    from web_scraping_script_ray.pipelines.queries import q_incremental_neardup

    sf = "/root/testdata/sf0.001"
    frames = {}
    for plan in ("driver", "distributed"):
        frames[plan] = (
            q_incremental_neardup(sf, force_path=plan)
            .to_pandas()
            .sort_values(["id_a", "id_b"])
            .reset_index(drop=True)
        )
    assert len(frames["driver"]) > 0
    assert frames["driver"].equals(frames["distributed"])
