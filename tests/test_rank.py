import numpy as np
import pyarrow as pa
import pytest


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    yield


def _ds(n, seed=0, blocks=8):
    import ray.data

    rng = np.random.Generator(np.random.PCG64(seed))
    t = pa.table(
        {
            "k": rng.integers(0, n // 3, size=n),
            "o": rng.permutation(n),
            "v": np.arange(n),
        }
    )
    return ray.data.from_arrow(t).repartition(blocks), t


def test_zip_with_index_total_order():
    from web_scraping_script_ray.stages.rank import zip_with_index

    ds, t = _ds(5_000, seed=1)
    out, n = zip_with_index(ds, ["o"], col="rank")
    assert n == 5_000
    df = out.to_pandas().sort_values("rank")
    assert (df["rank"].values == np.arange(5_000)).all()
    assert (df["o"].values == np.sort(t["o"].to_numpy())).all()


def test_zip_with_index_limit_and_base():
    from web_scraping_script_ray.stages.rank import zip_with_index

    ds, t = _ds(5_000, seed=2)
    out, n = zip_with_index(ds, ["o"], col="seq", limit=100, base=7_000)
    assert n == 100
    df = out.to_pandas().sort_values("seq")
    assert len(df) == 100
    assert df["seq"].iloc[0] == 7_000 and df["seq"].iloc[-1] == 7_099
    assert (df["o"].values == np.sort(t["o"].to_numpy())[:100]).all()


def test_dedup_first_wins_matches_pandas():
    from web_scraping_script_ray.stages.rank import dedup_first_wins

    ds, t = _ds(10_000, seed=3)
    out = dedup_first_wins(ds, "k", ["o"]).to_pandas().sort_values("k").reset_index(drop=True)
    exp = (
        t.to_pandas()
        .sort_values(["k", "o"], kind="mergesort")
        .drop_duplicates("k")
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert (out["k"].values == exp["k"].values).all()
    assert (out["v"].values == exp["v"].values).all()


def test_dedup_first_wins_composite_key(ray_session):
    """Composite (id_a, id_b) dedup must not alias distinct pairs the way a
    32-bit packed key would (ids >= 2^32)."""
    import ray.data

    from web_scraping_script_ray.stages.rank import dedup_first_wins

    big = 1 << 33
    t = pa.Table.from_arrays(
        [
            pa.array([1, 1, big, big + 1, 1], pa.int64()),
            pa.array([2, 3, big + 1, big + 2, 2], pa.int64()),
            pa.array([0, 1, 2, 3, 4], pa.int64()),
        ],
        names=["id_a", "id_b", "ordc"],
    )
    out = dedup_first_wins(
        ray.data.from_arrow(t).repartition(3), ["id_a", "id_b"], ["ordc"]
    ).to_pandas()
    pairs = sorted(zip(out.id_a, out.id_b))
    assert pairs == [(1, 2), (1, 3), (big, big + 1), (big + 1, big + 2)]
    # first-wins: the (1,2) survivor is the ordc=0 row
    assert out[(out.id_a == 1) & (out.id_b == 2)].ordc.iloc[0] == 0


def test_asof_join_semantics(ray_session):
    """As-of join: latest right value <= left time per key; unmatched
    rows null; exact-equal times match."""
    import ray.data

    from web_scraping_script_ray.functions.joins import asof_join

    left = pa.table(
        {
            "k": [1, 1, 1, 2, 3],
            "t": [5, 10, 3, 7, 1],
            "tag": ["a", "b", "c", "d", "e"],
        }
    )
    right = pa.table(
        {"k": [1, 1, 2], "rt": [4, 10, 9], "val": [100, 200, 300]}
    )
    out = (
        asof_join(
            ray.data.from_arrow(left).repartition(2),
            ray.data.from_arrow(right).repartition(2),
            by="k", left_on="t", right_on="rt", right_vals=["val"],
        )
        .to_pandas()
        .sort_values("tag")
    )
    # t=5 -> rt=4 (val 100); t=10 -> rt=10 exact match (val 200);
    # t=3 -> no right <= 3; k=2 t=7 < rt=9 -> null; k=3 no rights -> null
    vals = [None if v != v else int(v) for v in out.asof_val.tolist()]
    assert vals == [100, 200, None, None, None]


def test_asof_join_matches_bruteforce_random(ray_session):
    """Randomized (seeded) asof_join vs an O(n²) reference."""
    import ray.data

    from web_scraping_script_ray.functions.joins import asof_join

    rng = np.random.default_rng(42)
    for trial in range(3):
        nl, nr = 120, 60
        lk = rng.integers(0, 12, nl)
        lt = rng.integers(0, 1000, nl)
        rk = rng.integers(0, 12, nr)
        rt_raw = rng.integers(0, 1000, nr)
        # unique (key, time) on the right — as-of ties are ambiguous
        seen = set()
        keep = []
        for i, (k, t) in enumerate(zip(rk, rt_raw)):
            if (k, t) not in seen:
                seen.add((k, t))
                keep.append(i)
        rk, rt_, rv = rk[keep], rt_raw[keep], np.arange(len(keep)) * 10
        left = pa.table({"k": lk, "t": lt, "row": np.arange(nl)})
        right = pa.table({"k": rk, "rt": rt_, "val": rv})
        out = (
            asof_join(
                ray.data.from_arrow(left).repartition(3),
                ray.data.from_arrow(right).repartition(2),
                by="k", left_on="t", right_on="rt", right_vals=["val"],
            )
            .to_pandas()
            .sort_values("row")
        )
        exp = []
        for k, t in zip(lk, lt):
            best = None
            for k2, t2, v in zip(rk, rt_, rv):
                if k2 == k and t2 <= t and (best is None or t2 > best[0]):
                    best = (t2, v)
            exp.append(None if best is None else int(best[1]))
        got = [None if v != v else int(v) for v in out.asof_val.tolist()]
        assert got == exp, f"trial {trial} mismatch"


def test_range_join_semantics(ray_session):
    """Grid range join: containment matches only, bounds per ``closed``,
    intervals spanning many cells match once, empty-match rows drop."""
    import ray.data

    from web_scraping_script_ray.functions.joins import range_join

    left = pa.table({"x": [0.0, 5.0, 9.0, 10.0, 55.0], "row": [0, 1, 2, 3, 4]})
    right = pa.table(
        {
            "lo": [0.0, 5.0, 0.0, 100.0],
            "hi": [10.0, 5.0, 60.0, 110.0],
            "iv": [1, 2, 3, 4],
        }
    )
    out = (
        range_join(
            ray.data.from_arrow(left).repartition(2),
            ray.data.from_arrow(right).repartition(2),
            left_on="x", right_lo="lo", right_hi="hi", right_vals=["iv"],
            cell_width=4.0, closed="both",
        )
        .to_pandas()
    )
    got = sorted(zip(out.row, out.iv))
    # iv=1 [0,10] contains 0,5,9,10; iv=2 [5,5] contains 5; iv=3 [0,60]
    # spans 16 cells yet matches each point exactly once; iv=4 nothing
    assert got == [(0, 1), (0, 3), (1, 1), (1, 2), (1, 3), (2, 1), (2, 3),
                   (3, 1), (3, 3), (4, 3)]

    half = (
        range_join(
            ray.data.from_arrow(left).repartition(2),
            ray.data.from_arrow(right).repartition(2),
            left_on="x", right_lo="lo", right_hi="hi", right_vals=["iv"],
            cell_width=4.0, closed="left",
        )
        .to_pandas()
    )
    got_half = sorted(zip(half.row, half.iv))
    # lo <= x < hi: x=10 leaves iv=1, x=5 leaves iv=2
    assert got_half == [(0, 1), (0, 3), (1, 1), (1, 3), (2, 1), (2, 3),
                        (3, 3), (4, 3)]


def test_range_join_keyed_matches_duckdb(ray_session):
    """Randomized keyed range join vs a DuckDB BETWEEN join."""
    import duckdb
    import ray.data

    from web_scraping_script_ray.functions.joins import range_join

    rng = np.random.default_rng(7)
    nl, nr = 300, 80
    left = pa.table(
        {
            "k": rng.integers(0, 10, nl),
            "x": rng.integers(0, 500, nl).astype("float64"),
            "row": np.arange(nl),
        }
    )
    lo = rng.integers(0, 480, nr).astype("float64")
    right = pa.table(
        {
            "rk": rng.integers(0, 10, nr),
            "lo": lo,
            "hi": lo + rng.integers(0, 90, nr),
            "iv": np.arange(nr),
        }
    )
    out = (
        range_join(
            ray.data.from_arrow(left).repartition(3),
            ray.data.from_arrow(right).repartition(2),
            left_on="x", right_lo="lo", right_hi="hi", right_vals=["iv"],
            by=("k", "rk"), cell_width=32.0, closed="both",
        )
        .to_pandas()
    )
    con = duckdb.connect()
    con.register("l", left.to_pandas())
    con.register("r", right.to_pandas())
    exp = con.sql(
        "SELECT row, iv FROM l JOIN r ON k = rk AND x BETWEEN lo AND hi"
    ).df()
    assert sorted(zip(out.row, out.iv)) == sorted(zip(exp.row, exp.iv))
