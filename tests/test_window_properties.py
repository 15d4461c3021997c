"""Property checks for the vectorized window/scan plans added in
round-3 session-7 — randomized inputs vs brute-force references, aimed
at the subtle parts the fixed oracles exercise only at two datasets:

- max_rate: the per-user stride-rebasing trick that makes ONE global
  searchsorted valid across user runs (windows must never cross users;
  duplicate timestamps must count on both sides of the frame),
- ks_stat: cross-block prefix carries of the two sample counts,
- id_gaps: cross-block gap detection via last-id carries,
- first_last: the argmin/argmax-merge aggregation across blocks.

Seeded param draws, not hypothesis — each example spins real Ray work.
"""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    yield


def _make_events(tmpdir: str, seed: int, n: int = 800, users: int = 7) -> str:
    """Random events table with DELIBERATE timestamp collisions."""
    rng = np.random.default_rng(seed)
    base = 1_700_000_000_000_000
    # coarse time grid => many exact ties, plus bursts inside 60 s
    us = base + rng.integers(0, 3600, n) * rng.choice([1_000_000, 30_000_000], n)
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.to_datetime(us, unit="us"),
            "user_id": rng.integers(0, users, n).astype(np.int64),
            "event_type": rng.choice(
                ["click", "purchase", "view", "error"], n
            ),
            "value": np.round(rng.uniform(0, 50, n), 2),
            "props": ['{"k": 1}'] * n,
        }
    )
    sf = os.path.join(tmpdir, f"sf_{seed}")
    os.makedirs(sf, exist_ok=True)
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(sf, "events.parquet"))
    df.to_pickle(os.path.join(sf, "events.pkl"))
    return sf


@pytest.mark.parametrize("seed", [11, 222, 3333])
def test_max_rate_matches_bruteforce(seed, tmp_path_factory):
    from web_scraping_script_ray.pipelines.queries import q_max_rate

    sf = _make_events(str(tmp_path_factory.mktemp("mr")), seed)
    df = pd.read_pickle(os.path.join(sf, "events.pkl"))
    got = q_max_rate(sf).to_pandas().set_index("user_id")["max_per_min"]

    us = df["ts"].astype("int64").to_numpy() // 1_000  # ns -> µs
    WIN = 60_000_000
    for uid, g in df.assign(us=us).groupby("user_id"):
        t = np.sort(g["us"].to_numpy())
        brute = max(
            int(((t > t[i] - WIN) & (t <= t[i])).sum()) for i in range(len(t))
        )
        assert got.loc[uid] == brute, (seed, uid)


@pytest.mark.parametrize("seed", [17, 290])
def test_ks_stat_matches_bruteforce(seed, tmp_path_factory):
    from web_scraping_script_ray.pipelines.queries import q_ks_stat

    sf = _make_events(str(tmp_path_factory.mktemp("ks")), seed)
    df = pd.read_pickle(os.path.join(sf, "events.pkl"))
    out = q_ks_stat(sf)
    out = out.to_pandas() if hasattr(out, "to_pandas") else out
    row = out.iloc[0] if hasattr(out, "iloc") else out.to_pandas().iloc[0]

    a = np.sort(np.round(df.loc[df.event_type == "click", "value"] * 100).astype(int))
    b = np.sort(
        np.round(df.loc[df.event_type == "purchase", "value"] * 100).astype(int)
    )
    vals = np.unique(np.concatenate([a, b]))
    c1 = np.searchsorted(a, vals, side="right")
    c2 = np.searchsorted(b, vals, side="right")
    dnum = int(np.abs(c1 * len(b) - c2 * len(a)).max())
    assert int(row["n1"]) == len(a) and int(row["n2"]) == len(b)
    assert int(row["d_micro"]) == dnum * 1_000_000 // (len(a) * len(b))


@pytest.mark.parametrize("seed", [23, 480])
def test_id_gaps_matches_bruteforce(seed, tmp_path_factory):
    from web_scraping_script_ray.pipelines.queries import q_id_gaps

    sf = _make_events(str(tmp_path_factory.mktemp("ig")), seed)
    df = pd.read_pickle(os.path.join(sf, "events.pkl"))
    got = (
        q_id_gaps(sf).to_pandas().sort_values("gap_start").reset_index(drop=True)
    )
    ids = np.sort(df.loc[df.event_type != "error", "event_id"].to_numpy())
    exp = []
    for prev, nxt in zip(ids[:-1], ids[1:]):
        if nxt > prev + 1:
            exp.append((prev + 1, nxt - 1, nxt - prev - 1))
    assert list(map(tuple, got.to_numpy())) == exp, seed


@pytest.mark.parametrize("seed", [31, 570])
def test_first_last_matches_bruteforce(seed, tmp_path_factory):
    from web_scraping_script_ray.pipelines.queries import q_first_last

    sf = _make_events(str(tmp_path_factory.mktemp("fl")), seed)
    df = pd.read_pickle(os.path.join(sf, "events.pkl"))
    got = q_first_last(sf).to_pandas().set_index("user_id").sort_index()

    df = df.assign(
        us=df["ts"].astype("int64") // 1_000,
        cents=np.round(df["value"] * 100).astype(np.int64),
    ).sort_values(["user_id", "us", "event_id"])
    for uid, g in df.groupby("user_id"):
        assert got.loc[uid, "n_events"] == len(g)
        assert got.loc[uid, "first_us"] == g["us"].iloc[0]
        assert got.loc[uid, "first_cents"] == g["cents"].iloc[0]
        assert got.loc[uid, "last_us"] == g["us"].iloc[-1]
        assert got.loc[uid, "last_cents"] == g["cents"].iloc[-1]
