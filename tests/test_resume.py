"""Checkpoint/resume lineage equality (SURVEY.md §5.2 invariant 5): a
crawl killed between or inside rounds resumes from the last complete
manifest and produces byte-identical final tables."""

import json
import os
import shutil

import pytest

from web_scraping_script_ray.synthweb import Budget


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    yield


def _crawled(eng):
    df = eng.crawled_dataset().to_pandas().sort_values("crawl_seq").reset_index(drop=True)
    df["spans"] = df["spans"].map(
        lambda sp: tuple((s["kind"], s["text"], s["media_ref"], s["offset"]) for s in sp)
    )
    return df


def test_resume_after_clean_stop(t1_web, tmp_path_factory):
    from web_scraping_script_ray.pipelines.crawl import run_crawl

    out_full = str(tmp_path_factory.mktemp("full"))
    eng_full, _ = run_crawl(t1_web, out_full, Budget(max_rounds=3))
    ref = _crawled(eng_full)
    eng_full.shutdown()

    # run only 2 rounds ("kill" after round 1 checkpoint), then resume to 3
    out = str(tmp_path_factory.mktemp("resumed"))
    eng_a, info_a = run_crawl(t1_web, out, Budget(max_rounds=2))
    assert info_a["rounds"] == 2
    eng_a.shutdown()
    eng_b, info_b = run_crawl(t1_web, out, Budget(max_rounds=3), resume=True)
    got = _crawled(eng_b)
    seq_b = eng_b.seq
    eng_b.shutdown()

    assert seq_b == len(ref)
    assert got.equals(ref)


def test_resume_discards_partial_round(t1_web, tmp_path_factory):
    from web_scraping_script_ray.pipelines.crawl import run_crawl

    out_full = str(tmp_path_factory.mktemp("full2"))
    eng_full, _ = run_crawl(t1_web, out_full, Budget(max_rounds=3))
    ref = _crawled(eng_full)
    ref_metrics = eng_full.metrics_table()
    eng_full.shutdown()

    out = str(tmp_path_factory.mktemp("killed"))
    eng_a, _ = run_crawl(t1_web, out, Budget(max_rounds=3))
    eng_a.shutdown()
    # simulate a kill mid-round-2: its manifest never landed, and its
    # crawled output is half-written garbage
    shutil.rmtree(os.path.join(out, "state", "round-2"))
    crawled2 = os.path.join(out, "crawled", "round-2")
    shutil.rmtree(crawled2)
    os.makedirs(crawled2)
    with open(os.path.join(crawled2, "garbage.parquet"), "w") as f:
        f.write("not parquet")

    eng_b, _ = run_crawl(t1_web, out, Budget(max_rounds=3), resume=True)
    got = _crawled(eng_b)
    assert got.equals(ref)
    assert eng_b.metrics_table().equals(ref_metrics)
    eng_b.shutdown()


def test_resume_noop_when_complete(t1_web, tmp_path_factory):
    from web_scraping_script_ray.pipelines.crawl import run_crawl

    out = str(tmp_path_factory.mktemp("complete"))
    eng_a, _ = run_crawl(t1_web, out, Budget(max_rounds=2))
    ref = _crawled(eng_a)
    eng_a.shutdown()
    eng_b, info = run_crawl(t1_web, out, Budget(max_rounds=2), resume=True)
    assert _crawled(eng_b).equals(ref)
    # manifest carries the fetch counter forward
    with open(os.path.join(out, "state", "round-1", "manifest.json")) as f:
        assert json.load(f)["seq"] == len(ref)
    eng_b.shutdown()


def test_build_training_set_end_to_end(tmp_path, ray_session):
    """Crawl → filter → SimHash dedup → sharded export in one call;
    stats are coherent, the export round-trips, and resume is a no-op."""
    import os

    import ray.data

    from web_scraping_script_ray.pipelines.crawl import run_crawl
    from web_scraping_script_ray.pipelines.train_data import build_training_set
    from web_scraping_script_ray.synthweb import Budget, WebParams, fixture_dir

    web = fixture_dir(WebParams(n_docs=2000, n_hosts=20, seed=23))
    out = str(tmp_path / "crawl")
    eng, info = run_crawl(web, out, Budget(max_rounds=3))
    eng.shutdown()
    exp = str(tmp_path / "train")
    stats = build_training_set(out, exp, min_quality=0.0, n_shards=4)
    assert stats["input_rows"] == info["fetched"]
    assert stats["kept_rows"] + stats["dropped_filter"] + stats["dropped_neardup"] == (
        stats["input_rows"]
    )
    assert stats["kept_rows"] > 0
    back = ray.data.read_parquet(exp).to_pandas()
    assert len(back) == stats["kept_rows"]
    assert back["simhash"].nunique() == len(back)  # near-identicals removed
    # resume returns identical stats without recomputation
    mt = os.path.getmtime(os.path.join(exp, "_manifest.json"))
    stats2 = build_training_set(out, exp, min_quality=0.0, n_shards=4)
    assert stats2 == stats
    assert os.path.getmtime(os.path.join(exp, "_manifest.json")) == mt
    # a real language filter drops rows and stays coherent
    top_lang = back["lang_pred"].mode()[0]
    exp2 = str(tmp_path / "train_lang")
    s_l = build_training_set(out, exp2, langs=[top_lang], n_shards=4)
    assert 0 < s_l["kept_rows"] <= stats["kept_rows"]
    assert (
        s_l["kept_rows"] + s_l["dropped_filter"] + s_l["dropped_neardup"]
        == s_l["input_rows"]
    )
    # empty selection still produces a valid (zero-row) export
    exp3 = str(tmp_path / "train_none")
    s_n = build_training_set(out, exp3, langs=["zz-no-such-lang"], n_shards=4)
    assert s_n["kept_rows"] == 0 and s_n["manifest"]["rows"] == 0


def test_build_training_set_param_mismatch_raises(tmp_path, ray_session):
    import pytest

    from web_scraping_script_ray.pipelines.crawl import run_crawl
    from web_scraping_script_ray.pipelines.train_data import build_training_set
    from web_scraping_script_ray.synthweb import Budget, WebParams, fixture_dir

    web = fixture_dir(WebParams(n_docs=2000, n_hosts=20, seed=23))
    out = str(tmp_path / "crawl")
    eng, _ = run_crawl(web, out, Budget(max_rounds=2))
    eng.shutdown()
    exp = str(tmp_path / "train")
    build_training_set(out, exp, min_quality=0.0, n_shards=4)
    with pytest.raises(ValueError, match="resume=False"):
        build_training_set(out, exp, min_quality=0.5, n_shards=4)
    s = build_training_set(out, exp, min_quality=0.5, n_shards=4, resume=False)
    assert s["params"]["min_quality"] == 0.5


def test_pack_training_set(tmp_path, ray_session):
    """Export → pack map: segments tile the token stream exactly
    (every pack full but the last), totals match the export, resume is
    a no-op, capacity mismatch raises."""
    import os

    import pytest
    import ray.data

    from web_scraping_script_ray.pipelines.crawl import run_crawl
    from web_scraping_script_ray.pipelines.train_data import (
        build_training_set,
        pack_training_set,
    )
    from web_scraping_script_ray.synthweb import Budget, WebParams, fixture_dir

    web = fixture_dir(WebParams(n_docs=2000, n_hosts=20, seed=23))
    out = str(tmp_path / "crawl")
    eng, _ = run_crawl(web, out, Budget(max_rounds=2))
    eng.shutdown()
    exp = str(tmp_path / "train")
    stats = build_training_set(out, exp, n_shards=4)

    cap = 512
    ps = pack_training_set(exp, capacity=cap)
    assert ps["n_docs"] == stats["kept_rows"]
    segs = ray.data.read_parquet(os.path.join(exp, "packs", "data")).to_pandas()
    assert len(segs) == ps["n_segments"]
    assert segs["seg_tokens"].sum() == ps["total_tokens"]
    per_pack = segs.groupby("pack_id")["seg_tokens"].sum().sort_index()
    assert (per_pack.iloc[:-1] == cap).all()
    assert 0 < per_pack.iloc[-1] <= cap
    assert len(per_pack) == ps["n_packs"]
    # resume: manifest untouched, identical stats
    mt = os.path.getmtime(os.path.join(exp, "packs", "_manifest.json"))
    assert pack_training_set(exp, capacity=cap) == ps
    assert os.path.getmtime(os.path.join(exp, "packs", "_manifest.json")) == mt
    with pytest.raises(ValueError):
        pack_training_set(exp, capacity=cap * 2)
