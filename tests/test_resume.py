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
