"""tools/e2e_train.py — the composed crawl→training-set CLI — runs in a
fresh process (it owns its Ray session), produces its three stage lines,
and resumes both halves idempotently from their manifests."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(out_dir: str, resume: bool) -> dict:
    cmd = [
        sys.executable,
        os.path.join(REPO, "tools", "e2e_train.py"),
        "--synth-docs", "800",
        "--synth-hosts", "40",
        "--synth-seed", "202",
        "--synth-buckets", "8",
        "--out", out_dir,
        "--max-rounds", "2",
        "--max-urls", "600",
        "--min-quality", "0.0",
        "--shards", "4",
    ] + (["--resume"] if resume else [])
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    stages = {}
    for line in proc.stdout.splitlines():
        if line.startswith("{"):
            rec = json.loads(line)
            stages[rec["stage"]] = rec
    return stages


def test_e2e_train_runs_and_resumes(tmp_path):
    out = str(tmp_path / "e2e")
    first = _run(out, resume=False)
    fetched = first["crawl"]["fetched"]
    assert 0 < fetched <= 600  # within budget
    assert first["train"]["input_rows"] > 0
    assert first["train"]["kept_rows"] <= first["train"]["input_rows"]
    assert first["train"]["shards_written"] >= 1
    # shard dirs on disk match the manifest
    train_dir = os.path.join(out, "train")
    shard_dirs = [d for d in os.listdir(train_dir) if d.startswith("shard=")]
    assert len(shard_dirs) == first["train"]["shards_written"]

    second = _run(out, resume=True)
    # crawl resume: same rounds already complete — same cumulative count
    assert second["crawl"]["fetched"] == fetched
    # train resume: manifest-gated, stats identical
    for k in ("input_rows", "kept_rows", "dropped_filter", "dropped_neardup"):
        assert second["train"][k] == first["train"][k], k
