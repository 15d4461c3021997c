"""End-to-end training-data pipeline: crawl output → training shards.

The composed product surface a training team actually runs — everything
downstream of the crawl in one call:

    crawl (pipelines/crawl.py, per-doc parse fused into fetch)
      → quality / language filter            (columns already computed)
      → near-identical dedup on SimHash      (first-wins by crawl_seq)
      → deterministic hash-sharded export    (postprocess.export_shards)

Every stage is a streaming Dataset op over the parsed parquet the crawl
already wrote (no text re-tokenization: the fused parse computed token
counts, quality, language and both near-dup signatures in one pass).
Dedup here is the cheap exact-signature tier — identical 64-bit SimHash
⇒ near-identical document; the banded MinHash/SimHash pair pipelines in
``functions/dedup.py`` are the escalation tier when pair-level near-dup
removal is wanted.

At 100 TB: the parsed table is partitioned by round and bucket, the
filter is a column-pruned scan, the dedup is one range-partition
sort-dedup on (simhash, crawl_seq), the export is one partitioned write
— no stage materializes the corpus.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..stages.rank import dedup_first_wins
from .postprocess import export_shards


def build_training_set(
    crawl_out_dir: str,
    export_dir: str,
    min_quality: float = 0.0,
    langs: list[str] | None = None,
    n_shards: int = 16,
    resume: bool = True,
    shuffle_seed: int | None = None,
) -> dict:
    """Filter + dedup + shard the parsed output of a finished crawl.

    Returns a stats dict: input/kept row counts, rows dropped by the
    quality/language filter, near-identical rows removed by SimHash
    dedup, and the export manifest.  ``resume=True`` returns the
    existing export's stats without recomputation (manifest-gated, the
    crawl checkpoint discipline).  ``shuffle_seed`` makes the export
    byte-order-deterministic with a within-shard seeded shuffle (see
    ``postprocess.export_shards``).
    """
    parsed_root = os.path.join(crawl_out_dir, "parsed")
    if not os.path.isdir(parsed_root):
        raise FileNotFoundError(
            f"{parsed_root} missing — run the crawl with parse=True first"
        )
    params = {
        "min_quality": min_quality,
        "langs": sorted(langs) if langs is not None else None,
        "n_shards": n_shards,
        "shuffle_seed": shuffle_seed,
    }
    man_probe = os.path.join(export_dir, "_manifest.json")
    if resume and os.path.exists(man_probe):
        import json

        with open(man_probe) as f:
            man = json.load(f)
        stats = man.get("train_stats")
        if stats is not None:
            # pre-shuffle manifests lack the key; None means "no shuffle"
            prior_params = dict(stats.get("params") or {})
            prior_params.setdefault("shuffle_seed", None)
            if prior_params != params:
                raise ValueError(
                    f"training set at {export_dir} was built with "
                    f"{stats.get('params')}; requested {params} — pass "
                    f"resume=False to rebuild"
                )
            return stats

    ds = ray.data.read_parquet(parsed_root)
    n_input = ds.count()  # metadata-served, no scan

    def _mask(batch: pa.Table):
        mask = pc.greater_equal(batch.column("quality"), min_quality)
        if langs is not None:
            mask = pc.and_(
                mask, pc.is_in(batch.column("lang_pred"), value_set=pa.array(langs))
            )
        return mask

    def keep(batch: pa.Table) -> pa.Table:
        return batch.filter(_mask(batch))

    # survivor count from a COLUMN-PRUNED side pass (only the two filter
    # columns leave storage — a filtered.count() would re-scan the whole
    # corpus; the data pipeline below still executes exactly once)
    n_filtered = sum(
        r["__k"]
        for r in ray.data.read_parquet(
            parsed_root, columns=["quality", "lang_pred"]
        )
        .map_batches(
            lambda b: pa.table(
                {"__k": pa.array([pc.sum(_mask(b)).as_py() or 0], pa.int64())}
            ),
            batch_format="pyarrow",
        )
        .take_all()  # O(blocks) single-int rows
    )

    filtered = ds.map_batches(keep, batch_format="pyarrow")
    deduped = dedup_first_wins(filtered, "simhash", ["crawl_seq"])
    manifest = export_shards(
        deduped,
        export_dir,
        n_shards=n_shards,
        key_col="crawl_seq",
        resume=False,
        shuffle_seed=shuffle_seed,
    )
    stats = {
        "params": params,
        "input_rows": n_input,
        "dropped_filter": n_input - n_filtered,
        "dropped_neardup": n_filtered - manifest["rows"],
        "kept_rows": manifest["rows"],
        "manifest": dict(manifest),
    }
    # stamp the stats into the export manifest so resume can return them
    import json

    stamped = dict(manifest)
    stamped["train_stats"] = stats
    tmp = man_probe + ".tmp"
    with open(tmp, "w") as f:
        json.dump(stamped, f)
    os.replace(tmp, man_probe)
    return stats


def pack_training_set(
    export_dir: str,
    capacity: int,
    resume: bool = True,
) -> dict:
    """Pack an exported training set's token stream into capacity-C
    context windows (GPT-style sequence packing with document
    splitting) — the step between "shards on disk" and "batches in the
    trainer".

    Reads ONLY (``crawl_seq``, ``n_ws_tokens``) from the finished
    export (column-pruned; the fused parse already counted tokens — no
    re-tokenization), lays documents out in ``crawl_seq`` order and
    emits one row per (doc, pack) segment via the distributed
    prefix-sum plan (``functions/mix.py:pack_segments`` — O(n_parts)
    driver state).  Output is ``<export_dir>/packs/`` parquet plus a
    manifest written LAST (atomic rename, same resume discipline as the
    export itself: ``resume=True`` returns a finished pack map without
    recomputation; a capacity mismatch raises).
    """
    import glob
    import json
    import shutil

    from ..functions.mix import pack_segments

    if not os.path.exists(os.path.join(export_dir, "_manifest.json")):
        raise FileNotFoundError(
            f"{export_dir} has no export manifest — run build_training_set first"
        )
    packs_dir = os.path.join(export_dir, "packs")
    pman_path = os.path.join(packs_dir, "_manifest.json")
    if os.path.exists(pman_path):
        if resume:
            with open(pman_path) as f:
                prior = json.load(f)
            if prior.get("capacity") != capacity:
                raise ValueError(
                    f"pack map at {packs_dir} was built with capacity="
                    f"{prior.get('capacity')}; requested {capacity} — pass "
                    "resume=False to rebuild"
                )
            return prior
        shutil.rmtree(packs_dir)
    elif os.path.exists(packs_dir):
        shutil.rmtree(packs_dir)  # aborted attempt: no manifest ⇒ rebuild

    shard_files = sorted(glob.glob(os.path.join(export_dir, "shard=*/*.parquet")))
    ds = ray.data.read_parquet(shard_files, columns=["crawl_seq", "n_ws_tokens"])
    # one column-pruned aggregate pass: id range + total tokens
    import pyarrow.parquet as pq

    hi = 0
    total_tokens = 0
    n_docs = 0
    for r in (
        ds.map_batches(
            lambda b: pa.table(
                {
                    "__m": pa.array(
                        [pc.max(b.column("crawl_seq")).as_py() or 0], pa.int64()
                    ),
                    "__t": pa.array(
                        [pc.sum(b.column("n_ws_tokens")).as_py() or 0], pa.int64()
                    ),
                    "__n": pa.array([b.num_rows], pa.int64()),
                }
            ),
            batch_format="pyarrow",
        ).take_all()  # O(blocks) 3-int rows
    ):
        hi = max(hi, int(r["__m"]))
        total_tokens += int(r["__t"])
        n_docs += int(r["__n"])

    segs = pack_segments(
        ds, "crawl_seq", "n_ws_tokens", capacity, id_range=(0, hi + 1)
    )
    data_dir = os.path.join(packs_dir, "data")
    segs.write_parquet(data_dir)
    stats = {
        "capacity": capacity,
        "n_docs": n_docs,
        "total_tokens": total_tokens,
        "n_packs": (total_tokens + capacity - 1) // capacity,
        "n_segments": sum(
            pq.read_metadata(f).num_rows
            for f in glob.glob(os.path.join(data_dir, "*.parquet"))
        ),
    }
    os.makedirs(packs_dir, exist_ok=True)
    tmp = pman_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(stats, f)
    os.replace(tmp, pman_path)
    return stats
