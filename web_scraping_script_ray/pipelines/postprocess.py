"""Declarative post-processing ops compiled to Ray Data operations.

The reference's pipeline YAML carries a ``post_processing`` op list —
filter / sort / deduplicate over the collected results via pandas
(reference: src/main.py:166-206, configured in src/pipeline.yaml:40-58) —
plus an export step (reference: src/main.py:208-222).  Here the same
declarative spec compiles onto a streaming ``Dataset``:

- ``filter`` (A1): ``equals`` / ``contains`` / ``greater_than`` /
  ``less_than`` on a column; a missing column is a warn+no-op, exactly
  like the reference (src/main.py:173-175);
- ``sort`` (A2): global sort shuffle, ``ascending`` flag;
- ``deduplicate`` (A3): first-wins on the subset columns *in current
  order* — the engine carries an explicit order column (``crawl_seq`` /
  row id) because block order is not a contract under parallelism;
- ``limit``: ``Dataset.limit``;
- export (K5): parquet / csv / json writers.
"""

from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..stages.rank import dedup_first_wins

logger = logging.getLogger(__name__)

_FILTER_OPS = ("equals", "contains", "greater_than", "less_than")


def _apply_filter(ds: "ray.data.Dataset", column: str, op: str, value) -> "ray.data.Dataset":
    if op not in _FILTER_OPS:
        logger.warning("unknown filter op %r — skipping (reference no-op behavior)", op)
        return ds

    def fn(batch: pa.Table) -> pa.Table:
        if column not in batch.column_names:
            # reference: warn + no-op on missing column (src/main.py:173-175)
            return batch
        col = batch.column(column)
        if op == "equals":
            mask = pc.equal(col, value)
        elif op == "contains":
            # reference: str.contains with na=False (src/main.py:178-179)
            mask = pc.match_substring(col.cast(pa.string()), str(value))
        elif op == "greater_than":
            mask = pc.greater(col, value)
        else:
            mask = pc.less(col, value)
        mask = pc.fill_null(mask, False)
        return batch.filter(mask)

    return ds.map_batches(fn, batch_format="pyarrow")


def apply_ops(
    ds: "ray.data.Dataset",
    ops: list[dict],
    order_col: str | None = None,
) -> "ray.data.Dataset":
    """Compile a reference-style post_processing op list onto a Dataset.

    ``order_col`` names the column defining "current order" for
    deduplicate's first-wins semantics (e.g. ``crawl_seq``); required when
    a deduplicate op is present.
    """
    for op in ops:
        typ = op.get("type")
        if typ == "filter":
            # the reference spells the op key 'condition' (src/main.py:174);
            # accept both spellings so reference-format YAML works verbatim
            cond = op.get("condition", op.get("operation", "equals"))
            ds = _apply_filter(ds, op["column"], cond, op.get("value"))
        elif typ == "sort":
            # reference warns and skips a missing sort column
            # (src/main.py:188-195); ds.sort would raise instead
            schema = ds.schema()
            if schema is not None and op["column"] not in schema.names:
                logger.warning("sort column %r missing — skipping (reference no-op)", op["column"])
                continue
            ds = ds.sort(op["column"], descending=not op.get("ascending", True))
        elif typ == "deduplicate":
            cols = op.get("columns") or op.get("subset") or []
            if not cols:
                logger.warning("deduplicate without columns — skipping")
                continue
            if order_col is None:
                raise ValueError("deduplicate needs order_col for first-wins semantics")
            if len(cols) == 1:
                key = cols[0]
            else:
                # composite key → single hashable key column
                def add_key(batch: pa.Table, cols=tuple(cols)) -> pa.Table:
                    key_vals = [
                        "\x1f".join(str(v) for v in row)
                        for row in zip(*(batch.column(c).to_pylist() for c in cols))
                    ]
                    return batch.append_column("__dedup_key", pa.array(key_vals, pa.string()))

                ds = ds.map_batches(add_key, batch_format="pyarrow")
                key = "__dedup_key"
            ds = dedup_first_wins(ds, key, [order_col])
            if key == "__dedup_key":
                ds = ds.drop_columns(["__dedup_key"])
        elif typ == "limit":
            ds = ds.limit(int(op["n"]))
        # --- engine-native extensions beyond the reference's op list -------
        elif typ == "sample":
            # deterministic hash gate: content-stable, shard-order-independent
            # (the reproducible form of Dataset.random_sample)
            column = op["column"]
            permille = int(round(float(op["fraction"]) * 1000))
            seed = int(op.get("seed", 0))

            def keep(batch: pa.Table, col=column, pm=permille, sd=seed) -> pa.Table:
                from ..functions.hashing import mix64

                ids = (
                    batch.column(col).to_numpy(zero_copy_only=False).astype(np.int64)
                )
                hv = mix64(ids.astype(np.uint64) ^ mix64(np.uint64([sd]))[0])
                return batch.filter(pa.array(hv % np.uint64(1000) < pm))

            ds = ds.map_batches(keep, batch_format="pyarrow")
        elif typ == "content_dedup":
            # exact first-wins content dedup (md5 of the column)
            from ..functions.dedup import exact_dedup

            if order_col is None:
                raise ValueError("content_dedup needs order_col for first-wins")
            ds = exact_dedup(ds, op.get("column", "text"), [order_col])
        elif typ == "cdc_dedup":
            # shift-resilient boilerplate removal: drop CDC chunks whose
            # content appears >= 2 times corpus-wide (content-defined
            # analog of C4-style line dedup; see functions/dedup.py)
            from ..functions.dedup import cdc_dedup_text

            idc = op.get("id_col")
            if idc is None:
                raise ValueError("cdc_dedup needs id_col (integer row identity)")
            ds = cdc_dedup_text(
                ds, idc, op.get("column", "text"), mask=int(op.get("mask", 64))
            )
        elif typ == "quantile_band":
            # data-derived [lo, hi] quantile trim on an int column — the
            # histogram partials execute HERE (tiny: O(distinct values));
            # the returned pipeline stays lazy
            column = op["column"]
            qlo, qhi = float(op.get("lo", 0.05)), float(op.get("hi", 0.95))

            def hist(batch: pa.Table, col=column) -> pa.Table:
                out = batch.select([col]).group_by([col]).aggregate(
                    [([], "count_all")]
                )
                return out.rename_columns([col, "__n"])

            parts = ds.map_batches(hist, batch_format="pyarrow").take_all()
            if parts:
                v = np.array([r[column] for r in parts], dtype=np.int64)
                w = np.array([r["__n"] for r in parts], dtype=np.int64)
                order = np.argsort(v)
                v, w = v[order], w[order]
                first = np.ones(len(v), dtype=bool)
                first[1:] = v[1:] != v[:-1]
                vu = v[first]
                cum = np.cumsum(np.add.reduceat(w, np.flatnonzero(first)))
                n = int(cum[-1])
                lo = int(vu[np.searchsorted(cum, int(qlo * (n - 1)) + 1)])
                hi = int(vu[np.searchsorted(cum, int(qhi * (n - 1)) + 1)])

                def band(batch: pa.Table, col=column, lo=lo, hi=hi) -> pa.Table:
                    x = batch.column(col)
                    return batch.filter(
                        pc.and_(
                            pc.greater_equal(x, pa.scalar(lo, pa.int64())),
                            pc.less_equal(x, pa.scalar(hi, pa.int64())),
                        )
                    )

                ds = ds.map_batches(band, batch_format="pyarrow")
        elif typ == "quality_filter":
            # Gopher-style quality gate computed on the fly (the training
            # exporter filters on precomputed columns; this is the YAML
            # surface for raw tables)
            from ..functions.text import quality_scores

            column = op.get("column", "text")
            min_q = float(op.get("min", 0.0))

            def qkeep(batch: pa.Table, col=column, mq=min_q) -> pa.Table:
                before = set(batch.schema.names)
                scored = quality_scores(batch, text_col=col)
                keep_mask = pc.greater_equal(
                    scored.column("quality"), pa.scalar(mq)
                )
                out = scored.filter(keep_mask)
                return out.select([n for n in out.schema.names if n in before])

            ds = ds.map_batches(qkeep, batch_format="pyarrow")
        elif typ == "lang_filter":
            # language gate: LangId actor pool (profiles built once per
            # actor), keep rows whose predicted language is allowed
            from ..functions.text import LangId

            column = op.get("column", "text")
            langs = list(op.get("langs") or [])
            if not langs:
                logger.warning("lang_filter without langs — skipping")
                continue

            class _LangGate(LangId):
                def __init__(self, col=column, allowed=tuple(langs)):
                    super().__init__(text_col=col)
                    self._allowed = pa.array(list(allowed), pa.string())

                def __call__(self, batch: pa.Table) -> pa.Table:
                    before = set(batch.schema.names)
                    scored = super().__call__(batch)
                    keep_mask = pc.is_in(
                        scored.column("lang_pred"), value_set=self._allowed
                    )
                    out = scored.filter(keep_mask)
                    return out.select(
                        [n for n in out.schema.names if n in before]
                    )

            ds = ds.map_batches(
                _LangGate, batch_format="pyarrow", concurrency=(1, 8)
            )
        elif typ == "pii_redact":
            # in-place PII scrub of the column (emails/phones/IPv4)
            from ..functions.text import redact_pii

            column = op.get("column", "text")

            def scrub(batch: pa.Table, col=column) -> pa.Table:
                before = list(batch.schema.names)
                out = redact_pii(batch, text_col=col, out_col="__redacted")
                i = out.schema.names.index(col)
                out = out.set_column(i, col, out.column("__redacted"))
                return out.select(before)  # drop the redactor's count columns

            ds = ds.map_batches(scrub, batch_format="pyarrow")
        elif typ == "near_dedup":
            # SimHash near-identical drop, first-wins in order_col order —
            # the same (fingerprint, dedup_first_wins) pair the training
            # exporter uses (pipelines/train_data.py)
            from ..functions.dedup import simhash_batch

            if order_col is None:
                raise ValueError("near_dedup needs order_col for first-wins")
            column = op.get("column", "text")
            ds = ds.map_batches(
                lambda b, col=column: simhash_batch(b, text_col=col),
                batch_format="pyarrow",
            )
            ds = dedup_first_wins(ds, "simhash", [order_col])
            ds = ds.drop_columns(["simhash"])
        elif typ == "token_truncate":
            # context-length cap: keep each row's first N whitespace tokens
            from ..functions.hashing import flat_tokens

            column = op.get("column", "text")
            max_toks = int(op.get("max_tokens", 512))

            def trunc(batch: pa.Table, col=column, mt=max_toks) -> pa.Table:
                flat, offsets = flat_tokens(batch.column(col))
                counts = np.diff(offsets)
                kept = np.minimum(counts, mt)
                idx = np.concatenate(
                    [
                        np.arange(offsets[i], offsets[i] + kept[i])
                        for i in range(len(kept))
                    ]
                ) if len(kept) else np.zeros(0, np.int64)
                toks = flat.take(pa.array(idx, pa.int64()))
                lists = pa.ListArray.from_arrays(
                    pa.array(np.concatenate([[0], np.cumsum(kept)]), pa.int32()),
                    toks,
                )
                joined = pc.binary_join(lists, " ")
                # rows UNDER the cap keep their original text byte-for-byte
                # (the rejoin lowercases and collapses whitespace — that
                # rewrite is the price of truncation only)
                over = pa.array(counts > mt)
                orig = batch.column(col)
                if isinstance(orig, pa.ChunkedArray):
                    orig = orig.combine_chunks()
                merged = pc.if_else(over, joined, orig)
                i = batch.schema.names.index(col)
                return batch.set_column(i, col, merged)

            ds = ds.map_batches(trunc, batch_format="pyarrow")
        elif typ == "readability_filter":
            # Flesch reading-ease band gate (queries.q_flesch's integer
            # milli-point convention): keep rows whose score falls in
            # [min_milli, max_milli] — the readability mixture axis
            column = op.get("column", "text")
            lo = int(op.get("min_milli", -(1 << 62)))
            hi = int(op.get("max_milli", 1 << 62))

            def readable(batch: pa.Table, col=column, lo=lo, hi=hi) -> pa.Table:
                from ..functions.text import flesch_milli_counts

                w, _s, _v, flesch = flesch_milli_counts(batch.column(col))
                keep = (w > 0) & (flesch >= lo) & (flesch <= hi)
                return batch.filter(pa.array(keep))

            ds = ds.map_batches(readable, batch_format="pyarrow")
        else:
            logger.warning("unknown post-processing op %r — skipping", typ)
    return ds


def flatten_one_level(batch: pa.Table) -> pa.Table:
    """M24: one-level flatten of struct columns into ``parent.child``
    columns (reference: src/storage.py:72-81 flattens nested dicts exactly
    one level before CSV append); non-struct columns pass through, deeper
    nesting stays nested — same contract as the reference."""
    return batch.flatten()


def _stringify_nested(batch: pa.Table) -> pa.Table:
    """Remaining nested columns → their str() form, like the reference's
    CSV writer coerces values deeper than one level (Arrow's CSV writer
    would raise on struct/list columns instead)."""
    for i, name in enumerate(batch.column_names):
        col = batch.column(i)
        if pa.types.is_nested(col.type):
            vals = pa.array(
                [None if v is None else str(v) for v in col.to_pylist()],
                pa.string(),
            )
            batch = batch.set_column(i, name, vals)
    return batch


def export(ds: "ray.data.Dataset", path: str, fmt: str = "parquet") -> None:
    """K5 export (reference: src/main.py:208-222): parquet (the engine
    default — partitioned, resumable), csv or json.  CSV flattens struct
    columns one level first (M24, reference src/storage.py:72-81), then
    str()-coerces anything still nested so deep structures export instead
    of crashing the Arrow CSV writer."""
    if fmt == "parquet":
        ds.write_parquet(path)
    elif fmt == "csv":
        ds.map_batches(
            lambda b: _stringify_nested(flatten_one_level(b)),
            batch_format="pyarrow",
        ).write_csv(path)
    elif fmt == "json":
        ds.write_json(path)
    elif fmt == "excel":
        # K5 excel (reference src/main.py:219-220, ``df.to_excel``): a
        # presentation export, driver-sized by the format itself — xlsx
        # caps a sheet at 1,048,576 rows, so the bounded to_pandas here
        # is the format's own ceiling, not a scale bug.  The writer lib
        # is optional in this environment; fail with the actionable
        # message instead of a deep pandas ImportError.
        try:
            import openpyxl  # noqa: F401

            engine = "openpyxl"
        except ImportError:
            try:
                import xlsxwriter  # noqa: F401

                engine = "xlsxwriter"
            except ImportError:
                raise ImportError(
                    "excel export needs openpyxl or xlsxwriter installed; "
                    "neither is available"
                ) from None
        df = ds.map_batches(
            lambda b: _stringify_nested(flatten_one_level(b)),
            batch_format="pyarrow",
        ).to_pandas()
        if len(df) > 1_048_576:
            raise ValueError(
                f"excel export: {len(df)} rows exceed the xlsx sheet limit "
                "(1,048,576); export parquet/csv instead"
            )
        df.to_excel(path, index=False, engine=engine)
    else:
        raise ValueError(f"unsupported export format: {fmt}")


def export_shards(
    ds: "ray.data.Dataset",
    out_dir: str,
    n_shards: int = 64,
    key_col: str = "doc_id",
    resume: bool = True,
    shuffle_seed: int | None = None,
) -> dict:
    """Deterministic hash-sharded training-data export — the terminal
    step of a data pipeline: decorrelate input order and split the
    corpus into a fixed number of shards a dataloader can stripe over.

    ``shard = (key · 2654435761) mod n_shards`` is content-stable: a
    re-run (or a resumed failed run) reproduces identical shard
    MEMBERSHIP regardless of block order or parallelism — the
    reproducibility a positional ``random_shuffle`` cannot give under
    retry.  One streaming pass: assign the shard column in
    ``map_batches``, then one partitioned ``write_parquet``
    (``shard=K/`` hive dirs; the shard column is real, so hive
    inference on re-read is the desired behavior, unlike the crawl's
    ``round-N`` naming).  The manifest is written LAST via atomic
    rename (the crawl checkpoint discipline): no manifest ⇒ the
    directory is an aborted attempt and is rebuilt; ``resume=True``
    returns the manifest of a completed export without rewriting.
    Without ``shuffle_seed``, within-shard file order is
    parallel-writer-nondeterministic; shard content is not.

    ``shuffle_seed`` additionally decorrelates WITHIN-shard order (a
    training dataloader reads shards sequentially — crawl order inside
    a shard is curriculum leakage): every row gets a content-stable
    ``shuffle_ord = mix64(key ^ mix64(seed))`` column, and after the
    partitioned write one Ray task per shard re-reads that shard, sorts
    by ``(shuffle_ord, key)`` and rewrites it as a single file.  The
    whole export is then byte-order-deterministic: same data + same
    seed ⇒ identical shard files regardless of parallelism, block
    order, or retries.  Scale shape: the finalize step is one task per
    shard touching only that shard's rows — size ``n_shards`` so a
    shard fits a worker (100 TB / 100k shards ≈ 1 GB/task), exactly the
    per-partition budget the crawl's bucket scans already assume.
    """
    import json
    import os
    import shutil
    import uuid

    import numpy as np
    import pyarrow.parquet as pq

    import glob

    man_path = os.path.join(out_dir, "_manifest.json")
    if os.path.exists(man_path):
        if resume:
            with open(man_path) as f:
                prior = json.load(f)
            if (
                prior.get("n_shards") != n_shards
                or prior.get("key_col") != key_col
                or prior.get("shuffle_seed") != shuffle_seed
            ):
                raise ValueError(
                    f"export at {out_dir} was built with n_shards="
                    f"{prior.get('n_shards')}, key_col={prior.get('key_col')!r}, "
                    f"shuffle_seed={prior.get('shuffle_seed')!r}; requested "
                    f"{n_shards}/{key_col!r}/{shuffle_seed!r} — pass "
                    "resume=False to rebuild"
                )
            return prior
        shutil.rmtree(out_dir)
    elif os.path.exists(out_dir):
        shutil.rmtree(out_dir)  # aborted attempt: no manifest ⇒ rebuild
    for stale in glob.glob(f"{out_dir}.tmp-*"):  # crashed prior attempts
        shutil.rmtree(stale, ignore_errors=True)

    tmp = f"{out_dir}.tmp-{uuid.uuid4().hex[:8]}"

    seed_mix = None
    if shuffle_seed is not None:
        from ..functions.hashing import mix64

        seed_mix = int(mix64(np.array([shuffle_seed], dtype=np.uint64))[0])

    def assign(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        batch = batch.append_column(
            "shard", pa.array((keys * 2654435761) % n_shards, pa.int64())
        )
        if seed_mix is not None:
            from ..functions.hashing import mix64

            ord_ = mix64(keys.astype(np.uint64) ^ np.uint64(seed_mix))
            batch = batch.append_column("shuffle_ord", pa.array(ord_, pa.uint64()))
        return batch

    ds.map_batches(assign, batch_format="pyarrow").write_parquet(
        tmp, partition_cols=["shard"]
    )
    os.makedirs(tmp, exist_ok=True)  # an empty dataset writes no files
    if shuffle_seed is not None:
        import ray

        @ray.remote
        def _finalize_shard(shard_dir: str, key: str) -> None:
            """Sort ONE shard by (shuffle_ord, key) into a single file."""
            files = sorted(
                f for f in os.listdir(shard_dir) if f.endswith(".parquet")
            )
            t = pa.concat_tables(
                [pq.read_table(os.path.join(shard_dir, f)) for f in files]
            )
            t = t.sort_by([("shuffle_ord", "ascending"), (key, "ascending")])
            out = os.path.join(shard_dir, "sorted-0.parquet.tmp")
            pq.write_table(t, out)
            for f in files:
                os.remove(os.path.join(shard_dir, f))
            os.rename(out, os.path.join(shard_dir, "sorted-0.parquet"))

        ray.get(
            [
                _finalize_shard.remote(os.path.join(tmp, d), key_col)
                for d in sorted(os.listdir(tmp))
                if d.startswith("shard=") and os.path.isdir(os.path.join(tmp, d))
            ]
        )
    # per-shard row counts from file metadata only (no data re-read)
    counts: dict = {}
    for shard_dir in sorted(os.listdir(tmp)):
        full = os.path.join(tmp, shard_dir)
        if not (os.path.isdir(full) and shard_dir.startswith("shard=")):
            continue
        k = int(shard_dir.split("=", 1)[1])
        counts[str(k)] = sum(
            pq.read_metadata(os.path.join(full, f)).num_rows
            for f in os.listdir(full)
            if f.endswith(".parquet")
        )
    os.rename(tmp, out_dir)
    manifest = {
        "n_shards": n_shards,
        "key_col": key_col,
        "shuffle_seed": shuffle_seed,
        "rows": sum(counts.values()),
        "shard_rows": counts,
    }
    tmp_man = man_path + ".tmp"
    with open(tmp_man, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp_man, man_path)
    return manifest
