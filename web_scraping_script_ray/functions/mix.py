"""Weighted source mixture — the corpus-mixing step of a training-data
pipeline (e.g. "Wikipedia ×2.5, CommonCrawl ×0.25" in GPT-style data
recipes).

``mix_weighted`` expands or samples each row by its source's weight:
weight ``w`` yields ``floor(w)`` full copies plus one more iff a
deterministic hash of the row id lands under the fractional part —
content-stable (a retry or different block order reproduces the exact
same multiset), and exactly SQL-expressible for the oracle.

Scale shape: the weight table is tiny (one entry per corpus source) and
rides inside the task closure; expansion is a per-batch numpy ``repeat``
— no shuffle, no driver state, streams at any corpus size.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["mix_weighted", "dsir_scores"]

_K = np.int64(2654435761)


def _copies_for(
    ids: np.ndarray, wts: np.ndarray, mod: int = 1000
) -> np.ndarray:
    """floor(w) full copies + 1 iff (id·K) mod 1000 < round(frac·1000)."""
    full = np.floor(wts).astype(np.int64)
    frac_gate = np.rint((wts - np.floor(wts)) * mod).astype(np.int64)
    extra = ((ids * _K) % mod < frac_gate).astype(np.int64)
    return full + extra


def mix_weighted(
    ds,
    source_col: str,
    id_col: str,
    weights: dict[str, float],
    default: float = 1.0,
    epoch_col: str = "epoch",
):
    """Per-source weighted up/down-sampling with an ``epoch`` column.

    Each input row appears ``floor(w) + Bernoulli_hash(frac(w))`` times
    in the output, tagged ``epoch = 0..copies-1`` (so a dataloader can
    tell repeats apart).  ``w < 1`` is deterministic hash downsampling
    (the ``sample_docs`` rule generalized per source); ``w >= 1`` is
    corpus upsampling.  ``id_col`` must be integer and is the content
    key the decision hashes — shard/block order never matters.
    """

    w_items = dict(weights)

    def expand(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = batch.num_rows
        if n == 0:
            return batch.append_column(epoch_col, pa.array([], pa.int64()))
        enc = pc.dictionary_encode(batch.column(source_col))
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        # O(#distinct sources) python, O(rows) numpy
        dict_w = np.array(
            [float(w_items.get(s, default)) for s in enc.dictionary.to_pylist()],
            dtype=np.float64,
        )
        wts = dict_w[enc.indices.to_numpy(zero_copy_only=False)]
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        copies = _copies_for(ids, wts)
        total = int(copies.sum())
        row_idx = np.repeat(np.arange(n, dtype=np.int64), copies)
        starts = np.concatenate(([0], np.cumsum(copies)[:-1]))
        epoch = np.arange(total, dtype=np.int64) - np.repeat(starts, copies)
        out = batch.take(pa.array(row_idx))
        return out.append_column(epoch_col, pa.array(epoch, pa.int64()))

    return ds.map_batches(expand, batch_format="pyarrow")


def pack_segments(
    ds,
    id_col: str,
    ntok_col: str,
    capacity: int,
    id_range: tuple[int, int],
    n_parts: int | None = None,
):
    """Greedy sequence packing with document splitting — the "pack the
    token stream into fixed context windows" step of a training-data
    recipe (GPT-style pretraining packs the concatenated corpus into
    capacity-C blocks).

    Documents are laid out in ``id_col`` order as one global token
    stream; token ``g`` lands in pack ``g // capacity``.  A document
    spanning a pack boundary is split, yielding one output row per
    (document, pack) segment: ``(id_col, pack_id, seg_tokens)``.

    Scale shape (two passes, O(n_parts) driver state):

    1. rows carry ``part = id * n_parts // N`` (range partition on the
       already-ordered id); per-part token sums come back as ONE row per
       part (``groupby(part).sum``) — the only driver materialization,
       ``n_parts`` integers regardless of corpus size;
    2. the exclusive prefix sum over those ``n_parts`` totals is the
       global stream offset of each partition's first token; it rides
       into a ``groupby(part).map_groups`` that sorts its partition by
       id, cumsums locally, and emits every (doc, pack) segment with one
       vectorized ``np.repeat`` — no global sort, documents shuffle once.

    At 100 TB the id order comes from the upstream sort/assignment that
    produced ``id_col``; rows with ``ntok_col == 0`` produce no segment.
    """
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Sum

    lo, hi = id_range
    span = max(1, hi - lo)
    if n_parts is None:
        # ~250k docs per partition: small inputs collapse to one group
        # (single-task plan, no exchange overhead), 100-TB inputs fan
        # out; the output is identical at any n_parts (range partition
        # only changes layout, never the global prefix sums).
        n_parts = int(np.clip(span // 250_000, 1, 512))

    def add_part(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        part = np.clip((ids - lo) * n_parts // span, 0, n_parts - 1)
        return batch.append_column("__part", pa.array(part, pa.int64()))

    parted = ds.map_batches(add_part, batch_format="pyarrow").materialize()
    totals = parted.groupby("__part").aggregate(Sum(ntok_col)).take_all()
    base = np.zeros(n_parts, dtype=np.int64)
    for r in totals:  # O(n_parts) rows — driver-sized by construction
        base[int(r["__part"])] = int(r[f"sum({ntok_col})"])
    base = np.concatenate(([0], np.cumsum(base)[:-1]))

    def emit_segments(g: pa.Table) -> pa.Table:
        ids = g.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        nt = g.column(ntok_col).to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(ids)
        ids, nt = ids[order], nt[order]
        start = base[int(g.column("__part")[0].as_py())] + np.cumsum(nt) - nt
        keep = nt > 0
        ids, nt, start = ids[keep], nt[keep], start[keep]
        if len(ids) == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "pack_id": pa.array([], pa.int64()),
                    "seg_tokens": pa.array([], pa.int64()),
                }
            )
        p0 = start // capacity
        p1 = (start + nt - 1) // capacity
        npacks = p1 - p0 + 1
        rep = np.repeat(np.arange(len(ids), dtype=np.int64), npacks)
        within = np.arange(int(npacks.sum()), dtype=np.int64) - np.repeat(
            np.cumsum(npacks) - npacks, npacks
        )
        pack = p0[rep] + within
        seg = np.minimum((pack + 1) * capacity, (start + nt)[rep]) - np.maximum(
            pack * capacity, start[rep]
        )
        return pa.table(
            {
                id_col: pa.array(ids[rep], pa.int64()),
                "pack_id": pa.array(pack, pa.int64()),
                "seg_tokens": pa.array(seg, pa.int64()),
            }
        )

    return parted.groupby("__part").map_groups(emit_segments, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# DSIR — Data Selection via Importance Resampling (Xie et al., NeurIPS
# 2023): score every raw document by how much it resembles a TARGET
# domain, as the log importance ratio of two bag-of-hashed-ngrams
# models, log p_target(doc) − log p_raw(doc).  The published use: rank a
# web-scale raw corpus against a small high-quality target (Wikipedia,
# books) and keep the top mass.
#
# Determinism contract (same as the bigram LM scorer): feature = md5-
# prefix token hash mod m (SQL-reproducible), per-feature add-1-smoothed
# log-probs in integer micro-log units floor(ln(·)·1e6), per-doc score =
# sum over token OCCURRENCES of the feature's weight — integer addition,
# so partial-sum order can never perturb it.
# ---------------------------------------------------------------------------

DSIR_M = 4096  # hashed-feature buckets


def dsir_scores(
    ds: "ray.data.Dataset",
    id_col: str,
    text_col: str,
    target_mask_fn,
    m: int = DSIR_M,
) -> "ray.data.Dataset":
    """(id, n_tokens, dsir_micro) per document with ≥1 token.

    Pass 1 never shuffles documents: each block emits ONE row holding
    two dense m-bucket int64 count vectors (target / raw occurrences,
    ~64 KB each) — fixed-size associative partials, OR rather SUM-merged
    on the driver in O(blocks) (tree-reduce at cluster scale).  The
    m-entry weight vector broadcasts once (``ray.put``); pass 2 scores
    each block with one ``np.add.at`` — documents never move."""
    import ray

    from .hashing import flat_tokens, token_hashes

    def partial(batch: pa.Table) -> pa.Table:
        flat, offsets = flat_tokens(batch.column(text_col))
        f = (token_hashes(flat) % np.uint64(m)).astype(np.int64)
        per_doc = np.diff(offsets)
        doc_of = np.repeat(np.arange(batch.num_rows, dtype=np.int64), per_doc)
        tgt_occ = target_mask_fn(batch)[doc_of]
        n_t = np.bincount(f[tgt_occ], minlength=m).astype(np.int64)
        n_r = np.bincount(f, minlength=m).astype(np.int64)
        return pa.Table.from_arrays(
            [
                pa.array([n_t.tobytes()], pa.large_binary()),
                pa.array([n_r.tobytes()], pa.large_binary()),
            ],
            names=["n_t", "n_r"],
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    c_t = np.zeros(m, dtype=np.int64)
    c_r = np.zeros(m, dtype=np.int64)
    for row in parts:
        c_t += np.frombuffer(row["n_t"], dtype=np.int64)
        c_r += np.frombuffer(row["n_r"], dtype=np.int64)
    tot_t, tot_r = int(c_t.sum()), int(c_r.sum())
    lp = np.floor(np.log((c_t + 1.0) / (tot_t + m)) * 1e6).astype(np.int64)
    lq = np.floor(np.log((c_r + 1.0) / (tot_r + m)) * 1e6).astype(np.int64)
    w_ref = ray.put(lp - lq)

    def score(batch: pa.Table) -> pa.Table:
        w = ray.get(w_ref) if isinstance(w_ref, ray.ObjectRef) else w_ref
        flat, offsets = flat_tokens(batch.column(text_col))
        f = (token_hashes(flat) % np.uint64(m)).astype(np.int64)
        per_doc = np.diff(offsets)
        doc_of = np.repeat(np.arange(batch.num_rows, dtype=np.int64), per_doc)
        s = np.zeros(batch.num_rows, dtype=np.int64)
        np.add.at(s, doc_of, w[f])
        keep = per_doc > 0
        return pa.Table.from_arrays(
            [
                batch.column(id_col).filter(pa.array(keep)),
                pa.array(per_doc[keep], pa.int64()),
                pa.array(s[keep], pa.int64()),
            ],
            names=[id_col, "n_tokens", "dsir_micro"],
        )

    return ds.map_batches(score, batch_format="pyarrow")
