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

__all__ = ["mix_weighted"]

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
