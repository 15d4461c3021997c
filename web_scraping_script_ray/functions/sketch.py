"""KMV (k-minimum-values) distinct-count sketch — a mergeable cardinality
estimator for grouped COUNT(DISTINCT) at 100 TB.

An exact grouped count-distinct must co-locate every (key, value) pair —
an all-to-all shuffle of the raw pairs.  The KMV sketch (Bar-Yossef et
al., RANDOM'02 — the "KMV synopsis" of Beyer et al., SIGMOD'07) replaces
that with a bounded summary: hash every value to a uniform 64-bit point,
keep only the ``k`` smallest distinct hashes per key.  Two properties
make it distributed-friendly:

- **mergeable**: the union of two KMV sets, re-truncated to the k
  smallest, is exactly the KMV set of the combined stream — so per-block
  partials (map-side, O(k) rows per key per block) merge associatively
  in one tiny groupby; raw pairs never shuffle.
- **deterministic**: the estimate is a pure function of the value set
  (no RNG), so a DuckDB oracle reproduces it bit-for-bit.

Estimator: with m = |distinct hashes seen| ≤ k the sketch is exact
(est = m); otherwise est = floor((k-1) · 2^64 / h_(k)) where h_(k) is the
k-th smallest hash — the classic (k-1)/h_(k) estimator on hashes
normalized to [0, 1).

The hash is the md5-prefix uint64 (``functions/hashing.py:token_hashes``)
of the value's decimal string — the same SQL-reproducible construction
the SimHash oracle uses (``('0x'||substr(md5(v),1,16))::UBIGINT``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from .hashing import token_hashes

TWO64 = float(2**64)


def _kmv_hashes(values: pa.Array) -> np.ndarray:
    """Distinct uint64 md5-prefix hashes of the values' decimal strings."""
    s = pc.cast(values, pa.string())
    uniq = pc.unique(s)
    return token_hashes(uniq)


def _kmv_partial(batch: pa.Table, key_col: str, val_col: str, k: int) -> pa.Table:
    """Per-block partial: for each key, the k smallest distinct hashes."""
    enc = pc.dictionary_encode(batch.column(key_col))
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    idx = enc.indices.to_numpy(zero_copy_only=False)
    keys_out, hv_out = [], []
    for ki in range(len(enc.dictionary)):
        vals = batch.column(val_col).filter(pa.array(idx == ki))
        hv = np.unique(_kmv_hashes(vals))[:k]
        keys_out.append(np.full(len(hv), ki, dtype=np.int64))
        hv_out.append(hv)
    ki_arr = np.concatenate(keys_out) if keys_out else np.zeros(0, np.int64)
    key_arr = enc.dictionary.take(pa.array(ki_arr, pa.int64()))
    return pa.Table.from_arrays(
        [
            key_arr,
            pa.array(
                np.concatenate(hv_out) if hv_out else np.zeros(0, np.uint64),
                pa.uint64(),
            ),
        ],
        names=[key_col, "__hv"],
    )


def _kmv_final(g: pa.Table, key_col: str, k: int) -> pa.Table:
    hv = np.unique(g.column("__hv").to_numpy(zero_copy_only=False))[:k]
    m = len(hv)
    if m < k:
        est = float(m)
    else:
        est = np.floor((k - 1) * (TWO64 / float(hv[-1])))
    return pa.Table.from_arrays(
        [
            g.column(key_col).slice(0, 1),
            pa.array([k], pa.int64()),
            pa.array([int(est)], pa.int64()),
        ],
        names=[key_col, "k", "n_distinct_est"],
    )


def kmv_distinct(
    ds: "ray.data.Dataset", key_col: str, val_col: str, k: int = 64
) -> "ray.data.Dataset":
    """Grouped approximate COUNT(DISTINCT val) → (key, k, n_distinct_est).

    Map-side: each block emits ≤ k hash rows per key it contains; the
    groupby then moves only those partials (O(keys × blocks × k), never
    the raw pairs) and the per-key merge re-truncates to the k smallest.
    """
    partials = ds.map_batches(
        lambda b: _kmv_partial(b, key_col, val_col, k), batch_format="pyarrow"
    )
    return partials.groupby(key_col).map_groups(
        lambda g: _kmv_final(g, key_col, k), batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters (SpaceSaving family) — mergeable frequency
# summaries.  Each block compresses its exact counts to ``capacity``
# survivors (subtract the (capacity+1)-th largest count, keep positive:
# the batch form of the MG decrement); summaries concatenate, re-sum and
# re-compress associatively, so the merge tree can have any shape.  Every
# estimate is an UNDERCOUNT with total error ≤ n_rows/(capacity+1); with
# capacity ≥ distinct keys no decrement ever fires and the result is
# EXACT — the SQL-oracled instantiation (the ann_ivf_full pattern:
# oracle the machinery in its exact regime, pytest the bound in the
# approximate one).
# ---------------------------------------------------------------------------

def mg_compress(
    keys: np.ndarray, counts: np.ndarray, capacity: int
) -> tuple[np.ndarray, np.ndarray]:
    """Batch Misra-Gries decrement to ≤ ``capacity`` surviving keys."""
    if len(keys) <= capacity:
        return keys, counts
    thresh = np.partition(counts, -(capacity + 1))[-(capacity + 1)]
    kept = counts - thresh
    keep = kept > 0
    return keys[keep], kept[keep]


def _mg_compress_table(t: pa.Table, key_col: str, cnt_col: str, capacity: int) -> pa.Table:
    """Batch MG decrement over an Arrow (key, count) table — key type
    agnostic (ints, strings, …); returns (key_col, '__c')."""
    cnts = t.column(cnt_col).to_numpy(zero_copy_only=False).astype(np.int64)
    if len(cnts) > capacity:
        thresh = np.partition(cnts, -(capacity + 1))[-(capacity + 1)]
        kept = cnts - thresh
        idx = np.flatnonzero(kept > 0)
        t = t.take(pa.array(idx, pa.int64()))
        cnts = kept[idx]
    return pa.Table.from_arrays(
        [t.column(key_col), pa.array(cnts, pa.int64())], names=[key_col, "__c"]
    )


def mg_topk(
    ds: "ray.data.Dataset",
    key_col: str,
    capacity: int = 256,
    k: int = 10,
    exact_guard: bool = False,
) -> "ray.data.Dataset":
    """Top-``k`` keys by frequency via per-block MG summaries.

    One streaming pass: block → exact Arrow counts → MG compress →
    tiny summary rows; a single merge task re-sums and re-compresses
    (summaries are ≤ capacity rows each — O(blocks·capacity) total, the
    whole point of the sketch).  Key type agnostic (ints, strings).
    Deterministic output order (count DESC, key ASC).

    ``exact_guard=True`` makes the merge FAIL LOUDLY if any decrement
    would fire (summed distinct keys > capacity) — for callers that
    promise exactness (the SQL-oracled query) rather than silently
    undercounting."""
    import ray

    def partial(batch: pa.Table) -> pa.Table:
        out = batch.group_by([key_col]).aggregate([([], "count_all")])
        if exact_guard and out.num_rows > capacity:
            raise RuntimeError(
                f"mg_topk(exact_guard=True): a block holds {out.num_rows} "
                f"distinct keys > capacity {capacity} — the decrement would "
                f"fire and the result would undercount; raise capacity or "
                f"drop the guard for the approximate regime"
            )
        return _mg_compress_table(out, key_col, "count_all", capacity)

    @ray.remote
    def merge(refs: list) -> pa.Table:
        tables = [t for t in ray.get(list(refs)) if t.num_rows]
        if not tables:
            return pa.table({key_col: pa.array([], pa.int64()),
                             "est_count": pa.array([], pa.int64())})
        s = pa.concat_tables(tables).group_by([key_col]).aggregate([("__c", "sum")])
        if exact_guard and s.num_rows > capacity:
            raise RuntimeError(
                f"mg_topk(exact_guard=True): {s.num_rows} distinct keys exceed "
                f"capacity {capacity} — the result would undercount; raise "
                f"capacity or drop the guard for the approximate regime"
            )
        s = _mg_compress_table(s, key_col, "__c_sum", capacity)
        order = pc.sort_indices(
            s,
            sort_keys=[("__c", "descending"), (key_col, "ascending")],
        )[:k]
        s = s.take(order)
        return s.rename_columns([key_col, "est_count"])

    import ray.data

    refs = ds.map_batches(partial, batch_format="pyarrow").to_arrow_refs()
    return ray.data.from_arrow_refs([merge.remote(refs)])
