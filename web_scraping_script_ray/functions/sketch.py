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


# ---------------------------------------------------------------------------
# HyperLogLog (Flajolet et al., AofA'07) — mergeable grouped cardinality
# registers.  Complements KMV: a KMV summary is O(k) VALUES per key; the
# HLL summary is a fixed 2^p-register array per key whose per-register
# MAX merges associatively, so block partials are tiny and key-shaped
# skew cannot inflate them.  Everything here is integer-exact and
# hash-deterministic (same md5-prefix uint64 the KMV/SimHash oracles
# use), so a DuckDB oracle reproduces the REGISTERS and the estimate
# bit-for-bit: register index = top p bits of the hash, rho = leading-
# zero run of the low 64-p bits + 1 (SQL: 53 - length(bin(w))), and the
# raw estimator alpha_m * m^2 / sum(2^-M_j) is evaluated in fixed-point
# integer arithmetic (alpha scaled by 2^30, the 2^-M_j sum scaled by
# 2^53 — fits int128/HUGEINT) so no float association order can differ
# between engines.  The small-range linear-counting correction IS
# applied (the raw estimator floors at ~alpha*m): est <= 2.5m with
# empty registers switches to floor(m*ln(m/n_zero)), whose 4096
# possible values were verified identical between Python libm and
# DuckDB with >=3.7e-6 margin to every floor boundary.  High-
# cardinality accuracy is pytest-asserted (tests/test_agg.py).
# ---------------------------------------------------------------------------

HLL_P = 12
HLL_M = 1 << HLL_P  # 4096 registers
_HLL_W_BITS = 64 - HLL_P  # 52: low bits that feed the rho count
_HLL_W_MASK = np.uint64((1 << _HLL_W_BITS) - 1)
# floor(0.7213 / (1 + 1.079 / 4096) * 2^30) — the m=4096 alpha in .30
# fixed point; hard-coded identically in the SQL oracle.
_HLL_ALPHA_FP = 774286009


def _hll_registers(values: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(register index, rho) per DISTINCT value — duplicates can't move
    a per-register max, so hashing the uniques is lossless."""
    hv = _kmv_hashes(values)  # distinct md5-prefix uint64s
    idx = (hv >> np.uint64(_HLL_W_BITS)).astype(np.int64)
    w = hv & _HLL_W_MASK
    # w < 2^52 is exact in float64, so frexp's exponent IS bit_length(w)
    bl = np.frexp(w.astype(np.float64))[1]
    rho = np.where(w == 0, _HLL_W_BITS + 1, _HLL_W_BITS + 1 - bl).astype(np.int64)
    return idx, rho


def _hll_partial(batch: pa.Table, key_col: str, val_col: str) -> pa.Table:
    """Per-block partial: the non-zero (key, register, max rho) cells."""
    enc = pc.dictionary_encode(batch.column(key_col))
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    kidx = enc.indices.to_numpy(zero_copy_only=False)
    keys_out, idx_out, rho_out = [], [], []
    for ki in range(len(enc.dictionary)):
        vals = batch.column(val_col).filter(pa.array(kidx == ki))
        idx, rho = _hll_registers(vals)
        regs = np.zeros(HLL_M, dtype=np.int64)
        np.maximum.at(regs, idx, rho)
        used = np.flatnonzero(regs)
        keys_out.append(np.full(len(used), ki, dtype=np.int64))
        idx_out.append(used)
        rho_out.append(regs[used])
    ki_arr = np.concatenate(keys_out) if keys_out else np.zeros(0, np.int64)
    key_arr = enc.dictionary.take(pa.array(ki_arr, pa.int64()))
    return pa.Table.from_arrays(
        [
            key_arr,
            pa.array(np.concatenate(idx_out) if idx_out else np.zeros(0, np.int64)),
            pa.array(np.concatenate(rho_out) if rho_out else np.zeros(0, np.int64)),
        ],
        names=[key_col, "__ridx", "__rho"],
    )


def _hll_final(g: pa.Table, key_col: str) -> pa.Table:
    regs = np.zeros(HLL_M, dtype=np.int64)
    np.maximum.at(
        regs,
        g.column("__ridx").to_numpy(zero_copy_only=False),
        g.column("__rho").to_numpy(zero_copy_only=False),
    )
    n_zero = int((regs == 0).sum())
    sum_rho = int(regs.sum())
    # S = sum_j 2^(53 - M_j) exceeds int64 (max 4096 * 2^53); bucket the
    # 54 possible register values and sum in Python ints (exact).
    counts = np.bincount(regs, minlength=_HLL_W_BITS + 2)
    s_num = sum(int(c) << (_HLL_W_BITS + 1 - r) for r, c in enumerate(counts) if c)
    est = (_HLL_ALPHA_FP * HLL_M * HLL_M * (1 << (_HLL_W_BITS + 1))) // (s_num << 30)
    # Small-range (linear counting) correction — the raw estimator's
    # floor is ~alpha*m, so below 2.5m switch to m*ln(m/n_zero).  Safe
    # to oracle in float: the 4096 possible values were checked
    # identical between Python libm and DuckDB, with >=3.7e-6 margin to
    # every floor boundary (a libm ulp is ~1e-8 here).
    if n_zero > 0 and est <= 5 * HLL_M // 2:
        import math

        est = math.floor(HLL_M * math.log(HLL_M / n_zero))
    return pa.Table.from_arrays(
        [
            g.column(key_col).slice(0, 1),
            pa.array([HLL_M], pa.int64()),
            pa.array([n_zero], pa.int64()),
            pa.array([sum_rho], pa.int64()),
            pa.array([est], pa.int64()),
        ],
        names=[key_col, "m", "n_zero", "sum_rho", "n_distinct_est"],
    )


def hll_distinct(ds: "ray.data.Dataset", key_col: str, val_col: str) -> "ray.data.Dataset":
    """Grouped HLL COUNT(DISTINCT val) → (key, m, n_zero, sum_rho,
    n_distinct_est).  Map-side: each block emits only its NON-ZERO
    register cells (≤ 4096 rows per key per block, typically far
    fewer); the groupby moves those cells, never the raw pairs, and the
    per-key merge is one vectorized ``np.maximum.at``."""
    partials = ds.map_batches(
        lambda b: _hll_partial(b, key_col, val_col), batch_format="pyarrow"
    )
    return partials.groupby(key_col).map_groups(
        lambda g: _hll_final(g, key_col), batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# Bottom-k sampled quantiles — a fixed-size MERGEABLE quantile summary
# (bottom-k / coordinated sampling, Cohen & Kaplan 2007): per key, keep
# the k rows whose md5-prefix ROW-ID hash is smallest.  "k smallest of
# the union" is associative, so block partials merge exactly like KMV;
# the kept rows are a uniform k-subset of the key's rows, and the
# empirical quantiles of their VALUES estimate the true quantiles with
# error ~ sqrt(q(1-q)/k).  Unlike the exact radix/histogram quantile
# plans (multi-pass), this is ONE pass with an O(k)-per-key summary —
# and unlike a random reservoir it is deterministic: the same rows are
# sampled under any partitioning, so a DuckDB oracle reproduces the
# sample AND the estimates bit-for-bit.
# ---------------------------------------------------------------------------


def _bkq_partial(
    batch: pa.Table, key_col: str, val_col: str, id_col: str, k: int
) -> pa.Table:
    ids = pc.cast(batch.column(id_col), pa.string())
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    hv = token_hashes(ids)
    enc = pc.dictionary_encode(batch.column(key_col))
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    kidx = enc.indices.to_numpy(zero_copy_only=False)
    vals = batch.column(val_col).to_numpy(zero_copy_only=False)
    keys_out, hv_out, v_out = [], [], []
    for ki in range(len(enc.dictionary)):
        sel = np.flatnonzero(kidx == ki)
        take = sel[np.argsort(hv[sel], kind="stable")[:k]]
        keys_out.append(np.full(len(take), ki, dtype=np.int64))
        hv_out.append(hv[take])
        v_out.append(vals[take])
    ki_arr = np.concatenate(keys_out) if keys_out else np.zeros(0, np.int64)
    return pa.Table.from_arrays(
        [
            enc.dictionary.take(pa.array(ki_arr, pa.int64())),
            pa.array(
                np.concatenate(hv_out) if hv_out else np.zeros(0, np.uint64),
                pa.uint64(),
            ),
            pa.array(
                np.concatenate(v_out) if v_out else np.zeros(0, np.float64),
                pa.float64(),
            ),
        ],
        names=[key_col, "__hv", "__v"],
    )


def bottomk_quantiles(
    ds: "ray.data.Dataset",
    key_col: str,
    val_col: str,
    id_col: str,
    k: int = 1024,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> "ray.data.Dataset":
    """Grouped one-pass sampled quantiles → (key, k_used, q50, q90,
    q99).  Map-side: each block keeps its k smallest (row-hash, value)
    pairs per key; the groupby moves ≤ k rows per key per block; the
    merge re-selects the global bottom-k and reads the estimates off
    the sorted sample (keys with < k rows are EXACT)."""

    def final(g: pa.Table) -> pa.Table:
        hv = g.column("__hv").to_numpy(zero_copy_only=False)
        vals = g.column("__v").to_numpy(zero_copy_only=False)
        order = np.argsort(hv, kind="stable")[:k]
        sample = np.sort(vals[order])
        ku = len(sample)
        arrays = [
            g.column(key_col).slice(0, 1),
            pa.array([ku], pa.int64()),
        ]
        names = [key_col, "k_used"]
        for q in qs:
            arrays.append(
                pa.array([float(sample[int(np.floor(q * (ku - 1)))])], pa.float64())
            )
            names.append(f"q{int(q * 100)}")
        return pa.Table.from_arrays(arrays, names=names)

    partials = ds.map_batches(
        lambda b: _bkq_partial(b, key_col, val_col, id_col, k),
        batch_format="pyarrow",
    )
    return partials.groupby(key_col).map_groups(final, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Count-Min sketch (point-frequency estimates, linearly mergeable).
# ---------------------------------------------------------------------------

CM_DEPTH = 4
CM_WIDTH = 1024


def cm_partial_counters(
    toks: "pa.Array", counts: "np.ndarray", depth: int = CM_DEPTH, width: int = CM_WIDTH
) -> "np.ndarray":
    """(depth, width) int64 counter matrix for one block's token counts.
    Row r hashes token t as md5(f"{r}\\x1f{t}")[:8] % width — the same
    ``token_hashes`` construction every oracle reproduces with
    ``('0x' || substr(md5(r || chr(31) || t), 1, 16))::UBIGINT``.
    Counter matrices MERGE BY ADDITION (the sketch is a linear
    projection of the count vector), so block partials sum exactly."""
    from .hashing import token_hashes

    m = np.zeros((depth, width), np.int64)
    if len(toks) == 0:
        return m
    for r in range(depth):
        salted = pc.binary_join_element_wise(
            pa.array([str(r)] * len(toks), pa.string()), toks, "\x1f"
        )
        hv = (token_hashes(salted) % np.uint64(width)).astype(np.int64)
        np.add.at(m[r], hv, counts)
    return m


def cm_estimate(
    merged: "np.ndarray", probe: list[str], depth: int = CM_DEPTH, width: int = CM_WIDTH
) -> "np.ndarray":
    """min-over-rows estimate per probe key (>= true count, always)."""
    from .hashing import token_hashes

    if not probe:
        return np.zeros(0, np.int64)
    est = np.full(len(probe), np.iinfo(np.int64).max, np.int64)
    arr = pa.array(probe, pa.string())
    for r in range(depth):
        salted = pc.binary_join_element_wise(
            pa.array([str(r)] * len(probe), pa.string()), arr, "\x1f"
        )
        hv = (token_hashes(salted) % np.uint64(width)).astype(np.int64)
        est = np.minimum(est, merged[r][hv])
    return est


# ---------------------------------------------------------------------------
# AMS / Tug-of-War F2 sketch (Alon-Matias-Szegedy 1996): estimate the
# second frequency moment Σ c_u² — the self-join size — from K fixed-size
# counters.  The sketch is LINEAR (z_k = Σ_u sign_k(u)·c_u distributes
# over block-partial counts), so each block folds to K integers and NO
# per-key exchange happens for the estimate at all; only the exact
# comparison value pays a distinct-key shuffle.  Deterministic md5 sign
# hashes make every counter — and the median-of-groups estimate — bit-
# exactly SQL-reproducible (an approximate operator with an exact oracle,
# the kmv/hll/cm pattern).
# ---------------------------------------------------------------------------

AMS_K = 64          # counters
AMS_GROUPS = 8      # median-of-groups (8 groups × 8 counters)


def _ams_signs(values: pa.Array, k: int) -> np.ndarray:
    """(len(values), k) ±1 sign matrix: parity of md5_u64("<val>|<k>")."""
    s = pc.cast(values, pa.string())
    n = len(s)
    out = np.empty((n, k), np.int64)
    for j in range(k):
        salted = pc.binary_join_element_wise(
            s, pa.array([str(j)] * n, pa.string()), "|"
        )
        hv = token_hashes(salted)
        out[:, j] = np.where((hv & np.uint64(1)).astype(bool), 1, -1)
    return out


def ams_f2_partial(batch: pa.Table, val_col: str, k: int = AMS_K) -> pa.Table:
    """Per-block partial: K counter values over the block's local counts."""
    counts = (
        batch.select([val_col]).group_by([val_col]).aggregate([([], "count_all")])
    )
    vals = counts.column(val_col)
    if isinstance(vals, pa.ChunkedArray):
        vals = vals.combine_chunks()
    c = counts.column("count_all").to_numpy(zero_copy_only=False).astype(np.int64)
    signs = _ams_signs(vals, k)
    z = signs.T @ c  # (k,)
    return pa.Table.from_arrays(
        [
            pa.array(np.arange(k, dtype=np.int64), pa.int64()),
            pa.array(z, pa.int64()),
        ],
        names=["k", "z"],
    )


def ams_f2_estimate(z: np.ndarray, groups: int = AMS_GROUPS) -> tuple[int, int]:
    """(median_group_sum, estimate): group the K counters into ``groups``
    consecutive runs, sum z² within each, take the LOWER median (sorted
    index (groups-1)//2 — ORDER BY ... OFFSET in SQL), divide by the
    group size for the F2 estimate (integer floor)."""
    k = len(z)
    per = k // groups
    z2 = z.astype(object)  # arbitrary precision: z² can exceed int64 at scale
    gsum = [int(sum(x * x for x in z2[g * per : (g + 1) * per])) for g in range(groups)]
    med = sorted(gsum)[(groups - 1) // 2]
    return med, med // per


# ---------------------------------------------------------------------------
# KMV set operations (Beyer et al. 2007): union and intersection distinct
# estimates between two sets from their k-minimum-values sketches.  The
# union sketch is the k smallest of the two sketches' union; an element
# of the union sketch lies in A∩B iff it appears in BOTH input sketches
# (h ≤ kth(A∪B) ≤ kth(A), kth(B) — membership is decidable), so
# |A∩B| ≈ (n_common / k) · |A∪B|.  Same md5-prefix hash and estimator
# arithmetic as ``kmv_distinct`` — bit-exactly SQL-reproducible.
# ---------------------------------------------------------------------------

def kmv_merge_sets(
    a_hashes: np.ndarray, b_hashes: np.ndarray, k: int
) -> tuple[int, int, int, int]:
    """From the two sets' (already k-truncated, sorted-unique) sketch
    hash arrays: (n_common, m_union, union_est, inter_est)."""
    import math

    un = np.unique(np.concatenate([a_hashes, b_hashes]))[:k]
    m = len(un)
    common = un[np.isin(un, a_hashes) & np.isin(un, b_hashes)]
    nc = len(common)
    if m < k:
        return nc, m, m, nc
    u_raw = (k - 1) * (TWO64 / float(un[-1]))
    return nc, m, int(math.floor(u_raw)), int(math.floor(nc * u_raw / k))
