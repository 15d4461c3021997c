"""Map-side partial aggregation (combiner) for grouped sums/counts.

Ray Data's ``groupby(...).aggregate(...)`` shuffles the RAW rows into a
range-partitioned sort before reducing — at 100 TB that is an all-to-all
exchange of the whole table.  For algebraic aggregates (sum/count) the
combine can run inside ``map_batches`` first: each block collapses to one
row per distinct key (Arrow's C++ ``Table.group_by`` hash aggregation),
and only those partials move through the shuffle — rows exchanged drop
from O(table) to O(blocks × distinct-keys).

``grouped_sum_count`` is the engine's standard plan for every
sum/count-by-key query (A4 per-page counts, reference src/cli.py:206-208,
and the TPC-H-ish aggregates).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Sum


def _partial(batch: pa.Table, keys: list[str], sum_cols: list[str]) -> pa.Table:
    aggs = [(c, "sum") for c in sum_cols] + [([], "count_all")]
    out = batch.group_by(keys).aggregate(aggs)
    # arrow names: <col>_sum, count_all → stable partial names
    ren = {f"{c}_sum": f"__p_{c}" for c in sum_cols}
    ren["count_all"] = "__p_n"
    return out.rename_columns([ren.get(n, n) for n in out.column_names])


def grouped_sum_count(
    ds: "ray.data.Dataset",
    keys: list[str],
    sum_cols: list[str],
    out_names: dict[str, str],
    count_name: str = "n_rows",
    coarse: int | None = None,
) -> "ray.data.Dataset":
    """sum(col) + count(*) grouped by ``keys``, with map-side combining.

    ``out_names`` maps each sum col to its output column name; the final
    row count column is ``count_name``.  Only algebraic aggregates —
    partial sums re-sum exactly (the engine's money columns are integer
    cents for this reason).

    ``coarse=N``: merge the partials inside an N-way hash-partitioned
    ``map_groups`` instead of a Ray groupby keyed on the key itself —
    Ray's aggregate pays per-distinct-key overhead (measured ~2 s for
    3.4k keys, ~13 s for 27k, ~3.5 s for 15k custkeys), while N coarse
    groups cost N tasks.  Same exchange volume (only partial rows move),
    same result.  DEFAULT (coarse=None) is the 32-way coarse path: it is
    never slower (≤32 tasks beats per-key overhead at every cardinality
    measured) and key cardinality is rarely known at plan time; pass
    ``coarse=0`` to force the legacy per-key Ray aggregate."""
    if coarse is None:
        coarse = 32
    partials = ds.map_batches(
        lambda b: _partial(b, keys, sum_cols), batch_format="pyarrow"
    )
    if coarse:
        import numpy as np

        from .hashing import token_hashes

        def add_part(b: pa.Table) -> pa.Table:
            # hash ALL key columns (joined with an unlikely separator) so
            # partition spread never depends on key-list ordering
            cols = [pc.cast(b.column(kcol), pa.string()) for kcol in keys]
            s = (
                cols[0]
                if len(cols) == 1
                else pc.binary_join_element_wise(*cols, "\x1f")
            )
            if isinstance(s, pa.ChunkedArray):
                s = s.combine_chunks()
            part = (token_hashes(s) % np.uint64(coarse)).astype(np.int64)
            return b.append_column("__part", pa.array(part, pa.int64()))

        def merge_part(g: pa.Table) -> pa.Table:
            aggs = [(f"__p_{c}", "sum") for c in sum_cols] + [("__p_n", "sum")]
            out = g.drop_columns(["__part"]).group_by(keys).aggregate(aggs)
            ren = {f"__p_{c}_sum": out_names[c] for c in sum_cols}
            ren["__p_n_sum"] = count_name
            return out.rename_columns(
                [ren.get(n, n) for n in out.column_names]
            )

        return (
            partials.map_batches(add_part, batch_format="pyarrow")
            .groupby("__part")
            .map_groups(merge_part, batch_format="pyarrow")
        )
    agg = partials.groupby(keys).aggregate(
        *[Sum(f"__p_{c}") for c in sum_cols], Sum("__p_n")
    )

    def rename(batch: pa.Table) -> pa.Table:
        mapping = {f"sum(__p_{c})": out_names[c] for c in sum_cols}
        mapping["sum(__p_n)"] = count_name
        return batch.rename_columns(
            [mapping.get(n, n) for n in batch.column_names]
        )

    return agg.map_batches(rename, batch_format="pyarrow")


def salted_grouped_sum(
    ds: "ray.data.Dataset",
    key: str,
    sum_cols: list[str],
    out_names: dict[str, str],
    count_name: str = "n_rows",
    n_salts: int = 16,
    hot_frac: float = 0.02,
    hot_min: int = 64,
) -> "ray.data.Dataset":
    """Hot-key-safe grouped sum/count: stage 1 groups by ``(key, salt)``
    so a key holding 20%+ of all rows spreads over ``n_salts`` reducers;
    stage 2 merges the salted partials with a tiny groupby on ``key``
    alone (north_rule "salted repartitioning of hot domains").

    The salt is **adaptive**: only block-local heavy hitters (keys with
    ≥ ``hot_frac`` of the block's rows, min ``hot_min``) get a non-zero
    salt.  Salting every key would multiply the map-side partials'
    cardinality by ``n_salts`` — defeating the combiner and making BOTH
    shuffles O(keys × salts) — while the salt only matters for keys big
    enough to skew a reducer, and a globally-hot key is hot in (nearly)
    every block.  Cold keys keep salt 0, so partial cardinality stays
    ≈ distinct-keys and stage 2's input is barely larger than the final
    result.  The final sums are salt-invariant either way.
    """
    import numpy as np

    def add_salt(batch: pa.Table) -> pa.Table:
        enc = pc.dictionary_encode(batch.column(key))
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        idx = enc.indices.to_numpy(zero_copy_only=False)
        counts = np.bincount(idx, minlength=len(enc.dictionary))
        hot = counts >= max(hot_min, int(batch.num_rows * hot_frac))
        salt = np.where(
            hot[idx], np.arange(batch.num_rows, dtype=np.int64) % n_salts, 0
        )
        return batch.append_column("__salt", pa.array(salt, pa.int64()))

    stage1 = grouped_sum_count(
        ds.map_batches(add_salt, batch_format="pyarrow"),
        [key, "__salt"],
        sum_cols,
        {c: f"__s_{c}" for c in sum_cols},
        count_name="__s_n",
    )
    stage2 = stage1.groupby(key).aggregate(
        *[Sum(f"__s_{c}") for c in sum_cols], Sum("__s_n")
    )

    def rename(batch: pa.Table) -> pa.Table:
        mapping = {f"sum(__s_{c})": out_names[c] for c in sum_cols}
        mapping["sum(__s_n)"] = count_name
        return batch.rename_columns(
            [mapping.get(n, n) for n in batch.column_names]
        )

    return stage2.map_batches(rename, batch_format="pyarrow")


def radix_quantiles(
    ds: "ray.data.Dataset",
    key_col: str,
    val_col: str,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
    bits_per_pass: int = 16,
) -> pa.Table:
    """EXACT grouped quantiles over an UNBOUNDED int64 domain in a fixed
    number of column-pruned passes — the plan the bounded-cardinality
    histogram (``q_quantiles``) and the weighted median
    (``q_group_stats``) defer to when the value domain outgrows an
    in-memory histogram.

    Radix bisection (the distributed "binary search by rank" — BlinkDB /
    MapReduce-selection style, but with 2^bits-way fan-out so 64-bit
    values resolve in ``64/bits`` passes): each pass histograms the next
    ``bits_per_pass`` bits of the (order-preserved, sign-flipped) value
    for every (key, quantile) still being narrowed, as map-side partials
    that merge in one tiny groupby — raw rows NEVER shuffle, and memory
    is O(2^bits · keys · quantiles) regardless of value cardinality.
    Pass 1 is prefix-free and doubles as the per-key COUNT pass.

    Rank rule pinned to the repo standard: 0-based ``floor(q·(n-1))``
    ("lower"), identical to ``SQL_QUANTILES`` — so the SAME DuckDB
    oracle checks both this plan and the histogram plan.

    ``ds`` is scanned ``64/bits_per_pass`` times (4 at the default);
    pass a cheap-to-recompute (column-pruned) or materialized dataset.
    Returns a driver-side ``pa.Table`` (one row per key) — quantile
    output is O(keys), driver-sized by definition.
    """
    import numpy as np

    assert 64 % bits_per_pass == 0
    n_buckets = 1 << bits_per_pass
    mask = np.uint64(n_buckets - 1)
    shifts = [np.uint64(s) for s in range(64 - bits_per_pass, -1, -bits_per_pass)]
    sign_flip = np.uint64(1) << np.uint64(63)

    def _u(batch: pa.Table) -> np.ndarray:
        v = batch.column(val_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return v.view(np.uint64) ^ sign_flip  # order-preserving uint64

    # ---- pass 1: per-key histogram of the top bits (no prefix filter) ----
    def pass1(batch: pa.Table) -> pa.Table:
        b = (_u(batch) >> shifts[0]).astype(np.int64)
        t = pa.table({key_col: batch.column(key_col), "__b": pa.array(b, pa.int64())})
        out = t.group_by([key_col, "__b"]).aggregate([([], "count_all")])
        return out.rename_columns([key_col, "__b", "__n"])

    def _fetch_arrow(merged_ds) -> pa.Table:
        """Driver fetch of a merged histogram WITHOUT per-row Python
        dicts — the result is bounded (O(keys·quantiles·2^bits) rows)
        but that is up to ~10^6 rows, where ``take_all``'s row-dict
        materialization costs 50× the whole distributed pass."""
        blocks = ray.get(merged_ds.to_arrow_refs())
        tbls = [t for t in blocks if t.num_rows] or blocks[:1]
        return pa.concat_tables(tbls)

    def _coarse_merge(parts, int_cols: list[str], n_part: int = 32):
        """Merge per-block histogram partials through an N-way coarse
        hash exchange + Arrow ``group_by`` inside ``map_groups``, NOT a
        Ray groupby keyed on (key, q, bucket): Ray's aggregate pays
        per-distinct-key overhead (measured 19 s for the 88k distinct
        buckets of one sf0.1 pass, vs 0.3 s map + 0.4 s fetch), while N
        coarse groups cost N tasks with one C++ hash-agg each.  Exactly
        the ``grouped_sum_count(coarse=...)`` pattern; only partial rows
        (O(blocks · active-buckets)) move either way."""
        import numpy as np

        from .hashing import token_hashes

        group_cols = [key_col, *int_cols]

        def add_part(b: pa.Table) -> pa.Table:
            kc = pc.cast(b.column(key_col), pa.string())
            if isinstance(kc, pa.ChunkedArray):
                kc = kc.combine_chunks()
            h = token_hashes(kc)
            for i, c in enumerate(int_cols):
                iv = b.column(c).to_numpy(zero_copy_only=False).astype(np.uint64)
                h = h ^ (iv * np.uint64(0x9E3779B97F4A7C15 + 2 * i))
            part = (h % np.uint64(n_part)).astype(np.int64)
            return b.append_column("__part", pa.array(part, pa.int64()))

        def merge(g: pa.Table) -> pa.Table:
            out = (
                g.drop_columns(["__part"])
                .group_by(group_cols)
                .aggregate([("__n", "sum")])
            )
            return out.rename_columns([*group_cols, "__n"])

        return (
            parts.map_batches(add_part, batch_format="pyarrow")
            .groupby("__part")
            .map_groups(merge, batch_format="pyarrow")
        )

    merged = _fetch_arrow(
        _coarse_merge(ds.map_batches(pass1, batch_format="pyarrow"), ["__b"])
    )  # O(keys · 2^bits) bounded rows
    hist: dict = {}
    for k, b, n in zip(
        merged.column(key_col).to_pylist(),
        merged.column("__b").to_numpy(zero_copy_only=False),
        merged.column("__n").to_numpy(zero_copy_only=False),
    ):
        hist.setdefault(k, {})[int(b)] = int(n)
    keys = sorted(hist)
    # state per (key, q): accumulated prefix, remaining 1-based rank
    state: dict = {}
    totals: dict = {}
    for k in keys:
        n = sum(hist[k].values())
        totals[k] = n
        for qi, q in enumerate(qs):
            state[(k, qi)] = [np.uint64(0), int(q * (n - 1)) + 1]

    def _narrow(hist_kq: dict) -> None:
        """Advance each (key, q) one pass using its merged histogram."""
        for (k, qi), (prefix, rank) in list(state.items()):
            h = hist_kq.get((k, qi), {})
            cum = 0
            for b in sorted(h):
                if cum + h[b] >= rank:
                    state[(k, qi)] = [
                        (prefix << np.uint64(bits_per_pass)) | np.uint64(b),
                        rank - cum,
                    ]
                    break
                cum += h[b]

    _narrow({(k, qi): hist[k] for k in keys for qi in range(len(qs))})

    # ---- passes 2..: histogram the next bits under each (key, q) prefix ----
    for shift in shifts[1:]:
        hs = shift + np.uint64(bits_per_pass)
        # snapshot prefixes into plain arrays for the task closure
        plan = [(k, qi, state[(k, qi)][0]) for k in keys for qi in range(len(qs))]

        def passn(batch: pa.Table, _plan=plan, _shift=shift, _hs=hs) -> pa.Table:
            u = _u(batch)
            kc = batch.column(key_col)
            out_k, out_q, out_b, out_n = [], [], [], []
            for k, qi, prefix in _plan:
                m = pc.equal(kc, k).to_numpy(zero_copy_only=False)
                m &= (u >> _hs) == prefix
                if not m.any():
                    continue
                bk = ((u[m] >> _shift) & mask).astype(np.int64)
                ub, cn = np.unique(bk, return_counts=True)
                out_k.extend([k] * len(ub))
                out_q.extend([qi] * len(ub))
                out_b.extend(ub.tolist())
                out_n.extend(cn.tolist())
            return pa.table(
                {
                    key_col: pa.array(out_k, kc.type),
                    "__q": pa.array(out_q, pa.int64()),
                    "__b": pa.array(out_b, pa.int64()),
                    "__n": pa.array(out_n, pa.int64()),
                }
            )

        rows = _fetch_arrow(
            _coarse_merge(
                ds.map_batches(passn, batch_format="pyarrow"), ["__q", "__b"]
            )
        )
        hist_kq: dict = {}
        for k, qi, b, n in zip(
            rows.column(key_col).to_pylist(),
            rows.column("__q").to_numpy(zero_copy_only=False),
            rows.column("__b").to_numpy(zero_copy_only=False),
            rows.column("__n").to_numpy(zero_copy_only=False),
        ):
            hist_kq.setdefault((k, int(qi)), {})[int(b)] = int(n)
        _narrow(hist_kq)

    cols: dict = {key_col: keys, "n_rows": [totals[k] for k in keys]}
    for qi, _q in enumerate(qs):
        cols[f"q{qi}"] = [
            int(np.uint64(state[(k, qi)][0] ^ sign_flip).astype(np.int64))
            for k in keys
        ]
    return pa.table(cols)


def rollup_sum_count(
    ds: "ray.data.Dataset",
    keys: list[str],
    sum_cols: list[str],
    out_names: dict[str, str],
    count_name: str = "n_rows",
) -> "ray.data.Dataset":
    """GROUP BY ROLLUP(keys): the finest grouping plus every prefix
    super-aggregate up to the grand total, rolled-up key columns null
    (ANSI ROLLUP semantics; key columns must themselves be null-free —
    with real nulls a grouping-id column would be needed to
    disambiguate, as in every SQL engine).

    ONE map-side partial pass feeds all levels: the raw table collapses
    per block (``_partial``), ONE small groupby produces the finest
    aggregate, and the super-aggregates re-reduce those finest rows —
    O(distinct finest keys), not another scan.  The expansion runs in a
    single task (the finest aggregate is the shuffle's own output, small
    by construction); if the finest grain were web-scale-cardinality,
    roll up level-by-level instead (each level re-aggregates the one
    below — same algebra, still never rescans the table)."""
    finest = grouped_sum_count(ds, keys, sum_cols, out_names, count_name)
    in_sums = [out_names[c] for c in sum_cols] + [count_name]

    def expand(t: pa.Table) -> pa.Table:
        levels = [t]
        for j in range(len(keys) - 1, -1, -1):
            kept = keys[:j]
            if kept:
                lv = t.group_by(kept).aggregate([(c, "sum") for c in in_sums])
                lv = lv.rename_columns(
                    [
                        n[: -len("_sum")] if n.endswith("_sum") else n
                        for n in lv.column_names
                    ]
                )
            else:
                arrays = [
                    pa.array([pc.sum(t.column(c)).as_py()], t.schema.field(c).type)
                    for c in in_sums
                ]
                lv = pa.Table.from_arrays(arrays, names=in_sums)
            for k in keys[j:]:
                lv = lv.append_column(k, pa.nulls(lv.num_rows, t.schema.field(k).type))
            levels.append(lv.select(t.column_names))
        return pa.concat_tables(levels)

    return finest.repartition(1).map_batches(
        expand, batch_format="pyarrow", batch_size=None
    )
