"""As-of and range joins — operators Ray Data lacks natively (SURVEY
custom-op contract: compose map_batches + groupby; document the
partitioning assumption).

``asof_join`` matches each LEFT row to the RIGHT row with the greatest
``right_on`` value ≤ the left row's ``left_on`` value within the same
``by`` key (the classic time-series "latest state as of t" join,
LEFT-outer: unmatched rows keep nulls).

Physical plan: both sides are tagged and unioned, hash-partitioned on a
COARSE ``by % n_parts`` key (one shuffle moving only the projected join
columns; ~n_parts big Ray groups, not one per key), and each partition
does a vectorized numpy merge: lexsort both sides by (key, time) and
``searchsorted`` each left row into its key's right-side run.  At 10^10
rows the same plan holds — the shuffle is the unavoidable co-partition,
everything after is block-local.

Partitioning assumption: one ``by`` key's right side fits one task (same
assumption as any per-key window); salt the time dimension if a single
key's history exceeds block scale.

The right side must be unique per (by, right_on) for determinism — ties
on the as-of value are ambiguous in every engine (DuckDB's native ASOF
JOIN included); pre-reduce duplicates with ``dedup_first_wins`` or an
arg-max before joining.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..stages.rank import _nrows as _nrows_block  # size-probe task


def asof_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    by: str,
    left_on: str,
    right_on: str,
    right_vals: list[str],
    n_parts: int = 32,
) -> "ray.data.Dataset":
    """LEFT as-of join; returns the left columns + ``right_on`` (as-of
    match value) + ``right_vals``, nulls where no right row qualifies."""

    # union needs ONE schema: every batch carries left-cols + right-cols,
    # with the absent side null-padded (nulls cost nothing in Arrow)
    lschema = left.schema().base_schema
    rschema = right.schema().base_schema
    rcols = [by, right_on, *right_vals]
    lcols = lschema.names
    rtypes = {n: rschema.field(n).type for n in rcols}
    ltypes = {n: lschema.field(n).type for n in lcols}
    all_cols = lcols + [c for c in rcols if c not in lcols]

    def tag(is_left: bool):
        def fn(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            arrays = []
            for c in all_cols:
                if c in batch.column_names:
                    arrays.append(batch.column(c))
                else:
                    typ = ltypes.get(c, rtypes.get(c))
                    arrays.append(pa.nulls(n, typ))
            t = pa.Table.from_arrays(arrays, names=all_cols)
            key = batch.column(by).to_numpy(zero_copy_only=False).astype(np.int64)
            t = t.append_column("__part", pa.array(key % n_parts, pa.int64()))
            return t.append_column(
                "__is_left", pa.array(np.full(n, is_left), pa.bool_())
            )

        return fn

    # project the right side to only the join columns before the shuffle
    right_proj = right.select_columns(rcols).map_batches(
        tag(False), batch_format="pyarrow"
    )
    left_t = left.map_batches(tag(True), batch_format="pyarrow")

    def merge_part(g: pa.Table) -> pa.Table:
        is_left = g.column("__is_left").to_numpy(zero_copy_only=False)
        lt = g.filter(pa.array(is_left))
        rt = g.filter(pa.array(~is_left))
        lkey = lt.column(by).to_numpy(zero_copy_only=False).astype(np.int64)
        lon = lt.column(left_on).to_numpy(zero_copy_only=False)
        rkey = rt.column(by).to_numpy(zero_copy_only=False).astype(np.int64)
        ron = rt.column(right_on).to_numpy(zero_copy_only=False)
        # sort right by (key, time); per distinct key, one vectorized
        # searchsorted of that key's left times into its right-time run —
        # no packed composite keys (they alias for wide values)
        rorder = np.lexsort((ron, rkey))
        rkey_s, ron_s = rkey[rorder], ron[rorder]
        take_idx = np.full(len(lkey), -1, dtype=np.int64)
        if len(rkey_s) and len(lkey):
            seg_lo = np.searchsorted(rkey_s, lkey, side="left")
            seg_hi = np.searchsorted(rkey_s, lkey, side="right")
            for k in np.unique(lkey):
                lmask = lkey == k
                lo = seg_lo[lmask][0]
                hi = seg_hi[lmask][0]
                if hi <= lo:
                    continue  # key has no right rows
                pos = lo + np.searchsorted(ron_s[lo:hi], lon[lmask], side="right")
                ok = pos > lo
                idx = np.where(ok, rorder[np.maximum(pos - 1, lo)], -1)
                take_idx[lmask] = idx
        pad_cols = [c for c in all_cols if c not in lcols]
        out = lt.drop_columns(["__part", "__is_left", *pad_cols])
        idx_arr = pa.array(
            [int(i) if i >= 0 else None for i in take_idx], pa.int64()
        )
        for cname in (right_on, *right_vals):
            col = rt.column(cname).take(idx_arr)
            out = out.append_column(f"asof_{cname}", col)
        return out

    both = left_t.union(right_proj)
    return both.groupby("__part").map_groups(merge_part, batch_format="pyarrow")


def range_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    left_on: str,
    right_lo: str,
    right_hi: str,
    right_vals: list[str],
    by: tuple[str, str] | str | None = None,
    cell_width: float = 1.0,
    closed: str = "both",
    n_parts: int = 32,
) -> "ray.data.Dataset":
    """INNER range join: each LEFT row (point ``left_on``) matches every
    RIGHT row (interval ``[right_lo, right_hi]``) that contains it,
    optionally also requiring an equality key (``by`` — one name shared
    by both sides, or a ``(left_name, right_name)`` pair).  ``closed``
    is ``"both"`` (lo <= x <= hi) or ``"left"`` (lo <= x < hi).

    Physical plan (the grid method — a composition Ray Data can run at
    any scale): the numeric domain is cut into ``cell_width`` cells;
    points map to their one cell, intervals REPLICATE to every cell
    they overlap, both sides co-partition on a coarse
    ``hash(cell[, by]) % n_parts`` exchange, and each partition runs
    one C++ hash join on (cell[, by]) followed by the interval filter.
    A (point, interval-copy) pair meets in exactly the point's cell, so
    no post-dedup pass is needed.

    Scale notes: the exchange moves points once and each interval
    ``span/cell_width + 1`` times — pick ``cell_width`` near the typical
    interval width (replication ~2x).  False candidates (same cell, not
    contained) are filtered block-locally and never cross the wire
    again.  Skew assumption: one grid cell's rows fit one task; salt a
    hot cell by adding ``by`` (or a finer ``cell_width``) so its points
    spread over parts.

    Returns left columns + ``right_lo``/``right_hi`` + ``right_vals``
    (names must not collide with left columns).
    """
    from .hashing import mix64

    if isinstance(by, str):
        by = (by, by)
    lschema = left.schema().base_schema
    rschema = right.schema().base_schema
    lcols = lschema.names
    rcols = [right_lo, right_hi, *right_vals]
    if by is not None and by[1] not in rcols:
        rcols = [by[1], *rcols]
    clash = [c for c in rcols if c in lcols and (by is None or c != by[1])]
    if clash:
        raise ValueError(f"right columns collide with left: {clash}")
    ltypes = {n: lschema.field(n).type for n in lcols}
    rtypes = {n: rschema.field(n).type for n in rcols}
    all_cols = lcols + [c for c in rcols if c not in lcols]
    w = float(cell_width)

    def _cells(vals: np.ndarray) -> np.ndarray:
        return np.floor(vals.astype(np.float64) / w).astype(np.int64)

    def _part(cell: np.ndarray, key: np.ndarray | None) -> np.ndarray:
        u = cell.astype(np.uint64)
        if key is not None:
            u = u * np.uint64(0x9E3779B97F4A7C15) + key.astype(np.uint64)
        return (mix64(u) % np.uint64(n_parts)).astype(np.int64)

    def _pad(batch: pa.Table, n: int) -> list:
        arrays = []
        for c in all_cols:
            if c in batch.column_names:
                arrays.append(batch.column(c))
            else:
                arrays.append(pa.nulls(n, ltypes.get(c, rtypes.get(c))))
        return arrays

    def tag_left(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch.column(left_on)))
        n = batch.num_rows
        x = batch.column(left_on).to_numpy(zero_copy_only=False)
        cell = _cells(x)
        key = (
            batch.column(by[0]).to_numpy(zero_copy_only=False).astype(np.int64)
            if by
            else None
        )
        t = pa.Table.from_arrays(_pad(batch, n), names=all_cols)
        t = t.append_column("__cell", pa.array(cell, pa.int64()))
        t = t.append_column("__part", pa.array(_part(cell, key), pa.int64()))
        return t.append_column("__is_left", pa.array(np.ones(n, bool), pa.bool_()))

    def tag_right(batch: pa.Table) -> pa.Table:
        batch = batch.filter(
            pc.and_(
                pc.is_valid(batch.column(right_lo)),
                pc.is_valid(batch.column(right_hi)),
            )
        )
        lo = batch.column(right_lo).to_numpy(zero_copy_only=False)
        hi = batch.column(right_hi).to_numpy(zero_copy_only=False)
        c0, c1 = _cells(lo), _cells(hi)
        reps = np.maximum(c1 - c0 + 1, 0)
        idx = np.repeat(np.arange(len(lo), dtype=np.int64), reps)
        # intra-interval cell offset: 0,1,... per replicated row
        off = np.arange(len(idx), dtype=np.int64) - np.repeat(
            np.concatenate(([0], np.cumsum(reps)[:-1])), reps
        )
        cell = c0[idx] + off
        taken = batch.take(pa.array(idx, pa.int64()))
        key = (
            taken.column(by[1]).to_numpy(zero_copy_only=False).astype(np.int64)
            if by
            else None
        )
        t = pa.Table.from_arrays(_pad(taken, len(idx)), names=all_cols)
        t = t.append_column("__cell", pa.array(cell, pa.int64()))
        t = t.append_column("__part", pa.array(_part(cell, key), pa.int64()))
        return t.append_column(
            "__is_left", pa.array(np.zeros(len(idx), bool), pa.bool_())
        )

    out_cols = lcols + [c for c in rcols if by is None or c != by[1]]

    def merge_part(g: pa.Table) -> pa.Table:
        is_left = g.column("__is_left").to_numpy(zero_copy_only=False)
        lt = g.filter(pa.array(is_left)).select(["__cell", *lcols])
        rt = g.filter(pa.array(~is_left)).select(["__cell", *rcols])
        lkeys = ["__cell", by[0]] if by else ["__cell"]
        rkeys = ["__cell", by[1]] if by else ["__cell"]
        j = lt.join(
            rt, keys=lkeys, right_keys=rkeys, join_type="inner"
        ).combine_chunks()
        x = j.column(left_on)
        ok = pc.and_(
            pc.greater_equal(x, j.column(right_lo)),
            (pc.less_equal if closed == "both" else pc.less)(
                x, j.column(right_hi)
            ),
        )
        return j.filter(ok).select(out_cols)

    right_t = right.select_columns(rcols).map_batches(
        tag_right, batch_format="pyarrow"
    )
    left_t = left.map_batches(tag_left, batch_format="pyarrow")
    return (
        left_t.union(right_t)
        .groupby("__part")
        .map_groups(merge_part, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# Bloom-filter semi-join — the runtime-filter / sideways-information-passing
# pattern (Bloom CACM'70; Spark runtime bloom pushdown): before a fact⋈dim
# shuffle join, build a FIXED-SIZE bloom bitmap from the dim keys, OR-merge
# the per-block bitmaps (associative, m/8 bytes each), broadcast once, and
# prune the fact side map-side so only probable matches enter the exchange.
# The bloom admits false positives, never false negatives, so composing it
# with an exact confirm join yields EXACTLY the semi-join — the bloom only
# changes how many fact rows the shuffle moves (at 1% dim selectivity,
# ~99% of a 100-TB fact scan dies before the wire).
# ---------------------------------------------------------------------------


def bloom_bitmap_from_keys(keys: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """Set the k double-hashed positions of each int64 key in a packed
    uint64 bitmap of ``m_bits`` bits (``m_bits`` must be a multiple of 64)."""
    from .hashing import mix64

    bm = np.zeros(m_bits // 64, dtype=np.uint64)
    if len(keys) == 0:
        return bm
    g = mix64(keys.astype(np.uint64))
    h1 = g % np.uint64(m_bits)
    # odd step < m keeps the probe sequence cycling over all bit positions
    h2 = ((g >> np.uint64(33)) | np.uint64(1)) % np.uint64(m_bits)
    for i in range(k):
        pos = (h1 + np.uint64(i) * h2) % np.uint64(m_bits)
        np.bitwise_or.at(bm, (pos >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (pos & np.uint64(63)))
    return bm


def bloom_test_keys(keys: np.ndarray, bm: np.ndarray, k: int) -> np.ndarray:
    """Vectorized membership probe: True where ALL k bits are set."""
    from .hashing import mix64

    m_bits = len(bm) * 64
    g = mix64(keys.astype(np.uint64))
    h1 = g % np.uint64(m_bits)
    h2 = ((g >> np.uint64(33)) | np.uint64(1)) % np.uint64(m_bits)
    ok = np.ones(len(keys), dtype=bool)
    for i in range(k):
        pos = (h1 + np.uint64(i) * h2) % np.uint64(m_bits)
        bit = (bm[(pos >> np.uint64(6)).astype(np.int64)]
               >> (pos & np.uint64(63))) & np.uint64(1)
        ok &= bit.astype(bool)
    return ok


def bloom_or_merge(
    partials: "ray.data.Dataset",
    m_bits: int,
    fanin: int = 64,
    count_col: str | None = None,
) -> tuple[np.ndarray, int | None]:
    """Associative OR-merge of per-block bloom-bitmap partials WITHOUT
    materializing the O(blocks) partial set on the driver at once.

    Two-level tree reduce: a ``map_batches`` pass ORs up to ``fanin``
    partial rows per task (distributed, exchange-free), then the driver
    STREAMS the O(blocks/fanin) reduced rows one batch at a time via
    ``iter_batches`` and folds them into the final bitmap.  Driver peak
    is O(fanin · m/8) bytes inside one task and O(batch · m/8) on the
    driver, regardless of input block count — at 10^6 blocks × 1 MiB
    partials that's ~64 MiB streaming vs ~1 TB at-once for the old
    ``take_all()`` loop.  Bitwise OR is associative and commutative, so
    any reduction tree is exact; equality with the naive driver loop is
    pinned by a forced-path pytest (tests/test_dedup.py).

    ``partials`` must have a ``bm`` large_binary column (one fixed-size
    bitmap per row) and, if ``count_col`` is given, an int64 column of
    per-row key counts whose total is summed through the same tree and
    returned (for FP-rate sizing) — returns ``(merged_bitmap, total)``,
    ``total`` None when no ``count_col``."""
    words = m_bits // 64
    cols = ["bm"] + ([count_col] if count_col else [])

    def or_batch(batch: pa.Table) -> pa.Table:
        acc = np.zeros(words, dtype=np.uint64)
        for buf in batch.column("bm"):
            acc |= np.frombuffer(buf.as_py(), dtype=np.uint64)
        arrs = [pa.array([acc.tobytes()], pa.large_binary())]
        if count_col:
            n = int(
                batch.column(count_col)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
                .sum()
            )
            arrs.append(pa.array([n], pa.int64()))
        return pa.Table.from_arrays(arrs, names=cols)

    reduced = partials.select_columns(cols).map_batches(
        or_batch, batch_format="pyarrow", batch_size=fanin
    )
    merged = np.zeros(words, dtype=np.uint64)
    total = 0 if count_col else None
    for batch in reduced.iter_batches(batch_format="pyarrow", batch_size=8):
        for buf in batch["bm"]:
            merged |= np.frombuffer(buf.as_py(), dtype=np.uint64)
        if count_col:
            total += int(
                batch[count_col].to_numpy(zero_copy_only=False).sum()
            )
    return merged, total


def bloom_semi_join(
    fact: "ray.data.Dataset",
    fact_key: str,
    dim: "ray.data.Dataset",
    dim_key: str,
    m_bits: int = 1 << 20,
    k: int = 4,
    num_partitions: int = 16,
) -> "ray.data.Dataset":
    """EXACT left-semi join (fact rows whose key appears in dim) with a
    bloom pre-filter ahead of the confirming shuffle join.

    Physical plan:
      1. dim → map_batches: per-block packed bloom bitmap (one m/8-byte
         binary row per block; duplicate keys cost nothing).
      2. OR-merge the O(n_blocks) bitmaps through ``bloom_or_merge`` —
         a distributed tree reduce (fanin-64 map_batches pass) whose
         O(blocks/64) outputs the driver folds STREAMING via
         ``iter_batches``; the driver never holds the partial set
         at once.
      3. ``ray.put`` the merged bitmap once; fact → map_batches probes all
         k bits vectorized and drops non-members BEFORE any exchange.
      4. Survivors (true matches + bloom false positives, expected FP rate
         (1-e^{-kn/m})^k) go through Ray's native ``left_semi`` hash join
         against the dim keys for an exact final answer.

    The dim side is never driver-materialized as keys — only its bitmaps
    and the deduped key column (which the confirm join shuffles, small by
    the semi-join's own premise).  ``fact_key``/``dim_key`` must be int64."""

    def dim_partial(batch: pa.Table) -> pa.Table:
        keys = batch.column(dim_key).to_numpy(zero_copy_only=False).astype(np.int64)
        bm = bloom_bitmap_from_keys(keys, m_bits, k)
        return pa.Table.from_arrays(
            [pa.array([bm.tobytes()], pa.large_binary())], names=["bm"]
        )

    partials = dim.map_batches(dim_partial, batch_format="pyarrow")
    merged, _ = bloom_or_merge(partials, m_bits)
    bm_ref = ray.put(merged)

    def prefilter(batch: pa.Table) -> pa.Table:
        bm = ray.get(bm_ref) if isinstance(bm_ref, ray.ObjectRef) else bm_ref
        keys = batch.column(fact_key).to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.filter(pa.array(bloom_test_keys(keys, bm, k)))

    survivors = fact.map_batches(prefilter, batch_format="pyarrow")
    dim_keys = dim.select_columns([dim_key]).map_batches(
        lambda b: b.group_by([dim_key]).aggregate([]), batch_format="pyarrow"
    )
    return survivors.join(
        dim_keys,
        join_type="left_semi",
        num_partitions=num_partitions,
        on=(fact_key,),
        right_on=(dim_key,),
    )


def interval_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    left_lo: str,
    left_hi: str,
    right_lo: str,
    right_hi: str,
    right_vals: list[str],
    by: tuple[str, str] | str | None = None,
    cell_width: float = 1.0,
    n_parts: int = 32,
) -> "ray.data.Dataset":
    """INNER interval-OVERLAP join: every (left, right) row pair whose
    CLOSED intervals intersect (l_lo <= r_hi AND r_lo <= l_hi),
    optionally also requiring an equality key ``by``.

    Grid method, extended to interval×interval: BOTH sides replicate to
    every ``cell_width`` cell they cover and co-partition on one coarse
    ``hash(cell[, by]) % n_parts`` exchange; each partition hash-joins on
    (cell[, by]) and filters to true overlaps.  A pair that overlaps
    shares every cell of its intersection, so it would duplicate — the
    dedup is O(1) per candidate: keep the pair only in the FIRST cell of
    the intersection, ``floor(max(l_lo, r_lo)/w)``, a cell both copies
    are guaranteed to reach iff they overlap.

    Scale notes match ``range_join``: each side moves span/cell_width+1
    times — pick ``cell_width`` near the typical interval width; one
    cell[, by]'s rows must fit one task (salt hot cells with ``by`` or a
    finer width).  Returns left columns + right_lo/right_hi +
    ``right_vals`` (no name collisions allowed)."""
    from .hashing import mix64

    if isinstance(by, str):
        by = (by, by)
    lschema = left.schema().base_schema
    rschema = right.schema().base_schema
    lcols = lschema.names
    rcols = [right_lo, right_hi, *right_vals]
    if by is not None and by[1] not in rcols:
        rcols = [by[1], *rcols]
    clash = [c for c in rcols if c in lcols and (by is None or c != by[1])]
    if clash:
        raise ValueError(f"right columns collide with left: {clash}")
    ltypes = {n: lschema.field(n).type for n in lcols}
    rtypes = {n: rschema.field(n).type for n in rcols}
    all_cols = lcols + [c for c in rcols if c not in lcols]
    w = float(cell_width)

    def _cells(vals: np.ndarray) -> np.ndarray:
        return np.floor(vals.astype(np.float64) / w).astype(np.int64)

    def _part(cell: np.ndarray, key: np.ndarray | None) -> np.ndarray:
        u = cell.astype(np.uint64)
        if key is not None:
            u = u * np.uint64(0x9E3779B97F4A7C15) + key.astype(np.uint64)
        return (mix64(u) % np.uint64(n_parts)).astype(np.int64)

    def _pad(batch: pa.Table, n: int) -> list:
        return [
            batch.column(c)
            if c in batch.column_names
            else pa.nulls(n, ltypes.get(c, rtypes.get(c)))
            for c in all_cols
        ]

    def _tag(lo_col: str, hi_col: str, key_name: str | None, is_left: bool):
        def fn(batch: pa.Table) -> pa.Table:
            batch = batch.filter(
                pc.and_(
                    pc.is_valid(batch.column(lo_col)),
                    pc.is_valid(batch.column(hi_col)),
                )
            )
            lo = batch.column(lo_col).to_numpy(zero_copy_only=False)
            hi = batch.column(hi_col).to_numpy(zero_copy_only=False)
            c0, c1 = _cells(lo), _cells(hi)
            reps = np.maximum(c1 - c0 + 1, 0)
            idx = np.repeat(np.arange(len(lo), dtype=np.int64), reps)
            off = np.arange(len(idx), dtype=np.int64) - np.repeat(
                np.concatenate(([0], np.cumsum(reps)[:-1])), reps
            )
            cell = c0[idx] + off
            taken = batch.take(pa.array(idx, pa.int64()))
            key = (
                taken.column(key_name).to_numpy(zero_copy_only=False).astype(np.int64)
                if key_name
                else None
            )
            t = pa.Table.from_arrays(_pad(taken, len(idx)), names=all_cols)
            t = t.append_column("__cell", pa.array(cell, pa.int64()))
            t = t.append_column("__part", pa.array(_part(cell, key), pa.int64()))
            return t.append_column(
                "__is_left", pa.array(np.full(len(idx), is_left), pa.bool_())
            )

        return fn

    out_cols = lcols + [c for c in rcols if by is None or c != by[1]]

    def merge_part(g: pa.Table) -> pa.Table:
        is_left = g.column("__is_left").to_numpy(zero_copy_only=False)
        lt = g.filter(pa.array(is_left)).select(["__cell", *lcols])
        rt = g.filter(pa.array(~is_left)).select(["__cell", *rcols])
        lkeys = ["__cell", by[0]] if by else ["__cell"]
        rkeys = ["__cell", by[1]] if by else ["__cell"]
        j = lt.join(
            rt, keys=lkeys, right_keys=rkeys, join_type="inner"
        ).combine_chunks()
        llo, lhi = j.column(left_lo), j.column(left_hi)
        rlo, rhi = j.column(right_lo), j.column(right_hi)
        overlap = pc.and_(pc.less_equal(llo, rhi), pc.less_equal(rlo, lhi))
        start = np.floor(
            np.maximum(
                llo.to_numpy(zero_copy_only=False).astype(np.float64),
                rlo.to_numpy(zero_copy_only=False).astype(np.float64),
            )
            / w
        ).astype(np.int64)
        first_cell = pa.array(
            start == j.column("__cell").to_numpy(zero_copy_only=False)
        )
        return j.filter(pc.and_(overlap, first_cell)).select(out_cols)

    left_t = left.map_batches(
        _tag(left_lo, left_hi, by[0] if by else None, True), batch_format="pyarrow"
    )
    right_t = right.select_columns(rcols).map_batches(
        _tag(right_lo, right_hi, by[1] if by else None, False),
        batch_format="pyarrow",
    )
    return (
        left_t.union(right_t)
        .groupby("__part")
        .map_groups(merge_part, batch_format="pyarrow")
    )


def skew_join(
    fact: "ray.data.Dataset",
    fact_key: str,
    dim: "ray.data.Dataset",
    dim_key: str,
    dim_cols: list[str],
    hot_min_count: int = 1_000_000,
    hot_capacity: int = 4096,
    num_partitions: int = 16,
    force_plan: str | None = None,
) -> "ray.data.Dataset":
    """Skew-aware INNER equi-join: hot fact keys bypass the shuffle.

    A plain hash join puts EVERY row of a hot key in one partition — on a
    web-scale fact table one straggler task gets 10^8+ rows while the rest
    idle.  This operator splits the key space instead:

      1. detect hot keys with per-block Misra-Gries summaries
         (``sketch._mg_compress_table``): O(blocks x capacity) rows reach
         the single merge, never the raw counts.  Detection is
         APPROXIMATE (MG estimates undercount by <= n/capacity) but only
         affects ROUTING — a borderline-hot key that slips through just
         rides the shuffle join; the result is exact either way.
      2. the dim rows for hot keys (<= ``hot_capacity`` of them — dim is
         unique per key by the dimension-table premise) broadcast ONCE
         via ``ray.put``; hot fact rows join map-side with one
         ``index_in`` gather per batch — those rows never shuffle.
      3. cold fact rows go through Ray's native hash join, now skew-free.
      4. union of the two legs.

    The fact table is scanned twice (two streaming filters) — at 100 TB
    that is two cheap column-pruned passes instead of one straggler-bound
    exchange; fuse into one pass with a router stage if scan cost ever
    dominates.  ``force_plan`` pins ``"plain"`` or ``"split"`` for the
    forced-path equality tests.  ``fact_key``/``dim_key`` must be int64.
    """
    import ray

    from .sketch import _mg_compress_table

    def partial(batch: pa.Table) -> pa.Table:
        out = batch.select([fact_key]).group_by([fact_key]).aggregate(
            [([], "count_all")]
        )
        comp = _mg_compress_table(out, fact_key, "count_all", hot_capacity)
        # one null-key row carries the block's TRUE row count, so the merge
        # can tell whether the compressed counts are exact (no decrement /
        # truncation fired) — that is what licenses skipping an empty cold leg
        total = pa.table(
            {
                fact_key: pa.array([None], comp.column(fact_key).type),
                "__c": pa.array([batch.num_rows], pa.int64()),
            }
        )
        return pa.concat_tables([comp, total])

    fact_cols = list(fact.schema().names)
    out_cols = fact_cols + dim_cols

    def plain_join():
        return fact.join(
            dim,
            join_type="inner",
            num_partitions=num_partitions,
            on=(fact_key,),
            right_on=(dim_key,),
        ).select_columns(out_cols)

    if force_plan == "plain":
        return plain_join()

    summaries = fact.map_batches(partial, batch_format="pyarrow").take_all()
    cold_known_empty = False
    if summaries:
        merged = (
            pa.Table.from_pylist(summaries)
            .group_by([fact_key])
            .aggregate([("__c", "sum")])
        )
        is_total = pc.is_null(merged.column(fact_key))
        keyed = merged.filter(pc.invert(is_total))
        est = keyed.column("__c_sum").to_numpy(zero_copy_only=False)
        keys = keyed.column(fact_key).to_numpy(zero_copy_only=False).astype(np.int64)
        hot = keys[est >= hot_min_count]
        total_rows = int(
            pc.sum(merged.filter(is_total).column("__c_sum")).as_py() or 0
        )
        # exact regime (no MG decrement/truncation anywhere) AND every
        # surviving key is hot → the cold leg is provably empty; skip its
        # join entirely (Arrow joins reject an all-empty side)
        cold_known_empty = int(est.sum()) == total_rows and hot.size == len(keys)
    else:
        hot = np.array([], dtype=np.int64)
    if force_plan != "split" and hot.size == 0:
        return plain_join()

    hot_arr = pa.array(np.sort(hot), pa.int64())

    # dim rows for hot keys: bounded by hot_capacity rows (dim unique per
    # key by the dimension-table premise), driver-safe
    dim_schema = dim.schema().base_schema
    dim_hot_parts = dim.map_batches(
        lambda b: b.filter(pc.is_in(b.column(dim_key), value_set=hot_arr)),
        batch_format="pyarrow",
    ).take_all()
    dim_hot = (
        pa.Table.from_pylist(dim_hot_parts, schema=dim_schema)
        if dim_hot_parts
        else dim_schema.empty_table()
    )
    lookup_ref = ray.put(dim_hot.combine_chunks())

    def hot_leg(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch.column(fact_key), value_set=hot_arr)
        b = batch.filter(mask)
        names = list(b.column_names) + dim_cols
        look = ray.get(lookup_ref) if isinstance(lookup_ref, ray.ObjectRef) else lookup_ref
        at = pc.index_in(
            b.column(fact_key), value_set=look.column(dim_key).combine_chunks()
        )
        matched = pc.is_valid(at)
        b = b.filter(matched)
        at = at.filter(matched)
        cols = [b.column(c) for c in b.column_names]
        for c in dim_cols:
            cols.append(look.column(c).take(at))
        return pa.Table.from_arrays(cols, names=names)

    def cold_leg(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.invert(pc.is_in(batch.column(fact_key), value_set=hot_arr))
        )

    hot_out = fact.map_batches(hot_leg, batch_format="pyarrow").select_columns(
        out_cols
    )
    if cold_known_empty:
        return hot_out
    cold = fact.map_batches(cold_leg, batch_format="pyarrow").join(
        dim,
        join_type="inner",
        num_partitions=num_partitions,
        on=(fact_key,),
        right_on=(dim_key,),
    )
    return hot_out.union(cold.select_columns(out_cols))


def hamming1_self_join(
    ds: "ray.data.Dataset",
    col: str,
    n_parts: int = 64,
) -> "ray.data.Dataset":
    """All pairs of EQUAL-LENGTH strings at Hamming distance exactly 1,
    via position-deletion blocking — the fuzzy-key join (near-identical
    URLs, titles, product names) done without an all-pairs comparison.

    Each string explodes into L blocking keys ``(pos, s without s[pos])``;
    two strings differ in exactly one position iff they share exactly ONE
    such key (deleting the differing position equalizes them; deleting any
    other position preserves the difference), so the blocked join emits
    every true pair EXACTLY once — no dedup pass.  Keys co-partition by
    ``hash(pos, del) % n_parts`` in one coarse exchange; each partition
    self-joins its bucket with one Arrow hash join.  Cost is the standard
    L× blow-up of deletion blocking; at web scale cap L or shard long
    strings by prefix.  Emits (pos, a, b) with a < b.
    """

    def explode(batch: pa.Table) -> pa.Table:
        import zlib

        vals = batch.column(col).to_pylist()
        parts, poss, dels, orig = [], [], [], []
        for s in vals:
            for i in range(len(s)):
                d = s[:i] + s[i + 1 :]
                # crc32 is process-stable (Python's hash() is NOT — its
                # per-process seed would split one key across partitions)
                parts.append((i * 1000003 + zlib.crc32(d.encode())) % n_parts)
                poss.append(i)
                dels.append(d)
                orig.append(s)
        return pa.Table.from_arrays(
            [
                pa.array(parts, pa.int64()),
                pa.array(poss, pa.int64()),
                pa.array(dels, pa.string()),
                pa.array(orig, pa.string()),
            ],
            names=["part", "pos", "del_key", col],
        )

    def pairs_in_part(g: pa.Table) -> pa.Table:
        lt = g.select(["pos", "del_key", col]).rename_columns(["pos", "del_key", "a"])
        rt = g.select(["pos", "del_key", col]).rename_columns(["pos", "del_key", "b"])
        j = lt.join(rt, keys=["pos", "del_key"], join_type="inner").combine_chunks()
        keep = pc.less(j.column("a"), j.column("b"))
        return j.filter(keep).select(["pos", "a", "b"])

    return (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby("part")
        .map_groups(pairs_in_part, batch_format="pyarrow")
    )


def edit1_self_join(
    ds: "ray.data.Dataset",
    col: str,
    n_parts: int = 64,
) -> "ray.data.Dataset":
    """All DISTINCT-string pairs at Levenshtein distance EXACTLY 1 —
    ``hamming1_self_join`` widened to insertions/deletions, still with
    no all-pairs comparison and no dedup pass.

    Distance-1 splits into two disjoint classes, each blocked exactly:

    * substitution (equal length): the position-deletion keys
      ``(pos, s without s[pos], len)`` — two same-length strings differ
      in exactly one position iff they share exactly ONE such key.
    * indel (length differs by 1): the longer string's deletion variant
      equals the shorter string.  Variants are emitted only at the
      FIRST position of each run of equal characters — ``del_i(s) ==
      del_j(s)`` iff i and j sit in one run, so first-of-run variants
      are pairwise distinct and each true pair is emitted exactly once
      (joined against the shorter strings riding as identity rows).

    Both classes co-partition on ``crc32`` of the joined key in ONE
    coarse exchange; each partition runs two local Arrow hash joins.
    Cost is deletion blocking's standard L× blow-up (L = string
    length); at web scale shard long strings by prefix or cap L.
    Emits (a, b, edit_op) with a < b, edit_op in {'sub', 'indel'}.
    """

    def explode(batch: pa.Table) -> pa.Table:
        import zlib

        vals = batch.column(col).to_pylist()
        parts: list[int] = []
        kinds: list[int] = []
        poss: list[int] = []
        keys: list[str] = []
        orig: list[str] = []

        def emit(part: int, kind: int, pos: int, key: str, s: str) -> None:
            parts.append(part)
            kinds.append(kind)
            poss.append(pos)
            keys.append(key)
            orig.append(s)

        for s in vals:
            emit(zlib.crc32(s.encode()) % n_parts, 2, -1, s, s)  # identity
            for i in range(len(s)):
                d = s[:i] + s[i + 1 :]
                dh = zlib.crc32(d.encode())
                # substitution key: (pos, deletion, implicit same-length)
                emit((i * 1000003 + dh) % n_parts, 0, i, d, s)
                # indel variant: first-of-run deletions only
                if i == 0 or s[i] != s[i - 1]:
                    emit(dh % n_parts, 1, -1, d, s)
        return pa.Table.from_arrays(
            [
                pa.array(parts, pa.int64()),
                pa.array(kinds, pa.int8()),
                pa.array(poss, pa.int64()),
                pa.array(keys, pa.string()),
                pa.array(orig, pa.string()),
            ],
            names=["part", "kind", "pos", "key", "s"],
        )

    def pairs_in_part(g: pa.Table) -> pa.Table:
        kind = g.column("kind")
        sub = g.filter(pc.equal(kind, pa.scalar(0, pa.int8())))
        var = g.filter(pc.equal(kind, pa.scalar(1, pa.int8())))
        ident = g.filter(pc.equal(kind, pa.scalar(2, pa.int8())))
        out_a: list[str] = []
        out_b: list[str] = []
        out_op: list[str] = []
        # substitutions: same (pos, key), same length by construction of
        # the deletion (len(s) == len(key) + 1 on both sides)
        lt = sub.select(["pos", "key", "s"]).rename_columns(["pos", "key", "a"])
        rt = sub.select(["pos", "key", "s"]).rename_columns(["pos", "key", "b"])
        j = lt.join(rt, keys=["pos", "key"], join_type="inner").combine_chunks()
        j = j.filter(pc.less(j.column("a"), j.column("b")))
        out_a.extend(j.column("a").to_pylist())
        out_b.extend(j.column("b").to_pylist())
        out_op.extend(["sub"] * j.num_rows)
        # indels: longer's variant == shorter identity
        lv = var.select(["key", "s"]).rename_columns(["key", "longer"])
        ri = ident.select(["key", "s"]).rename_columns(["key", "shorter"])
        ji = lv.join(ri, keys=["key"], join_type="inner").combine_chunks()
        # variant == shorter string itself; longer != shorter always
        lo = ji.column("longer").to_pylist()
        sh = ji.column("shorter").to_pylist()
        for x, y in zip(lo, sh):
            a, b = (x, y) if x < y else (y, x)
            out_a.append(a)
            out_b.append(b)
            out_op.append("indel")
        return pa.table(
            {
                "a": pa.array(out_a, pa.string()),
                "b": pa.array(out_b, pa.string()),
                "edit_op": pa.array(out_op, pa.string()),
            }
        )

    return (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby("part")
        .map_groups(pairs_in_part, batch_format="pyarrow")
    )


def basket_pairs(
    ds: "ray.data.Dataset",
    basket_col: str,
    item_col: str,
    min_support: int = 2,
    n_parts: int = 64,
) -> "ray.data.Dataset":
    """Frequent co-occurring item PAIRS across baskets (the first level of
    market-basket / co-occurrence mining): (item_u, item_v, n_baskets)
    for every unordered item pair appearing together in ≥ ``min_support``
    baskets.

    Plan: one coarse hash exchange co-locates each basket's rows
    (``basket % n_parts``), the group task dedups (basket, item) and
    generates each basket's C(m,2) pairs with pure index arithmetic
    (np.repeat over per-basket run lengths — no Python loop over rows),
    then pair counts fold map-side per block before a tiny grouped merge
    (``grouped_sum_count``).  Baskets are small and bounded in practice
    (a web corpus's per-page entities, an order's line items), so the
    quadratic blow-up is per-basket-local; the exchange carries only
    (pair, partial_count) rows."""
    from .agg import grouped_sum_count

    def add_part(batch: pa.Table) -> pa.Table:
        b = batch.column(basket_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "part": pa.array(b % n_parts, pa.int64()),
                "basket": pa.array(b, pa.int64()),
                "item": batch.column(item_col).cast(pa.int64()),
            }
        )

    def gen_pairs(g: pa.Table) -> pa.Table:
        t = g.select(["basket", "item"]).group_by(["basket", "item"]).aggregate([])
        b = t.column("basket").to_numpy(zero_copy_only=False)
        it = t.column("item").to_numpy(zero_copy_only=False)
        order = np.lexsort((it, b))
        b, it = b[order], it[order]
        n = len(b)
        if n == 0:
            return pa.table(
                {
                    "item_u": pa.array([], pa.int64()),
                    "item_v": pa.array([], pa.int64()),
                }
            )
        starts = np.flatnonzero(np.r_[True, b[1:] != b[:-1]])
        lens = np.diff(np.r_[starts, n])
        run_start = np.repeat(starts, lens)          # basket start per row
        pos_in_run = np.arange(n) - run_start        # 0..m-1 within basket
        run_len = np.repeat(lens, lens)
        cnt = run_len - 1 - pos_in_run               # pairs this row opens
        first = np.repeat(np.arange(n), cnt)
        offs = np.zeros(n + 1, np.int64)
        np.cumsum(cnt, out=offs[1:])
        within = np.arange(offs[-1]) - np.repeat(offs[:-1], cnt)
        second = first + 1 + within
        return pa.table(
            {
                "item_u": pa.array(it[first], pa.int64()),
                "item_v": pa.array(it[second], pa.int64()),
            }
        )

    pairs = (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(gen_pairs, batch_format="pyarrow")
    )
    counted = grouped_sum_count(
        pairs, ["item_u", "item_v"], [], {}, count_name="n_baskets", coarse=n_parts
    )

    def supported(b: pa.Table) -> pa.Table:
        return b.filter(
            pc.greater_equal(b.column("n_baskets"), pa.scalar(min_support, pa.int64()))
        )

    return counted.map_batches(supported, batch_format="pyarrow")


@ray.remote
def _concat_sort_by_key(block_refs: list, key: str) -> pa.Table:
    """Concat + sort blocks by a key, off-driver — the broadcast side of
    ``unique_key_lookup_join`` (shared zero-copy from the object store
    by every probe task).  combine_chunks guarantees single-chunk
    columns, so each probe task's ``to_numpy`` of the key column is a
    zero-copy view, not a per-batch copy."""
    live = [b for b in ray.get(list(block_refs)) if b.num_rows]
    if not live:
        return pa.table({})  # callers guard n == 0 before dispatching
    return pa.concat_tables(live).sort_by(key).combine_chunks()


def unique_key_lookup_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    left_on: str,
    right_on: str,
    limit: int = 5_000_000,
    num_partitions: int = 16,
    force_plan: str | None = None,
) -> "ray.data.Dataset":
    """Size-selected INNER equi-join for a KEY-UNIQUE right side (a
    dimension table or an aggregate): if the right side is within
    ``limit`` rows it broadcasts as ONE sorted table in the object
    store and every left batch probes it with searchsorted — zero
    shuffle, no aggregator-actor startup; larger right sides fall back
    to Ray's native hash-shuffle join.  Output rows carry all left
    columns plus the right side's non-key columns (same multiset of
    rows as the native join; physical row order differs, as with any
    shuffle plan)."""
    import ray.data as rd

    refs = right.to_arrow_refs()
    n = sum(ray.get([_nrows_block.remote(r) for r in refs]))
    plan = force_plan or ("bcast" if n <= limit else "native")
    if n == 0:
        # empty right side: inner join = zero rows.  Neither physical
        # plan can run (the probe has no key array; the native join
        # chokes on schema-less empty blocks), so emit an explicit
        # empty result carrying the joined schema (left + right
        # non-key columns).
        rschema = right.schema().base_schema

        def empty_out(b: pa.Table) -> pa.Table:
            for name in rschema.names:
                if name == right_on:
                    continue
                b = b.append_column(
                    name, pa.nulls(b.num_rows, rschema.field(name).type)
                )
            return b.slice(0, 0)

        return left.map_batches(empty_out, batch_format="pyarrow")
    if plan == "native":
        return left.join(
            rd.from_arrow_refs(refs),
            join_type="inner",
            num_partitions=num_partitions,
            on=(left_on,),
            right_on=(right_on,),
        )
    sref = _concat_sort_by_key.remote(refs, right_on)

    def probe(b: pa.Table) -> pa.Table:
        rt = ray.get(sref)
        keys = rt.column(right_on).to_numpy(zero_copy_only=False)
        lk = b.column(left_on).to_numpy(zero_copy_only=False)
        pos = np.minimum(np.searchsorted(keys, lk), len(keys) - 1)
        hit = keys[pos] == lk
        if not hit.all():
            b = b.filter(pa.array(hit))
            pos = pos[hit]
        idx = pa.array(pos)
        for name in rt.column_names:
            if name == right_on:
                continue
            col = rt.column(name)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            b = b.append_column(name, col.take(idx))
        return b

    return left.map_batches(probe, batch_format="pyarrow")
