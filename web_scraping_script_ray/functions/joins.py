"""As-of join — an operator Ray Data lacks natively (SURVEY custom-op
contract: compose map_batches + groupby; document the partitioning
assumption).

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
import ray.data


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
