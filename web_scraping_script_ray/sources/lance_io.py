"""Lance table adapter seam.

The north-star deployment stores the web/crawled tables in Lance
(take-by-key reads, versioned appends); this sandbox has no ``lance``
package (verified each round — ``import lance`` fails), so the engine
uses the bucketed-parquet layout as a faithful stand-in (same
partition-by-``url_hash % n_buckets`` contract; see
``synthweb.py`` bucket layout and ``stages/fetch.py`` bucket scans).

This module is the single seam: if the environment ever provides
``lance``, ``HAVE_LANCE`` flips on and ``write_lance`` / ``read_lance`` /
``take_by_key`` activate with the same bucket contract; nothing else in
the engine changes.  The skipped-unless-available test in
``tests/test_sources.py`` probes the seam every round.
"""

from __future__ import annotations

import pyarrow as pa

try:  # pragma: no cover - not installed in this sandbox (probed each round)
    import lance

    HAVE_LANCE = True
except ImportError:
    lance = None
    HAVE_LANCE = False


def _require() -> None:
    if not HAVE_LANCE:
        raise NotImplementedError(
            "the 'lance' package is not available in this environment; "
            "the engine uses the bucketed-parquet stand-in layout instead "
            "(same bucket-by-url_hash contract)"
        )


def write_lance(table: pa.Table, uri: str, mode: str = "create"):
    """Write an Arrow table as a Lance dataset (versioned)."""
    _require()
    return lance.write_dataset(table, uri, mode=mode)


def read_lance(uri: str, columns: list[str] | None = None) -> pa.Table:
    """Read a Lance dataset to an Arrow table (column-pruned)."""
    _require()
    return lance.dataset(uri).to_table(columns=columns)


def take_by_key(uri: str, keys: list, key_col: str = "doc_id") -> pa.Table:
    """Keyed point-lookup — the Lance-native version of the engine's
    bucketed parquet ``isin`` scan (stages/fetch.py:fetch_rows_in_bucket)."""
    _require()
    ds = lance.dataset(uri)
    import pyarrow.compute as pc

    return ds.to_table(filter=pc.field(key_col).isin(keys))


# ---------------------------------------------------------------------------
# Doc-store contract, executable on BOTH backends.
#
# The functions above raise without the package; these run everywhere —
# Lance when importable, the bucketed-parquet stand-in otherwise — so the
# store contract (write → columns-pruned read → keyed take) is exercised
# end-to-end in every environment, and flipping to Lance changes the
# storage format only, never a caller.  ``backend="parquet"`` pins the
# stand-in (the always-on test path); ``backend=None`` auto-selects.
# ---------------------------------------------------------------------------


def docstore_write(
    table: pa.Table,
    uri: str,
    key_col: str = "url_hash",
    n_buckets: int = 16,
    backend: str | None = None,
) -> None:
    """Write a doc-store table keyed by an integer ``key_col``.

    Lance: one versioned dataset (its row-group/fragment pruning plays
    the bucket role).  Parquet stand-in: ``bucket=K`` directories by
    ``key % n_buckets`` — the exact layout the crawl's web/etag stores
    use, so keyed reads open only their shard."""
    import numpy as np

    if (backend or ("lance" if HAVE_LANCE else "parquet")) == "lance":
        write_lance(table, uri)
        return
    import os

    import pyarrow.parquet as pq

    keys = table.column(key_col).to_numpy(zero_copy_only=False).astype(np.uint64)
    buckets = (keys % np.uint64(n_buckets)).astype(np.int64)
    for b in np.unique(buckets):
        sub = table.filter(pa.array(buckets == b))
        d = os.path.join(uri, f"bucket={int(b)}")
        os.makedirs(d, exist_ok=True)
        pq.write_table(sub, os.path.join(d, "part-0.parquet"))


def docstore_take(
    uri: str,
    keys: list,
    key_col: str = "url_hash",
    n_buckets: int = 16,
    columns: list[str] | None = None,
    backend: str | None = None,
) -> pa.Table:
    """Keyed take: Lance filter-scan when available, else a
    bucket-pruned parquet read — only shards that can hold a requested
    key are opened."""
    import numpy as np

    if (backend or ("lance" if HAVE_LANCE else "parquet")) == "lance":
        t = take_by_key(uri, keys, key_col)
        return t.select(columns) if columns else t
    import glob
    import os

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    want = np.unique(np.asarray(keys, dtype=np.uint64))
    parts = []
    for b in np.unique((want % np.uint64(n_buckets)).astype(np.int64)):
        for f in sorted(glob.glob(os.path.join(uri, f"bucket={int(b)}", "*.parquet"))):
            t = pq.read_table(f, columns=None)
            m = pc.is_in(
                t.column(key_col), value_set=pa.array(want, t.schema.field(key_col).type)
            )
            t = t.filter(m)
            parts.append(t.select(columns) if columns else t)
    if not parts:
        raise FileNotFoundError(f"no doc-store shards under {uri}")
    return pa.concat_tables(parts)
