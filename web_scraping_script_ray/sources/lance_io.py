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
