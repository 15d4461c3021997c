"""S9 storage loaders: read back what the sinks wrote, as Datasets.

Reference parity: src/storage.py:103-120 (``CSVStorage.load`` →
DictReader rows) and src/storage.py:193-201 (``JSONStorage.load``).
The reference loads a single file into driver lists; here each loader
returns a streaming ``ray.data.Dataset`` over the file or directory the
matching sink produced (``pipelines/postprocess.export`` writes
partitioned directories), so readback scales with the written data
instead of the driver heap.  A missing path maps to the reference's
``return []`` as an empty Dataset rather than an error.
"""

from __future__ import annotations

import os


def _exists(path: str) -> bool:
    return os.path.exists(path)


def _empty():
    import ray.data

    return ray.data.from_items([])


def load_csv(path: str):
    """CSV readback (reference src/storage.py:103-120).  Matches the
    reference's DictReader behavior of returning [] for a missing file."""
    import ray.data

    return ray.data.read_csv(path) if _exists(path) else _empty()


def load_json(path: str):
    """JSON-lines readback (reference src/storage.py:193-201; the engine's
    JSON sink writes newline-delimited JSON via ``Dataset.write_json``)."""
    import ray.data

    return ray.data.read_json(path) if _exists(path) else _empty()


def load_parquet(path: str, columns: list[str] | None = None):
    import ray.data

    if not _exists(path):
        return _empty()
    return ray.data.read_parquet(path, columns=columns)
