"""K3 document-store semantics behind a parquet-backed stand-in.

Reference parity: src/storage.py:225-257 (``MongoDBStorage``) — ``save``
coerces a single dict to a list, stamps every item with one shared
``timestamp``, and bulk-inserts (``insert_many``); ``load(query, limit)``
returns matching documents.  The sandbox has neither mongo nor the
``lance`` package (see ``lance_io.py`` for the Lance seam), so the same
contract is implemented over an append-only directory of parquet parts:

- each ``save`` is one atomic part file (tmp + rename — a retried save
  can't leave a torn part), mirroring one ``insert_many`` batch;
- the stamp clock is injectable so tests are deterministic (the
  reference uses ``datetime.now()``);
- ``load`` filters with equality predicates (the mongo-query subset the
  reference actually issues) and applies ``limit``.

At scale a collection is just a parquet/Lance directory Datasets read;
``as_dataset`` exposes exactly that.
"""

from __future__ import annotations

import os
import uuid

import pyarrow as pa
import pyarrow.parquet as pq


class DocStore:
    def __init__(self, root: str, clock=None):
        import time

        self.root = root
        self._clock = clock or (lambda: time.time())
        os.makedirs(root, exist_ok=True)

    def save(self, data) -> bool:
        """Bulk insert with a shared per-call timestamp
        (reference src/storage.py:228-252)."""
        if not isinstance(data, list):
            data = [data]
        if not data:
            return True
        stamp = float(self._clock())
        rows = [{**item, "timestamp": stamp} for item in data]
        t = pa.Table.from_pylist(rows)
        part = os.path.join(self.root, f"part-{uuid.uuid4().hex}.parquet")
        tmp = part + ".tmp"
        pq.write_table(t, tmp)
        os.replace(tmp, part)
        return True

    def _parts(self) -> list[str]:
        return sorted(
            os.path.join(self.root, f)
            for f in os.listdir(self.root)
            if f.endswith(".parquet")
        )

    def load(self, query: dict | None = None, limit: int | None = None) -> list[dict]:
        """Equality-filtered readback (reference src/storage.py:254+);
        driver-sized by contract — use ``as_dataset`` for bulk reads."""
        import pyarrow.compute as pc

        out: list[dict] = []
        for part in self._parts():
            t = pq.read_table(part)
            if query:
                for k, v in query.items():
                    if k not in t.column_names:
                        t = t.slice(0, 0)
                        break
                    t = t.filter(pc.equal(t.column(k), v))
            out.extend(t.to_pylist())
            if limit is not None and len(out) >= limit:
                return out[:limit]
        return out

    def as_dataset(self):
        import ray.data

        parts = self._parts()
        if not parts:
            return ray.data.from_items([])
        return ray.data.read_parquet(parts)
