"""SQLite sink — the reference's K4 storage backend, re-expressed for a
streaming Dataset.

The reference appends each result dict to one SQLite database with a
dynamically-created table (reference: src/storage.py:90-150).  SQLite is a
single-writer file format, so the distributed-correct shape is:

- ``write_sqlite``: the DRIVER streams ``iter_batches`` (bounded memory,
  never a full materialization) into ONE database over a single
  connection — semantically identical to the reference's one-file store;
  right whenever the result is a query/report-sized table.
- ``write_sqlite_partitioned``: one ``.sqlite`` file PER BLOCK, written
  inside ``map_batches`` tasks (no driver bottleneck) — the scale path;
  readers attach/iterate the partition files.  Mirrors the engine's
  one-parquet-file-per-bucket layout.

Schema mapping follows the reference's TEXT/REAL/INTEGER inference:
Arrow ints → INTEGER, floats → REAL, everything else → TEXT via str().
"""

from __future__ import annotations

import os
import sqlite3

import pyarrow as pa


def _sql_type(t: pa.DataType) -> str:
    if pa.types.is_integer(t) or pa.types.is_boolean(t):
        return "INTEGER"
    if pa.types.is_floating(t):
        return "REAL"
    return "TEXT"


def _create(con: sqlite3.Connection, table: str, schema: pa.Schema) -> None:
    cols = ", ".join(f'"{f.name}" {_sql_type(f.type)}' for f in schema)
    con.execute(f'CREATE TABLE IF NOT EXISTS "{table}" ({cols})')


def _rows(batch: pa.Table):
    cols = []
    for c in batch.columns:
        t = c.type
        if pa.types.is_integer(t) or pa.types.is_floating(t):
            cols.append(c.to_pylist())
        elif pa.types.is_boolean(t):
            cols.append([None if v is None else int(v) for v in c.to_pylist()])
        else:
            cols.append(
                [None if v is None else str(v) for v in c.to_pylist()]
            )
    return zip(*cols)


def write_table_sqlite(batch: pa.Table, path: str, table: str = "results") -> None:
    """Append one Arrow table to a SQLite db (creates table on first use)."""
    con = sqlite3.connect(path)
    try:
        _create(con, table, batch.schema)
        ph = ", ".join("?" for _ in batch.schema)
        con.executemany(f'INSERT INTO "{table}" VALUES ({ph})', _rows(batch))
        con.commit()
    finally:
        con.close()


def write_sqlite(ds, path: str, table: str = "results", batch_size: int = 4096) -> int:
    """Stream a Dataset into ONE SQLite database on the driver (single
    writer, reference semantics).  Returns rows written.  Bounded memory:
    one batch at a time via ``iter_batches`` — never ``take_all``."""
    if os.path.exists(path):
        os.remove(path)
    n = 0
    con = sqlite3.connect(path)
    try:
        created = False
        for batch in ds.iter_batches(batch_size=batch_size, batch_format="pyarrow"):
            if not created:
                _create(con, table, batch.schema)
                created = True
            ph = ", ".join("?" for _ in batch.schema)
            con.executemany(f'INSERT INTO "{table}" VALUES ({ph})', _rows(batch))
            n += batch.num_rows
        con.commit()
    finally:
        con.close()
    return n


def read_sqlite(path: str, table: str = "results", limit: int | None = None):
    """Storage loader (reference: src/storage.py:259-282,395-421
    ``load(limit)``): SQLite table → Ray Dataset.  The LIMIT is pushed
    into the SQL so only the requested rows ever leave the database."""
    import ray.data

    con = sqlite3.connect(path)
    try:
        q = f'SELECT * FROM "{table}"'
        if limit is not None:
            q += f" LIMIT {int(limit)}"
        cur = con.execute(q)
        names = [d[0] for d in cur.description]
        rows = cur.fetchall()
    finally:
        con.close()
    cols = list(zip(*rows)) if rows else [[] for _ in names]
    t = pa.Table.from_arrays([pa.array(list(c)) for c in cols], names=names)
    return ray.data.from_arrow(t)


def write_sqlite_partitioned(ds, out_dir: str, table: str = "results") -> None:
    """Scale path: one SQLite file per block, written by the map tasks —
    no driver bottleneck, resumable per partition.

    Retry-safe and collision-free: each file is named by the Ray task id
    (stable across re-executions of the same task, unique across tasks —
    falls back to a content hash of the whole block outside Ray), written
    to a temp path and atomically renamed, so a task retried after a
    partial or complete write REPLACES its file instead of appending
    duplicate rows."""
    os.makedirs(out_dir, exist_ok=True)

    def write_block(batch: pa.Table) -> pa.Table:
        if batch.num_rows:
            import hashlib

            try:
                import ray as _ray

                name = _ray.get_runtime_context().get_task_id()
            except Exception:
                name = None
            if not name:
                h = hashlib.blake2b(digest_size=8)
                for c in batch.columns:
                    for buf in c.combine_chunks().buffers():
                        if buf is not None:
                            h.update(buf)
                name = h.hexdigest()
            final = os.path.join(out_dir, f"part-{name}.sqlite")
            tmp = final + ".tmp"
            if os.path.exists(tmp):
                os.remove(tmp)
            write_table_sqlite(batch, tmp, table)
            os.replace(tmp, final)  # atomic; retry overwrites, never appends
        return batch.slice(0, 0)

    ds.map_batches(write_block, batch_format="pyarrow").materialize()
