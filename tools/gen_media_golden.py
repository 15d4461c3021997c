"""Generate the media_features golden table — the INDEPENDENT oracle for
``q_media_features`` (same pattern as crawl_bfs's sequential-oracle
golden: a from-first-principles recomputation committed as parquet, with
the driver's SQL oracle just reading it back joined to ``documents``).

The fake codec is fully deterministic from the doc_id, so the golden is
recomputed here WITHOUT importing the engine's stages — the published
formulas are reimplemented directly (synthesize_payload's blake2b stream,
ImageDecoder._decode_fake's hash-derived dimensions, the md5[:10]
content hash).  Any drift between engine and formula breaks the
correctness gate loudly.

    python tools/gen_media_golden.py [max_doc_id]   # default 4999 (sf0.1)
"""

from __future__ import annotations

import hashlib
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

FIXTURES = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "tests", "fixtures")


def payload_for(media_ref: str, min_bytes: int = 64, max_bytes: int = 4096) -> bytes:
    h = hashlib.blake2b(media_ref.encode("utf-8"), digest_size=8).digest()
    size = min_bytes + int.from_bytes(h[:4], "big") % (max_bytes - min_bytes)
    out = bytearray()
    counter = 0
    while len(out) < size:
        out += hashlib.blake2b(h + counter.to_bytes(4, "big"), digest_size=32).digest()
        counter += 1
    return bytes(out[:size])


def main() -> int:
    hi = int(sys.argv[1]) if len(sys.argv) > 1 else 4999
    ids, refs, hashes, sizes, ws, hs = [], [], [], [], [], []
    for i in range(hi + 1):
        ref = f"http://cdn0.example/img/{i:07d}.jpg"
        p = payload_for(ref)
        d = hashlib.blake2b(p, digest_size=16).digest()
        ids.append(str(i))
        refs.append(ref)
        hashes.append(hashlib.md5(p).hexdigest()[:10])
        sizes.append(len(p))
        ws.append(16 + d[0] * 8)
        hs.append(16 + d[1] * 8)
    t = pa.Table.from_arrays(
        [
            pa.array(ids, pa.string()),
            pa.array(refs, pa.string()),
            pa.array(hashes, pa.string()),
            pa.array(sizes, pa.int64()),
            pa.array(ws, pa.int32()),
            pa.array(hs, pa.int32()),
        ],
        names=["doc_id", "media_ref", "content_hash", "nbytes", "width", "height"],
    )
    out = os.path.join(FIXTURES, "media_features_golden.parquet")
    pq.write_table(t, out)
    print(f"wrote {out}: {t.num_rows} rows")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
