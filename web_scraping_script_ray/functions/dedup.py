"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

The reference deduplicates twice — post-hoc row dedup on a column
(reference: src/main.py:197-206) and content-addressed media files
(reference: src/media_downloader.py:181-188).  A training-data pipeline at
100 TB needs the full family; each is expressed Ray-Data-first:

- **exact**: 128-bit content hash (md5) added per batch, then the engine's
  sort-based first-wins dedup (one range-partition shuffle + a narrow
  block pass, ``stages.rank.dedup_first_wins``) — no per-group Python.
- **MinHash+LSH**: shingle → 128-perm minhash signature (vectorized
  ``(a·s + b) mod p`` matrix min) → banded bucket keys → ``groupby(band)``
  emits candidate pairs → signature-estimate verify.  The only shuffle
  moves ``(band_key, doc_id)`` pairs, never documents.
- **SimHash**: 64-bit sign-of-weighted-sum fingerprint; near-dup blocking
  on 4×16-bit bands (any Hamming-≤3 pair shares a band by pigeonhole),
  verify by popcount.
- **n-gram Jaccard**: exact verify kernel over shingle sets, used as the
  re-rank stage after LSH candidate generation.
- **embedding cosine**: normalized-matrix near-dup; exact path broadcasts
  the (small) normalized matrix via ``ray.put`` and each batch does one
  numpy matmul; scale path buckets by random-hyperplane LSH first.

Pair outputs are canonicalized (``id_a < id_b``) and deduplicated; the
"keep" policy is min-id connected component (union-find over the pair
list — pairs are tiny relative to docs; document-scale path is iterative
label propagation over the pairs Dataset).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..stages.rank import dedup_first_wins

_P = np.uint64((1 << 61) - 1)  # Mersenne prime modulus for minhash perms


# ---------------------------------------------------------------------------
# Exact dedup.
# ---------------------------------------------------------------------------

def add_md5(batch: pa.Table, text_col: str = "text", out_col: str = "fp_md5") -> pa.Table:
    md5 = hashlib.md5
    vals = [md5(t.encode("utf-8")).hexdigest() for t in batch.column(text_col).to_pylist()]
    return batch.append_column(out_col, pa.array(vals, pa.string()))


def exact_dedup(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    order_cols: list[str] | None = None,
) -> "ray.data.Dataset":
    """First-wins exact dedup on content: md5(text) key + the engine's
    sort-based dedup (A3 semantics, reference: src/main.py:197-206);
    128-bit key makes hash collisions a non-issue at 10^10 docs."""
    ds = ds.map_batches(
        lambda b: add_md5(b, text_col), batch_format="pyarrow"
    )
    return dedup_first_wins(ds, "fp_md5", order_cols or [])


# ---------------------------------------------------------------------------
# Shingling + MinHash.
# ---------------------------------------------------------------------------

def shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """uint64 hashes of the k-word shingles of ``text`` (lowercased)."""
    toks = text.lower().split()
    if len(toks) < k:
        shingles = [" ".join(toks)] if toks else []
    else:
        shingles = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    b2b = hashlib.blake2b
    return np.unique(
        np.fromiter(
            (
                int.from_bytes(b2b(s.encode("utf-8"), digest_size=8).digest(), "big")
                for s in shingles
            ),
            dtype=np.uint64,
            count=len(shingles),
        )
    )


def ngram_jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    """Exact Jaccard similarity of the k-word shingle sets."""
    a, b = shingle_hashes(text_a, k), shingle_hashes(text_b, k)
    if len(a) == 0 and len(b) == 0:
        return 1.0
    inter = len(np.intersect1d(a, b, assume_unique=True))
    return inter / (len(a) + len(b) - inter)


class MinHasher:
    """Actor-pool callable: draws the (a_i, b_i) permutation parameters once
    per actor from a fixed seed, then per batch computes signatures and
    banded LSH bucket keys.

    Emits ``sig`` (list<uint64>, len ``num_perm``) and ``bands``
    (list<uint64>, len ``n_bands``) where
    ``bands[j] = blake2b(j, sig[j·r:(j+1)·r])`` — docs agreeing on any
    band land in the same LSH bucket.
    """

    def __init__(
        self,
        text_col: str = "text",
        k: int = 3,
        num_perm: int = 128,
        n_bands: int = 16,
        seed: int = 0x31AB,
    ):
        assert num_perm % n_bands == 0
        self.text_col = text_col
        self.k = k
        self.num_perm = num_perm
        self.n_bands = n_bands
        self.rows_per_band = num_perm // n_bands
        rng = np.random.Generator(np.random.PCG64(seed))
        self.a = (rng.integers(1, _P, size=num_perm, dtype=np.uint64) | np.uint64(1))
        self.b = rng.integers(0, _P, size=num_perm, dtype=np.uint64)

    def signature(self, text: str) -> np.ndarray:
        s = shingle_hashes(text, self.k)
        if len(s) == 0:
            return np.zeros(self.num_perm, dtype=np.uint64)
        # (num_perm, n_shingles) — integer ops mod 2^64 then mod P is fine
        # for minhash purposes (uniform-ish, deterministic).
        vals = (self.a[:, None] * s[None, :] + self.b[:, None]) % _P
        return vals.min(axis=1)

    def band_keys(self, sig: np.ndarray) -> np.ndarray:
        r = self.rows_per_band
        b2b = hashlib.blake2b
        return np.fromiter(
            (
                int.from_bytes(
                    b2b(
                        bytes([j]) + sig[j * r : (j + 1) * r].tobytes(),
                        digest_size=8,
                    ).digest(),
                    "big",
                )
                for j in range(self.n_bands)
            ),
            dtype=np.uint64,
            count=self.n_bands,
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = [self.signature(t) for t in batch.column(self.text_col).to_pylist()]
        bands = [self.band_keys(s) for s in sigs]
        batch = batch.append_column(
            "sig", pa.array([s.tolist() for s in sigs], pa.list_(pa.uint64()))
        )
        return batch.append_column(
            "bands", pa.array([b.tolist() for b in bands], pa.list_(pa.uint64()))
        )


def sig_jaccard_estimate(sa: np.ndarray, sb: np.ndarray) -> float:
    return float((sa == sb).mean()) if len(sa) else 0.0


def _explode_bands(batch: pa.Table, id_col: str) -> pa.Table:
    """(id, sig, bands) → one row per (band_key, id, sig)."""
    bands = batch.column("bands")
    if isinstance(bands, pa.ChunkedArray):
        bands = bands.combine_chunks()
    flat = pc.list_flatten(bands)
    parents = pc.list_parent_indices(bands)
    return pa.Table.from_arrays(
        [
            flat,
            batch.column(id_col).take(parents),
            batch.column("sig").take(parents),
        ],
        names=["band_key", id_col, "sig"],
    )


def _pairs_from_band_group(
    g: pa.Table, id_col: str, threshold: float, max_bucket: int = 256
) -> pa.Table:
    """Candidate pairs within one LSH bucket, verified by signature
    Jaccard estimate.  Oversized buckets (degenerate content, e.g. empty
    docs) are truncated at ``max_bucket`` — logged via the ``truncated``
    column rather than silently dropped."""
    ids = g.column(id_col).to_pylist()
    sigs = [np.asarray(s, dtype=np.uint64) for s in g.column("sig").to_pylist()]
    order = np.argsort(ids)
    truncated = len(ids) > max_bucket
    order = order[:max_bucket]
    out_a, out_b, out_j = [], [], []
    for x in range(len(order)):
        for y in range(x + 1, len(order)):
            i, j = order[x], order[y]
            est = sig_jaccard_estimate(sigs[i], sigs[j])
            if est >= threshold:
                out_a.append(ids[i])
                out_b.append(ids[j])
                out_j.append(round(est, 6))
    return pa.Table.from_arrays(
        [
            pa.array(out_a, pa.int64()),
            pa.array(out_b, pa.int64()),
            pa.array(out_j, pa.float64()),
            pa.array([truncated] * len(out_a), pa.bool_()),
        ],
        names=["id_a", "id_b", "est_jaccard", "truncated"],
    )


def minhash_lsh_pairs(
    ds: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.7,
    num_perm: int = 128,
    n_bands: int = 16,
    k: int = 3,
    concurrency: tuple[int, int] | int = (1, 16),
) -> "ray.data.Dataset":
    """Near-duplicate pairs via MinHash+LSH: returns
    ``(id_a, id_b, est_jaccard)`` with ``id_a < id_b``, deduplicated.

    Shuffle cost: one groupby on ``(band_key)`` over (band_key, id, sig)
    rows — ``n_bands`` light rows per doc; documents never move.
    """
    signed = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs=dict(
            text_col=text_col, k=k, num_perm=num_perm, n_bands=n_bands
        ),
        batch_format="pyarrow",
        concurrency=concurrency,
    ).select_columns([id_col, "sig", "bands"])
    exploded = signed.map_batches(
        lambda b: _explode_bands(b, id_col), batch_format="pyarrow"
    )
    pairs = exploded.groupby("band_key").map_groups(
        lambda g: _pairs_from_band_group(g, id_col, threshold),
        batch_format="pyarrow",
    )
    # same pair can surface from multiple bands → dedup on (id_a, id_b)
    pairs = pairs.map_batches(
        lambda b: b.append_column(
            "pair_key",
            pa.array(
                (
                    b.column("id_a").to_numpy(zero_copy_only=False).astype(np.uint64)
                    << np.uint64(32)
                )
                | b.column("id_b").to_numpy(zero_copy_only=False).astype(np.uint64),
                pa.uint64(),
            ),
        ),
        batch_format="pyarrow",
    )
    return dedup_first_wins(pairs, "pair_key", []).select_columns(
        ["id_a", "id_b", "est_jaccard"]
    )


def keep_mask_from_pairs(pairs: pa.Table, all_ids: np.ndarray) -> pa.Table:
    """Union-find over the (small) pair list → per-id keep decision
    (canonical = min id of each connected component).  Returns
    ``(id, keep, canonical_id)``.  Pairs are O(dups) ≪ O(docs); at
    extreme scale swap for label propagation over the pairs Dataset."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for a, b in zip(pairs.column("id_a").to_pylist(), pairs.column("id_b").to_pylist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    canon = np.array([find(int(i)) for i in all_ids], dtype=np.int64)
    keep = canon == all_ids
    return pa.Table.from_arrays(
        [
            pa.array(all_ids, pa.int64()),
            pa.array(keep),
            pa.array(canon, pa.int64()),
        ],
        names=["id", "keep", "canonical_id"],
    )


# ---------------------------------------------------------------------------
# SimHash.
# ---------------------------------------------------------------------------

def simhash64(text: str) -> int:
    """64-bit SimHash over whitespace unigrams (term-frequency weighted)."""
    toks = text.lower().split()
    if not toks:
        return 0
    b2b = hashlib.blake2b
    hs = np.fromiter(
        (
            int.from_bytes(b2b(t.encode("utf-8"), digest_size=8).digest(), "big")
            for t in toks
        ),
        dtype=np.uint64,
        count=len(toks),
    )
    bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
        np.int64
    )
    acc = (2 * bits - 1).sum(axis=0)
    return int(
        np.bitwise_or.reduce(
            (acc > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)
        )
    )


def simhash_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    vals = [simhash64(t) for t in batch.column(text_col).to_pylist()]
    return batch.append_column("simhash", pa.array(vals, pa.uint64()))


def _explode_simhash_bands(batch: pa.Table, id_col: str) -> pa.Table:
    """simhash → 4 rows of (band_key, id, simhash); Hamming-≤3 pairs share
    at least one of the 4 16-bit bands (pigeonhole)."""
    sh = batch.column("simhash").to_numpy(zero_copy_only=False).astype(np.uint64)
    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    n = len(sh)
    band_keys = np.empty(4 * n, dtype=np.uint64)
    for j in range(4):
        chunk = (sh >> np.uint64(16 * j)) & np.uint64(0xFFFF)
        band_keys[j * n : (j + 1) * n] = chunk | (np.uint64(j) << np.uint64(60))
    return pa.Table.from_arrays(
        [
            pa.array(band_keys, pa.uint64()),
            pa.array(np.tile(ids, 4), pa.int64()),
            pa.array(np.tile(sh, 4), pa.uint64()),
        ],
        names=["band_key", id_col, "simhash"],
    )


def _simhash_pairs_group(g: pa.Table, id_col: str, max_dist: int) -> pa.Table:
    ids = np.asarray(g.column(id_col).to_pylist(), dtype=np.int64)
    sh = np.asarray(g.column("simhash").to_pylist(), dtype=np.uint64)
    order = np.argsort(ids)
    ids, sh = ids[order], sh[order]
    out_a, out_b, out_d = [], [], []
    for x in range(len(ids)):
        xor = sh[x] ^ sh[x + 1 :]
        dist = np.array([bin(int(v)).count("1") for v in xor])
        hit = np.where(dist <= max_dist)[0]
        for h in hit:
            out_a.append(int(ids[x]))
            out_b.append(int(ids[x + 1 + h]))
            out_d.append(int(dist[h]))
    return pa.Table.from_arrays(
        [
            pa.array(out_a, pa.int64()),
            pa.array(out_b, pa.int64()),
            pa.array(out_d, pa.int64()),
        ],
        names=["id_a", "id_b", "hamming"],
    )


def simhash_pairs(
    ds: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    max_dist: int = 3,
) -> "ray.data.Dataset":
    """Near-duplicate pairs with SimHash Hamming distance ≤ ``max_dist``
    (≤3 guaranteed complete by 4-band blocking)."""
    hashed = ds.map_batches(
        lambda b: simhash_batch(b, text_col), batch_format="pyarrow"
    ).select_columns([id_col, "simhash"])
    exploded = hashed.map_batches(
        lambda b: _explode_simhash_bands(b, id_col), batch_format="pyarrow"
    )
    pairs = exploded.groupby("band_key").map_groups(
        lambda g: _simhash_pairs_group(g, id_col, max_dist),
        batch_format="pyarrow",
    )
    pairs = pairs.map_batches(
        lambda b: b.append_column(
            "pair_key",
            pa.array(
                (
                    b.column("id_a").to_numpy(zero_copy_only=False).astype(np.uint64)
                    << np.uint64(32)
                )
                | b.column("id_b").to_numpy(zero_copy_only=False).astype(np.uint64),
                pa.uint64(),
            ),
        ),
        batch_format="pyarrow",
    )
    return dedup_first_wins(pairs, "pair_key", []).select_columns(
        ["id_a", "id_b", "hamming"]
    )


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup.
# ---------------------------------------------------------------------------

def _normalize(mat: np.ndarray) -> np.ndarray:
    mat = np.asarray(mat, dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def embedding_neardup_pairs(
    ds: "ray.data.Dataset",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 0,
    seed: int = 7,
) -> "ray.data.Dataset":
    """Pairs with cosine ≥ threshold.

    ``n_planes=0`` → exact: the normalized matrix (ids + float64 vectors)
    is built once with a streaming pass, put in the object store, and every
    batch does one ``(B,d)·(d,N)`` matmul against it — vectorized, no
    shuffle; O(N·d) broadcast memory.  Right up to ~10^7 vectors.

    ``n_planes=k`` → scale path: random-hyperplane LSH signature buckets
    (groupby) then exact cosine within buckets only; recall < 1 by design
    (documented approximation).
    """
    if n_planes:
        rng = np.random.Generator(np.random.PCG64(seed))
        planes_ref = None  # created lazily below once dim is known

        def bucketize(batch: pa.Table) -> pa.Table:
            nonlocal planes_ref
            mat = _normalize(np.stack(batch.column(vec_col).to_numpy(zero_copy_only=False)))
            if planes_ref is None:
                planes_ref = rng.standard_normal((mat.shape[1], n_planes))
            sig = (mat @ planes_ref > 0).astype(np.uint64)
            key = np.zeros(len(mat), dtype=np.uint64)
            for j in range(n_planes):
                key = (key << np.uint64(1)) | sig[:, j]
            return pa.Table.from_arrays(
                [batch.column(id_col), pa.array(key, pa.uint64()), batch.column(vec_col)],
                names=[id_col, "bucket", vec_col],
            )

        def pairs_in_bucket(g: pa.Table) -> pa.Table:
            ids = np.asarray(g.column(id_col).to_pylist(), dtype=np.int64)
            mat = _normalize(np.stack([np.asarray(v) for v in g.column(vec_col).to_pylist()]))
            order = np.argsort(ids)
            ids, mat = ids[order], mat[order]
            sims = mat @ mat.T
            ia, ib = np.where(np.triu(sims >= threshold, k=1))
            return pa.Table.from_arrays(
                [
                    pa.array(ids[ia], pa.int64()),
                    pa.array(ids[ib], pa.int64()),
                    pa.array(sims[ia, ib], pa.float64()),
                ],
                names=["id_a", "id_b", "cos"],
            )

        return (
            ds.map_batches(bucketize, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(pairs_in_bucket, batch_format="pyarrow")
        )

    # exact path: broadcast normalized matrix, one matmul per batch
    all_tbl = ds.select_columns([id_col, vec_col]).to_arrow_refs()
    tables = ray.get(all_tbl)
    ids_all = np.concatenate(
        [t.column(id_col).to_numpy(zero_copy_only=False) for t in tables if t.num_rows]
    )
    mat_all = _normalize(
        np.concatenate(
            [
                np.stack(t.column(vec_col).to_numpy(zero_copy_only=False))
                for t in tables
                if t.num_rows
            ]
        )
    )
    order = np.argsort(ids_all)
    ids_all, mat_all = ids_all[order], mat_all[order]
    broadcast = ray.put((ids_all, mat_all))

    def pairs_vs_all(batch: pa.Table) -> pa.Table:
        ids_b = batch.column(id_col).to_numpy(zero_copy_only=False)
        mat_b = _normalize(np.stack(batch.column(vec_col).to_numpy(zero_copy_only=False)))
        ids_g, mat_g = ray.get(broadcast)
        sims = mat_b @ mat_g.T
        # emit only id_b < id_g side to halve work & dedup naturally
        mask = (sims >= threshold) & (ids_b[:, None] < ids_g[None, :])
        ia, ib = np.where(mask)
        return pa.Table.from_arrays(
            [
                pa.array(ids_b[ia], pa.int64()),
                pa.array(ids_g[ib], pa.int64()),
                pa.array(sims[ia, ib], pa.float64()),
            ],
            names=["id_a", "id_b", "cos"],
        )

    return ds.map_batches(pairs_vs_all, batch_format="pyarrow")
