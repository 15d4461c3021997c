"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

The reference deduplicates twice — post-hoc row dedup on a column
(reference: src/main.py:197-206) and content-addressed media files
(reference: src/media_downloader.py:181-188).  A training-data pipeline at
100 TB needs the full family; each is expressed Ray-Data-first:

- **exact**: 128-bit content hash (md5) added per batch, then the engine's
  sort-based first-wins dedup (one range-partition shuffle + a narrow
  block pass, ``stages.rank.dedup_first_wins``) — no per-group Python.
- **MinHash+LSH**: shingle → 128-perm minhash signature (fully vectorized:
  Arrow tokenization, dictionary-hashed tokens, numpy polynomial shingle
  mix, segmented ``minimum.reduceat`` signature minima) → banded bucket
  keys → ``groupby(band)`` emits candidate pairs → signature-estimate
  verify.  The only shuffle moves ``(band_key, doc_id, sig)`` rows, never
  documents.
- **SimHash**: 64-bit sign-of-summed-bits fingerprint (vectorized via
  ``unpackbits`` + segmented sums); near-dup blocking on 4×16-bit bands
  (any Hamming-≤3 pair shares a band by pigeonhole), verify by table-driven
  popcount.
- **n-gram Jaccard**: exact verify kernel over shingle sets, used as the
  re-rank stage after LSH candidate generation.
- **embedding cosine**: normalized-matrix near-dup; exact path builds the
  broadcast matrix in a REMOTE task (the driver never holds rows) and each
  batch does one numpy matmul; above ``auto_lsh_rows`` it auto-switches to
  the random-hyperplane LSH bucket path.

Pair outputs are canonicalized (``id_a < id_b``) and deduplicated on the
composite ``(id_a, id_b)`` key — ids of any width, no 32-bit packing that
could alias distinct pairs.  The "keep" policy is min-id connected
component (union-find over the pair list — pairs are tiny relative to
docs; document-scale path is iterative label propagation over the pairs
Dataset).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..stages.rank import dedup_first_wins
from .hashing import band_salt, flat_tokens, mix64, popcount64, shingle_hash_flat, token_hashes

_B = np.uint64(0x100000001B3)


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
    """Sorted-unique uint64 hashes of the k-word shingles of ``text``
    (lowercased) — single-document convenience over the batch kernel."""
    flat, offsets = flat_tokens(pa.array([text]))
    sh, _ = shingle_hash_flat(token_hashes(flat), offsets, k)
    return np.unique(sh)


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
    banded LSH bucket keys — all vectorized, no per-row Python.

    Each permutation is ``π_i(s) = a_i·s + b_i (mod 2^64)`` with odd
    ``a_i`` — a bijection on uint64, the standard multiply-shift minhash
    family (no per-element mod-prime division on the hot path).

    Emits ``sig`` (list<uint64>, len ``num_perm``) and ``bands``
    (list<uint64>, len ``n_bands``) where band j's key mixes rows
    ``sig[j·r:(j+1)·r]`` with a per-band salt — docs agreeing on any band
    land in the same LSH bucket.
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
        self.a = rng.integers(0, np.iinfo(np.uint64).max, size=num_perm, dtype=np.uint64) | np.uint64(1)
        self.b = rng.integers(0, np.iinfo(np.uint64).max, size=num_perm, dtype=np.uint64)
        self._salts = band_salt(n_bands)

    def signatures_matrix(self, texts: "pa.Array | pa.ChunkedArray") -> np.ndarray:
        """(n_rows, num_perm) uint64 signature matrix for a string column.
        Rows with no shingles (empty text) get all-zero signatures."""
        flat, offsets = flat_tokens(texts)
        return self.signatures_from_hashes(token_hashes(flat), offsets)

    def signatures_from_hashes(self, th: np.ndarray, offsets: np.ndarray) -> np.ndarray:
        """Signature matrix from pre-computed flat token hashes — lets the
        crawl parse tokenize ONCE and share tokens across kernels."""
        sh, soff = shingle_hash_flat(th, offsets, self.k)
        n = len(offsets) - 1
        if len(sh) == 0:
            return np.zeros((n, self.num_perm), np.uint64)
        # per-PERMUTATION segmented min: 128 vectorized passes over the
        # flat shingle array (one multiply-add + one reduceat each)
        # instead of a Python iteration per document — ~2× faster than
        # the per-doc matrix min at 10k docs/batch, and the advantage
        # grows with docs-per-batch (loop count is num_perm, not n_docs).
        # The permuted array is padded with one MAX sentinel so a
        # trailing empty doc's start (== len) stays a VALID reduceat
        # index — clipping it instead would silently truncate the last
        # non-empty doc's segment (hypothesis-caught).  Empty segments
        # (interior or trailing) land on an arbitrary element / the
        # sentinel and are patched to 0 via the mask.
        starts = soff[:-1]
        empty = np.diff(soff) == 0
        sig_t = np.empty((self.num_perm, n), np.uint64)
        v = np.empty(len(sh) + 1, np.uint64)
        v[-1] = np.uint64(0xFFFFFFFFFFFFFFFF)
        for p in range(self.num_perm):
            np.multiply(self.a[p], sh, out=v[:-1])
            v[:-1] += self.b[p]
            sig_t[p] = np.minimum.reduceat(v, starts)
        sig = np.ascontiguousarray(sig_t.T)
        if empty.any():
            sig[empty] = 0
        return sig

    def band_keys_matrix(self, sig: np.ndarray) -> np.ndarray:
        """(n_rows, n_bands) uint64 LSH bucket keys from a signature matrix."""
        n = sig.shape[0]
        r = self.rows_per_band
        s3 = sig.reshape(n, self.n_bands, r)
        acc = np.zeros((n, self.n_bands), np.uint64)
        for i in range(r):
            acc = acc * _B + s3[:, :, i]
        acc ^= self._salts[None, :]
        return mix64(acc)

    # single-row conveniences (tests / ad-hoc use)
    def signature(self, text: str) -> np.ndarray:
        return self.signatures_matrix(pa.array([text]))[0]

    def band_keys(self, sig: np.ndarray) -> np.ndarray:
        return self.band_keys_matrix(np.asarray(sig, np.uint64)[None, :])[0]

    def __call__(self, batch: pa.Table) -> pa.Table:
        sig = self.signatures_matrix(batch.column(self.text_col))
        bands = self.band_keys_matrix(sig)
        n = batch.num_rows
        sig_col = pa.ListArray.from_arrays(
            pa.array(np.arange(n + 1, dtype=np.int64) * self.num_perm, pa.int32()),
            pa.array(sig.ravel(), pa.uint64()),
        )
        band_col = pa.ListArray.from_arrays(
            pa.array(np.arange(n + 1, dtype=np.int64) * self.n_bands, pa.int32()),
            pa.array(bands.ravel(), pa.uint64()),
        )
        batch = batch.append_column("sig", sig_col)
        return batch.append_column("bands", band_col)


def sig_jaccard_estimate(sa: np.ndarray, sb: np.ndarray) -> float:
    return float((np.asarray(sa) == np.asarray(sb)).mean()) if len(sa) else 0.0


_MH_CACHE: dict[tuple, "MinHasher"] = {}


def _cached_minhasher(**kwargs) -> "MinHasher":
    """Per-process MinHasher cache keyed by params — construction is cheap
    but the permutation arrays are reused across a worker's batches."""
    key = tuple(sorted(kwargs.items()))
    if key not in _MH_CACHE:
        _MH_CACHE[key] = MinHasher(**kwargs)
    return _MH_CACHE[key]


_N_BAND_PARTS = 64  # coarse hash partitions for the LSH-bucket groupby
_BLOOM_MAX_BITS = 1 << 27  # 16 MiB bitmap cap for the verify pre-filter


def _explode_bands(batch: pa.Table, id_col: str) -> pa.Table:
    """(id, sig, bands) → one row per (band_key, id, sig), plus a COARSE
    partition key ``band_part = band_key % N``: grouping by the coarse key
    gives N big groups instead of one Ray group per LSH bucket (bucket
    count ≈ rows — per-group dispatch overhead would dominate), while
    still colocating every complete bucket inside one group."""
    bands = batch.column("bands")
    if isinstance(bands, pa.ChunkedArray):
        bands = bands.combine_chunks()
    flat = pc.list_flatten(bands)
    parents = pc.list_parent_indices(bands)
    part = (
        flat.to_numpy(zero_copy_only=False) % np.uint64(_N_BAND_PARTS)
    ).astype(np.int64)
    return pa.Table.from_arrays(
        [
            pa.array(part, pa.int64()),
            flat,
            batch.column(id_col).take(parents),
            batch.column("sig").take(parents),
        ],
        names=["band_part", "band_key", id_col, "sig"],
    )


def _pairs_from_band_part(
    g: pa.Table,
    id_col: str,
    threshold: float,
    max_bucket: int = 256,
    require_new_col: str | None = None,
) -> pa.Table:
    """Candidate pairs within ONE coarse partition (many complete LSH
    buckets): rows are sorted by (band_key, id) in-task, singleton buckets
    (the vast majority) are skipped wholesale, and each multi-row bucket
    is verified by a vectorized signature-equality-mean.  Oversized
    buckets (degenerate content, e.g. empty docs) are truncated at
    ``max_bucket``; truncation is observable — every emitted pair carries
    ``truncated=true``, and a truncated bucket that yields no pairs still
    emits one marker row with ``id_a = id_b = -1``."""
    keys = g.column("band_key").to_numpy(zero_copy_only=False).astype(np.uint64)
    ids = g.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((ids, keys))
    keys, ids = keys[order], ids[order]
    newf = (
        g.column(require_new_col)
        .to_numpy(zero_copy_only=False)
        .astype(bool)[order]
        if require_new_col is not None
        else None
    )
    n = len(keys)
    change = np.ones(n, dtype=bool)
    change[1:] = keys[1:] != keys[:-1]
    starts = np.nonzero(change)[0]
    ends = np.append(starts[1:], n)
    multi = np.nonzero(ends - starts >= 2)[0]
    out_a: list = []
    out_b: list = []
    out_j: list = []
    out_t: list = []
    if len(multi):
        sig_col = g.column("sig")
        if isinstance(sig_col, pa.ChunkedArray):
            sig_col = sig_col.combine_chunks()
        flat_sig = pc.list_flatten(sig_col).to_numpy(zero_copy_only=False)
        num_perm = (
            pc.list_value_length(sig_col)[0].as_py() if len(sig_col) else 0
        )
        sig_mat = flat_sig.reshape(-1, num_perm)[order]
        for r in multi:
            s, e = starts[r], min(ends[r], starts[r] + max_bucket)
            truncated = bool(ends[r] - starts[r] > max_bucket)
            bids = ids[s:e]
            sigm = sig_mat[s:e]
            est = (sigm[:, None, :] == sigm[None, :, :]).mean(axis=2)
            hit = np.triu(est >= threshold, k=1)
            if newf is not None:
                # incremental probe: prior×prior pairs are already known
                # from the epoch that indexed them — emit only pairs
                # touching a probe row
                bn = newf[s:e]
                hit &= bn[:, None] | bn[None, :]
            ia, ib = np.nonzero(hit)
            if len(ia):
                out_a.append(bids[ia])
                out_b.append(bids[ib])
                out_j.append(np.round(est[ia, ib], 6))
                out_t.append(np.full(len(ia), truncated))
            elif truncated:
                out_a.append(np.array([-1], np.int64))
                out_b.append(np.array([-1], np.int64))
                out_j.append(np.array([0.0]))
                out_t.append(np.array([True]))
    a = np.concatenate(out_a) if out_a else np.zeros(0, np.int64)
    b = np.concatenate(out_b) if out_b else np.zeros(0, np.int64)
    j = np.concatenate(out_j) if out_j else np.zeros(0, np.float64)
    tr = np.concatenate(out_t) if out_t else np.zeros(0, bool)
    return pa.Table.from_arrays(
        [
            pa.array(a, pa.int64()),
            pa.array(b, pa.int64()),
            pa.array(j, pa.float64()),
            pa.array(tr, pa.bool_()),
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
) -> "ray.data.Dataset":
    """Near-duplicate pairs via MinHash+LSH: returns
    ``(id_a, id_b, est_jaccard, truncated)`` with ``id_a < id_b``,
    deduplicated on the composite pair key.  ``truncated=true`` rows came
    from buckets clipped at the bucket cap (recall-loss marker; rows with
    ``id_a = -1`` are pure markers from truncated-but-pairless buckets).

    Shuffle cost: one groupby on the COARSE ``band_part`` key over
    (band_part, band_key, id, sig) rows — ``n_bands`` light rows per doc;
    documents never move, and the groupby dispatches ~64 big groups
    instead of one per LSH bucket.  The MinHasher is constructed per task
    via a keyed cache — its setup is microseconds, so no actor-pool ramp.
    """
    mh_kwargs = dict(text_col=text_col, k=k, num_perm=num_perm, n_bands=n_bands)

    def sign_batch(b: pa.Table) -> pa.Table:
        return _cached_minhasher(**mh_kwargs)(b)

    signed = ds.map_batches(sign_batch, batch_format="pyarrow").select_columns(
        [id_col, "sig", "bands"]
    )
    exploded = signed.map_batches(
        lambda b: _explode_bands(b, id_col), batch_format="pyarrow"
    )
    pairs = exploded.groupby("band_part").map_groups(
        lambda g: _pairs_from_band_part(g, id_col, threshold),
        batch_format="pyarrow",
    )
    # same pair can surface from multiple bands → dedup on the composite
    # (id_a, id_b) key — no packed-integer key that could alias wide ids.
    # Order by NOT(truncated) so a pair seen from any clipped bucket keeps
    # truncated=true deterministically (the flag is the recall-loss audit
    # signal; an arbitrary-survivor dedup would make it flap run-to-run).
    pairs = pairs.map_batches(
        lambda b: b.append_column("__nt", pc.invert(b.column("truncated"))),
        batch_format="pyarrow",
    )
    return dedup_first_wins(pairs, ["id_a", "id_b"], ["__nt"]).select_columns(
        ["id_a", "id_b", "est_jaccard", "truncated"]
    )


def probe_neardup_pairs(
    index_ds: "ray.data.Dataset",
    probe_ds: "ray.data.Dataset",
    id_col: str = "doc_id",
    threshold: float = 0.7,
) -> "ray.data.Dataset":
    """INCREMENTAL near-dup probe: candidate pairs between a PERSISTED
    signature index and a (much smaller) probe set of changed/new docs —
    the refresh-epoch maintenance step that avoids re-running LSH over
    the unchanged corpus majority.

    Both inputs are PRE-SIGNED ``(id, sig, bands)`` rows (the index read
    back from its parquet store, the probe from the current epoch's
    parse — signatures are computed exactly once per content version,
    never here).  Id sets must be disjoint (prune superseded index rows
    first).  Plan: both sides explode to band rows tagged ``is_new``,
    ONE coarse ``band_part`` groupby colocates every LSH bucket, and the
    in-bucket verify emits only pairs touching a probe row (prior×prior
    pairs were already reported by the epoch that indexed them) — so
    exchange volume is O((index + probe) band rows) but pair work is
    probe-proportional.  Same output contract as ``minhash_lsh_pairs``
    (est-Jaccard, truncation markers, first-wins pair dedup)."""

    def explode_tagged(is_new: int):
        def fn(b: pa.Table) -> pa.Table:
            t = _explode_bands(b, id_col)
            return t.append_column(
                "is_new",
                pa.array(np.full(t.num_rows, is_new, np.int8), pa.int8()),
            )

        return fn

    exploded = index_ds.map_batches(
        explode_tagged(0), batch_format="pyarrow"
    ).union(probe_ds.map_batches(explode_tagged(1), batch_format="pyarrow"))
    pairs = exploded.groupby("band_part").map_groups(
        lambda g: _pairs_from_band_part(
            g, id_col, threshold, require_new_col="is_new"
        ),
        batch_format="pyarrow",
    )
    pairs = pairs.map_batches(
        lambda b: b.append_column("__nt", pc.invert(b.column("truncated"))),
        batch_format="pyarrow",
    )
    return dedup_first_wins(pairs, ["id_a", "id_b"], ["__nt"]).select_columns(
        ["id_a", "id_b", "est_jaccard", "truncated"]
    )


def _doc_shingle_sets(batch: pa.Table, id_col: str, text_col: str, k: int) -> pa.Table:
    """(id, sh) rows: per-doc SORTED-UNIQUE k-shingle hash sets, computed
    vectorized from the flat batch kernels (one lexsort per batch, no
    per-row Python hashing)."""
    from .hashing import flat_tokens, shingle_hash_flat, token_hashes

    flat, offsets = flat_tokens(batch.column(text_col))
    sh, soff = shingle_hash_flat(token_hashes(flat), offsets, k)
    n = len(soff) - 1
    seg = np.repeat(np.arange(n, dtype=np.int64), np.diff(soff))
    order = np.lexsort((sh, seg))
    sh_s, seg_s = sh[order], seg[order]
    keep = np.r_[True, (sh_s[1:] != sh_s[:-1]) | (seg_s[1:] != seg_s[:-1])]
    sh_u, seg_u = sh_s[keep], seg_s[keep]
    counts = np.bincount(seg_u, minlength=n).astype(np.int64)
    uoff = np.zeros(n + 1, np.int64)
    np.cumsum(counts, out=uoff[1:])
    return pa.Table.from_arrays(
        [
            batch.column(id_col),
            pa.ListArray.from_arrays(
                pa.array(uoff, pa.int32()), pa.array(sh_u, pa.uint64())
            ),
        ],
        names=["id", "sh"],
    )


def lsh_verify_pairs(
    ds: "ray.data.Dataset",
    cand: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.7,
    k: int = 3,
    n_parts: int = 64,
    bloom_m_bits: int = 1 << 23,
    bloom_k: int = 4,
) -> "ray.data.Dataset":
    """DISTRIBUTED exact-Jaccard verification of LSH candidate pairs — no
    driver-side materialization at any stage; every structure is a
    co-partitioned Dataset, so verify cost scales out with the candidate
    count (on a duplicate-heavy corpus candidates are O(duplicates) — the
    driver-dict verify this replaces is the last place that count could
    pool on one machine).

    Three coarse exchanges, ``setsim_join``-style (both shingle sets local
    to the partition that compares them), with a BLOOM pre-filter so the
    doc-side exchange is CANDIDATE-scale, not corpus-scale:

      0. *bloom*: a ``bloom_m_bits`` bitmap over candidate ids is built
         from per-block fixed-size partials, merged by a distributed
         tree reduce + streaming driver fold (``bloom_or_merge`` — the
         driver never holds the O(blocks) partials at once), re-sized
         from the candidate key count when the default m would saturate,
         and broadcast once via ``ray.put``; non-candidate docs are
         dropped MAP-SIDE before shingling, so only candidates (+ the
         bloom's false positives, removed by the exact demand filter in
         step 1) ever compute shingles or cross an exchange;
      1. *demand*: candidate ids hash-partitioned by ``id % n_parts``,
         co-partitioned with the surviving per-doc shingle-set rows →
         only EXACT candidate docs' sets continue;
      2. *attach a*: pair rows partitioned by ``id_a % n_parts`` meet the
         surviving set rows → each pair picks up ``sh_a``;
      3. *attach b + verify*: repartition by ``id_b % n_parts``, pick up
         ``sh_b``, and verify with one ``intersect1d`` per pair.

    The per-pair arithmetic is the SAME float64 sequence as the driver
    path (``inter/union >= threshold``, ``floor(j*1e6)/1e6``) so the two
    plans are bit-equal — pinned by a forced-path pytest.  Emits
    ``(id_a, id_b, jaccard)``; pairs whose union is empty (two contentless
    docs) are dropped, matching the SQL oracle.
    """
    KP = np.uint64(n_parts)

    def _rows(part, kind, ida, idb, sh):
        return pa.Table.from_arrays(
            [
                pa.array(part, pa.int64()),
                pa.array(np.full(len(part), kind, np.int8), pa.int8()),
                pa.array(ida, pa.int64()),
                pa.array(idb, pa.int64()),
                sh,
            ],
            names=["part", "kind", "ida", "idb", "sh"],
        )

    def demand(batch: pa.Table) -> pa.Table:
        a = batch.column("id_a").to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch.column("id_b").to_numpy(zero_copy_only=False).astype(np.int64)
        ids = np.unique(np.concatenate([a, b]))
        part = (ids.astype(np.uint64) % KP).astype(np.int64)
        return _rows(
            part, 0, ids, np.zeros(len(ids), np.int64),
            pa.ListArray.from_arrays(
                pa.array(np.zeros(len(ids) + 1, np.int64), pa.int32()),
                pa.array([], pa.uint64()),
            ),
        )

    from .joins import bloom_bitmap_from_keys, bloom_or_merge, bloom_test_keys

    def cand_bloom_partial(m_bits: int):
        def fn(batch: pa.Table) -> pa.Table:
            keys = np.concatenate(
                [
                    batch.column("id_a").to_numpy(zero_copy_only=False),
                    batch.column("id_b").to_numpy(zero_copy_only=False),
                ]
            ).astype(np.int64)
            bm = bloom_bitmap_from_keys(keys, m_bits, bloom_k)
            return pa.Table.from_arrays(
                [
                    pa.array([bm.tobytes()], pa.large_binary()),
                    pa.array([len(np.unique(keys))], pa.int64()),
                ],
                names=["bm", "n"],
            )

        return fn

    # per-block partials carry a distinct-id count so the bitmap can be
    # re-sized to the candidate load: a fixed m saturates toward
    # all-ones past ~m/10 keys, quietly degrading the doc-side exchange
    # back to corpus scale (perf only — the exact demand filter in step
    # 1 preserves correctness).  Merge is a distributed tree reduce +
    # streaming driver fold (bloom_or_merge), never an at-once
    # take_all of the O(blocks) partials.
    bloom, n_keys = bloom_or_merge(
        cand.map_batches(cand_bloom_partial(bloom_m_bits), batch_format="pyarrow"),
        bloom_m_bits,
        count_col="n",
    )
    if n_keys is not None and n_keys > bloom_m_bits // 10:
        target = min(
            _BLOOM_MAX_BITS, 1 << int(np.ceil(np.log2(max(64, 10 * n_keys))))
        )
        if target > bloom_m_bits:
            bloom_m_bits = target
            bloom, n_keys = bloom_or_merge(
                cand.map_batches(
                    cand_bloom_partial(bloom_m_bits), batch_format="pyarrow"
                ),
                bloom_m_bits,
                count_col="n",
            )
        if n_keys > bloom_m_bits // 10:
            import logging

            logging.getLogger(__name__).warning(
                "lsh_verify_pairs: bloom load %d keys > m/10 (m=%d, cap %d) — "
                "FP rate degraded; doc-side exchange may exceed candidate scale",
                n_keys, bloom_m_bits, _BLOOM_MAX_BITS,
            )
    bloom_ref = ray.put(bloom)

    def doc_sets(batch: pa.Table) -> pa.Table:
        bm = ray.get(bloom_ref)
        keys = (
            batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        )
        batch = batch.filter(pa.array(bloom_test_keys(keys, bm, bloom_k)))
        t = _doc_shingle_sets(batch, id_col, text_col, k)
        ids = t.column("id").to_numpy(zero_copy_only=False).astype(np.int64)
        part = (ids.astype(np.uint64) % KP).astype(np.int64)
        return _rows(part, 1, ids, np.zeros(len(ids), np.int64), t.column("sh"))

    def filter_demanded(g: pa.Table) -> pa.Table:
        kinds = g.column("kind").to_numpy(zero_copy_only=False)
        ids = g.column("ida").to_numpy(zero_copy_only=False)
        wanted = np.unique(ids[kinds == 0])
        is_set = kinds == 1
        hit = is_set & np.isin(ids, wanted)
        return g.filter(pa.array(hit)).select(["ida", "sh"]).rename_columns(
            ["id", "sh"]
        )

    def _list_views(col):
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return (
            col.values.to_numpy(zero_copy_only=False),
            col.offsets.to_numpy(zero_copy_only=False).astype(np.int64),
        )

    def pair_rows_a(batch: pa.Table) -> pa.Table:
        a = batch.column("id_a").to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch.column("id_b").to_numpy(zero_copy_only=False).astype(np.int64)
        part = (a.astype(np.uint64) % KP).astype(np.int64)
        off = pa.array(np.zeros(len(a) + 1, np.int64), pa.int32())
        return _rows(
            part, 2, a, b,
            pa.ListArray.from_arrays(off, pa.array([], pa.uint64())),
        )

    def set_rows(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_numpy(zero_copy_only=False).astype(np.int64)
        part = (ids.astype(np.uint64) % KP).astype(np.int64)
        return _rows(part, 1, ids, np.zeros(len(ids), np.int64), batch.column("sh"))

    def attach_a(g: pa.Table) -> pa.Table:
        # fully vectorized: one searchsorted lookup for every pair row,
        # then a flat-index gather of the matched sets (no per-pair loop
        # — this stage is pure data movement; verify's per-pair
        # intersect is the only inherent loop in the plan)
        kinds = g.column("kind").to_numpy(zero_copy_only=False)
        ida = g.column("ida").to_numpy(zero_copy_only=False).astype(np.int64)
        idb = g.column("idb").to_numpy(zero_copy_only=False).astype(np.int64)
        sh_flat, sh_off = _list_views(g.column("sh"))
        set_rows_idx = np.nonzero(kinds == 1)[0]
        sids = ida[set_rows_idx]
        so = np.argsort(sids)
        sids_s, srow_s = sids[so], set_rows_idx[so]
        pr = np.nonzero(kinds == 2)[0]
        if len(pr) == 0 or len(sids_s) == 0:
            e64 = np.zeros(0, np.int64)
            return _rows(
                e64, 2, e64, e64,
                pa.ListArray.from_arrays(
                    pa.array([0], pa.int32()), pa.array([], pa.uint64())
                ),
            )
        pos = np.searchsorted(sids_s, ida[pr])
        safe = np.minimum(pos, len(sids_s) - 1)
        hit = (pos < len(sids_s)) & (sids_s[safe] == ida[pr])  # absent → drop
        pr = pr[hit]
        sr = srow_s[safe[hit]]
        lens = (sh_off[sr + 1] - sh_off[sr]) if len(sr) else np.zeros(0, np.int64)
        total = int(lens.sum())
        flat_idx = (
            np.repeat(sh_off[sr], lens)
            + np.arange(total, dtype=np.int64)
            - np.repeat(np.cumsum(lens) - lens, lens)
        )
        offs = np.zeros(len(sr) + 1, np.int64)
        np.cumsum(lens, out=offs[1:])
        return _rows(
            (idb[pr].astype(np.uint64) % KP).astype(np.int64), 2,
            ida[pr], idb[pr],
            pa.ListArray.from_arrays(
                pa.array(offs, pa.int32()),
                pa.array(sh_flat[flat_idx], pa.uint64()),
            ),
        )

    def verify(g: pa.Table) -> pa.Table:
        kinds = g.column("kind").to_numpy(zero_copy_only=False)
        ida = g.column("ida").to_numpy(zero_copy_only=False).astype(np.int64)
        idb = g.column("idb").to_numpy(zero_copy_only=False).astype(np.int64)
        sh_flat, sh_off = _list_views(g.column("sh"))
        set_rows_idx = np.nonzero(kinds == 1)[0]
        sids = ida[set_rows_idx]
        so = np.argsort(sids)
        sids_s, srow_s = sids[so], set_rows_idx[so]
        out_a, out_b, out_j = [], [], []
        for r in np.nonzero(kinds == 2)[0]:
            p = np.searchsorted(sids_s, idb[r])
            if p >= len(sids_s) or sids_s[p] != idb[r]:
                continue
            sr = srow_s[p]
            sb = sh_flat[sh_off[sr] : sh_off[sr + 1]]
            sa = sh_flat[sh_off[r] : sh_off[r + 1]]
            inter = np.intersect1d(sa, sb, assume_unique=True).size
            uni = len(sa) + len(sb) - inter
            if uni == 0:
                continue
            j = inter / uni
            if j >= threshold:
                out_a.append(int(ida[r]))
                out_b.append(int(idb[r]))
                out_j.append(np.floor(j * 1e6) / 1e6)
        return pa.Table.from_arrays(
            [
                pa.array(out_a, pa.int64()),
                pa.array(out_b, pa.int64()),
                pa.array(out_j, pa.float64()),
            ],
            names=["id_a", "id_b", "jaccard"],
        )

    sh_ds = (
        cand.map_batches(demand, batch_format="pyarrow")
        .union(ds.map_batches(doc_sets, batch_format="pyarrow"))
        .groupby("part")
        .map_groups(filter_demanded, batch_format="pyarrow")
        .materialize()
    )
    with_a = (
        cand.map_batches(pair_rows_a, batch_format="pyarrow")
        .union(sh_ds.map_batches(set_rows, batch_format="pyarrow"))
        .groupby("part")
        .map_groups(attach_a, batch_format="pyarrow")
    )
    return (
        with_a.union(sh_ds.map_batches(set_rows, batch_format="pyarrow"))
        .groupby("part")
        .map_groups(verify, batch_format="pyarrow")
    )


def _cdc_bounds(text: str, mask: int = 64, k: int = 8) -> np.ndarray:
    """Content-defined chunk boundaries of ``text``: cut AFTER the 8-byte
    rolling-hash window wherever ``hv % mask == 0`` (the LBFS/Rabin CDC
    rule — an insertion only re-chunks its own neighborhood).  Returns
    sorted unique BYTE offsets including 0 and len.  Each interior cut is
    snapped BACK to the nearest UTF-8 codepoint start (a no-op for ASCII,
    preserving the SQL-oracle parity) so that byte-sliced chunks always
    concatenate to valid text — a text-dedup rebuild must produce a
    storable Arrow string, and the snap is as content-local as the cut
    itself, so shift-resilience is unchanged."""
    from .text import _rolling_hashes

    raw = text.encode("utf-8")
    data = np.frombuffer(raw, np.uint8)
    n = len(data)
    if n == 0:
        return np.array([0], np.int64)
    hv = _rolling_hashes(data, k)
    cuts = (
        np.flatnonzero(hv % np.uint64(mask) == 0) + k
        if len(hv)
        else np.zeros(0, np.int64)
    )
    if len(cuts) and len(raw) != len(text):  # non-ASCII present
        is_start = (data & np.uint8(0xC0)) != np.uint8(0x80)
        last_start = np.maximum.accumulate(
            np.where(is_start, np.arange(n, dtype=np.int64), 0)
        )
        cuts = last_start[np.minimum(cuts, n - 1)]
    return np.unique(np.concatenate([[0], cuts, [n]]))


def cdc_dedup_text(
    ds: "ray.data.Dataset",
    id_col: str,
    text_col: str = "text",
    mask: int = 64,
    n_parts: int = 32,
) -> "ray.data.Dataset":
    """Shift-resilient boilerplate removal: drop every CDC chunk whose
    content appears ≥ 2 times CORPUS-WIDE, keeping each row's remaining
    bytes verbatim and in order — the content-defined analog of C4-style
    line dedup (``line_dedup``), robust to insertions that would shift
    fixed-size blocks.

    Chunk boundaries are recomputed deterministically at rebuild time, so
    chunk TEXT never crosses an exchange — only light rows move:

      1. map: per row emit (chunk_hash, row_id, chunk_idx) — no text;
      2. groupby ``ch % n_parts``: the global occurrence count of a hash
         is local to one partition → emit ONLY the duplicated (row_id,
         chunk_idx) rows (non-dup chunks default to keep);
      3. co-partition those drop-rows with the ORIGINAL rows by
         ``row_id % n_parts``; each row recomputes its boundaries and
         concatenates the kept segments byte-for-byte.

    ``id_col`` must be integer row identity.  Rows whose text empties
    out are kept with ``""`` (the caller filters if desired)."""
    import hashlib

    def chunk_hash_rows(batch: pa.Table) -> pa.Table:
        md5 = hashlib.md5
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        out_p: list[int] = []
        out_id: list[int] = []
        out_ix: list[int] = []
        out_ch: list[int] = []
        for i, t in zip(ids, texts):
            b = _cdc_bounds(t, mask)
            # _cdc_bounds offsets are BYTE offsets — slice the encoded
            # bytes, not the str, so chunk identity matches the Rabin
            # byte-chunk contract for non-ASCII text too
            tb = t.encode("utf-8")
            for ix, (a, e) in enumerate(zip(b[:-1].tolist(), b[1:].tolist())):
                ch = int.from_bytes(md5(tb[a:e]).digest()[:8], "big") >> 4
                out_p.append(ch % n_parts)
                out_id.append(i)
                out_ix.append(ix)
                out_ch.append(ch)
        return pa.table(
            {
                "__part": pa.array(out_p, pa.int64()),
                "__rid": pa.array(out_id, pa.int64()),
                "__idx": pa.array(out_ix, pa.int64()),
                "ch": pa.array(out_ch, pa.int64()),
            }
        )

    # both union sides carry the SAME canonical schema: the row payload
    # columns (null on drop-rows) + part/rid/idx/kind — captured once
    # from Dataset metadata on the driver
    schema = ds.schema()
    base = list(zip(schema.names, schema.types))

    def dup_rows(g: pa.Table) -> pa.Table:
        ch = g.column("ch").to_numpy(zero_copy_only=False)
        order = np.argsort(ch, kind="stable")
        ch_s = ch[order]
        new = np.r_[True, ch_s[1:] != ch_s[:-1]]
        run_id = np.cumsum(new) - 1
        run_len = np.bincount(run_id)
        dup_s = run_len[run_id] >= 2
        dup = np.empty(len(ch), bool)
        dup[order] = dup_s
        d = g.filter(pa.array(dup))
        rid = d.column("__rid").to_numpy(zero_copy_only=False).astype(np.int64)
        cols = [pa.nulls(d.num_rows, t) for _, t in base]
        cols += [
            pa.array(rid % n_parts, pa.int64()),
            d.column("__rid").combine_chunks(),
            d.column("__idx").combine_chunks(),
            pa.array(np.zeros(d.num_rows, np.int8), pa.int8()),
        ]
        return pa.Table.from_arrays(
            cols, names=[n for n, _ in base] + ["__part", "__rid", "__idx", "__kind"]
        )

    def tag_rows(batch: pa.Table) -> pa.Table:
        rid = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        cols = [batch.column(n).combine_chunks() for n, _ in base]
        cols += [
            pa.array(rid % n_parts, pa.int64()),
            pa.array(rid, pa.int64()),
            pa.array(np.zeros(batch.num_rows, np.int64), pa.int64()),
            pa.array(np.ones(batch.num_rows, np.int8), pa.int8()),
        ]
        return pa.Table.from_arrays(
            cols, names=[n for n, _ in base] + ["__part", "__rid", "__idx", "__kind"]
        )

    def rebuild(g: pa.Table) -> pa.Table:
        kinds = g.column("__kind").to_numpy(zero_copy_only=False)
        rows = g.filter(pa.array(kinds == 1))
        drops = g.filter(pa.array(kinds == 0))
        drop_of: dict[int, set] = {}
        for r, ix in zip(
            drops.column("__rid").to_pylist(), drops.column("__idx").to_pylist()
        ):
            drop_of.setdefault(r, set()).add(ix)
        texts = rows.column(text_col).to_pylist()
        rids = rows.column("__rid").to_pylist()
        out = []
        for r, t in zip(rids, texts):
            dd = drop_of.get(r)
            if not dd:
                out.append(t)
                continue
            b = _cdc_bounds(t, mask)
            # byte-offset slicing to match chunk_hash_rows' chunk
            # identity; bounds are codepoint-snapped, so the kept-chunk
            # concatenation is always valid UTF-8 (strict decode)
            tb = t.encode("utf-8")
            out.append(
                b"".join(
                    tb[a:e]
                    for ix, (a, e) in enumerate(zip(b[:-1].tolist(), b[1:].tolist()))
                    if ix not in dd
                ).decode("utf-8")
            )
        keep_cols = [c for c in rows.column_names if c not in ("__part", "__rid", "__idx", "__kind")]
        cleaned = rows.select(keep_cols)
        i = cleaned.schema.names.index(text_col)
        return cleaned.set_column(i, text_col, pa.array(out, pa.string()))

    hashes = ds.map_batches(chunk_hash_rows, batch_format="pyarrow")
    drops = hashes.groupby("__part").map_groups(dup_rows, batch_format="pyarrow")
    tagged = ds.map_batches(tag_rows, batch_format="pyarrow")
    return (
        tagged.union(drops)
        .groupby("__part")
        .map_groups(rebuild, batch_format="pyarrow")
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

def simhash_texts(texts: "pa.Array | pa.ChunkedArray") -> np.ndarray:
    """Vectorized 64-bit SimHash over whitespace unigrams (term-frequency
    weighted) for a whole string column: token hashes → per-token bit
    matrix (``unpackbits``) → segmented per-doc bit sums → sign → packed
    uint64.  Empty rows hash to 0."""
    flat, offsets = flat_tokens(texts)
    return simhash_from_hashes(token_hashes(flat), offsets)


def simhash_from_hashes(th: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """SimHash from pre-computed flat token hashes (shared tokenization)."""
    n = len(offsets) - 1
    counts = np.diff(offsets)
    out = np.zeros(n, np.uint64)
    if len(th) == 0:
        return out
    bits = np.unpackbits(
        th.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
    )
    nonempty = counts > 0
    starts = offsets[:-1][nonempty]
    ends = offsets[1:][nonempty]
    # per-doc C reductions beat reduceat/cumsum by ~100× here (strided
    # axis-0 reductions over a wide uint8 matrix are reduceat's worst case)
    sums = np.empty((len(starts), 64), np.int32)
    for i in range(len(starts)):
        sums[i] = bits[starts[i] : ends[i]].sum(axis=0, dtype=np.int32)
    acc = 2 * sums - counts[nonempty][:, None].astype(np.int32)
    packed = np.ascontiguousarray(np.packbits(acc > 0, axis=1, bitorder="little"))
    out[nonempty] = packed.view(np.uint64).ravel()
    return out


def simhash64(text: str) -> int:
    """Single-document SimHash (convenience over the batch kernel)."""
    return int(simhash_texts(pa.array([text]))[0])


def simhash_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    vals = simhash_texts(batch.column(text_col))
    return batch.append_column("simhash", pa.array(vals, pa.uint64()))


def _explode_simhash_bands(batch: pa.Table, id_col: str) -> pa.Table:
    """simhash → 4 rows of (band_part, band_key, id, simhash); Hamming-≤3
    pairs share at least one of the 4 16-bit bands (pigeonhole).  The
    coarse ``band_part`` key keeps the Ray groupby at ~64 groups."""
    sh = batch.column("simhash").to_numpy(zero_copy_only=False).astype(np.uint64)
    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    n = len(sh)
    band_keys = np.empty(4 * n, dtype=np.uint64)
    for j in range(4):
        chunk = (sh >> np.uint64(16 * j)) & np.uint64(0xFFFF)
        band_keys[j * n : (j + 1) * n] = chunk | (np.uint64(j) << np.uint64(60))
    return pa.Table.from_arrays(
        [
            pa.array((band_keys % np.uint64(_N_BAND_PARTS)).astype(np.int64), pa.int64()),
            pa.array(band_keys, pa.uint64()),
            pa.array(np.tile(ids, 4), pa.int64()),
            pa.array(np.tile(sh, 4), pa.uint64()),
        ],
        names=["band_part", "band_key", id_col, "simhash"],
    )


def _simhash_pairs_part(g: pa.Table, id_col: str, max_dist: int) -> pa.Table:
    """Hamming-verified pairs for one coarse partition: sort by
    (band_key, id), skip singleton buckets, table-driven popcount."""
    keys = g.column("band_key").to_numpy(zero_copy_only=False).astype(np.uint64)
    ids = g.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    sh = g.column("simhash").to_numpy(zero_copy_only=False).astype(np.uint64)
    order = np.lexsort((ids, keys))
    keys, ids, sh = keys[order], ids[order], sh[order]
    n = len(keys)
    change = np.ones(n, dtype=bool)
    change[1:] = keys[1:] != keys[:-1]
    starts = np.nonzero(change)[0]
    ends = np.append(starts[1:], n)
    multi = np.nonzero(ends - starts >= 2)[0]
    out_a, out_b, out_d = [], [], []
    for r in multi:
        s, e = starts[r], ends[r]
        bids, bsh = ids[s:e], sh[s:e]
        for x in range(len(bids) - 1):
            xor = bsh[x] ^ bsh[x + 1 :]
            dist = popcount64(xor)
            hit = np.nonzero(dist <= max_dist)[0]
            if len(hit):
                out_a.append(np.full(len(hit), bids[x], np.int64))
                out_b.append(bids[x + 1 + hit])
                out_d.append(dist[hit])
    if out_a:
        a = np.concatenate(out_a)
        b = np.concatenate(out_b)
        d = np.concatenate(out_d)
    else:
        a = b = d = np.zeros(0, np.int64)
    return pa.Table.from_arrays(
        [pa.array(a, pa.int64()), pa.array(b, pa.int64()), pa.array(d, pa.int64())],
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
    pairs = exploded.groupby("band_part").map_groups(
        lambda g: _simhash_pairs_part(g, id_col, max_dist),
        batch_format="pyarrow",
    )
    return dedup_first_wins(pairs, ["id_a", "id_b"], []).select_columns(
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


@ray.remote
def _gather_normalized(refs: list) -> tuple[np.ndarray, np.ndarray]:
    """Build the broadcast (ids, normalized matrix) in a REMOTE task so the
    driver never materializes the embedding table; the result lands in the
    object store and map tasks read it zero-copy."""
    tables = [t for t in ray.get(list(refs)) if t.num_rows]
    ids = np.concatenate(
        [t.column(0).to_numpy(zero_copy_only=False) for t in tables]
    )
    mat = _normalize(
        np.concatenate(
            [np.stack(t.column(1).to_numpy(zero_copy_only=False)) for t in tables]
        )
    )
    order = np.argsort(ids, kind="stable")
    return ids[order], mat[order]


def embedding_neardup_pairs(
    ds: "ray.data.Dataset",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 0,
    seed: int = 7,
    auto_lsh_rows: int = 2_000_000,
    auto_planes: int = 16,
) -> "ray.data.Dataset":
    """Pairs with cosine ≥ threshold.

    Exact path (default): the normalized matrix (ids + float64 vectors) is
    assembled by a remote task, lives in the object store, and every batch
    does one ``(B,d)·(d,N)`` matmul against it — vectorized, no shuffle;
    O(N·d) broadcast memory.  Right up to ~10^6–10^7 vectors.

    Above ``auto_lsh_rows`` rows (or with explicit ``n_planes>0``) it
    switches to the scale path: random-hyperplane LSH signature buckets
    (groupby) then exact cosine within buckets only; recall < 1 by design
    (documented approximation; recall vs the exact path is test-asserted).
    """
    if not n_planes:
        n_rows = ds.count()  # parquet metadata / cached count — cheap
        if n_rows > auto_lsh_rows:
            n_planes = auto_planes

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
            order = np.argsort(ids, kind="stable")
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

    # exact path: broadcast built remotely, one matmul per batch
    broadcast = _gather_normalized.remote(
        ds.select_columns([id_col, vec_col]).to_arrow_refs()
    )

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


# ---------------------------------------------------------------------------
# Exact substring deduplication (ExactSubstr — Lee et al. 2022,
# "Deduplicating Training Data Makes Language Models Better").  The
# reference engine has no counterpart; this is a first-class
# training-data op.  Instead of the paper's monolithic suffix array
# (which needs the whole corpus in one address space), duplicated
# >= k-token runs are found as duplicated OVERLAPPING k-token shingles
# — any duplicated run of length >= k is exactly a maximal chain of
# duplicated k-shingles, so merging the per-doc shingle hits back into
# islands reproduces the paper's spans with only streaming passes and a
# (shingle-hash, count) exchange.
# ---------------------------------------------------------------------------


def shingle_positions(
    texts: "pa.Array | pa.ChunkedArray", k: int
) -> tuple[pa.Array, np.ndarray, np.ndarray]:
    """All OVERLAPPING ``k``-token shingles of each text, with positions.

    Fully vectorized on the shared flat token buffer (``flat_tokens``):
    the k-way ``binary_join_element_wise`` over k shifted zero-copy
    slices builds every candidate shingle in C++, then one numpy mask
    drops the window positions that straddle a document boundary.

    Returns ``(shingles, doc_of, pos)``: shingle i is the k tokens of
    row ``doc_of[i]`` starting at 0-based token position ``pos[i]``.
    Documents with fewer than ``k`` tokens contribute nothing.
    """
    flat, offsets = flat_tokens(texts)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    n = len(offsets) - 1
    T = len(flat)
    if n == 0 or T < k:
        return (
            pa.array([], pa.string()),
            np.zeros(0, np.int64),
            np.zeros(0, np.int64),
        )
    m = T - k + 1
    cand = pc.binary_join_element_wise(*[flat.slice(j, m) for j in range(k)], " ")
    if isinstance(cand, pa.ChunkedArray):
        cand = cand.combine_chunks()
    ntok = np.diff(offsets)
    doc_of = np.repeat(np.arange(n, dtype=np.int64), ntok)[:m]
    starts = np.arange(m, dtype=np.int64)
    valid = starts + k <= offsets[1:][doc_of]
    if not valid.all():
        cand = cand.filter(pa.array(valid))
        doc_of = doc_of[valid]
        starts = starts[valid]
    return cand, doc_of, starts - offsets[:-1][doc_of]


def merge_dup_spans(doc_ids: np.ndarray, pos: np.ndarray, k: int) -> pa.Table:
    """Merge duplicated-shingle hits ``[pos, pos+k)`` into maximal
    per-doc islands (touching spans merge — a chain of duplicated
    k-shingles IS one duplicated run).  Vectorized: one lexsort, one
    break mask; every span has width k so the running island end is
    simply ``prev pos + k``."""
    order = np.lexsort((pos, doc_ids))
    d, p = doc_ids[order], pos[order]
    if len(d) == 0:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "span_start": pa.array([], pa.int64()),
                "span_end": pa.array([], pa.int64()),
                "span_toks": pa.array([], pa.int64()),
            }
        )
    brk = np.ones(len(d), bool)
    brk[1:] = (d[1:] != d[:-1]) | (p[1:] > p[:-1] + k)
    firsts = np.flatnonzero(brk)
    lasts = np.append(firsts[1:], len(p)) - 1
    starts = p[firsts]
    ends = p[lasts] + k
    return pa.table(
        {
            "doc_id": pa.array(d[firsts], pa.int64()),
            "span_start": pa.array(starts, pa.int64()),
            "span_end": pa.array(ends, pa.int64()),
            "span_toks": pa.array(ends - starts, pa.int64()),
        }
    )


@ray.remote
def _gather_u64_column(refs: list, col: str) -> np.ndarray:
    """Concat + sort one uint64 column of many blocks WITHOUT the driver
    touching the rows — returns the sorted array as one object-store
    value for `np.isin`-style probes."""
    vals = [
        t.column(col).to_numpy(zero_copy_only=False)
        for t in ray.get(list(refs))
        if t.num_rows
    ]
    if not vals:
        return np.zeros(0, np.uint64)
    return np.sort(np.concatenate(vals))


def exact_substring_spans(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    broadcast_limit: int = 10_000_000,
    force_plan: str | None = None,
    n_parts: int = 64,
) -> "ray.data.Dataset":
    """Corpus-wide exact substring dedup: one output row per MAXIMAL
    duplicated run of >= ``k`` tokens — ``(doc_id, span_start,
    span_end, span_toks)``, token coordinates, end exclusive.

    Two streaming passes (the ``line_dedup`` shape, overlapping unit):

    1. per-block partial counts of the md5-prefix shingle hash
       (``token_hashes`` — SQL-reproducible, so the oracle shares hash
       collisions bit-for-bit) merge in a 64-way COARSE partition
       (Ray's per-distinct-key groupby cost dodge); hashes seen >= 2
       times corpus-wide are the duplicated-shingle set.  Only
       (hash, count) partials cross the exchange — raw text never moves.
    2. size-selected mark pass (``force_plan`` pins one; forced-path
       pytest equality in tests/test_dedup.py): at <= ``broadcast_limit``
       dup hashes the sorted uint64 set broadcasts once through the
       object store and every block probes + island-merges locally
       (docs never move); above it, exploded (doc, pos, hash)
       occurrences co-partition with the dup set on ``hash % n_parts``
       (exchange #1 marks) then regroup on ``doc_id`` hash (exchange #2
       merges islands) — the 100-TB path, nothing driver-resident.
    """

    def occ_partials(batch: pa.Table) -> pa.Table:
        sh, _, _ = shingle_positions(batch.column(text_col), k)
        if len(sh) == 0:
            return pa.table(
                {
                    "h": pa.array([], pa.uint64()),
                    "__p_cnt": pa.array([], pa.int64()),
                    "part": pa.array([], pa.int64()),
                }
            )
        hu, cnt = np.unique(token_hashes(sh), return_counts=True)
        return pa.table(
            {
                "h": pa.array(hu, pa.uint64()),
                "__p_cnt": pa.array(cnt.astype(np.int64), pa.int64()),
                "part": pa.array(
                    (hu % np.uint64(n_parts)).astype(np.int64), pa.int64()
                ),
            }
        )

    def dup_in_part(g: pa.Table) -> pa.Table:
        tot = g.group_by(["h"]).aggregate([("__p_cnt", "sum")])
        mask = pc.greater_equal(tot.column("__p_cnt_sum"), pa.scalar(2, pa.int64()))
        return tot.filter(mask).select(["h"])

    dup_ds = (
        ds.map_batches(occ_partials, batch_format="pyarrow")
        .groupby("part")
        .map_groups(dup_in_part, batch_format="pyarrow")
        .materialize()
    )
    plan = force_plan or (
        "broadcast" if dup_ds.count() <= broadcast_limit else "shuffle"
    )
    if plan == "shuffle":
        return _exact_substring_shuffle(ds, dup_ds, text_col, id_col, k, n_parts)

    dup_ref = _gather_u64_column.remote(dup_ds.to_arrow_refs(), "h")

    def mark(batch: pa.Table) -> pa.Table:
        dup = ray.get(dup_ref) if isinstance(dup_ref, ray.ObjectRef) else dup_ref
        sh, doc_of, pos = shingle_positions(batch.column(text_col), k)
        if len(sh) == 0:
            return merge_dup_spans(np.zeros(0, np.int64), np.zeros(0, np.int64), k)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        hit = np.isin(token_hashes(sh), dup)
        return merge_dup_spans(ids[doc_of[hit]], pos[hit], k)

    return ds.map_batches(mark, batch_format="pyarrow")


def _exact_substring_shuffle(
    ds, dup_ds, text_col: str, id_col: str, k: int, n_parts: int
) -> "ray.data.Dataset":
    """exact_substring_spans pass 2 as two coarse exchanges (the 100-TB
    plan): occurrence rows meet the dup-hash set on ``hash % n_parts``,
    survivors regroup on ``doc_id`` hash for the island merge."""
    hash_mul = np.uint64(2654435761)

    def explode(batch: pa.Table) -> pa.Table:
        sh, doc_of, pos = shingle_positions(batch.column(text_col), k)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        h = token_hashes(sh) if len(sh) else np.zeros(0, np.uint64)
        return pa.table(
            {
                "part": pa.array(
                    (h % np.uint64(n_parts)).astype(np.int64), pa.int64()
                ),
                "doc_id": pa.array(ids[doc_of], pa.int64()),
                "pos": pa.array(pos, pa.int64()),
                "h": pa.array(h, pa.uint64()),
                "is_occ": pa.array(np.ones(len(h), np.int8), pa.int8()),
            }
        )

    def tag_dup(batch: pa.Table) -> pa.Table:
        h = batch.column("h").to_numpy(zero_copy_only=False)
        n = len(h)
        return pa.table(
            {
                "part": pa.array(
                    (h % np.uint64(n_parts)).astype(np.int64), pa.int64()
                ),
                "doc_id": pa.array(np.zeros(n, np.int64), pa.int64()),
                "pos": pa.array(np.zeros(n, np.int64), pa.int64()),
                "h": pa.array(h, pa.uint64()),
                "is_occ": pa.array(np.zeros(n, np.int8), pa.int8()),
            }
        )

    def mark_in_part(g: pa.Table) -> pa.Table:
        is_occ = pc.equal(g.column("is_occ"), pa.scalar(1, pa.int8()))
        occ = g.filter(is_occ)
        dup = g.filter(pc.invert(is_occ)).column("h").combine_chunks()
        hit = occ.filter(pc.is_in(occ.column("h"), value_set=dup))
        docs = hit.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "dpart": pa.array(
                    ((docs.astype(np.uint64) * hash_mul) % np.uint64(n_parts)).astype(
                        np.int64
                    ),
                    pa.int64(),
                ),
                "doc_id": hit.column("doc_id"),
                "pos": hit.column("pos"),
            }
        )

    def spans_in_part(g: pa.Table) -> pa.Table:
        return merge_dup_spans(
            g.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64),
            g.column("pos").to_numpy(zero_copy_only=False).astype(np.int64),
            k,
        )

    marked = (
        ds.map_batches(explode, batch_format="pyarrow")
        .union(dup_ds.map_batches(tag_dup, batch_format="pyarrow"))
        .groupby("part")
        .map_groups(mark_in_part, batch_format="pyarrow")
    )
    return marked.groupby("dpart").map_groups(spans_in_part, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Incremental (cross-snapshot) dedup: new snapshot vs an existing corpus.
# ---------------------------------------------------------------------------

_INCR_BROADCAST_LIMIT = 2_000_000  # corpus-fingerprint rows a driver broadcast absorbs


def incremental_dedup(
    new_ds: "ray.data.Dataset",
    corpus_ds: "ray.data.Dataset",
    text_col: str = "text",
    keep_cols: list[str] | None = None,
    n_parts: int = 64,
    force_plan: str | None = None,
) -> "ray.data.Dataset":
    """Keep only the NEW snapshot's rows whose content (md5 of
    ``text_col``) does not already exist in the corpus — the recurring
    crawl's "dedup snapshot N against snapshots 1..N-1" step.

    Size-selected like the other anti-joins (``force_plan`` pins one):

    - ``broadcast``: corpus blocks collapse to per-block DISTINCT
      fingerprints (map-side; dups inside a block cost nothing), the
      deduped set broadcasts once via ``ray.put`` and new rows filter
      with one vectorized ``is_in`` — the snapshot never shuffles.
    - ``partition``: at web scale the corpus fingerprint set is billions
      of rows and CANNOT broadcast; both sides co-partition by
      ``int(md5[:8], 16) % n_parts`` in ONE coarse exchange moving only
      (part, fp, keep_cols), and each partition drops probe rows whose
      fingerprint appears in its local corpus slice.  This is the 100-TB
      path; nothing is ever driver-resident.

    Output: the surviving new rows projected to ``keep_cols``.  A prior
    in-snapshot ``exact_dedup`` composes before this when the snapshot
    itself has internal dups.
    """

    keep_cols = keep_cols or ["doc_id"]

    def fp_part(batch: pa.Table, cols: list[str], probe: int) -> pa.Table:
        md5 = hashlib.md5
        fps = [md5(t.encode("utf-8")).hexdigest() for t in batch.column(text_col).to_pylist()]
        part = np.array([int(f[:8], 16) % n_parts for f in fps], dtype=np.int64)
        arrays = [
            pa.array(part, pa.int64()),
            pa.array(fps, pa.string()),
            pa.array(np.full(len(fps), probe, np.int8), pa.int8()),
        ]
        names = ["part", "fp", "is_probe"]
        for c in cols:
            arrays.append(batch.column(c))
            names.append(c)
        return pa.Table.from_arrays(arrays, names=names)

    def corpus_partial(batch: pa.Table) -> pa.Table:
        t = fp_part(batch, [], 0).select(["part", "fp"])
        return t.group_by(["part", "fp"]).aggregate([])

    fp_partials = corpus_ds.map_batches(
        corpus_partial, batch_format="pyarrow"
    ).materialize()
    plan = force_plan or (
        "broadcast" if fp_partials.count() <= _INCR_BROADCAST_LIMIT else "partition"
    )

    if plan == "broadcast":
        parts = fp_partials.take_all()
        fps = pa.array(sorted({r["fp"] for r in parts}), pa.string())
        fps_ref = ray.put(fps)

        def anti(batch: pa.Table) -> pa.Table:
            vs = ray.get(fps_ref) if isinstance(fps_ref, ray.ObjectRef) else fps_ref
            t = fp_part(batch, keep_cols, 1)
            seen = pc.is_in(t.column("fp"), value_set=vs)
            return t.filter(pc.invert(seen)).select(keep_cols)

        return new_ds.map_batches(anti, batch_format="pyarrow")

    # ---- hash-partition plan (corpus side never leaves the cluster) -------
    new_schema = new_ds.schema().base_schema

    def tag_corpus(batch: pa.Table) -> pa.Table:
        t = batch  # fp_partials rows: (part, fp)
        arrays = [
            t.column("part"),
            t.column("fp"),
            pa.array(np.zeros(t.num_rows, np.int8), pa.int8()),
        ]
        names = ["part", "fp", "is_probe"]
        for c in keep_cols:
            arrays.append(pa.nulls(t.num_rows, new_schema.field(c).type))
            names.append(c)
        return pa.Table.from_arrays(arrays, names=names)

    def anti_in_part(g: pa.Table) -> pa.Table:
        is_probe = pc.equal(g.column("is_probe"), pa.scalar(1, pa.int8()))
        probe = g.filter(is_probe)
        corpus = g.filter(pc.invert(is_probe))
        seen = pc.is_in(
            probe.column("fp"), value_set=corpus.column("fp").combine_chunks()
        )
        return probe.filter(pc.invert(seen)).select(keep_cols)

    probe_ds = new_ds.map_batches(
        lambda b: fp_part(b, keep_cols, 1), batch_format="pyarrow"
    )
    return (
        probe_ds.union(fp_partials.map_batches(tag_corpus, batch_format="pyarrow"))
        .groupby("part")
        .map_groups(anti_in_part, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# Exact set-similarity self-join (AllPairs/PPJoin prefix filtering).
# ---------------------------------------------------------------------------

def setsim_join(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    t_num: int = 3,
    t_den: int = 5,
    n_parts: int = 64,
    shingle_k: int | None = None,
    order: str = "hash",
    df_broadcast_limit: int = 30_000_000,
) -> "ray.data.Dataset":
    """ALL pairs with token-set Jaccard >= t (= ``t_num/t_den``), EXACT —
    the prefix-filtering join (Bayardo et al. 2007 AllPairs / PPJoin
    family), not an LSH approximation.

    Every doc's token set sorts by a global total order (the md5 token
    hash — order choice affects only candidate counts, never the result;
    at scale switch to ascending document frequency so prefixes hit rare
    tokens).  If J(a,b) >= t then the two prefixes of length
    ``m - ceil(t*m) + 1`` must share a token, so each doc emits ONLY its
    prefix tokens, carrying its full sorted hash set:

      1. one coarse exchange co-partitions prefix rows by token hash;
      2. each partition forms candidate pairs per shared token, applies
         the length filter (``t*max(m) <= min(m)``), dedups locally, and
         verifies EXACT Jaccard with one ``intersect1d`` per pair —
         both sets are already local (they rode the prefix rows);
      3. one final coarse exchange dedups pairs found via different
         prefix tokens.

    Wire cost: each set is replicated ``(1-t)*m + 1`` times (its prefix
    count) — PPJoin's suffix-truncation trims this further at scale.
    The threshold is a RATIONAL (``t_num/t_den``); every filter and the
    final verdict are integer comparisons, so the result is
    bit-reproducible in SQL.  Empty token sets never pair (matches the
    SQL, where a token-less doc yields no rows).  Emits
    (id_a, id_b, jac_micro) with a < b, jac_micro = (inter*1e6)//union.

    ``shingle_k`` switches the set universe from unigram tokens to
    k-token shingles (the near-dup definition MinHash approximates).
    On a small-vocabulary corpus unigram SETS degenerate — long docs all
    contain most of the vocabulary, the true answer is quadratic, and NO
    algorithm makes a quadratic output small; shingles keep the set
    space sparse so only genuine near-dups qualify.
    """
    from .hashing import flat_tokens, shingle_hash_flat, token_hashes

    def _doc_hashes(batch: pa.Table):
        flat, offsets = flat_tokens(batch.column(text_col))
        hv = token_hashes(flat)
        if shingle_k is not None:
            hv, offsets = shingle_hash_flat(hv, offsets, shingle_k)
        return hv, offsets

    df_ref = None
    if order == "df":
        # ascending-document-frequency total order (AllPairs' refinement):
        # prefixes hit RARE tokens first, shrinking candidate sets.  The
        # DF table broadcasts via ray.put (one plasma copy, zero-copy
        # reads in every task); at vocabularies past df_broadcast_limit
        # swap to emitting prefixes inside a token-keyed co-partition of
        # (doc-shingles x DF) instead of the broadcast.
        def df_partial(batch: pa.Table) -> pa.Table:
            hv, offsets = _doc_hashes(batch)
            seg = np.repeat(
                np.arange(len(offsets) - 1), np.diff(offsets)
            )
            o = np.lexsort((hv, seg))
            h_s, g_s = hv[o], seg[o]
            first = np.r_[True, (h_s[1:] != h_s[:-1]) | (g_s[1:] != g_s[:-1])]
            uh = h_s[first]
            out = pa.table({"h": pa.array(uh, pa.uint64())}).group_by(
                ["h"]
            ).aggregate([([], "count_all")])
            return out.rename_columns(["h", "cnt"])

        from .agg import grouped_sum_count

        df_ds = grouped_sum_count(
            ds.map_batches(df_partial, batch_format="pyarrow"),
            ["h"], ["cnt"], {"cnt": "df"}, coarse=64,
        ).materialize()
        n_vocab = df_ds.count()
        if n_vocab > df_broadcast_limit:
            raise ValueError(
                f"setsim_join(order='df'): vocabulary {n_vocab} exceeds the "
                f"broadcast limit {df_broadcast_limit}; use order='hash' or "
                f"the token-keyed co-partition plan described in the docstring"
            )
        tables = [t for t in ray.get(df_ds.to_arrow_refs()) if t.num_rows]
        keys = (
            np.concatenate(
                [t.column("h").to_numpy(zero_copy_only=False) for t in tables]
            )
            if tables
            else np.zeros(0, np.uint64)
        )
        dfs = (
            np.concatenate(
                [t.column("df").to_numpy(zero_copy_only=False) for t in tables]
            ).astype(np.int64)
            if tables
            else np.zeros(0, np.int64)
        )
        ko = np.argsort(keys)
        df_ref = ray.put((keys[ko], dfs[ko]))

    def _list_np(col) -> "tuple[np.ndarray, np.ndarray]":
        """(flat values, offsets) of a list<...> column, zero-copy."""
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return col.values.to_numpy(zero_copy_only=False), col.offsets.to_numpy(
            zero_copy_only=False
        ).astype(np.int64)

    def prefixes(batch: pa.Table) -> pa.Table:
        """One row per (doc, partition hit by its prefix): the doc's full
        sorted set rides ONCE per partition (not once per prefix token —
        PPJoin's wire-cost trim), alongside the prefix tokens and their
        POSITIONS that land there (feeding the positional filter)."""
        hv, offsets = _doc_hashes(batch)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        if df_ref is not None:
            df_keys, df_vals = ray.get(df_ref)  # zero-copy plasma views
        out_part: list[int] = []
        out_id: list[int] = []
        out_m: list[int] = []
        tok_values: list[np.ndarray] = []
        tok_offsets = [0]
        pos_values: list[np.ndarray] = []
        set_values: list[np.ndarray] = []
        set_offsets = [0]
        for i in range(len(ids)):
            s = np.unique(hv[offsets[i] : offsets[i + 1]])
            m = len(s)
            if m == 0:
                continue
            p = m - ((t_num * m + t_den - 1) // t_den) + 1
            if df_ref is not None:
                rk = df_vals[np.searchsorted(df_keys, s)]
                s_ord = s[np.lexsort((s, rk))]  # df asc, hash tiebreak
                pref = s_ord[:p]
            else:
                pref = s[:p]
            parts = (pref % np.uint64(n_parts)).astype(np.int64)
            order = np.argsort(parts, kind="stable")
            parts_s = parts[order]
            starts = np.flatnonzero(np.r_[True, parts_s[1:] != parts_s[:-1]])
            bounds = np.r_[starts, len(parts_s)]
            for gi in range(len(starts)):
                lo, hi = bounds[gi], bounds[gi + 1]
                sel = order[lo:hi]
                out_part.append(int(parts_s[lo]))
                out_id.append(int(ids[i]))
                out_m.append(m)
                tok_values.append(pref[sel])
                pos_values.append(sel.astype(np.int64))
                tok_offsets.append(tok_offsets[-1] + (hi - lo))
                set_values.append(s)
                set_offsets.append(set_offsets[-1] + m)
        tvals = np.concatenate(tok_values) if tok_values else np.zeros(0, np.uint64)
        pvals = np.concatenate(pos_values) if pos_values else np.zeros(0, np.int64)
        svals = np.concatenate(set_values) if set_values else np.zeros(0, np.uint64)
        return pa.Table.from_arrays(
            [
                pa.array(out_part, pa.int64()),
                pa.array(out_id, pa.int64()),
                pa.array(out_m, pa.int64()),
                pa.ListArray.from_arrays(
                    pa.array(tok_offsets, pa.int32()), pa.array(tvals, pa.uint64())
                ),
                pa.ListArray.from_arrays(
                    pa.array(tok_offsets, pa.int32()), pa.array(pvals, pa.int64())
                ),
                pa.ListArray.from_arrays(
                    pa.array(set_offsets, pa.int32()), pa.array(svals, pa.uint64())
                ),
            ],
            names=["part", "id", "m", "toks", "pos", "set"],
        )

    def pairs_in_part(g: pa.Table) -> pa.Table:
        ids = g.column("id").to_numpy(zero_copy_only=False).astype(np.int64)
        ms = g.column("m").to_numpy(zero_copy_only=False).astype(np.int64)
        tok_flat, tok_off = _list_np(g.column("toks"))
        pos_flat, _ = _list_np(g.column("pos"))
        set_flat, set_off = _list_np(g.column("set"))
        # one set VIEW per distinct doc in this partition (zero-copy slices)
        doc_set: dict[int, np.ndarray] = {}
        for r in range(len(ids)):
            if int(ids[r]) not in doc_set:
                doc_set[int(ids[r])] = set_flat[set_off[r] : set_off[r + 1]]
        # explode (doc,part) rows to per-token occurrences
        counts = np.diff(tok_off)
        occ_row = np.repeat(np.arange(len(ids)), counts)
        order = np.lexsort((occ_row, tok_flat))
        tok_s, row_s = tok_flat[order], occ_row[order]
        pos_s = pos_flat[order]
        cand = set()
        i, n = 0, len(tok_s)
        while i < n:
            j = i
            while j < n and tok_s[j] == tok_s[i]:
                j += 1
            for x in range(i, j):
                rx = row_s[x]
                a, ma, pxa = int(ids[rx]), int(ms[rx]), int(pos_s[x])
                for y in range(x + 1, j):
                    ry = row_s[y]
                    b = int(ids[ry])
                    if a == b:
                        continue
                    mb, pyb = int(ms[ry]), int(pos_s[y])
                    if t_num * max(ma, mb) > t_den * min(ma, mb):
                        continue  # length filter
                    # PPJoin positional filter: at the pair's FIRST shared
                    # token nothing before the two positions is common, so
                    # overlap <= 1 + min(suffix lengths); a true pair always
                    # survives at that token (later tokens may prune — fine,
                    # the pair was already emitted there or will verify)
                    alpha = -(-(t_num * (ma + mb)) // (t_num + t_den))
                    if 1 + min(ma - pxa - 1, mb - pyb - 1) < alpha:
                        continue
                    cand.add((a, b) if a < b else (b, a))
            i = j
        out_a, out_b, out_j = [], [], []
        for a, b in cand:
            sa, sb = doc_set[a], doc_set[b]
            inter = np.intersect1d(sa, sb, assume_unique=True).size
            union = len(sa) + len(sb) - inter
            if inter * t_den >= union * t_num:
                out_a.append(a)
                out_b.append(b)
                out_j.append(inter * 1_000_000 // union)
        part2 = [(a * 1_000_003 + b) % n_parts for a, b in zip(out_a, out_b)]
        return pa.Table.from_arrays(
            [
                pa.array(part2, pa.int64()),
                pa.array(out_a, pa.int64()),
                pa.array(out_b, pa.int64()),
                pa.array(out_j, pa.int64()),
            ],
            names=["part", "id_a", "id_b", "jac_micro"],
        )

    def dedup_pairs(g: pa.Table) -> pa.Table:
        return (
            g.select(["id_a", "id_b", "jac_micro"])
            .group_by(["id_a", "id_b", "jac_micro"])
            .aggregate([])
        )

    return (
        ds.map_batches(prefixes, batch_format="pyarrow")
        # split before the exchange: sort-shuffle parallelism follows
        # input block count, and a 1-block documents read would run the
        # quadratic per-partition verify in a single task
        .repartition(min(n_parts, 32))
        .groupby("part")
        .map_groups(pairs_in_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(dedup_pairs, batch_format="pyarrow")
    )


def containment_join(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    t_num: int = 7,
    t_den: int = 10,
    n_parts: int = 64,
    shingle_k: int | None = None,
) -> "ray.data.Dataset":
    """ALL ordered pairs (a, b), a != b, with set CONTAINMENT
    |A ∩ B| / |A| >= t — the asymmetric cousin of ``setsim_join``:
    finds documents whose shingle set is (near-)subsumed by another
    document (quote extraction, partial-copy detection, benchmark
    contamination beyond exact n-gram hits).

    Prefix filtering still applies, but one-sided: if containment >= t
    then A shares a token with B among A's FIRST ``m_a - ceil(t*m_a)
    + 1`` tokens (any global total order), while B must index ALL its
    tokens — the classic probe/index asymmetry of containment joins.
    Each side ships its sorted set ONCE per partition its tokens hit
    (the PPJoin wire trim).  At web scale the small side should be the
    probe set (cf. ``decontaminate``'s broadcast of benchmark
    shingles); this symmetric-shuffle layout is the self-join shape.
    Emits (id_a, id_b, cont_micro) with cont_micro = |A∩B|*1e6 // |A|.
    The threshold is rational — every filter and the verdict are
    integer comparisons, bit-reproducible in SQL."""
    from .hashing import flat_tokens, shingle_hash_flat, token_hashes

    def _list_np(col):
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return col.values.to_numpy(zero_copy_only=False), col.offsets.to_numpy(
            zero_copy_only=False
        ).astype(np.int64)

    def emit_side(is_probe: bool):
        def fn(batch: pa.Table) -> pa.Table:
            flat, offsets = flat_tokens(batch.column(text_col))
            hv = token_hashes(flat)
            if shingle_k is not None:
                hv, offsets = shingle_hash_flat(hv, offsets, shingle_k)
            ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            out_part: list[int] = []
            out_id: list[int] = []
            out_m: list[int] = []
            tok_values: list[np.ndarray] = []
            tok_offsets = [0]
            set_values: list[np.ndarray] = []
            set_offsets = [0]
            for i in range(len(ids)):
                s = np.unique(hv[offsets[i] : offsets[i + 1]])
                m = len(s)
                if m == 0:
                    continue
                if is_probe:
                    p = m - ((t_num * m + t_den - 1) // t_den) + 1
                    emit = s[:p]
                else:
                    emit = s  # index side posts every token
                parts = (emit % np.uint64(n_parts)).astype(np.int64)
                order = np.argsort(parts, kind="stable")
                parts_s = parts[order]
                starts = np.flatnonzero(np.r_[True, parts_s[1:] != parts_s[:-1]])
                bounds = np.r_[starts, len(parts_s)]
                for gi in range(len(starts)):
                    lo, hi = bounds[gi], bounds[gi + 1]
                    sel = order[lo:hi]
                    out_part.append(int(parts_s[lo]))
                    out_id.append(int(ids[i]))
                    out_m.append(m)
                    tok_values.append(emit[sel])
                    tok_offsets.append(tok_offsets[-1] + (hi - lo))
                    set_values.append(s)
                    set_offsets.append(set_offsets[-1] + m)
            tvals = (
                np.concatenate(tok_values) if tok_values else np.zeros(0, np.uint64)
            )
            svals = (
                np.concatenate(set_values) if set_values else np.zeros(0, np.uint64)
            )
            return pa.Table.from_arrays(
                [
                    pa.array(out_part, pa.int64()),
                    pa.array(
                        np.full(len(out_id), 1 if is_probe else 0, np.int8),
                        pa.int8(),
                    ),
                    pa.array(out_id, pa.int64()),
                    pa.array(out_m, pa.int64()),
                    pa.ListArray.from_arrays(
                        pa.array(tok_offsets, pa.int32()),
                        pa.array(tvals, pa.uint64()),
                    ),
                    pa.ListArray.from_arrays(
                        pa.array(set_offsets, pa.int32()),
                        pa.array(svals, pa.uint64()),
                    ),
                ],
                names=["part", "is_probe", "id", "m", "toks", "set"],
            )

        return fn

    def pairs_in_part(g: pa.Table) -> pa.Table:
        probe_mask = pc.equal(g.column("is_probe"), pa.scalar(1, pa.int8()))
        pt = g.filter(probe_mask)
        it = g.filter(pc.invert(probe_mask))
        if pt.num_rows == 0 or it.num_rows == 0:
            return pa.table(
                {"part": pa.array([], pa.int64()), "id_a": pa.array([], pa.int64()),
                 "id_b": pa.array([], pa.int64()),
                 "cont_micro": pa.array([], pa.int64())}
            )
        p_ids = pt.column("id").to_numpy(zero_copy_only=False).astype(np.int64)
        p_tok, p_off = _list_np(pt.column("toks"))
        p_set, p_soff = _list_np(pt.column("set"))
        i_ids = it.column("id").to_numpy(zero_copy_only=False).astype(np.int64)
        i_tok, i_off = _list_np(it.column("toks"))
        i_set, i_soff = _list_np(it.column("set"))
        probe_set = {
            int(p_ids[r]): p_set[p_soff[r] : p_soff[r + 1]]
            for r in range(len(p_ids))
        }
        index_set = {
            int(i_ids[r]): i_set[i_soff[r] : i_soff[r + 1]]
            for r in range(len(i_ids))
        }
        p_occ_row = np.repeat(np.arange(len(p_ids)), np.diff(p_off))
        i_occ_row = np.repeat(np.arange(len(i_ids)), np.diff(i_off))
        # sort both occurrence streams by token, then sweep-merge
        po = np.argsort(p_tok, kind="stable")
        io = np.argsort(i_tok, kind="stable")
        ptk, prw = p_tok[po], p_occ_row[po]
        itk, irw = i_tok[io], i_occ_row[io]
        # per-TOKEN numpy pair expansion (a per-PAIR python loop was the
        # partition hot spot).  ptk/itk are ALREADY sorted, so run bounds
        # come from one adjacent-diff pass and the shared tokens from one
        # searchsorted merge — no redundant np.unique/intersect1d re-sorts
        pfirst = np.flatnonzero(np.r_[True, ptk[1:] != ptk[:-1]])
        ifirst = np.flatnonzero(np.r_[True, itk[1:] != itk[:-1]])
        pu = ptk[pfirst]
        iu = itk[ifirst]
        pcnt = np.diff(np.r_[pfirst, len(ptk)])
        icnt = np.diff(np.r_[ifirst, len(itk)])
        pos_in_i = np.searchsorted(iu, pu)
        hit = (pos_in_i < len(iu)) & (
            iu[np.minimum(pos_in_i, max(len(iu) - 1, 0))] == pu
        ) if len(iu) else np.zeros(len(pu), bool)
        p_pos = np.flatnonzero(hit)
        i_pos = pos_in_i[hit]
        common = pu[p_pos]
        pstart, istart = pfirst, ifirst
        a_chunks: list[np.ndarray] = []
        b_chunks: list[np.ndarray] = []
        for ci in range(len(common)):
            ps, pc_ = int(pstart[p_pos[ci]]), int(pcnt[p_pos[ci]])
            is_, ic_ = int(istart[i_pos[ci]]), int(icnt[i_pos[ci]])
            arows = p_ids[prw[ps : ps + pc_]]
            brows = i_ids[irw[is_ : is_ + ic_]]
            a_chunks.append(np.repeat(arows, ic_))
            b_chunks.append(np.tile(brows, pc_))
        out_a: list[int] = []
        out_b: list[int] = []
        out_c: list[int] = []
        if a_chunks:
            alla = np.concatenate(a_chunks)
            allb = np.concatenate(b_chunks)
            # composite-key dedup via lexsort — NO id packing (the module
            # invariant: ids of any width, no 32-bit aliasing)
            order = np.lexsort((allb, alla))
            a_s, b_s = alla[order], allb[order]
            firstc = np.r_[True, (a_s[1:] != a_s[:-1]) | (b_s[1:] != b_s[:-1])]
            a_s, b_s = a_s[firstc], b_s[firstc]
            keep = a_s != b_s
            for a, b in zip(a_s[keep], b_s[keep]):
                a, b = int(a), int(b)
                sa, sb = probe_set[a], index_set[b]
                inter = np.intersect1d(sa, sb, assume_unique=True).size
                if inter * t_den >= len(sa) * t_num:
                    out_a.append(a)
                    out_b.append(b)
                    out_c.append(inter * 1_000_000 // len(sa))
        part2 = [(a * 1_000_003 + b) % n_parts for a, b in zip(out_a, out_b)]
        return pa.Table.from_arrays(
            [
                pa.array(part2, pa.int64()),
                pa.array(out_a, pa.int64()),
                pa.array(out_b, pa.int64()),
                pa.array(out_c, pa.int64()),
            ],
            names=["part", "id_a", "id_b", "cont_micro"],
        )

    def dedup_pairs(g: pa.Table) -> pa.Table:
        return (
            g.select(["id_a", "id_b", "cont_micro"])
            .group_by(["id_a", "id_b", "cont_micro"])
            .aggregate([])
        )

    return (
        ds.map_batches(emit_side(True), batch_format="pyarrow")
        .union(ds.map_batches(emit_side(False), batch_format="pyarrow"))
        # sort-shuffle output parallelism follows INPUT block count: a
        # 1-block documents read would funnel all 64 logical partitions'
        # verify work into 1-2 tasks — split first so pairs_in_part runs
        # wide (same groups, same result, any physical split)
        .repartition(min(n_parts, 32))
        .groupby("part")
        .map_groups(pairs_in_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(dedup_pairs, batch_format="pyarrow")
    )


def containment_probe_broadcast(
    ds: "ray.data.Dataset",
    probe_ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    t_num: int = 7,
    t_den: int = 10,
    shingle_k: int | None = None,
    probe_limit_rows: int = 1_000_000,
) -> "ray.data.Dataset":
    """Two-dataset containment (|A ∩ B| / |A| >= t, A from ``probe_ds``,
    B from ``ds``) with the PROBE SIDE BROADCAST — the decontaminate-
    shaped scale plan for ``containment_join`` when the query corpus is
    small: probe sets and a token->probe inverted prefix index build
    ONCE in a remote task and ship via ``ray.put``; the big side then
    streams through ``map_batches`` with ZERO exchanges (no shuffle at
    all), each batch probing the index and exact-verifying its hits.
    Same output contract as ``containment_join``: (id_a, id_b,
    cont_micro), id_a != id_b; a corpus doc that also appears in the
    probe set never pairs with itself."""
    from .hashing import flat_tokens, shingle_hash_flat, token_hashes

    def _doc_sets(batch: pa.Table):
        flat, offsets = flat_tokens(batch.column(text_col))
        hv = token_hashes(flat)
        if shingle_k is not None:
            hv, offsets = shingle_hash_flat(hv, offsets, shingle_k)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return ids, hv, offsets

    @ray.remote
    def build_index(refs: list):
        tables = [t for t in ray.get(list(refs)) if t.num_rows]
        pid: list[int] = []
        sets: list[np.ndarray] = []
        tok2probe: dict[int, list[int]] = {}
        row = 0
        for t in tables:
            ids, hv, offsets = _doc_sets(t)
            for i in range(len(ids)):
                s = np.unique(hv[offsets[i] : offsets[i + 1]])
                m = len(s)
                if m == 0:
                    continue
                p = m - ((t_num * m + t_den - 1) // t_den) + 1
                pid.append(int(ids[i]))
                sets.append(s)
                for tok in s[:p]:
                    tok2probe.setdefault(int(tok), []).append(row)
                row += 1
        return pid, sets, tok2probe

    probe_mat = probe_ds.materialize()
    n_probe = probe_mat.count()
    if n_probe > probe_limit_rows:
        raise ValueError(
            f"containment_probe_broadcast: probe side has {n_probe} rows > "
            f"{probe_limit_rows}; use the shuffle plan (containment_join)"
        )
    idx_ref = build_index.remote(
        probe_mat.select_columns([id_col, text_col]).to_arrow_refs()
    )

    def scan(batch: pa.Table) -> pa.Table:
        pid, sets, tok2probe = ray.get(idx_ref)
        ids, hv, offsets = _doc_sets(batch)
        out_a: list[int] = []
        out_b: list[int] = []
        out_c: list[int] = []
        for i in range(len(ids)):
            sb = np.unique(hv[offsets[i] : offsets[i + 1]])
            if len(sb) == 0:
                continue
            b = int(ids[i])
            cand: set[int] = set()
            for tok in sb:
                hits = tok2probe.get(int(tok))
                if hits:
                    cand.update(hits)
            for r in cand:
                a = int(pid[r])
                if a == b:
                    continue
                sa = sets[r]
                inter = np.intersect1d(sa, sb, assume_unique=True).size
                if inter * t_den >= len(sa) * t_num:
                    out_a.append(a)
                    out_b.append(b)
                    out_c.append(inter * 1_000_000 // len(sa))
        return pa.table(
            {
                "id_a": pa.array(out_a, pa.int64()),
                "id_b": pa.array(out_b, pa.int64()),
                "cont_micro": pa.array(out_c, pa.int64()),
            }
        )

    return ds.map_batches(scan, batch_format="pyarrow")
