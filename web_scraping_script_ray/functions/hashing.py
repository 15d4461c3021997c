"""Vectorized tokenization + hashing primitives shared by the hot kernels
(MinHash, SimHash, language ID, quality scoring, crawl parse).

Everything here is batch-vectorized: tokenization is Arrow C++ kernels
(``utf8_lower`` → ``ascii_split_whitespace`` / ``split_pattern_regex``),
token hashing is md5-prefix over the *dictionary* of unique tokens
(deterministic AND SQL-reproducible — DuckDB computes the identical
uint64, which is what makes SimHash oracle-able), and everything
downstream (shingle mixing, signature minima, band keys, popcounts) is
numpy over uint64 arrays.  No per-row or per-token Python in
any of it — the per-shingle ``hashlib`` loops these replace were the
engine's single hottest code path (both the near-dup queries and the
crawl's fused parse).

Semantics are unchanged from the scalar originals: tokens come from
``text.lower().split()`` (or a regex split), a k-shingle's hash mixes the
k token hashes in order, documents shorter than k tokens contribute one
shingle over all their tokens, empty documents contribute none.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = [
    "flat_tokens",
    "token_hashes",
    "shingle_hash_flat",
    "mix64",
    "popcount64",
]

_B = np.uint64(0x100000001B3)  # FNV-ish odd multiplier for polynomial mixes
_GOLD = np.uint64(0x9E3779B97F4A7C15)


def mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — avalanches a uint64 array in place-ish."""
    x = x.astype(np.uint64, copy=True)
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


def flat_tokens(
    texts: "pa.Array | pa.ChunkedArray", pattern: str | None = None
) -> tuple[pa.Array, np.ndarray]:
    """Lowercase + tokenize a string column.

    Returns ``(flat, offsets)`` where ``flat`` is the concatenated token
    strings of all rows (no empties) and ``offsets`` is int64 of length
    ``n_rows+1`` — row i's tokens are ``flat[offsets[i]:offsets[i+1]]``.

    ``pattern=None`` splits on ASCII-whitespace runs — exactly the token
    boundaries of the RE2/DuckDB ``\\S+`` idiom every SQL oracle uses
    (``\\s`` in RE2 is ASCII-only; Unicode spaces like NBSP glue into
    their neighbors on BOTH sides, so engine and oracle always agree).
    Otherwise splits on the regex (== ``re.findall`` of its complement).
    """
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n = len(texts)
    low = pc.utf8_lower(texts)
    lists = (
        pc.ascii_split_whitespace(low)
        if pattern is None
        else pc.split_pattern_regex(low, pattern)
    )
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    flat = pc.list_flatten(lists)
    parents = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
    # Arrow's split emits empty strings at edges (leading/trailing
    # whitespace, empty input); Python's .split() / findall do not.
    nonempty = pc.greater(pc.binary_length(flat), 0)
    ne = nonempty.to_numpy(zero_copy_only=False)
    if not ne.all():
        flat = flat.filter(nonempty)
        parents = parents[ne]
    counts = np.bincount(parents, minlength=n).astype(np.int64)
    offsets = np.zeros(n + 1, np.int64)
    np.cumsum(counts, out=offsets[1:])
    return flat, offsets


def token_hashes(flat: pa.Array) -> np.ndarray:
    """uint64 hash per token: the FIRST 8 BYTES (big-endian) OF md5 —
    chosen because a SQL engine can reproduce it exactly
    (``('0x' || substr(md5(t),1,16))::UBIGINT`` in DuckDB), which makes
    every token-hash-derived value (SimHash in particular) oracle-able.
    Hashed only over the *unique* tokens (dictionary encode in C++), then
    gathered: corpora repeat tokens heavily, so the per-unique md5 loop
    is small."""
    if len(flat) == 0:
        return np.zeros(0, np.uint64)
    enc = pc.dictionary_encode(flat)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    idx = enc.indices.to_numpy(zero_copy_only=False)
    md5 = hashlib.md5
    words = enc.dictionary.to_pylist()
    hv = np.fromiter(
        (
            int.from_bytes(md5(w.encode("utf-8")).digest()[:8], "big")
            for w in words
        ),
        dtype=np.uint64,
        count=len(words),
    )
    return hv[idx]


def shingle_hash_flat(
    th: np.ndarray, offsets: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """Hashes of the k-token shingles of every row, from flat token hashes.

    Returns ``(sh, soff)``: row i's shingle hashes are
    ``sh[soff[i]:soff[i+1]]``.  Rows with ``0 < m < k`` tokens get one
    shingle mixing all m tokens (matching the scalar original's
    whole-document shingle); empty rows get none.
    """
    n_docs = len(offsets) - 1
    counts = np.diff(offsets)
    sc = np.where(counts >= k, counts - k + 1, (counts > 0).astype(np.int64))
    soff = np.zeros(n_docs + 1, np.int64)
    np.cumsum(sc, out=soff[1:])
    out = np.zeros(soff[-1], np.uint64)
    N = len(th)
    if N >= k:
        M = N - k + 1
        acc = np.zeros(M, np.uint64)
        for j in range(k):
            acc = acc * _B + th[j : M + j]
        acc = mix64(acc)
        doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), counts)
        valid = doc_of[:M] == doc_of[k - 1 :]
        vidx = np.nonzero(valid)[0]
        if len(vidx):
            d = doc_of[vidx]
            out[soff[d] + (vidx - offsets[d])] = acc[vidx]
    # rare short rows (0 < m < k): one shingle over all m token hashes
    short = np.nonzero((counts > 0) & (counts < k))[0]
    for di in short:
        a = np.zeros(1, np.uint64)
        for v in th[offsets[di] : offsets[di + 1]]:
            a = a * _B + v
        out[soff[di]] = mix64(a)[0]
    return out, soff


_POPCNT8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def popcount64(x: np.ndarray) -> np.ndarray:
    """Per-element popcount of a uint64 array via a byte lookup table."""
    b = np.ascontiguousarray(x, dtype=np.uint64).view(np.uint8).reshape(-1, 8)
    return _POPCNT8[b].sum(axis=1).astype(np.int64)


def band_salt(n_bands: int) -> np.ndarray:
    """Per-band xor salts so identical row-chunks in different bands never
    collide into one bucket."""
    return mix64(np.arange(1, n_bands + 1, dtype=np.uint64) * _GOLD)


def span_content_hashes(spans) -> "np.ndarray":
    """uint64 content fingerprint per document from its span list — the
    ETag of the conditional-GET refresh model: md5-prefix (the repo's
    oracle-able hash) of the spans serialized as
    ``kind\\x1ftext\\x1fmedia_ref`` joined by ``\\x1e``.  Offsets are
    EXCLUDED on purpose: a changed doc is one whose *content* changed.
    Vectorized end-to-end: struct-field joins + one Arrow list-join;
    the md5 loop runs once per document string."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    n = len(spans)
    if n == 0:
        return np.zeros(0, np.uint64)
    flat = pc.list_flatten(spans)
    per_span = pc.binary_join_element_wise(
        pc.struct_field(flat, "kind"),
        pc.struct_field(flat, "text"),
        pc.struct_field(flat, "media_ref"),
        "\x1f",
    )
    offsets = pc.list_value_length(spans).to_numpy(zero_copy_only=False)
    offs = np.zeros(n + 1, np.int32)
    np.cumsum(offsets, out=offs[1:])
    lst = pa.ListArray.from_arrays(pa.array(offs, pa.int32()), per_span)
    joined = pc.binary_join(lst, "\x1e")
    md5 = hashlib.md5
    return np.fromiter(
        (
            int.from_bytes(md5(s.encode("utf-8")).digest()[:8], "big")
            for s in joined.to_pylist()
        ),
        dtype=np.uint64,
        count=n,
    )


def span_content_hash_py(spans: list[dict]) -> int:
    """Scalar twin of ``span_content_hashes`` for the sequential oracle —
    pytest-pinned equal (tests/test_hashing.py)."""
    s = "\x1e".join(
        f"{sp['kind']}\x1f{sp['text']}\x1f{sp['media_ref']}" for sp in spans
    )
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "big")
