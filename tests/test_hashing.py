"""Unit tests for the shared vectorized tokenizer/hasher primitives
(functions/hashing.py) — the kernels every parse/dedup stage rides on."""

import numpy as np
import pyarrow as pa

from web_scraping_script_ray.functions.hashing import (
    flat_tokens,
    mix64,
    popcount64,
    shingle_hash_flat,
    token_hashes,
)


def test_flat_tokens_edges():
    texts = ["", "   ", "a", "  a b  ", "A\tB\nC", "x" * 5]
    flat, offsets = flat_tokens(pa.array(texts))
    counts = np.diff(offsets).tolist()
    assert counts == [0, 0, 1, 2, 3, 1]
    assert flat.to_pylist() == ["a", "a", "b", "a", "b", "c", "xxxxx"]  # lowered


def test_flat_tokens_ascii_whitespace_only():
    # NBSP is NOT a separator (matches the \S+ oracle idiom)
    flat, offsets = flat_tokens(pa.array(["a b c"]))
    assert np.diff(offsets).tolist() == [2]
    assert flat.to_pylist() == ["a b", "c"]


def test_token_hashes_deterministic_and_distinct():
    flat, _ = flat_tokens(pa.array(["foo bar foo baz"]))
    h = token_hashes(flat)
    assert h[0] == h[2]          # same token → same hash
    assert len({int(x) for x in h}) == 3
    h2 = token_hashes(flat)
    assert (h == h2).all()       # deterministic within/across calls
    assert token_hashes(pa.array([], pa.string())).shape == (0,)


def test_shingle_hash_flat_short_and_normal_docs():
    texts = ["a b c d", "a b", "", "a b c"]
    flat, offsets = flat_tokens(pa.array(texts))
    th = token_hashes(flat)
    sh, soff = shingle_hash_flat(th, offsets, k=3)
    assert np.diff(soff).tolist() == [2, 1, 0, 1]  # m-k+1 / 1 / 0 / 1
    # the (a b c) shingle of doc0 equals the whole-doc shingle of doc3
    assert sh[soff[0]] == sh[soff[3]]
    # short doc's single shingle differs from any 3-gram of doc0
    assert sh[soff[1]] not in sh[soff[0] : soff[1]]


def test_mix64_and_popcount():
    x = np.array([0, 1, 0xFFFFFFFFFFFFFFFF, 0xF0F0], np.uint64)
    assert popcount64(x).tolist() == [0, 1, 64, 8]
    m = mix64(x)
    assert (mix64(x) == m).all()
    assert len({int(v) for v in m}) == 4  # avalanched, no trivial collisions


def test_cdc_bounds_properties():
    """CDC invariants via hypothesis: (1) chunks reassemble the text
    byte-for-byte; (2) bounds are strictly increasing from 0 to len;
    (3) LOCALITY — editing a prefix never moves any boundary that lies
    ≥ 8 bytes past the edit's end (the shift-resilience contract CDC
    dedup relies on)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from web_scraping_script_ray.functions.dedup import _cdc_bounds

    ascii_text = st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=126),
        min_size=0,
        max_size=400,
    )

    @settings(max_examples=120, deadline=None)
    @given(ascii_text, ascii_text)
    def check(t, prefix):
        b = _cdc_bounds(t)
        assert b[0] == 0 and b[-1] == len(t.encode())
        assert (np.diff(b) > 0).all() or len(t) == 0
        # reassembly is byte-exact
        assert "".join(t[a:e] for a, e in zip(b[:-1], b[1:])) == t
        # locality: a window straddling the splice starts at >= p-7 and
        # cuts at <= p+7, so every boundary >= p+8 comes from a window
        # fully inside t — boundaries there are exactly t's, shifted
        # (and t's own interior cuts are >= 8 by construction)
        p = len(prefix.encode())
        b2 = _cdc_bounds(prefix + t)
        tail2 = {x - p for x in b2.tolist() if x >= p + 8}
        tail1 = {x for x in b.tolist() if x >= 8}
        assert tail2 == tail1

    check()
