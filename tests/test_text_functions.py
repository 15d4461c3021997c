"""Unit tests for functions.text: token counts, quality, language ID,
fingerprints (winnowing invariances)."""

import numpy as np
import pyarrow as pa

from web_scraping_script_ray.functions.text import (
    LangId,
    md5_fingerprint,
    quality_scores,
    token_counts,
    winnow_fingerprint,
)


def t(texts):
    return pa.Table.from_arrays([pa.array(texts, pa.string())], names=["text"])


def test_token_counts():
    out = token_counts(t(["a b  c", "", "one-two 3!"]))
    assert out.column("n_ws_tokens").to_pylist() == [3, 0, 2]
    # BPE-ish: 'a','b','c' = 3; 'one','-','two','3','!' = 5
    assert out.column("n_bpe_tokens").to_pylist() == [3, 0, 5]


def test_quality_scores_deterministic_and_bounded():
    out = quality_scores(t(["the cat sat on the mat.", "x" * 50, ""]))
    q = out.column("quality").to_pylist()
    assert all(0.0 <= v <= 1.0 for v in q)
    # stopword-rich text scores the stop component fully
    sr = out.column("stop_ratio").to_pylist()
    assert sr[0] > 0.3
    assert sr[1] == 0.0 and sr[2] == 0.0
    # floor6: 6 decimals max
    assert all(abs(v * 1e6 - round(v * 1e6)) < 1e-6 for v in q)


def test_langid_known_languages():
    texts = [
        "the cat and the dog are in the house with a friend",
        "der Hund und die Katze sind nicht in einem Haus",
        "le chat et le chien sont dans une maison pour la nuit",
        "el perro y el gato son una familia en la casa",
        "zz qq xx",  # no profile hits → und
    ]
    out = LangId()(t(texts))
    assert out.column("lang_pred").to_pylist() == ["en", "de", "fr", "es", "und"]


def test_md5_fingerprint_matches_hashlib():
    import hashlib

    out = md5_fingerprint(t(["hello world"]))
    assert out.column("fp_md5")[0].as_py() == hashlib.md5(b"hello world").hexdigest()


def test_winnow_fingerprint_properties():
    base = "the quick brown fox jumps over the lazy dog " * 5
    fp1 = winnow_fingerprint(base)
    assert fp1 == winnow_fingerprint(base)  # deterministic
    assert len(fp1) > 0
    # winnowing is robust to appending content: most fingerprints survive
    fp2 = set(winnow_fingerprint(base + " and then some extra words here"))
    overlap = len(set(fp1) & fp2) / len(fp1)
    assert overlap > 0.8
    # unrelated text shares almost nothing
    fp3 = set(winnow_fingerprint("completely different content " * 10))
    assert len(set(fp1) & fp3) / len(fp1) < 0.1
    assert winnow_fingerprint("") == []


def test_token_count_matches_regex_on_unicode_whitespace():
    """flat_tokens splits on ASCII whitespace only, so n_ws_tokens equals
    the \\S+ regex count (the DuckDB-oracle tokenization) even when the
    text contains NBSP / unicode spaces."""
    import re

    import pyarrow as pa

    from web_scraping_script_ray.functions.text import token_counts

    texts = ["a b c", "x y", "plain words here", ""]
    t = pa.Table.from_arrays([pa.array(texts)], names=["text"])
    out = token_counts(t)
    got = out.column("n_ws_tokens").to_pylist()
    expected = [len(re.findall(r"[^ \t\n\r\f\v]+", s)) for s in texts]
    assert got == expected  # NBSP glues tokens on both sides


def test_token_count_pretok_consistent():
    import pyarrow as pa

    from web_scraping_script_ray.functions.hashing import flat_tokens
    from web_scraping_script_ray.functions.text import token_counts

    texts = ["a b c", "one two  three", ""]
    t = pa.Table.from_arrays([pa.array(texts)], names=["text"])
    plain = token_counts(t).column("n_ws_tokens").to_pylist()
    pre = token_counts(t, pretok=flat_tokens(t.column("text")))
    assert pre.column("n_ws_tokens").to_pylist() == plain
