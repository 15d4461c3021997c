"""Text-analysis operators for large-scale training-data pipelines.

These extend the reference's text handling (M2 ``extract_text`` /
M8 ``clean_text``, reference: src/parser.py:41-52, 209-226) with the
operations a 100 TB training-data pipeline needs: token counting,
quality scoring, language identification and document fingerprinting.

All operators are **vectorized batch functions** over ``pyarrow`` batches
(`batch_format="pyarrow"`), designed for ``Dataset.map_batches``:

- token counts use ``pyarrow.compute.count_substring_regex`` (no Python
  row loop);
- quality scoring is pure Arrow/numpy arithmetic over those counts;
- language ID scores character n-gram / stopword profiles with one
  compiled regex pass per language (per-batch, not per-row);
- fingerprints (md5 + winnowing rolling hash) hash the UTF-8 bytes
  directly from the Arrow buffer.

SQL-parity notes: ``token_count`` / ``quality`` columns are defined so a
DuckDB oracle can reproduce them bit-for-bit (integer counts; float
ratios computed with one division and rounded to 6 decimals).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .hashing import flat_tokens, shingle_hash_flat, token_hashes

# Whitespace tokenization: runs of non-space (mirrors the reference's
# space-joined text model, src/parser.py:51-52).
WS_TOKEN_RE = r"\S+"
# BPE-ish pre-tokenizer: letter runs | single digits | single punctuation.
# Kept RE2-compatible so the DuckDB oracle uses the same pattern.
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"

STOPWORDS = frozenset(
    (
        "the", "a", "an", "of", "to", "in", "and", "or", "is", "are",
        "for", "on", "with", "as", "by", "at", "from",
    )
)
_STOP_ARR = pa.array(sorted(STOPWORDS), pa.string())
_PUNCT_RE = r"[.,!?;:]"


def floor6(x: np.ndarray) -> np.ndarray:
    """floor to 6 decimals — unlike round(), floor() has identical
    semantics in numpy and DuckDB (numpy rounds half-to-even, DuckDB
    half-away-from-zero), so oracle SQL can reproduce it bit-for-bit."""
    return np.floor(x * 1e6) / 1e6


def token_counts(
    batch: pa.Table, text_col: str = "text", pretok=None
) -> pa.Table:
    """Append ``n_ws_tokens`` / ``n_bpe_tokens`` (int64) columns.

    ``pretok=(flat, offsets)`` reuses a shared whitespace tokenization:
    ``n_ws_tokens`` = per-row token count (identical to the ``\\S+`` regex
    count), and ``n_bpe_tokens`` is counted over the DICTIONARY of unique
    tokens then scatter-summed — the BPE pattern cannot match across
    whitespace, so per-token counts sum to the full-text count exactly,
    at a fraction of the regex-scan cost (corpora repeat tokens heavily).
    """
    text = batch.column(text_col)
    if pretok is not None:
        flat, offsets = pretok
        ws = pa.array(np.diff(offsets), pa.int64())
        enc = pc.dictionary_encode(flat)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        per_uniq = (
            pc.count_substring_regex(enc.dictionary, BPE_TOKEN_RE)
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        tok = per_uniq[enc.indices.to_numpy(zero_copy_only=False)]
        parents = np.repeat(np.arange(batch.num_rows, dtype=np.int64), np.diff(offsets))
        bpe = pa.array(
            np.bincount(parents, weights=tok, minlength=batch.num_rows).astype(np.int64),
            pa.int64(),
        )
    else:
        ws = pc.count_substring_regex(text, WS_TOKEN_RE).cast(pa.int64())
        bpe = pc.count_substring_regex(text, BPE_TOKEN_RE).cast(pa.int64())
    batch = batch.append_column("n_ws_tokens", ws)
    return batch.append_column("n_bpe_tokens", bpe)


def quality_scores(
    batch: pa.Table, text_col: str = "text", pretok=None
) -> pa.Table:
    """Append quality columns: ``q_chars``, ``q_tokens``, ``stop_ratio``,
    ``punct_ratio``, ``quality`` (all deterministic; ratios floored to 6dp).

    quality = 0.5·min(tokens,100)/100 + 0.3·min(stop_ratio·5,1) +
              0.2·(1 − min(punct_ratio·10,1)), floored to 6dp — a
    length/stopword/punctuation blend in the C4/Gopher-rule spirit.
    Stopword count = whitespace tokens (lowercased) that are exactly a
    STOPWORDS member — a definition a SQL oracle can replicate exactly
    (list_filter over regexp_extract_all), unlike a lookahead regex
    (RE2 has no lookahead).
    """
    text = batch.column(text_col)
    n_chars = pc.utf8_length(text).cast(pa.int64()).to_numpy(zero_copy_only=False).astype(np.float64)
    # stopword count: Arrow tokenize (lower + whitespace split) → one is_in
    # membership probe over the flat token array → per-row bincount — the
    # same "token in STOPWORDS" semantics, no per-row Python.  A caller
    # that already tokenized (the crawl parse) passes pretok to skip the
    # re-tokenization AND the \S+ count scan (token count == len(tokens)).
    if pretok is not None:
        flat, offsets = pretok
    else:
        flat, offsets = flat_tokens(text)
    n_tok = np.diff(offsets).astype(np.float64)
    parents = np.repeat(np.arange(batch.num_rows, dtype=np.int64), np.diff(offsets))
    enc = pc.dictionary_encode(flat)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    stop_uniq = pc.is_in(enc.dictionary, value_set=_STOP_ARR).to_numpy(zero_copy_only=False)
    is_stop = stop_uniq[enc.indices.to_numpy(zero_copy_only=False)]
    n_stop = np.bincount(parents[is_stop], minlength=batch.num_rows).astype(np.float64)
    n_punct = (
        pc.count_substring_regex(text, _PUNCT_RE).cast(pa.int64())
        .to_numpy(zero_copy_only=False).astype(np.float64)
    )
    stop_ratio = floor6(np.where(n_tok > 0, n_stop / np.maximum(n_tok, 1), 0.0))
    punct_ratio = floor6(np.where(n_chars > 0, n_punct / np.maximum(n_chars, 1), 0.0))
    quality = floor6(
        0.5 * np.minimum(n_tok, 100.0) / 100.0
        + 0.3 * np.minimum(stop_ratio * 5.0, 1.0)
        + 0.2 * (1.0 - np.minimum(punct_ratio * 10.0, 1.0))
    )
    batch = batch.append_column("q_chars", pa.array(n_chars.astype(np.int64), pa.int64()))
    batch = batch.append_column("q_tokens", pa.array(n_tok.astype(np.int64), pa.int64()))
    batch = batch.append_column("stop_ratio", pa.array(stop_ratio, pa.float64()))
    batch = batch.append_column("punct_ratio", pa.array(punct_ratio, pa.float64()))
    return batch.append_column("quality", pa.array(quality, pa.float64()))


def _gram_stats(
    th: np.ndarray, offsets: np.ndarray, counts: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc k-gram repetition stats from flat token hashes.

    Returns ``(top_frac, dup_frac)`` float64 arrays (floored to 6dp):
    ``top_frac`` = occurrences of the single most frequent k-gram / total
    k-gram occurrences; ``dup_frac`` = occurrences belonging to k-grams
    that appear >= 2 times / total occurrences.  Docs with fewer than k
    tokens score 0 on both (they have no k-grams — matches the SQL
    oracle's empty-group semantics, so the whole-doc fallback shingle
    ``shingle_hash_flat`` emits for short docs is masked out here).

    Fully vectorized: one lexsort of (doc, gram_hash) pairs, run-length
    encoding, then ``reduceat`` per doc — no per-row Python.  Grouping is
    by 64-bit shingle hash; the oracle groups by the gram string (token
    strings contain no whitespace, so the space-joined gram is injective)
    — identical absent a 64-bit collision inside one document.
    """
    n = len(counts)
    top = np.zeros(n, np.float64)
    dup = np.zeros(n, np.float64)
    sh, soff = shingle_hash_flat(th, offsets, k)
    m = len(sh)
    if m:
        doc_of = np.repeat(np.arange(n, dtype=np.int64), np.diff(soff))
        order = np.lexsort((sh, doc_of))
        sd, dd = sh[order], doc_of[order]
        new_run = np.ones(m, bool)
        new_run[1:] = (sd[1:] != sd[:-1]) | (dd[1:] != dd[:-1])
        run_starts = np.nonzero(new_run)[0]
        run_len = np.diff(np.append(run_starts, m))
        run_doc = dd[run_starts]
        first_of_doc = np.ones(len(run_starts), bool)
        first_of_doc[1:] = run_doc[1:] != run_doc[:-1]
        firsts = np.nonzero(first_of_doc)[0]
        docs_present = run_doc[firsts]
        top_c = np.maximum.reduceat(run_len, firsts)
        dup_c = np.add.reduceat(np.where(run_len >= 2, run_len, 0), firsts)
        tot_c = np.add.reduceat(run_len, firsts)
        valid = counts[docs_present] >= k  # mask whole-doc fallback shingles
        dv = docs_present[valid]
        top[dv] = top_c[valid] / tot_c[valid]
        dup[dv] = dup_c[valid] / tot_c[valid]
    return floor6(top), floor6(dup)


def repetition_scores(
    batch: pa.Table, text_col: str = "text", pretok=None
) -> pa.Table:
    """Gopher/C4-style repetition + shape quality rules, per document.

    Appends ``n_tokens``, ``mean_wlen`` (mean token length, 6dp floor),
    ``top2gram_frac`` (share of 2-gram occurrences taken by the most
    frequent 2-gram), ``dup3gram_frac`` (share of 3-gram occurrences
    whose 3-gram repeats), and ``keep_doc`` (int64 0/1): the document
    passes when 5 <= n_tokens <= 1000, 2.0 <= mean_wlen <= 12.0,
    top2gram_frac < 0.35 and dup3gram_frac < 0.4 — the repetition /
    word-shape filters of Rae et al. (Gopher) §A1.1, adapted to the
    corpus's whitespace tokens.  All thresholds compare 6dp-floored
    values, so a SQL oracle reproduces ``keep_doc`` exactly.
    """
    text = batch.column(text_col)
    if pretok is not None:
        flat, offsets = pretok
    else:
        flat, offsets = flat_tokens(text)
    n = batch.num_rows
    counts = np.diff(offsets)
    tlen = pc.binary_length(flat).cast(pa.int64()).to_numpy(zero_copy_only=False)
    parents = np.repeat(np.arange(n, dtype=np.int64), counts)
    chars = np.bincount(parents, weights=tlen, minlength=n)
    mean_wlen = floor6(np.where(counts > 0, chars / np.maximum(counts, 1), 0.0))
    th = token_hashes(flat)
    top2, _ = _gram_stats(th, offsets, counts, 2)
    _, dup3 = _gram_stats(th, offsets, counts, 3)
    keep = (
        (counts >= 5) & (counts <= 1000)
        & (mean_wlen >= 2.0) & (mean_wlen <= 12.0)
        & (top2 < 0.35) & (dup3 < 0.4)
    ).astype(np.int64)
    batch = batch.append_column("n_tokens", pa.array(counts, pa.int64()))
    batch = batch.append_column("mean_wlen", pa.array(mean_wlen, pa.float64()))
    batch = batch.append_column("top2gram_frac", pa.array(top2, pa.float64()))
    batch = batch.append_column("dup3gram_frac", pa.array(dup3, pa.float64()))
    return batch.append_column("keep_doc", pa.array(keep, pa.int64()))


# ---------------------------------------------------------------------------
# Language identification — stopword-profile heuristic.
# ---------------------------------------------------------------------------

# Small high-frequency function-word profiles (top words per language).
_LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "it", "for", "with", "was", "this"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "eine", "mit", "für", "auf", "ich"),
    "fr": ("le", "la", "les", "et", "est", "une", "des", "dans", "que", "pour", "pas", "je"),
    "es": ("el", "la", "los", "las", "y", "es", "una", "en", "que", "por", "con", "para"),
    "it": ("il", "la", "e", "che", "di", "un", "una", "per", "non", "sono", "con", "del"),
}


# words = maximal [a-zà-ÿ]+ runs of the lowercased text — tokenized by
# splitting on the complement (identical to re.findall of _WORD_PATTERN)
_WORD_PATTERN = "[a-zà-ÿ]+"
_WORD_SPLIT = "[^a-zà-ÿ]+"
_WORD_RE = re.compile(_WORD_PATTERN)


class LangId:
    """Actor-pool callable: builds per-language profile-word Arrow arrays
    once per actor (`__init__`); per batch, tokenizes the whole column with
    Arrow kernels and scores profile-word membership per language with one
    ``is_in`` probe + bincount per language — no per-row Python.

    Score(lang) = profile-word hits / max(word tokens, 1); predicted
    language is the argmax (ties → lexicographic first), or 'und'
    (undetermined) when the best score < ``min_score``.
    """

    def __init__(self, min_score: float = 0.05, text_col: str = "text"):
        self.min_score = min_score
        self.text_col = text_col
        self.langs = sorted(_LANG_PROFILES)
        self.profiles = {
            lang: pa.array(sorted(set(_LANG_PROFILES[lang])), pa.string())
            for lang in self.langs
        }

    def __call__(self, batch: pa.Table, pretok=None) -> pa.Table:
        """``pretok=(flat, offsets)`` reuses a shared lowercased
        whitespace tokenization (the fused crawl parse computes it once
        for every kernel).  Word tokens are the letters-only runs, but
        the ``_WORD_SPLIT`` regex runs over the DICTIONARY of unique
        whitespace tokens only — a letter run can never cross whitespace,
        so per-unique word counts/profile hits scatter-summed through the
        dictionary indices equal the full-text values exactly, at a
        fraction of the regex-scan cost (corpora repeat tokens heavily)."""
        n = batch.num_rows
        if pretok is None:
            flat, offsets = flat_tokens(batch.column(self.text_col))
        else:
            flat, offsets = pretok
        parents = np.repeat(np.arange(n, dtype=np.int64), np.diff(offsets))
        enc = pc.dictionary_encode(flat)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        idx = enc.indices.to_numpy(zero_copy_only=False)
        n_uniq = len(enc.dictionary)
        # letters-only word tokens of each UNIQUE whitespace token
        lists = pc.split_pattern_regex(enc.dictionary, _WORD_SPLIT)
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        sub = pc.list_flatten(lists)
        subp = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
        nonempty = pc.greater(pc.binary_length(sub), 0)
        ne = nonempty.to_numpy(zero_copy_only=False)
        if not ne.all():
            sub = sub.filter(nonempty)
            subp = subp[ne]
        m_u = np.bincount(subp, minlength=n_uniq).astype(np.float64)
        denom = np.maximum(np.bincount(parents, weights=m_u[idx], minlength=n), 1.0)
        scores = np.zeros((len(self.langs), n), dtype=np.float64)
        sub_enc = pc.dictionary_encode(sub)
        if isinstance(sub_enc, pa.ChunkedArray):
            sub_enc = sub_enc.combine_chunks()
        sidx = sub_enc.indices.to_numpy(zero_copy_only=False)
        for li, lang in enumerate(self.langs):
            hit_uniq = pc.is_in(
                sub_enc.dictionary, value_set=self.profiles[lang]
            ).to_numpy(zero_copy_only=False)
            hits_u = np.bincount(
                subp, weights=hit_uniq[sidx].astype(np.float64), minlength=n_uniq
            )
            scores[li] = np.bincount(parents, weights=hits_u[idx], minlength=n) / denom
        best = scores.argmax(axis=0)
        best_score = scores.max(axis=0)
        pred = np.array(self.langs, dtype=object)[best]
        pred[best_score < self.min_score] = "und"
        batch = batch.append_column("lang_pred", pa.array(pred.tolist(), pa.string()))
        return batch.append_column(
            "lang_score", pa.array(floor6(best_score), pa.float64())
        )


def langid_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Stateless convenience wrapper (tests); production uses the LangId
    actor pool so regex compilation happens once per actor."""
    return LangId(text_col=text_col)(batch)


# ---------------------------------------------------------------------------
# Document fingerprinting.
# ---------------------------------------------------------------------------

def md5_fingerprint(batch: pa.Table, text_col: str = "text", out_col: str = "fp_md5") -> pa.Table:
    """Exact-content fingerprint: md5 hex of the UTF-8 bytes — the same
    content-hash idea as the reference's media filenames
    (reference: src/media_downloader.py:181-188)."""
    md5 = hashlib.md5
    vals = [md5(t.encode("utf-8")).hexdigest() for t in batch.column(text_col).to_pylist()]
    return batch.append_column(out_col, pa.array(vals, pa.string()))


_B = np.uint64(1000003)          # polynomial base
_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)


def _rolling_hashes(data: np.ndarray, k: int) -> np.ndarray:
    """uint64 polynomial hashes of all k-byte windows (vectorized)."""
    if len(data) < k:
        return np.zeros(0, dtype=np.uint64)
    # Horner over k offsets: h[i] = sum data[i+j] * B^(k-1-j)
    out = np.zeros(len(data) - k + 1, dtype=np.uint64)
    for j in range(k):
        out = (out * _B + data[j : len(data) - k + 1 + j].astype(np.uint64)) & _MASK
    return out


def winnow_fingerprint(
    text: str, k: int = 8, window: int = 16
) -> list[int]:
    """Winnowing (Schleimer et al., SIGMOD'03): min rolling k-gram hash per
    sliding window, deduplicated — a compact, position-robust fingerprint."""
    data = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    hs = _rolling_hashes(data, k)
    if len(hs) == 0:
        return []
    if len(hs) <= window:
        return [int(hs.min())]
    w = np.lib.stride_tricks.sliding_window_view(hs, window)
    mins = w.min(axis=1)
    keep = np.ones(len(mins), dtype=bool)
    keep[1:] = mins[1:] != mins[:-1]
    return np.unique(mins[keep]).tolist()


def winnow_batch(batch: pa.Table, text_col: str = "text", k: int = 8, window: int = 16) -> pa.Table:
    """Append ``fp_winnow`` (list<uint64>) — per-doc winnowing fingerprint."""
    fps = [
        winnow_fingerprint(t, k, window)
        for t in batch.column(text_col).to_pylist()
    ]
    return batch.append_column("fp_winnow", pa.array(fps, pa.list_(pa.uint64())))


# ---------------------------------------------------------------------------
# Fixed-width token chunking ("lines" for corpora without newline structure).
# ---------------------------------------------------------------------------

def token_chunks(
    texts: "pa.Array | pa.ChunkedArray", width: int = 3
) -> tuple[pa.Array, np.ndarray, np.ndarray, np.ndarray]:
    """Split each text into consecutive ``width``-token chunks (lowercased
    whitespace tokens, last chunk ragged) — the unit of C4/RefinedWeb-style
    duplicate-"line" removal for a corpus whose documents carry no newline
    structure.  With a newline-structured corpus the same pipeline splits
    on ``'\\n'`` instead; only this kernel changes.

    Fully vectorized: one shared tokenization (``flat_tokens``), chunk
    boundaries by numpy arithmetic, chunk strings via one
    ``pc.binary_join`` over a ListArray view of the flat token buffer.

    Returns ``(chunks, doc_of_chunk, chunk_tok_counts, n_chunks_per_doc)``:
    ``chunks`` is a StringArray of all chunk strings (tokens joined by a
    single space) in document order; ``doc_of_chunk[i]`` is the row index
    owning chunk i; ``chunk_tok_counts[i]`` its token count;
    ``n_chunks_per_doc`` has one entry per input row (0 for empty docs).
    """
    flat, offsets = flat_tokens(texts)
    n = len(offsets) - 1
    ntok = np.diff(offsets)
    nchunks = (ntok + width - 1) // width
    total = int(nchunks.sum())
    doc_of_chunk = np.repeat(np.arange(n, dtype=np.int64), nchunks)
    within = np.arange(total, dtype=np.int64) - np.repeat(
        np.cumsum(nchunks) - nchunks, nchunks
    )
    starts = offsets[:-1][doc_of_chunk] + within * width
    ends = np.minimum(starts + width, offsets[1:][doc_of_chunk])
    # Chunks tile each doc's token range contiguously and docs abut, so
    # `starts` + the final offset is a valid monotone offsets vector.
    chunk_offsets = np.append(starts, offsets[-1]).astype(np.int32)
    lists = pa.ListArray.from_arrays(pa.array(chunk_offsets, pa.int32()), flat)
    chunks = pc.binary_join(lists, " ")
    if isinstance(chunks, pa.ChunkedArray):
        chunks = chunks.combine_chunks()
    return chunks, doc_of_chunk, (ends - starts).astype(np.int64), nchunks.astype(np.int64)


# ---------------------------------------------------------------------------
# PII redaction (the C4/CCNet "remove personal data before training" step).
# ---------------------------------------------------------------------------

# (name, RE2 pattern, replacement token).  Patterns are kept inside the
# RE2 subset that pyarrow.compute and DuckDB share, so the SQL oracle
# applies the *same* automaton: no lookarounds, no backrefs.  Order
# matters (applied top to bottom); the replacement tokens contain no
# characters any later pattern can match.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\+\d{1,3}-\d{3}-\d{4}", "<PHONE>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
)


def redact_pii(
    batch: pa.Table, text_col: str = "text", out_col: str = "text_redacted"
) -> pa.Table:
    """Redact emails / phone numbers / IPv4 addresses from ``text_col``.

    One ``pc.count_substring_regex`` + one ``pc.replace_substring_regex``
    per pattern per batch — fully vectorized, stateless, streams at any
    corpus size (no shuffle, no driver state).  Counts are measured on
    the ORIGINAL text (before any replacement) so they are independent
    of pattern order; replacements chain in ``PII_PATTERNS`` order.

    Appends ``n_<name>`` (int64) per pattern plus ``out_col`` (string).
    """
    text = batch.column(text_col)
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    for name, pat, _tok in PII_PATTERNS:
        cnt = pc.count_substring_regex(text, pat).cast(pa.int64())
        batch = batch.append_column(f"n_{name}", cnt)
    red = text
    for _name, pat, tok in PII_PATTERNS:
        red = pc.replace_substring_regex(red, pat, tok)
    return batch.append_column(out_col, red)


def token_entropy(batch: pa.Table, id_col: str = "doc_id",
                  text_col: str = "text") -> pa.Table:
    """Per-doc Shannon token entropy in integer micro-nat units — the
    classic diversity/quality signal (low entropy ≙ templated or
    repeated text).  entropy_micro = −Σ_tok c·floor(ln(c/n)·10⁶): each
    per-token term is floored BEFORE the weighted sum, so the result is
    pure integer arithmetic and bit-reproducible in SQL (the lm_score
    micro-log contract).  Per-doc, block-local — no shuffle; the
    (row, token)-count reduction is one Arrow C++ hash aggregation.
    Docs with zero tokens are dropped (entropy undefined), matching the
    SQL group-by."""
    from .hashing import flat_tokens

    flat, offsets = flat_tokens(batch.column(text_col))
    per_doc = np.diff(offsets)
    doc_of = np.repeat(np.arange(batch.num_rows, dtype=np.int64), per_doc)
    enc = pc.dictionary_encode(flat)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    pairs = pa.table(
        {
            "d": pa.array(doc_of, pa.int64()),
            "t": pa.array(
                enc.indices.to_numpy(zero_copy_only=False).astype(np.int64),
                pa.int64(),
            ),
        }
    )
    cnt = pairs.group_by(["d", "t"]).aggregate([([], "count_all")])
    d = cnt.column("d").to_numpy(zero_copy_only=False)
    c = cnt.column("count_all").to_numpy(zero_copy_only=False).astype(np.int64)
    n = per_doc[d].astype(np.float64)
    term = c * np.floor(np.log(c.astype(np.float64) / n) * 1e6).astype(np.int64)
    ent = np.zeros(batch.num_rows, dtype=np.int64)
    np.add.at(ent, d, -term)
    uniq = np.zeros(batch.num_rows, dtype=np.int64)
    np.add.at(uniq, d, 1)
    keep = per_doc > 0
    return pa.Table.from_arrays(
        [
            batch.column(id_col).filter(pa.array(keep)),
            pa.array(per_doc[keep], pa.int64()),
            pa.array(uniq[keep], pa.int64()),
            pa.array(ent[keep], pa.int64()),
        ],
        names=[id_col, "n_tokens", "n_unique", "entropy_micro"],
    )


def flesch_milli_counts(txt) -> tuple:
    """Shared integer Flesch reading-ease kernel — the SINGLE definition
    used by both ``queries.q_flesch`` and the ``readability_filter``
    post-processing op (one formula, no silent divergence).

    Words = ``\\S+`` runs, sentences = ``[.!?]+`` runs (min 1), syllable
    proxy = ``[aeiouy]+`` vowel groups in the lowercase text (min 1);
    each rational term floors independently:
    ``flesch_milli = 206835 − 1015·W // S − 84600·V // W`` (W clamped to
    ≥1 inside the formula).  Returns ``(w, s, v, flesch_milli)`` int64
    arrays; the score is only MEANINGFUL where ``w > 0`` — callers drop
    or gate those rows themselves."""
    w = pc.count_substring_regex(txt, pattern=r"\S+").to_numpy(
        zero_copy_only=False
    ).astype(np.int64)
    s = np.maximum(
        pc.count_substring_regex(txt, pattern=r"[.!?]+").to_numpy(
            zero_copy_only=False
        ).astype(np.int64),
        1,
    )
    v = np.maximum(
        pc.count_substring_regex(
            pc.utf8_lower(txt), pattern=r"[aeiouy]+"
        ).to_numpy(zero_copy_only=False).astype(np.int64),
        1,
    )
    wk = np.maximum(w, 1)
    flesch = 206_835 - 1015 * wk // s - 84_600 * v // wk
    return w, s, v, flesch
