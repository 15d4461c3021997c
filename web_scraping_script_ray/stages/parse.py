"""Per-document parse stage — the "parsed" half of fetched-and-parsed.

What a production crawl computes per fetched page before storage
(SURVEY.md §2.3 + the training-data additions): text projection from the
span array (M2 semantics), token counts, quality score, language ID and
the MinHash signature that downstream near-dup detection keys on.

Runs as ``map_batches(DocParser, ...)`` over the crawled table — the
expensive setup (permutation matrices, language profiles) happens once
per actor; per batch everything row-wise is a tight loop over
already-projected text."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.dedup import MinHasher, simhash_from_hashes
from ..functions.hashing import flat_tokens, token_hashes
from ..functions.text import LangId, quality_scores, token_counts

PARSED_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("crawl_seq", pa.int64()),
        ("round", pa.int32()),
        ("n_ws_tokens", pa.int64()),
        ("n_bpe_tokens", pa.int64()),
        ("quality", pa.float64()),
        ("lang_pred", pa.string()),
        ("simhash", pa.uint64()),
        ("sig", pa.list_(pa.uint64())),  # MinHash signature (num_perm)
    ]
)


PARSE_COLUMNS = (
    "n_ws_tokens",
    "n_bpe_tokens",
    "quality",
    "lang_pred",
    "simhash",
    "sig",
)


class DocParser:
    """Callable: crawled batch → PARSED_SCHEMA batch.  Usable as a
    map_batches actor class OR via the per-worker-process singleton
    (``get_parser``) inside raw fetch tasks — worker processes persist
    across rounds, so setup (permutation params, language profiles)
    amortizes without an actor pool's startup ramp."""

    def __init__(self, num_perm: int = 128):
        self.mh = MinHasher(num_perm=num_perm)
        self.langid = LangId()

    def parse_columns(self, batch: pa.Table) -> dict:
        """Row-aligned parse columns for a batch that has ``spans``.

        Whitespace tokenization + token hashing happen ONCE; token counts,
        stopword quality, language ID, MinHash and SimHash all consume the
        shared (flat, offsets, hashes) — langid's letters-only word split
        runs over the token dictionary only."""
        t = _project_text_fast_cols(batch)
        texts = t.column("text")
        flat, offsets = flat_tokens(texts)
        th = token_hashes(flat)
        t = token_counts(t, pretok=(flat, offsets))
        t = quality_scores(t, pretok=(flat, offsets))
        t = self.langid(t, pretok=(flat, offsets))
        sig = self.mh.signatures_from_hashes(th, offsets)
        shs = simhash_from_hashes(th, offsets)
        n = t.num_rows
        sig_col = pa.ListArray.from_arrays(
            pa.array(np.arange(n + 1, dtype=np.int64) * self.mh.num_perm, pa.int32()),
            pa.array(sig.ravel(), pa.uint64()),
        )
        return {
            "n_ws_tokens": t.column("n_ws_tokens"),
            "n_bpe_tokens": t.column("n_bpe_tokens"),
            "quality": t.column("quality"),
            "lang_pred": t.column("lang_pred"),
            "simhash": pa.array(shs, pa.uint64()),
            "sig": sig_col,
        }

    def append_parse_columns(self, batch: pa.Table) -> pa.Table:
        for name, col in self.parse_columns(batch).items():
            batch = batch.append_column(name, col)
        return batch

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols = self.parse_columns(batch)
        return pa.Table.from_arrays(
            [
                batch.column("url"),
                batch.column("crawl_seq"),
                batch.column("round"),
                *cols.values(),
            ],
            schema=PARSED_SCHEMA,
        )


_PARSER: DocParser | None = None


def get_parser() -> DocParser:
    """Per-worker-process DocParser singleton (raw-task amortization)."""
    global _PARSER
    if _PARSER is None:
        _PARSER = DocParser()
    return _PARSER


def _project_text_fast_cols(batch: pa.Table) -> pa.Table:
    """Ordered text spans joined by ' ' — fully vectorized: filter the
    flat span values to kind=='text', regroup them per row with rebuilt
    list offsets (span order within a row is preserved by list_flatten),
    and join with Arrow's ``binary_join`` — no per-row Python."""
    spans = batch.column("spans")
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    flat = pc.list_flatten(spans)
    parents = pc.list_parent_indices(spans).to_numpy(zero_copy_only=False)
    is_text = pc.equal(pc.struct_field(flat, "kind"), "text")
    texts = pc.struct_field(flat, "text").filter(is_text)
    t_par = parents[is_text.to_numpy(zero_copy_only=False)]
    n = batch.num_rows
    counts = np.bincount(t_par, minlength=n)
    offsets = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(counts, out=offsets[1:])
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    lists = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), texts)
    joined = pc.binary_join(lists, " ")
    return pa.Table.from_arrays([joined], names=["text"])
