"""Span-array transforms: frontier expansion and document projections.

The interleaved span array IS the document (BASELINE.json input_hint); the
reference's per-page extraction operators become vectorized projections
over it:

- ``expand_links``: link spans → next-round frontier candidates (the
  reference extracts links but never enqueues them — src/main.py:107-108;
  the crawl engine closes that loop);
- ``project_text``: ordered text spans joined with spaces ≙ M2
  ``extract_text`` (reference: src/parser.py:41-52);
- ``explode_media``: media spans with type classification ≙ M10+M13
  (reference: src/media_downloader.py:326-340, 105-123).

All operate on ``batch_format="pyarrow"`` batches using list-flatten
kernels; the only per-row Python is URL canonicalization of discovered
links (string work proportional to the links, not the documents).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..htmlparse import get_extension, get_media_type
from ..schemas import FRONTIER_SCHEMA
from ..urlnorm import FAST_CANONICAL_RE, canonicalize, host_of, url_hashes

MEDIA_KINDS = ("image", "video", "audio", "iframe", "doc_link")


def _flat_spans(batch: pa.Table):
    """→ (flat struct array, parent row indices, span index within row)."""
    spans = batch.column("spans")
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    flat = pc.list_flatten(spans)
    parents = pc.list_parent_indices(spans).to_numpy(zero_copy_only=False)
    offsets = np.asarray(spans.offsets)
    span_idx = np.arange(len(flat), dtype=np.int64) - (offsets[parents] - offsets[0])
    return flat, parents, span_idx


def expand_links(batch: pa.Table) -> pa.Table:
    """Crawled batch (url, crawl_seq, depth, ok, spans) → FRONTIER_SCHEMA
    candidates for the next round."""
    batch = batch.filter(batch.column("ok"))
    if batch.num_rows == 0:
        return FRONTIER_SCHEMA.empty_table()
    flat, parents, span_idx = _flat_spans(batch)
    # 'redirect' spans (HTTP 3xx alias pages, synthweb p_redirect) feed the
    # frontier exactly like links: the alias fetch consumed its politeness
    # slot and the canonical target is enqueued for the next round.
    kinds = pc.struct_field(flat, "kind")
    mask = pc.is_in(
        kinds, value_set=pa.array(["link", "redirect"], pa.string())
    ).to_numpy(zero_copy_only=False)
    if not mask.any():
        return FRONTIER_SCHEMA.empty_table()
    sel = np.where(mask)[0]
    refs_arr = pc.struct_field(flat, "media_ref").take(pa.array(sel))
    if isinstance(refs_arr, pa.ChunkedArray):
        refs_arr = refs_arr.combine_chunks()
    parents_sel = parents[sel]
    span_idx_sel = span_idx[sel]
    base_urls = batch.column("url").to_pylist()
    seqs = batch.column("crawl_seq").to_numpy(zero_copy_only=False)
    depths = batch.column("depth").to_numpy(zero_copy_only=False)

    # vectorized fast path (one RE2 pass): absolute http URLs that are
    # ALREADY canonical — lowercase host, no port/query/fragment, path of
    # printable ASCII only (\x21-\x7e minus '?' '#'; RE2's \s is
    # ASCII-only, so Unicode whitespace that canonicalize() would strip
    # must fall back too) — pass through unchanged with the host extracted
    # by the same regex; canonicalize() is the identity on exactly this
    # set (tested against adversarial URLs).  The per-row fallback
    # (relative refs, schemes, ports, fragments) keeps a memo because
    # link targets are popularity-skewed.
    ext = pc.extract_regex(refs_arr, FAST_CANONICAL_RE)
    fast = pc.is_valid(ext).to_numpy(zero_copy_only=False)
    n_sel = len(sel)
    urls_np = np.empty(n_sel, dtype=object)
    hosts_np = np.empty(n_sel, dtype=object)
    keep_mask = np.zeros(n_sel, dtype=bool)
    if fast.any():
        refs_np = refs_arr.to_numpy(zero_copy_only=False)
        urls_np[fast] = refs_np[fast]
        hosts_np[fast] = pc.struct_field(ext, "h").to_numpy(zero_copy_only=False)[fast]
        keep_mask[fast] = True
    slow = np.nonzero(~fast)[0]
    if len(slow):
        refs_slow = refs_arr.take(pa.array(slow)).to_pylist()
        memo: dict[str, str | None] = {}
        for i, ref in zip(slow, refs_slow):
            if ref.startswith(("http://", "https://")):
                if ref in memo:
                    cu = memo[ref]
                else:
                    cu = canonicalize(ref)
                    memo[ref] = cu
            else:
                cu = canonicalize(ref, base_url=base_urls[parents_sel[i]])
            if cu is None:
                continue
            keep_mask[i] = True
            urls_np[i] = cu
            hosts_np[i] = host_of(cu)
    keep = np.nonzero(keep_mask)[0]
    if len(keep) == 0:
        return FRONTIER_SCHEMA.empty_table()
    urls = urls_np[keep].tolist()
    out = pa.Table.from_arrays(
        [
            pa.array(urls, pa.string()),
            pa.array(hosts_np[keep].tolist(), pa.string()),
            pa.array(np.array(url_hashes(urls), dtype=np.uint64), pa.uint64()),
            pa.array((depths[parents_sel[keep]] + 1).astype(np.int32), pa.int32()),
            pa.array(seqs[parents_sel[keep]].astype(np.int64), pa.int64()),
            pa.array(span_idx_sel[keep], pa.int64()),
            pa.array([base_urls[p] for p in parents_sel[keep]], pa.string()),
            pa.array(np.ones(len(keep), np.int64), pa.int64()),
        ],
        schema=FRONTIER_SCHEMA,
    )
    # map-side combine: block-local first-wins dedup on url_hash (keep the
    # min (disc_primary, disc_secondary) per hash).  Popular targets are
    # rediscovered constantly; dropping block-local repeats shrinks the
    # frontier shipped to the scheduler without changing its global
    # first-wins result (each block's surviving row is its block-minimum,
    # so the global minimum always survives).  The duplicate COUNT per
    # hash is folded into the survivor's ``n_disc`` — the priority
    # signal's map-side partial (global n_disc = sum of block partials).
    uh = out.column("url_hash").to_numpy(zero_copy_only=False)
    dp = out.column("disc_primary").to_numpy(zero_copy_only=False)
    ds2 = out.column("disc_secondary").to_numpy(zero_copy_only=False)
    order = np.lexsort((ds2, dp, uh))
    suh = uh[order]
    first = np.ones(len(suh), dtype=bool)
    first[1:] = suh[1:] != suh[:-1]
    if first.all():
        return out
    starts = np.where(first)[0]
    counts = np.diff(np.append(starts, len(suh)))
    keep_rows = order[first]
    back = np.argsort(keep_rows, kind="stable")
    out = out.take(pa.array(np.sort(keep_rows)))
    return out.set_column(
        out.column_names.index("n_disc"),
        "n_disc",
        pa.array(counts[back], pa.int64()),
    )


def project_text(batch: pa.Table, id_col: str = "doc_id") -> pa.Table:
    """doc → full visible text (ordered text spans joined by ' ') —
    vectorized via regrouped list offsets + Arrow ``binary_join``."""
    from .parse import _project_text_fast_cols

    text = _project_text_fast_cols(batch).column("text")
    return pa.Table.from_arrays(
        [batch.column(id_col), text], names=[id_col, "text"]
    )


def explode_media(batch: pa.Table, id_col: str = "doc_id") -> pa.Table:
    """doc → one row per media span: (id, kind, media_ref, offset,
    media_type) with reference extension classification."""
    flat, parents, span_idx = _flat_spans(batch)
    kinds = pc.struct_field(flat, "kind").to_numpy(zero_copy_only=False)
    mask = np.isin(kinds, MEDIA_KINDS)
    sel = np.where(mask)[0]
    refs = pc.struct_field(flat, "media_ref").take(pa.array(sel)).to_pylist()
    ids = batch.column(id_col).take(pa.array(parents[sel]))
    mtypes = [get_media_type(get_extension(r)) for r in refs]
    return pa.Table.from_arrays(
        [
            ids,
            pa.array(kinds[sel].tolist(), pa.string()),
            pa.array(refs, pa.string()),
            pc.struct_field(flat, "offset").take(pa.array(sel)),
            pa.array(mtypes, pa.string()),
        ],
        names=[id_col, "kind", "media_ref", "offset", "media_type"],
    )


def span_kind_counts(batch: pa.Table, id_col: str = "doc_id") -> pa.Table:
    """Per-doc span tallies ≙ A4 per-page counts (reference: src/cli.py:206-208)."""
    flat, parents, _ = _flat_spans(batch)
    kinds = pc.struct_field(flat, "kind").to_numpy(zero_copy_only=False)
    n = batch.num_rows
    cols = {k: np.zeros(n, dtype=np.int64) for k in ("text", "link", *MEDIA_KINDS)}
    for k, arr in cols.items():
        np.add.at(arr, parents[kinds == k], 1)
    arrays = [batch.column(id_col)] + [pa.array(cols[k], pa.int64()) for k in cols]
    return pa.Table.from_arrays(arrays, names=[id_col] + [f"n_{k}" for k in cols])
