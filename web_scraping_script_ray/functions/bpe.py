"""Byte-pair-encoding tokenizer TRAINING and ENCODING over Ray Datasets.

The standard greedy pair-merge trainer (Sennrich et al. 2016, public
algorithm): pre-tokenize → distinct-word frequency table → repeat
{count adjacent symbol pairs weighted by word frequency, merge the most
frequent pair everywhere}; encoding applies the learned merges to the
vocabulary once and maps every corpus token through it.  The reference
repo has no tokenizer — this is a training-data-platform extension
alongside the token counting in ``functions/text.py``
(``q_bpe_top_pairs`` computes exactly this trainer's FIRST merge
decision).

Plan shape — the corpus is touched ONCE per product; every merge round
is vocabulary-scale:

  PASS 1 (the only corpus-scale exchange): per-block token-count
  partials → coarse grouped sum → the distinct (word, n) table.

  MERGE LOOP over the vocabulary table, size-selected (house pattern):
    * single path (≤ ``_BPE_SINGLE_LIMIT`` distinct words): the whole
      loop runs in ONE remote task — dict pair counts + left-to-right
      re-segmentation, the oracle-shaped plan.
    * distributed path: per round —
        1. ``map_batches`` per-block pair partials (factorized numpy
           codes + ``np.add.at``, pre-aggregated within the block so
           only distinct-pair rows cross the exchange);
        2. coarse grouped sum over (lhs, rhs) — PAIR-vocabulary scale;
        3. per-block local argmax candidates → the driver picks the
           global best from O(blocks) three-column rows (argmax
           distributes over any partitioning);
        4. the winning pair is broadcast into a vectorized apply over
           flattened symbol arrays: match positions, resolve overlaps
           with the even-offset-within-run rule (== left-to-right
           non-overlapping), splice, re-offset; ``materialize()`` so
           round lineage stays flat.
  Tie-break everywhere: count DESC then (lhs, rhs) ASC — deterministic
  and mirrored by the unrolled-CTE SQL oracle.

  ENCODE (``bpe_encode_counts``): the trained final state already maps
  every distinct word to its merged symbol count, so per-doc BPE token
  counts need only a (word → n_toks) lookup over the corpus tokens —
  size-selected again: a ``ray.put`` broadcast of the sorted vocab
  (vectorized ``searchsorted`` per batch) when it fits, else a
  co-partitioned hash join of per-block (word, doc, cnt) partials with
  the vocab table (two exchanges, nothing driver-resident).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

_BPE_SINGLE_LIMIT = 2_000_000  # distinct words one task's heap absorbs
_BPE_BCAST_LIMIT = 2_000_000  # vocab rows a ray.put broadcast absorbs


def word_count_table(ds: "ray.data.Dataset", text_col: str = "text"):
    """Distinct (word, n) over the corpus — lowercased ``\\S+`` tokens
    (the ``flat_tokens`` contract every SQL oracle shares).  The one
    corpus-scale exchange of BPE training."""
    from .agg import grouped_sum_count
    from .hashing import flat_tokens

    def partial(batch: pa.Table) -> pa.Table:
        flat, _ = flat_tokens(batch.column(text_col))
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        t = (
            pa.table({"word": flat})
            .group_by(["word"])
            .aggregate([([], "count_all")])
        )
        return t.rename_columns(["word", "__n"])

    out = grouped_sum_count(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["word"], ["__n"], {"__n": "n"}, coarse=16,
    )
    return out.select_columns(["word", "n"])


def _merge_rounds_seq(
    words: list[str], counts: list[int], n_merges: int
) -> tuple[list[tuple[int, str, str, int]], list[tuple]]:
    """The sequential greedy trainer over a (word, count) vocabulary —
    the single-task path AND the semantics both plans must match.
    Returns (merges, final symbol sequences aligned with ``words``)."""
    seqs = [tuple(w) for w in words]
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        pair_n: dict[tuple[str, str], int] = {}
        for seq, c in zip(seqs, counts):
            for j in range(len(seq) - 1):
                p = (seq[j], seq[j + 1])
                pair_n[p] = pair_n.get(p, 0) + c
        if not pair_n:
            break
        best_n = max(pair_n.values())
        lhs, rhs = min(p for p, v in pair_n.items() if v == best_n)
        merges.append((rank, lhs, rhs, best_n))
        new_sym = lhs + rhs
        next_seqs = []
        for seq in seqs:
            res = []
            j = 0
            while j < len(seq):
                if j + 1 < len(seq) and seq[j] == lhs and seq[j + 1] == rhs:
                    res.append(new_sym)
                    j += 2
                else:
                    res.append(seq[j])
                    j += 1
            next_seqs.append(tuple(res))
        seqs = next_seqs
    return merges, seqs


def _merges_table(merges: list[tuple[int, str, str, int]]) -> pa.Table:
    return pa.table(
        {
            "rank": pa.array([m[0] for m in merges], pa.int64()),
            "lhs": pa.array([m[1] for m in merges], pa.string()),
            "rhs": pa.array([m[2] for m in merges], pa.string()),
            "n": pa.array([m[3] for m in merges], pa.int64()),
        }
    )


@ray.remote
def _bpe_single(word_refs: list, n_merges: int) -> pa.Table:
    tabs = [t for t in ray.get(list(word_refs)) if t.num_rows]
    if not tabs:
        return _merges_table([])
    t = pa.concat_tables(tabs)
    merges, _ = _merge_rounds_seq(
        t.column("word").to_pylist(), t.column("n").to_pylist(), n_merges
    )
    return _merges_table(merges)


@ray.remote
def _bpe_encode_single(word_refs: list, n_merges: int) -> pa.Table:
    """(word, n_toks) after the whole merge loop, in one task."""
    tabs = [t for t in ray.get(list(word_refs)) if t.num_rows]
    empty = pa.table(
        {"word": pa.array([], pa.string()), "n_toks": pa.array([], pa.int64())}
    )
    if not tabs:
        return empty
    t = pa.concat_tables(tabs)
    words = t.column("word").to_pylist()
    _, seqs = _merge_rounds_seq(words, t.column("n").to_pylist(), n_merges)
    return pa.table(
        {
            "word": pa.array(words, pa.string()),
            "n_toks": pa.array([len(s) for s in seqs], pa.int64()),
        }
    )


def _flat_syms(batch: pa.Table):
    """(flat symbol object-array, int64 offsets, per-word counts)."""
    col = batch.column("syms")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = np.asarray(col.values.to_pylist(), dtype=object)
    offs = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    offs = offs - offs[0]
    n = batch.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
    return flat, offs, n


def _pair_positions(flat: np.ndarray, offs: np.ndarray):
    """Boolean mask of WITHIN-WORD adjacent-pair positions over
    ``flat[:-1]`` (seam positions between words masked out)."""
    total = len(flat)
    valid = np.ones(max(total - 1, 0), bool)
    ends = offs[1:-1] - 1  # last symbol index of each word but the final
    sel = ends[(ends >= 0) & (ends < total - 1)]
    valid[sel] = False
    return valid


def _to_syms(batch: pa.Table) -> pa.Table:
    """(word, n) → (word, syms list<string>, n) — character split."""
    ws = batch.column("word").to_pylist()
    offs = np.zeros(len(ws) + 1, np.int64)
    np.cumsum([len(w) for w in ws], out=offs[1:])
    flat = pa.array([c for w in ws for c in w], pa.string())
    return pa.table(
        {
            "word": batch.column("word"),
            "syms": pa.ListArray.from_arrays(pa.array(offs, pa.int32()), flat),
            "n": batch.column("n"),
        }
    )


def _pair_partials(batch: pa.Table) -> pa.Table:
    empty = pa.table(
        {
            "lhs": pa.array([], pa.string()),
            "rhs": pa.array([], pa.string()),
            "__c": pa.array([], pa.int64()),
        }
    )
    flat, offs, n = _flat_syms(batch)
    if len(flat) < 2:
        return empty
    valid = _pair_positions(flat, offs)
    wlen = np.diff(offs)
    wn = np.repeat(n, wlen)[:-1]  # word count at each pair position
    ls, rs, w = flat[:-1][valid], flat[1:][valid], wn[valid]
    if not len(ls):
        return empty
    ul, il = np.unique(ls, return_inverse=True)
    ur, ir = np.unique(rs, return_inverse=True)
    code = il.astype(np.int64) * len(ur) + ir
    uc, inv = np.unique(code, return_inverse=True)
    sums = np.zeros(len(uc), np.int64)
    np.add.at(sums, inv, w)
    return pa.table(
        {
            "lhs": pa.array(ul[uc // len(ur)].tolist(), pa.string()),
            "rhs": pa.array(ur[uc % len(ur)].tolist(), pa.string()),
            "__c": pa.array(sums, pa.int64()),
        }
    )


def _local_best(batch: pa.Table) -> pa.Table:
    if batch.num_rows == 0:
        return batch
    c = batch.column("cnt").to_numpy(zero_copy_only=False).astype(np.int64)
    ls = np.asarray(batch.column("lhs").to_pylist(), dtype=object)
    rs = np.asarray(batch.column("rhs").to_pylist(), dtype=object)
    i = int(np.lexsort((rs, ls, -c))[0])
    return pa.table(
        {
            "lhs": pa.array([ls[i]], pa.string()),
            "rhs": pa.array([rs[i]], pa.string()),
            "cnt": pa.array([int(c[i])], pa.int64()),
        }
    )


def _apply_merge(batch: pa.Table, lhs: str, rhs: str) -> pa.Table:
    flat, offs, n = _flat_syms(batch)
    total = len(flat)
    if total < 2:
        return batch
    valid = _pair_positions(flat, offs)
    mm = (flat[:-1] == lhs) & (flat[1:] == rhs) & valid
    if not mm.any():
        return batch
    # even offset within each run of consecutive matches ==
    # left-to-right non-overlapping (runs only occur when lhs == rhs;
    # seams break runs via the valid mask)
    prev = np.r_[False, mm[:-1]]
    run_start = mm & ~prev
    run_id = np.cumsum(run_start)
    starts = np.flatnonzero(run_start)
    start_of = np.zeros(len(mm), np.int64)
    start_of[mm] = starts[run_id[mm] - 1]
    keep = mm & ((np.arange(len(mm)) - start_of) % 2 == 0)
    kidx = np.flatnonzero(keep)
    drop = np.zeros(total, bool)
    drop[kidx + 1] = True
    new_flat = flat.copy()
    new_flat[kidx] = lhs + rhs
    out_flat = new_flat[~drop]
    wlen = np.diff(offs)
    word_of = np.repeat(np.arange(len(wlen)), wlen)
    drops_per_word = np.bincount(word_of[drop], minlength=len(wlen))
    new_offs = np.zeros(len(offs), np.int64)
    np.cumsum(wlen - drops_per_word, out=new_offs[1:])
    return pa.table(
        {
            "word": batch.column("word"),
            "syms": pa.ListArray.from_arrays(
                pa.array(new_offs, pa.int32()),
                pa.array(out_flat.tolist(), pa.string()),
            ),
            "n": batch.column("n"),
        }
    )


def _distributed_loop(
    state: "ray.data.Dataset", n_merges: int
) -> tuple[list[tuple[int, str, str, int]], "ray.data.Dataset"]:
    """The per-round distributed merge loop over a (word, syms, n)
    vocabulary Dataset.  Returns (merges, final state)."""
    from .agg import grouped_sum_count

    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        pairs = grouped_sum_count(
            state.map_batches(_pair_partials, batch_format="pyarrow"),
            ["lhs", "rhs"], ["__c"], {"__c": "cnt"}, coarse=16,
        ).select_columns(["lhs", "rhs", "cnt"])
        cands = pairs.map_batches(_local_best, batch_format="pyarrow").take_all()
        if not cands:
            break
        best = min(cands, key=lambda r: (-r["cnt"], r["lhs"], r["rhs"]))
        lhs, rhs, cnt = best["lhs"], best["rhs"], int(best["cnt"])
        merges.append((rank, lhs, rhs, cnt))
        state = state.map_batches(
            lambda b, lhs=lhs, rhs=rhs: _apply_merge(b, lhs, rhs),
            batch_format="pyarrow",
        ).materialize()
    return merges, state


def _vocab_plan(
    ds: "ray.data.Dataset", text_col: str, force_plan: str | None
):
    from ..stages.rank import _nrows as _nrows_meta

    words = word_count_table(ds, text_col).materialize()
    refs = words.to_arrow_refs()
    n_words = sum(ray.get([_nrows_meta.remote(r) for r in refs]))
    plan = force_plan or (
        "single" if n_words <= _BPE_SINGLE_LIMIT else "distributed"
    )
    return words, refs, n_words, plan


def bpe_train(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    n_merges: int = 12,
    force_plan: str | None = None,
) -> "ray.data.Dataset":
    """Train ``n_merges`` BPE merges over ``ds[text_col]`` → Dataset of
    (rank, lhs, rhs, n).  ``force_plan`` pins "single" or "distributed"
    (forced-path equality in tests/test_new_ops.py)."""
    import ray.data as rd

    words, refs, _, plan = _vocab_plan(ds, text_col, force_plan)
    if plan == "single":
        return rd.from_arrow_refs([_bpe_single.remote(refs, n_merges)])
    state = words.map_batches(_to_syms, batch_format="pyarrow").materialize()
    merges, _ = _distributed_loop(state, n_merges)
    return rd.from_arrow(_merges_table(merges))


def bpe_encode_counts(
    ds: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    n_merges: int = 12,
    force_plan: str | None = None,
    force_lookup: str | None = None,
) -> "ray.data.Dataset":
    """Per-doc BPE token counts under the trained merges → Dataset of
    (doc_id, n_tokens); docs with no tokens are absent (SQL join
    parity).  ``force_plan`` pins the trainer path,
    ``force_lookup`` pins "broadcast" or "join" for the corpus-token →
    vocab lookup (all four combinations equality-tested)."""
    import ray.data as rd

    from .agg import grouped_sum_count
    from .hashing import flat_tokens

    words, refs, n_words, plan = _vocab_plan(ds, text_col, force_plan)
    if plan == "single":
        wordlen = rd.from_arrow_refs(
            [_bpe_encode_single.remote(refs, n_merges)]
        ).materialize()
    else:
        state = words.map_batches(_to_syms, batch_format="pyarrow").materialize()
        _, state = _distributed_loop(state, n_merges)

        def lens(b: pa.Table) -> pa.Table:
            col = b.column("syms")
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            offs = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table(
                {
                    "word": b.column("word"),
                    "n_toks": pa.array(np.diff(offs), pa.int64()),
                }
            )

        wordlen = state.map_batches(lens, batch_format="pyarrow").materialize()

    lookup = force_lookup or (
        "broadcast" if n_words <= _BPE_BCAST_LIMIT else "join"
    )

    def doc_word_counts(batch: pa.Table) -> pa.Table:
        """Per-block (doc_id, word, cnt) — in-block pre-aggregation."""
        flat, offsets = flat_tokens(batch.column(text_col))
        toks = np.asarray(flat.to_pylist(), dtype=object)
        parent = np.repeat(
            np.arange(len(offsets) - 1, dtype=np.int64), np.diff(offsets)
        )
        ids = (
            batch.column(id_col)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)[parent]
        )
        order = np.lexsort((toks, ids))
        t_s, i_s = toks[order], ids[order]
        new = np.ones(len(t_s), bool)
        new[1:] = (t_s[1:] != t_s[:-1]) | (i_s[1:] != i_s[:-1])
        run = np.cumsum(new) - 1
        cnt = np.bincount(run)
        first = np.flatnonzero(new)
        return pa.table(
            {
                id_col: pa.array(i_s[first], pa.int64()),
                "word": pa.array(t_s[first].tolist(), pa.string()),
                "cnt": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    if lookup == "broadcast":
        parts = [t for t in ray.get(wordlen.to_arrow_refs()) if t.num_rows]
        if parts:
            wl = pa.concat_tables(parts)
            vocab = np.asarray(wl.column("word").to_pylist(), dtype="U")
            lens_arr = (
                wl.column("n_toks").to_numpy(zero_copy_only=False).astype(np.int64)
            )
            order = np.argsort(vocab)
            vocab, lens_arr = vocab[order], lens_arr[order]
        else:
            vocab = np.zeros(0, "U1")
            lens_arr = np.zeros(0, np.int64)
        vref = ray.put((vocab, lens_arr))

        def per_doc(batch: pa.Table) -> pa.Table:
            voc, ln = ray.get(vref)
            t = doc_word_counts(batch)
            if t.num_rows == 0 or not len(voc):
                return pa.table(
                    {
                        id_col: pa.array([], pa.int64()),
                        "n_tokens": pa.array([], pa.int64()),
                    }
                )
            w = np.asarray(t.column("word").to_pylist(), dtype="U")
            pos = np.searchsorted(voc, w)
            pos = np.minimum(pos, len(voc) - 1)
            # every corpus word is in the trained vocab by construction
            toks = (
                ln[pos] * t.column("cnt").to_numpy(zero_copy_only=False)
            ).astype(np.int64)
            ids = t.column(id_col).to_numpy(zero_copy_only=False)
            uids, inv = np.unique(ids, return_inverse=True)
            sums = np.zeros(len(uids), np.int64)
            np.add.at(sums, inv, toks)
            return pa.table(
                {
                    id_col: pa.array(uids, pa.int64()),
                    "n_tokens": pa.array(sums, pa.int64()),
                }
            )

        per_block = ds.map_batches(per_doc, batch_format="pyarrow")
        # a doc can span blocks only via block splits — fold exactly
        return grouped_sum_count(
            per_block.map_batches(
                lambda b: b.rename_columns([id_col, "__t"]),
                batch_format="pyarrow",
            ),
            [id_col], ["__t"], {"__t": "n_tokens"}, coarse=16,
        ).select_columns([id_col, "n_tokens"])

    # join path: co-partition per-block (doc, word, cnt) partials with
    # the vocab by crc32(word) (process-stable, unlike Python's
    # randomized str hash) — two exchanges, nothing driver-resident
    import zlib

    KP = 64

    def tag_corpus(batch: pa.Table) -> pa.Table:
        t = doc_word_counts(batch)
        ws = t.column("word").to_pylist()
        part = np.fromiter(
            (zlib.crc32(w.encode()) % KP for w in ws), np.int64, count=len(ws)
        )
        return pa.table(
            {
                "part": pa.array(part, pa.int64()),
                "word": t.column("word"),
                "a": t.column(id_col),
                "b": t.column("cnt"),
                "kind": pa.array(np.ones(t.num_rows, np.int8), pa.int8()),
            }
        )

    def tag_vocab(b: pa.Table) -> pa.Table:
        ws = b.column("word").to_pylist()
        part = np.fromiter(
            (zlib.crc32(w.encode()) % KP for w in ws), np.int64, count=len(ws)
        )
        return pa.table(
            {
                "part": pa.array(part, pa.int64()),
                "word": b.column("word"),
                "a": b.column("n_toks").cast(pa.int64()),
                "b": pa.array(np.zeros(b.num_rows, np.int64), pa.int64()),
                "kind": pa.array(np.zeros(b.num_rows, np.int8), pa.int8()),
            }
        )

    import pyarrow.compute as pc

    def join_part(g: pa.Table) -> pa.Table:
        is_v = pc.equal(g.column("kind"), pa.scalar(0, pa.int8()))
        voc = g.filter(is_v)
        cor = g.filter(pc.invert(is_v))
        if cor.num_rows == 0 or voc.num_rows == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "__t": pa.array([], pa.int64()),
                }
            )
        at = pc.index_in(
            cor.column("word"), value_set=voc.column("word").combine_chunks()
        )
        if at.null_count:  # vocab is built from this corpus — fail loudly
            raise AssertionError("bpe_encode: corpus word missing from vocab")
        ln = voc.column("a").combine_chunks().take(at).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        ids = cor.column("a").to_numpy(zero_copy_only=False).astype(np.int64)
        cnt = cor.column("b").to_numpy(zero_copy_only=False).astype(np.int64)
        uids, inv = np.unique(ids, return_inverse=True)
        sums = np.zeros(len(uids), np.int64)
        np.add.at(sums, inv, ln * cnt)
        return pa.table(
            {
                id_col: pa.array(uids, pa.int64()),
                "__t": pa.array(sums, pa.int64()),
            }
        )

    joined = (
        ds.map_batches(tag_corpus, batch_format="pyarrow")
        .union(wordlen.map_batches(tag_vocab, batch_format="pyarrow"))
        .groupby("part")
        .map_groups(join_part, batch_format="pyarrow")
    )
    return grouped_sum_count(
        joined, [id_col], ["__t"], {"__t": "n_tokens"}, coarse=16
    ).select_columns([id_col, "n_tokens"])
