"""Multinomial Naive Bayes text classification over a Ray Dataset.

Train + apply in one call over a ``documents``-shaped table (doc_id, lang,
text): token-occurrence likelihoods with Laplace(+1) smoothing over the
TRAIN vocabulary, doc-count priors, every score in integer micro-log units
(``floor(ln(p) * 1e6)`` — the repo's ln fixed-point rule, bit-identical
between numpy and DuckDB per the guard test) so partial sums are exact and
combine-order-independent.  Out-of-vocabulary eval tokens are skipped — the
standard multinomial-NB inference rule, and exactly what the SQL twin
expresses as an inner join to the train vocabulary.

Train split is the repo's deterministic ``doc_id % 10 < 3`` gate (shared
with the bigram LM scorer).  Ties in the argmax go to the lexicographically
smallest language: languages are scored in sorted order and ``np.argmax``
takes the first maximum.

Physical plans (the lm_score pattern; ``force_plan`` pins one, a
forced-path pytest asserts equality):

- **model build** (both plans): per-block (lang, token) occurrence-count
  partials collapse map-side; the only exchange is vocabulary-scale
  ((lang, token) rows), never documents.  The dense [vocab x langs]
  micro-log model is assembled per token-hash partition, so no partition
  ever needs more than its slice of the vocabulary.
- **apply, broadcast** (model rows <= ``broadcast_limit``): the model
  matrix rides the object store once (``ray.put``); each eval block does
  ONE ``pc.index_in`` gather + one bincount per language — documents
  never shuffle.
- **apply, join** (the 100-TB path — web-scale vocabularies outgrow any
  broadcast): eval (doc, token, k) occurrence partials co-partition with
  the model rows on ``hash(token) % n_parts``; each partition gathers its
  slice of scores into per-(doc, lang) partial vectors; ONE coarse
  doc-hash-partitioned sum merges them.  Documents still never shuffle —
  only occurrence partials and model rows move.

Reference parity note: the reference script has no classifier; this is a
training-data-pipeline addition (quality routing / language verification),
grafted onto the reference's documents surface.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from .agg import grouped_sum_count
from .hashing import flat_tokens, token_hashes

_MICRO = 1_000_000


def _split(batch: pa.Table, train: bool) -> pa.Table:
    did = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    m = (did % 10) < 3
    return batch.filter(pa.array(m if train else ~m))


def _token_lang_partial(batch: pa.Table) -> pa.Table:
    """Block-local (lang, token) occurrence counts over TRAIN docs."""
    b = _split(batch, True)
    if b.num_rows == 0:
        return pa.table(
            {
                "lang": pa.array([], pa.string()),
                "token": pa.array([], pa.string()),
                "cnt": pa.array([], pa.int64()),
            }
        )
    flat, offsets = flat_tokens(b.column("text"))
    ntok = np.diff(offsets)
    lang = b.column("lang")
    if isinstance(lang, pa.ChunkedArray):
        lang = lang.combine_chunks()
    lang_of = lang.take(
        pa.array(np.repeat(np.arange(b.num_rows, dtype=np.int64), ntok), pa.int64())
    )
    t = pa.table({"lang": lang_of, "token": flat})
    out = t.group_by(["lang", "token"]).aggregate([([], "count_all")])
    return out.rename_columns(["lang", "token", "cnt"])


def _ulog(num: np.ndarray, den: float) -> np.ndarray:
    """floor(ln(num/den) * 1e6) in int64 — num int array, den exact int."""
    return np.floor(np.log(num / den) * _MICRO).astype(np.int64)


def nb_confusion(
    docs: "ray.data.Dataset",
    force_plan: str | None = None,
    broadcast_limit: int = 2_000_000,
    n_parts: int = 16,
):
    """Confusion matrix (lang, pred, n_docs) of NB predictions on the
    eval split.  ``docs`` needs columns (doc_id, lang, text)."""
    # ---- pass 1: train counts (vocabulary-scale, docs never shuffle) ----
    counts = grouped_sum_count(
        docs.map_batches(_token_lang_partial, batch_format="pyarrow"),
        ["lang", "token"],
        ["cnt"],
        {"cnt": "c"},
    ).select_columns(["lang", "token", "c"])
    counts = counts.materialize()

    # metadata-scale folds: per-lang token totals, per-lang doc priors, |V|
    from ray.data.aggregate import Sum

    lt_rows = counts.groupby("lang").aggregate(Sum("c")).take_all()
    ntok_lang = {r["lang"]: int(r["sum(c)"]) for r in lt_rows}

    def _train_docs_partial(batch: pa.Table) -> pa.Table:
        b = _split(batch, True)
        out = (
            pa.table({"lang": b.column("lang")})
            .group_by(["lang"])
            .aggregate([([], "count_all")])
        )
        return out.rename_columns(["lang", "nd"])

    pr_rows = (
        docs.map_batches(_train_docs_partial, batch_format="pyarrow")
        .groupby("lang")
        .sum("nd")
        .take_all()
    )
    nd_lang = {r["lang"]: int(r["sum(nd)"]) for r in pr_rows}
    total_train = sum(nd_lang.values())
    langs = sorted(nd_lang)
    L = len(langs)
    prior = np.array(
        [int(np.floor(np.log(nd_lang[l] / float(total_train)) * _MICRO)) for l in langs],
        np.int64,
    )

    def _tag_token(b: pa.Table) -> pa.Table:
        tok = b.column("token")
        if isinstance(tok, pa.ChunkedArray):
            tok = tok.combine_chunks()
        part = (token_hashes(tok) % np.uint64(n_parts)).astype(np.int64)
        return b.append_column("part", pa.array(part, pa.int64()))

    tagged = counts.map_batches(_tag_token, batch_format="pyarrow")

    def _distinct_in_part(g: pa.Table) -> pa.Table:
        nv = len(pc.unique(g.column("token").combine_chunks()))
        return pa.table({"nv": pa.array([nv], pa.int64())})

    vocab_size = int(
        tagged.groupby("part")
        .map_groups(_distinct_in_part, batch_format="pyarrow")
        .aggregate(Sum("nv"))["sum(nv)"]
    )
    assert vocab_size > 0 and total_train > 0

    # ---- dense model rows per token partition: (lang, token, ulogp) ----
    ntok_arr = np.array([ntok_lang.get(l, 0) for l in langs], np.int64)
    lang_arr = pa.array(langs, pa.string())

    def _model_in_part(g: pa.Table) -> pa.Table:
        toks = g.column("token").combine_chunks()
        vocab = pc.unique(toks)
        T = len(vocab)
        ti = pc.index_in(toks, value_set=vocab).to_numpy(zero_copy_only=False)
        li = pc.index_in(
            g.column("lang").combine_chunks(), value_set=lang_arr
        ).to_numpy(zero_copy_only=False)
        c = np.zeros((T, L), np.int64)
        c[ti.astype(np.int64), li.astype(np.int64)] = (
            g.column("c").to_numpy(zero_copy_only=False).astype(np.int64)
        )
        ulogp = np.empty((T, L), np.int64)
        for j in range(L):
            ulogp[:, j] = _ulog(c[:, j] + 1, float(ntok_arr[j] + vocab_size))
        return pa.table(
            {
                "token": pa.concat_arrays([vocab] * L),
                "lang": pa.array(
                    [l for l in langs for _ in range(T)], pa.string()
                ),
                "ulogp": pa.array(ulogp.T.reshape(-1), pa.int64()),
            }
        )

    model = tagged.groupby("part").map_groups(_model_in_part, batch_format="pyarrow")

    model_rows = vocab_size * L
    plan = force_plan or ("broadcast" if model_rows <= broadcast_limit else "join")

    if plan == "broadcast":
        scored = _apply_broadcast(docs, model, langs, prior)
    else:
        scored = _apply_join(docs, model, langs, prior, n_parts)

    # scored: (lang, pred) per eval doc -> confusion counts
    return grouped_sum_count(
        scored, ["lang", "pred"], ["one"], {"one": "n_docs"}, count_name="__nr"
    ).select_columns(["lang", "pred", "n_docs"])


def _predict(S: np.ndarray, prior: np.ndarray, langs: list[str]) -> np.ndarray:
    """argmax over langs (sorted ascending -> first max == smallest)."""
    total = S + prior[None, :]
    idx = np.argmax(total, axis=1)
    return np.array(langs, dtype=object)[idx]


def _confusion_rows(lang_true: pa.Array, pred: np.ndarray) -> pa.Table:
    return pa.table(
        {
            "lang": lang_true,
            "pred": pa.array(list(pred), pa.string()),
            "one": pa.array(np.ones(len(pred), np.int64), pa.int64()),
        }
    )


def _apply_broadcast(docs, model, langs, prior):
    L = len(langs)
    lang_arr = pa.array(langs, pa.string())
    # model is vocabulary-scale and under broadcast_limit by plan selection
    mt = pa.concat_tables(ray.get(model.to_arrow_refs())).combine_chunks()
    vocab = pc.unique(mt.column("token").combine_chunks())
    ti = pc.index_in(mt.column("token").combine_chunks(), value_set=vocab)
    li = pc.index_in(mt.column("lang").combine_chunks(), value_set=lang_arr)
    M = np.zeros((len(vocab), L), np.int64)
    M[
        ti.to_numpy(zero_copy_only=False).astype(np.int64),
        li.to_numpy(zero_copy_only=False).astype(np.int64),
    ] = mt.column("ulogp").to_numpy(zero_copy_only=False).astype(np.int64)
    ref = ray.put((vocab, M))

    def score_block(batch: pa.Table) -> pa.Table:
        b = _split(batch, False)
        if b.num_rows == 0:
            return pa.table(
                {
                    "lang": pa.array([], pa.string()),
                    "pred": pa.array([], pa.string()),
                    "one": pa.array([], pa.int64()),
                }
            )
        vocab_, M_ = ray.get(ref)
        flat, offsets = flat_tokens(b.column("text"))
        ntok = np.diff(offsets)
        doc_of = np.repeat(np.arange(b.num_rows, dtype=np.int64), ntok)
        ii = pc.index_in(flat, value_set=vocab_)
        valid = ~pc.is_null(ii).to_numpy(zero_copy_only=False)
        idx = np.where(valid, ii.to_numpy(zero_copy_only=False), 0).astype(np.int64)
        S = np.zeros((b.num_rows, M_.shape[1]), np.int64)
        dv = doc_of[valid]
        iv = idx[valid]
        for j in range(M_.shape[1]):
            S[:, j] = np.bincount(
                dv, weights=M_[iv, j].astype(np.float64), minlength=b.num_rows
            ).astype(np.int64)
        pred = _predict(S, prior, langs)
        return _confusion_rows(b.column("lang"), pred)

    return docs.map_batches(score_block, batch_format="pyarrow")


def _apply_join(docs, model, langs, prior, n_parts):
    L = len(langs)
    lang_arr = pa.array(langs, pa.string())
    s_cols = [f"s_{j}" for j in range(L)]

    def _empty_occ() -> pa.Table:
        cols = {
            "side": pa.array([], pa.int64()),
            "part": pa.array([], pa.int64()),
            "token": pa.array([], pa.string()),
            "lang": pa.array([], pa.string()),
            "ulogp": pa.array([], pa.int64()),
            "doc_id": pa.array([], pa.int64()),
            "lang_true": pa.array([], pa.string()),
            "k": pa.array([], pa.int64()),
        }
        return pa.table(cols)

    def eval_occ(batch: pa.Table) -> pa.Table:
        b = _split(batch, False)
        if b.num_rows == 0:
            return _empty_occ()
        flat, offsets = flat_tokens(b.column("text"))
        ntok = np.diff(offsets)
        ridx = pa.array(
            np.repeat(np.arange(b.num_rows, dtype=np.int64), ntok), pa.int64()
        )
        t = pa.table(
            {
                "doc_id": b.column("doc_id").combine_chunks().take(ridx)
                if isinstance(b.column("doc_id"), pa.ChunkedArray)
                else b.column("doc_id").take(ridx),
                "lang_true": b.column("lang").combine_chunks().take(ridx)
                if isinstance(b.column("lang"), pa.ChunkedArray)
                else b.column("lang").take(ridx),
                "token": flat,
            }
        )
        occ = (
            t.group_by(["doc_id", "lang_true", "token"])
            .aggregate([([], "count_all")])
            .rename_columns(["doc_id", "lang_true", "token", "k"])
        )
        tok = occ.column("token").combine_chunks()
        part = (token_hashes(tok) % np.uint64(n_parts)).astype(np.int64)
        n = occ.num_rows
        return pa.table(
            {
                "side": pa.array(np.ones(n, np.int64), pa.int64()),
                "part": pa.array(part, pa.int64()),
                "token": occ.column("token"),
                "lang": pa.array([None] * n, pa.string()),
                "ulogp": pa.array(np.zeros(n, np.int64), pa.int64()),
                "doc_id": occ.column("doc_id").cast(pa.int64()),
                "lang_true": occ.column("lang_true"),
                "k": occ.column("k").cast(pa.int64()),
            }
        )

    def model_side(b: pa.Table) -> pa.Table:
        tok = b.column("token")
        if isinstance(tok, pa.ChunkedArray):
            tok = tok.combine_chunks()
        part = (token_hashes(tok) % np.uint64(n_parts)).astype(np.int64)
        n = b.num_rows
        return pa.table(
            {
                "side": pa.array(np.zeros(n, np.int64), pa.int64()),
                "part": pa.array(part, pa.int64()),
                "token": b.column("token"),
                "lang": b.column("lang"),
                "ulogp": b.column("ulogp").cast(pa.int64()),
                "doc_id": pa.array(np.zeros(n, np.int64), pa.int64()),
                "lang_true": pa.array([None] * n, pa.string()),
                "k": pa.array(np.zeros(n, np.int64), pa.int64()),
            }
        )

    both = docs.map_batches(eval_occ, batch_format="pyarrow").union(
        model.map_batches(model_side, batch_format="pyarrow")
    )

    def part_scores(g: pa.Table) -> pa.Table:
        side = g.column("side").to_numpy(zero_copy_only=False).astype(np.int64)
        m = g.filter(pa.array(side == 0))
        e = g.filter(pa.array(side == 1))
        if e.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "lang_true": pa.array([], pa.string()),
                    **{c: pa.array([], pa.int64()) for c in s_cols},
                }
            )
        vocab = pc.unique(m.column("token").combine_chunks())
        T = len(vocab)
        Mm = np.zeros((T, L), np.int64)
        if T:
            ti = pc.index_in(
                m.column("token").combine_chunks(), value_set=vocab
            ).to_numpy(zero_copy_only=False)
            li = pc.index_in(
                m.column("lang").combine_chunks(), value_set=lang_arr
            ).to_numpy(zero_copy_only=False)
            Mm[ti.astype(np.int64), li.astype(np.int64)] = (
                m.column("ulogp").to_numpy(zero_copy_only=False).astype(np.int64)
            )
        ei = pc.index_in(e.column("token").combine_chunks(), value_set=vocab)
        ev = ei.to_numpy(zero_copy_only=False)
        valid = ~pc.is_null(ei).to_numpy(zero_copy_only=False)
        doc = e.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        k = e.column("k").to_numpy(zero_copy_only=False).astype(np.int64)
        lt = e.column("lang_true").combine_chunks()
        udoc, ufirst, uinv = np.unique(doc, return_index=True, return_inverse=True)
        S = np.zeros((len(udoc), L), np.int64)
        dv = uinv[valid]
        iv = np.where(valid, ev, 0).astype(np.int64)[valid]
        kv = k[valid]
        for j in range(L):
            np.add.at(S[:, j], dv, kv * Mm[iv, j])
        out = {
            "doc_id": pa.array(udoc, pa.int64()),
            "lang_true": lt.take(pa.array(ufirst, pa.int64())),
        }
        for j, c in enumerate(s_cols):
            out[c] = pa.array(S[:, j], pa.int64())
        return pa.table(out)

    partials = both.groupby("part").map_groups(part_scores, batch_format="pyarrow")

    # zero frame: every eval doc appears even with no in-vocab tokens
    def zero_frame(batch: pa.Table) -> pa.Table:
        b = _split(batch, False)
        n = b.num_rows
        out = {
            "doc_id": b.column("doc_id").cast(pa.int64()),
            "lang_true": b.column("lang"),
        }
        for c in s_cols:
            out[c] = pa.array(np.zeros(n, np.int64), pa.int64())
        return pa.table(out)

    allp = partials.union(docs.map_batches(zero_frame, batch_format="pyarrow"))
    summed = grouped_sum_count(
        allp,
        ["doc_id", "lang_true"],
        s_cols,
        {c: c for c in s_cols},
        count_name="__nr",
        coarse=16,
    )

    def finalize(b: pa.Table) -> pa.Table:
        S = np.stack(
            [
                b.column(c).to_numpy(zero_copy_only=False).astype(np.int64)
                for c in s_cols
            ],
            axis=1,
        )
        pred = _predict(S, prior, langs)
        return _confusion_rows(b.column("lang_true"), pred)

    return summed.map_batches(finalize, batch_format="pyarrow")
