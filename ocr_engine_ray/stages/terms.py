"""Term-level text operators for training-data pipelines: fixed-window
chunking, term/document-frequency (TF-IDF, vocabulary build), n-gram
counts, and Gopher-style repetition metrics.

All kernels are batch-level pure functions over zero-copy Arrow tables
— tokenization is ``pc.split_pattern``, per-doc segment arithmetic is
numpy offset math, string assembly is ``pc.binary_join`` — so a batch
never pays a per-row Python loop.  Each emits *partial* (pre-shuffle)
aggregates where a global combine follows, keeping the exchange to one
row per distinct key per batch (the 100 TB shuffle discipline; compare
the reference's single-process counting in
app/utils/data_extractor.py — semantics only, no code shared).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _tokens(b: pa.Table, col: str = "text"):
    """(list<str> tokens, int64 lens, flat tokens, doc offsets) for a
    batch — whitespace tokenization identical to SQL string_split."""
    toks = pc.split_pattern(b.column(col).combine_chunks(), " ")
    lens = pc.list_value_length(toks).cast(pa.int64()) \
        .to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(toks)
    offs = np.concatenate([[0], np.cumsum(lens)])
    return toks, lens, flat, offs


def chunk_batch(b: pa.Table, window: int, stride: int,
                id_col: str = "doc_id") -> pa.Table:
    """1→N fixed-token-window chunking with overlap (window > stride):
    the training-data prep step that turns documents into model-ready
    segments.  Chunk starts are 0, stride, 2·stride, … < n_tokens; the
    final chunk may be short.  Fully vectorized: a single gather-index
    array covers every (chunk, token) pair, so overlapping windows cost
    one ``take`` + one C-level ``binary_join``."""
    if b.num_rows == 0:
        return pa.table({id_col: pa.array([], b.column(id_col).type),
                         "chunk_idx": pa.array([], pa.int64()),
                         "n_tokens": pa.array([], pa.int64()),
                         "chunk": pa.array([], pa.string())})
    _, lens, flat, offs = _tokens(b)
    n_chunks = (np.maximum(lens, 1) - 1) // stride + 1
    doc_rep = np.repeat(np.arange(len(lens)), n_chunks)
    cum = np.concatenate([[0], np.cumsum(n_chunks)])
    ordinal = np.arange(n_chunks.sum()) - cum[doc_rep]
    starts = ordinal * stride
    clens = np.minimum(window, lens[doc_rep] - starts)
    gstart = offs[doc_rep] + starts
    cstart = np.concatenate([[0], np.cumsum(clens)])
    idx = np.repeat(gstart - cstart[:-1], clens) + np.arange(clens.sum())
    values = flat.take(pa.array(idx, pa.int64()))
    larr = pa.ListArray.from_arrays(pa.array(cstart, pa.int32()), values)
    return pa.table({
        id_col: b.column(id_col).combine_chunks()
                 .take(pa.array(doc_rep, pa.int64())),
        "chunk_idx": pa.array(ordinal, pa.int64()),
        "n_tokens": pa.array(clens, pa.int64()),
        "chunk": pc.binary_join(larr, " "),
    })


def term_partials(b: pa.Table) -> pa.Table:
    """Per-batch (term, p_tf, p_df) partials for TF-IDF / vocabulary:
    one Arrow group_by over (doc, term) gives per-doc term counts, a
    second collapses to term level — term frequency (sum) and document
    frequency (count of docs containing the term).  The downstream
    shuffle moves one row per distinct term per batch, never tokens."""
    _, lens, flat, _ = _tokens(b)
    d = np.repeat(np.arange(len(lens)), lens)
    t = pa.table({"d": pa.array(d, pa.int64()), "term": flat})
    per_doc = t.group_by(["d", "term"]).aggregate([("term", "count")])
    g = per_doc.group_by("term").aggregate(
        [("term_count", "sum"), ("term_count", "count")])
    return g.rename_columns(["term", "p_tf", "p_df"])


def _bigram_parts(flat, lens, offs):
    """Adjacent-token bigram strings (doc-boundary-safe) + the doc index
    of each bigram.  Returns (bigram StringArray, doc idx ndarray)."""
    tot = len(flat)
    if tot == 0:
        return pa.array([], pa.string()), np.array([], np.int64)
    intra = np.arange(tot) - np.repeat(offs[:-1], lens)
    keep = intra < np.repeat(lens, lens) - 1
    idx = np.flatnonzero(keep)
    left = flat.take(pa.array(idx, pa.int64()))
    right = flat.take(pa.array(idx + 1, pa.int64()))
    bg = pc.binary_join_element_wise(left, right, " ")
    d = np.repeat(np.arange(len(lens)), np.maximum(lens - 1, 0))
    return bg, d


def bigram_partials(b: pa.Table) -> pa.Table:
    """Per-batch bigram (2-gram language-model) counts — the n-gram LM
    counting primitive; the shuffle sees (bigram, p_n) rows only."""
    _, lens, flat, offs = _tokens(b)
    bg, _ = _bigram_parts(flat, lens, offs)
    if len(bg) == 0:
        return pa.table({"bigram": pa.array([], pa.string()),
                         "p_n": pa.array([], pa.int64())})
    g = pa.table({"bigram": bg}).group_by("bigram") \
        .aggregate([("bigram", "count")])
    return g.rename_columns(["bigram", "p_n"])


def repetition_batch(b: pa.Table, min_distinct_ratio: float,
                     max_top_bigram_frac: float) -> pa.Table:
    """Gopher-style per-document repetition metrics + quality gate:
    distinct-token ratio and the fraction of adjacent-bigram slots
    taken by the single most frequent bigram.  Both ratios divide the
    same int64s the SQL twin divides, so the doubles (and the keep
    flag's threshold comparisons) are bit-identical.  Embarrassingly
    parallel — one batch in, one row per doc out, no shuffle."""
    if b.num_rows == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "n_tokens": pa.array([], pa.int64()),
                         "n_distinct": pa.array([], pa.int64()),
                         "distinct_ratio": pa.array([], pa.float64()),
                         "top_bigram_frac": pa.array([], pa.float64()),
                         "keep": pa.array([], pa.int64())})
    _, lens, flat, offs = _tokens(b)
    nb = len(lens)
    d = np.repeat(np.arange(nb), lens)
    per_doc = pa.table({"d": pa.array(d, pa.int64()), "term": flat}) \
        .group_by(["d", "term"]).aggregate([("term", "count")])
    dist = per_doc.group_by("d").aggregate([("term", "count")])
    n_distinct = np.zeros(nb, np.int64)
    n_distinct[dist.column("d").to_numpy()] = \
        dist.column("term_count").to_numpy()

    bg, bd = _bigram_parts(flat, lens, offs)
    mx = np.zeros(nb, np.int64)
    if len(bg) > 0:
        cnt = pa.table({"d": pa.array(bd, pa.int64()), "b": bg}) \
            .group_by(["d", "b"]).aggregate([("b", "count")])
        mxt = cnt.group_by("d").aggregate([("b_count", "max")])
        mx[mxt.column("d").to_numpy()] = mxt.column("b_count_max").to_numpy()

    distinct_ratio = n_distinct / lens
    top_bigram_frac = np.where(lens > 1, mx / np.maximum(lens - 1, 1), 0.0)
    keep = ((distinct_ratio >= min_distinct_ratio)
            & (top_bigram_frac <= max_top_bigram_frac)).astype(np.int64)
    return pa.table({
        "doc_id": b.column("doc_id"),
        "n_tokens": pa.array(lens, pa.int64()),
        "n_distinct": pa.array(n_distinct, pa.int64()),
        "distinct_ratio": pa.array(distinct_ratio, pa.float64()),
        "top_bigram_frac": pa.array(top_bigram_frac, pa.float64()),
        "keep": pa.array(keep, pa.int64()),
    })


def training_prep_filter(b: pa.Table, min_tokens: int,
                         min_stopword_ratio: float,
                         min_distinct_ratio: float,
                         max_top_bigram_frac: float,
                         stopwords=("the", "a")) -> pa.Table:
    """One-pass survivor filter for the composed training-prep
    pipeline: C4-style token/stopword gate + Gopher-style repetition
    gate evaluated together on a single tokenization, returning the
    surviving (doc_id, text) rows.  All ratios divide the same int64s
    the SQL twin divides — threshold comparisons are bit-identical."""
    if b.num_rows == 0:
        return b.select(["doc_id", "text"])
    _, lens, flat, offs = _tokens(b)
    nb = len(lens)
    d = np.repeat(np.arange(nb), lens)

    stop = pc.is_in(flat, value_set=pa.array(list(stopwords))) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    csum = np.concatenate([[0], np.cumsum(stop)])
    n_stop = csum[offs[1:]] - csum[offs[:-1]]
    stop_ratio = n_stop / np.maximum(lens, 1)

    per_doc = pa.table({"d": pa.array(d, pa.int64()), "term": flat}) \
        .group_by(["d", "term"]).aggregate([("term", "count")])
    dist = per_doc.group_by("d").aggregate([("term", "count")])
    n_distinct = np.zeros(nb, np.int64)
    n_distinct[dist.column("d").to_numpy()] = \
        dist.column("term_count").to_numpy()

    bg, bd = _bigram_parts(flat, lens, offs)
    mx = np.zeros(nb, np.int64)
    if len(bg) > 0:
        cnt = pa.table({"d": pa.array(bd, pa.int64()), "b": bg}) \
            .group_by(["d", "b"]).aggregate([("b", "count")])
        mxt = cnt.group_by("d").aggregate([("b_count", "max")])
        mx[mxt.column("d").to_numpy()] = mxt.column("b_count_max").to_numpy()

    keep = ((lens >= min_tokens)
            & (stop_ratio >= min_stopword_ratio)
            & (n_distinct / lens >= min_distinct_ratio)
            & (np.where(lens > 1, mx / np.maximum(lens - 1, 1), 0.0)
               <= max_top_bigram_frac))
    return b.select(["doc_id", "text"]).filter(pa.array(keep))
