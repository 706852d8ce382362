"""Corpus-trained word-bigram LM + perplexity scorer (CCNet-style).

The reference consumes an upstream-trained KenLM quality signal the
same way it consumes fastText LID (passenger columns,
``/root/reference/fineweb/fineweb2_download.py:14-24``); the frozen
byte-bigram scorer in ``functions/perplexity.py`` covers the
*interface*. This module adds the TRAINING half a standalone engine
needs — the standard web-pipeline flow (CCNet; Wenzek et al. 2019,
arXiv:1911.00359): fit an n-gram LM on a reference corpus, then score
and filter a target corpus by perplexity.

Shape:

- **fit** — ONE ``map_batches`` pass emits per-batch Arrow ``group_by``
  count partials (unigrams and in-document adjacent bigrams); a thin
  keyed exchange sums them exactly (integer counts, order-free). Only
  (gram, count) rows ever shuffle — never the corpus. The driver pulls
  the PRUNED model (``min_count`` floors both tables), which is then a
  broadcast-sized artifact like any other frozen scorer state.
- **score** — the model is ``ray.put`` once; each batch maps words to
  vocab ids via ONE ``index_in`` against the model vocabulary (exact,
  no hashing — OOV becomes the UNK id), packs adjacent in-document id
  pairs into int64 keys, binary-searches the sorted bigram key table,
  and reduces add-alpha log-probs per document with the same
  fixed-order ``reduceat`` layout as the byte-bigram kernel: per-doc
  results are bit-identical across batch sizes and parallelism.

Tokenization is the engine's single-space word convention (DuckDB
``string_split(text, ' ')``), matching word_counts / span-dedup; empty
words (doubled separators) are dropped. Documents with no in-document
bigram score ``lm_ppl = 0.0`` (the byte-kernel's convention for
too-short rows).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from .boilerplate import _split_col
from .exchange import hash_exchange_map_groups

_COUNT1_SCHEMA = pa.schema([("w", pa.string()), ("n", pa.int64())])
_COUNT2_SCHEMA = pa.schema(
    [("w1", pa.string()), ("w2", pa.string()), ("n", pa.int64())]
)


def _batch_words(t: pa.Table, text_col: str) -> tuple[pa.Array, np.ndarray]:
    """Flat nonempty word array + parent doc index per word."""
    lst = _split_col(t, text_col, " ")
    parents = pc.list_parent_indices(lst).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(lst)
    keep = pc.greater(pc.utf8_length(flat), 0)
    keep_np = keep.to_numpy(zero_copy_only=False)
    return flat.filter(keep), parents[keep_np]


def _sum_counts(keys: list[str]):
    def f(t: pa.Table) -> pa.Table:
        g = t.group_by(keys).aggregate([("n", "sum")])
        return g.rename_columns(keys + ["n"])

    return f


def unigram_counts(
    ds: ray.data.Dataset, *, text_col: str = "text", min_count: int = 1
) -> ray.data.Dataset:
    """(w, n) — exact corpus-wide word counts ≥ min_count; per-batch
    Arrow group_by partials, thin keyed exchange sum."""

    def uni_partials(t: pa.Table) -> pa.Table:
        flat, _ = _batch_words(t, text_col)
        if len(flat) == 0:
            return _COUNT1_SCHEMA.empty_table()
        g = pa.table({"w": flat}).group_by("w").aggregate([("w", "count")])
        return pa.table({"w": g["w"], "n": g["w_count"].cast(pa.int64())})

    out = hash_exchange_map_groups(
        ds.map_batches(uni_partials, batch_format="pyarrow"),
        _sum_counts(["w"]),
        key="w",
        out_schema=_COUNT1_SCHEMA,
        batch_format="pyarrow",
    )
    if min_count > 1:
        out = out.map_batches(
            lambda t: t.filter(pc.greater_equal(t["n"], min_count)),
            batch_format="pyarrow",
        )
    return out


def bigram_counts(
    ds: ray.data.Dataset, *, text_col: str = "text", min_count: int = 1
) -> ray.data.Dataset:
    """(w1, w2, n) — exact corpus-wide counts of in-document ADJACENT
    word pairs (empty words dropped before adjacency) ≥ min_count."""

    def bi_partials(t: pa.Table) -> pa.Table:
        flat, parents = _batch_words(t, text_col)
        if len(flat) < 2:
            return _COUNT2_SCHEMA.empty_table()
        same = parents[:-1] == parents[1:]
        idx = np.flatnonzero(same)
        if len(idx) == 0:
            return _COUNT2_SCHEMA.empty_table()
        w1 = flat.take(pa.array(idx, pa.int64()))
        w2 = flat.take(pa.array(idx + 1, pa.int64()))
        g = (
            pa.table({"w1": w1, "w2": w2})
            .group_by(["w1", "w2"])
            .aggregate([("w1", "count")])
        )
        return pa.table(
            {"w1": g["w1"], "w2": g["w2"], "n": g["w1_count"].cast(pa.int64())}
        )

    out = hash_exchange_map_groups(
        ds.map_batches(bi_partials, batch_format="pyarrow"),
        _sum_counts(["w1", "w2"]),
        key=["w1", "w2"],
        out_schema=_COUNT2_SCHEMA,
        batch_format="pyarrow",
    )
    if min_count > 1:
        out = out.map_batches(
            lambda t: t.filter(pc.greater_equal(t["n"], min_count)),
            batch_format="pyarrow",
        )
    return out


def fit_word_bigram_counts(
    ds: ray.data.Dataset,
    *,
    text_col: str = "text",
    min_count: int = 2,
    alpha: float = 1.0,
) -> dict:
    """Train the LM: exact corpus-wide unigram + in-document-adjacent
    bigram counts, pruned at ``min_count``. Returns the model dict
    consumed by :func:`score_word_bigram` (broadcast it via
    ``ray.put``). At 100 TB, ``min_count`` is the driver-exposure lever:
    the pulled tables hold only grams seen >= min_count times."""
    uni = unigram_counts(ds, text_col=text_col)
    bi = bigram_counts(ds, text_col=text_col, min_count=min_count)
    uni_t = pa.concat_tables(
        b for b in uni.iter_batches(batch_format="pyarrow")
    ) if uni.count() else _COUNT1_SCHEMA.empty_table()
    total_tokens = int(pc.sum(uni_t["n"]).as_py() or 0)
    uni_t = uni_t.filter(pc.greater_equal(uni_t["n"], min_count))
    # canonical vocab order = sorted strings; UNK id = V (one past)
    order = pc.sort_indices(uni_t, sort_keys=[("w", "ascending")])
    uni_t = uni_t.take(order)
    vocab = uni_t["w"].combine_chunks()
    uni_counts = uni_t["n"].to_numpy(zero_copy_only=False).astype(np.int64)

    bi_t = pa.concat_tables(
        b for b in bi.iter_batches(batch_format="pyarrow")
    ) if bi.count() else _COUNT2_SCHEMA.empty_table()
    id1 = pc.index_in(bi_t["w1"], value_set=vocab)
    id2 = pc.index_in(bi_t["w2"], value_set=vocab)
    in_vocab = pc.and_(pc.is_valid(id1), pc.is_valid(id2))
    keep = in_vocab.to_numpy(zero_copy_only=False)
    V = len(vocab)
    i1 = pc.fill_null(id1, 0).to_numpy(zero_copy_only=False).astype(np.int64)[keep]
    i2 = pc.fill_null(id2, 0).to_numpy(zero_copy_only=False).astype(np.int64)[keep]
    bn = bi_t["n"].to_numpy(zero_copy_only=False).astype(np.int64)[keep]
    bkeys = i1 * np.int64(V + 1) + i2
    order = np.argsort(bkeys, kind="stable")
    return {
        "vocab": vocab,  # sorted pa.StringArray, ids 0..V-1; UNK = V
        "uni_counts": uni_counts,
        "bigram_keys": bkeys[order],  # sorted packed (id1*(V+1)+id2)
        "bigram_counts": bn[order],
        "total_tokens": total_tokens,
        "alpha": float(alpha),
    }


def score_word_bigram(
    ds: ray.data.Dataset,
    model_ref,
    *,
    text_col: str = "text",
    out_col: str = "lm_ppl",
) -> ray.data.Dataset:
    """Append ``out_col``: exp(-mean add-alpha bigram log-prob) per
    document under the fitted model (``model_ref`` = ``ray.put(model)``
    — fetched zero-copy once per task). Deterministic across batch
    sizes: each doc's pairs reduce in position order over its own
    segment only."""

    def score(t: pa.Table) -> pa.Table:
        model = ray.get(model_ref) if isinstance(model_ref, ray.ObjectRef) else model_ref
        vocab: pa.Array = model["vocab"]
        V = len(vocab)
        uni_ext = np.zeros(V + 1, dtype=np.int64)
        uni_ext[:V] = model["uni_counts"]  # UNK unigram count = 0
        alpha = model["alpha"]
        n_docs = t.num_rows
        out = np.zeros(n_docs, dtype=np.float64)
        flat, parents = _batch_words(t, text_col)
        if len(flat) >= 2:
            ids = pc.index_in(flat, value_set=vocab)
            ids = (
                pc.fill_null(ids, V).to_numpy(zero_copy_only=False).astype(np.int64)
            )
            same = parents[:-1] == parents[1:]
            pos = np.flatnonzero(same)
            if len(pos):
                k = ids[pos] * np.int64(V + 1) + ids[pos + 1]
                loc = np.searchsorted(model["bigram_keys"], k)
                loc_c = np.minimum(loc, len(model["bigram_keys"]) - 1)
                if len(model["bigram_keys"]):
                    hit = model["bigram_keys"][loc_c] == k
                    c2 = np.where(hit, model["bigram_counts"][loc_c], 0)
                else:
                    c2 = np.zeros(len(k), dtype=np.int64)
                lp = np.log(c2 + alpha) - np.log(
                    uni_ext[ids[pos]] + alpha * (V + 1)
                )
                doc_of = parents[pos]
                npairs = np.bincount(doc_of, minlength=n_docs)
                valid = npairs >= 1
                starts = np.searchsorted(doc_of, np.flatnonzero(valid))
                sums = np.zeros(n_docs, dtype=np.float64)
                # pairs of one doc are contiguous in pos order, so plain
                # reduceat over the valid docs' start offsets is exact
                sums[valid] = np.add.reduceat(lp, starts)
                with np.errstate(divide="ignore", invalid="ignore"):
                    out = np.where(
                        valid, np.exp(-(sums / np.maximum(npairs, 1))), 0.0
                    )
        return t.append_column(out_col, pa.array(out, pa.float64()))

    return ds.map_batches(score, batch_format="pyarrow")


def lm_ppl_pipeline(
    ds: ray.data.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 2,
    alpha: float = 1.0,
) -> ray.data.Dataset:
    """Fit on the corpus, score the same corpus (the CCNet self-ppl
    diagnostic): returns (id, lm_ppl). The fit is a barrier (the model
    must exist before scoring); the score pass streams."""
    model = fit_word_bigram_counts(
        ds, text_col=text_col, min_count=min_count, alpha=alpha
    )
    ref = ray.put(model)
    scored = score_word_bigram(ds, ref, text_col=text_col)
    return scored.map_batches(
        lambda t: t.select([id_col, "lm_ppl"]), batch_format="pyarrow"
    )
