"""BM25 keyword search over a text column — the lexical counterpart of
the ANN lane (``stages/similarity.py``): a SMALL query set against a
LARGE corpus, top-k documents per query.

Okapi BM25 (Robertson-Walker-Jones; the ranking function behind
Lucene/Elasticsearch defaults):

    score(q, d) = Σ_{t∈q} qtf_t · idf(t) · tf_td (k1+1)
                                   / (tf_td + k1 (1 − b + b·dl_d/avgdl))
    idf(t) = ln( (N − df_t + 0.5) / (df_t + 0.5) + 1 )

Engine shape (two streamed passes, no shuffle anywhere):

- **Fit pass** — one ``map_batches`` emitting per-batch partials of
  (df per query term, doc count, token count); the query vocabulary V
  is the union of the queries' terms, so every partial is O(|V|) and
  the driver folds them into three scalars/arrays of that size.
- **Score pass** — the (idf, query-term matrix, avgdl) bundle is
  ``ray.put`` once; each batch computes the per-doc term-frequency
  matrix with ONE ``pc.index_in`` over the flat word array + ONE
  bincount on (row · |V| + term) composite keys, then all query
  scores with one (rows × |V|) · (|V| × Q) matmul. Per-batch local
  top-k per query, then a k·Q-bounded streaming driver merge — the
  driver never holds more than 2kQ candidate rows.

Scoring is deterministic; final ranking ties break on smallest doc
id. Documents matching no query term never appear (score 0 rows are
suppressed like any search engine's).

BM25 has no clean SQL analog at value level (float ln/ratios differ
in libm rounding across engines), so the query entry is rows-only;
exact agreement with a single-process reference implementation is
pytest-pinned (tests/test_search.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data


def _tokenize_queries(queries: list[str], sep: str) -> tuple[list[str], np.ndarray]:
    """(vocab, qtf matrix |V|×Q) — qtf counts a term's multiplicity
    inside the query (standard BM25 query-side weighting)."""
    terms: list[list[str]] = [q.split(sep) if q else [] for q in queries]
    vocab = sorted({t for ts in terms for t in ts if t != ""})
    vidx = {t: i for i, t in enumerate(vocab)}
    m = np.zeros((len(vocab), len(queries)), dtype=np.float64)
    for qi, ts in enumerate(terms):
        for t in ts:
            if t:
                m[vidx[t], qi] += 1.0
    return vocab, m


def _batch_tf(
    t: pa.Table, text_col: str, vocab_arr: pa.Array, nv: int
) -> tuple[np.ndarray, np.ndarray]:
    """(tf matrix rows×|V|, doc lengths) for one batch — flat-array,
    loop-free."""
    lst = pc.split_pattern(
        pc.cast(t[text_col], pa.string()), pattern=" "
    )
    parents = pc.list_parent_indices(lst).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(lst)
    dl = (
        pc.fill_null(pc.list_value_length(lst), 0)
        .to_numpy(zero_copy_only=False)
        .astype(np.float64)
    )
    tid = pc.fill_null(pc.index_in(flat, value_set=vocab_arr), -1).to_numpy(
        zero_copy_only=False
    )
    ok = tid >= 0
    keys = parents[ok] * nv + tid[ok]
    tf = np.bincount(keys, minlength=t.num_rows * nv).reshape(t.num_rows, nv)
    return tf.astype(np.float64), dl


def bm25_topk(
    ds: ray.data.Dataset,
    queries: list[str],
    *,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = " ",
    k1: float = 1.2,
    b: float = 0.75,
) -> ray.data.Dataset:
    """Top-``k`` BM25 hits per query: Dataset of
    (query_id, doc_id, score) with query_id = index into ``queries``.
    Ties break on smallest doc id; zero-score docs are suppressed."""
    if sep != " ":
        raise ValueError("only single-space tokenization is supported")
    vocab, qtf = _tokenize_queries(queries, sep)
    nv, nq = len(vocab), len(queries)
    empty = pa.table(
        {
            "query_id": pa.array([], pa.int64()),
            id_col: pa.array([], pa.int64()),
            "score": pa.array([], pa.float64()),
        }
    )
    if nv == 0 or nq == 0:
        return ray.data.from_arrow(empty)
    vocab_arr = pa.array(vocab, pa.string())

    # ---- fit pass: df per term, N docs, total tokens --------------
    def fit_partial(t: pa.Table) -> pa.Table:
        tf, dl = _batch_tf(t, text_col, vocab_arr, nv)
        df = (tf > 0).sum(axis=0).astype(np.int64)
        return pa.table(
            {
                "term": pa.array(np.arange(nv, dtype=np.int64)),
                "df": pa.array(df),
                "n_docs": pa.array(np.full(nv, t.num_rows, dtype=np.int64)),
                "n_tokens": pa.array(
                    np.full(nv, int(dl.sum()), dtype=np.int64)
                ),
            }
        )

    df = np.zeros(nv, dtype=np.int64)
    n_docs = 0
    n_tokens = 0
    for bt in ds.select_columns([id_col, text_col]).map_batches(
        fit_partial, batch_format="pyarrow"
    ).iter_batches(batch_format="pyarrow"):
        term = bt["term"].to_numpy(zero_copy_only=False)
        np.add.at(df, term, bt["df"].to_numpy(zero_copy_only=False))
        # n_docs/n_tokens replicated per term row; take term-0 rows
        z = term == 0
        n_docs += int(bt["n_docs"].to_numpy(zero_copy_only=False)[z].sum())
        n_tokens += int(bt["n_tokens"].to_numpy(zero_copy_only=False)[z].sum())
    if n_docs == 0:
        return ray.data.from_arrow(empty)
    avgdl = max(n_tokens / n_docs, 1e-12)
    idf = np.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)
    bundle = ray.put((idf, qtf, avgdl))

    # ---- score pass: per-batch scores + local top-k per query -----
    def score(t: pa.Table) -> pa.Table:
        idf_, qtf_, avgdl_ = ray.get(bundle)
        tf, dl = _batch_tf(t, text_col, vocab_arr, nv)
        denom = tf + k1 * (1.0 - b + b * (dl / avgdl_)[:, None])
        contrib = idf_[None, :] * tf * (k1 + 1.0) / np.maximum(denom, 1e-30)
        scores = contrib @ qtf_  # (rows, Q)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        out_q: list[np.ndarray] = []
        out_d: list[np.ndarray] = []
        out_s: list[np.ndarray] = []
        for qi in range(nq):
            s = scores[:, qi]
            nz = np.nonzero(s > 0.0)[0]
            if len(nz) > k:
                # top-k by (score desc, id asc)
                o = nz[np.lexsort((ids[nz], -s[nz]))[:k]]
            else:
                o = nz
            out_q.append(np.full(len(o), qi, dtype=np.int64))
            out_d.append(ids[o])
            out_s.append(s[o])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                id_col: pa.array(np.concatenate(out_d), pa.int64()),
                "score": pa.array(np.concatenate(out_s), pa.float64()),
            }
        )

    best: dict[int, pa.Table] = {}
    stream = ds.select_columns([id_col, text_col]).map_batches(
        score, batch_format="pyarrow"
    )
    for bt in stream.iter_batches(batch_format="pyarrow"):
        if bt.num_rows == 0:
            continue
        qv = bt["query_id"].to_numpy(zero_copy_only=False)
        for qi in np.unique(qv):
            sub = bt.filter(pa.array(qv == qi))
            cand = sub if qi not in best else pa.concat_tables([best[qi], sub])
            if cand.num_rows > k:
                cand = cand.take(
                    pc.select_k_unstable(
                        cand,
                        k,
                        [("score", "descending"), (id_col, "ascending")],
                    )
                )
            best[int(qi)] = cand.combine_chunks()
    if not best:
        return ray.data.from_arrow(empty)
    out = pa.concat_tables(
        [best[qi] for qi in sorted(best)]
    ).combine_chunks()
    order = pc.sort_indices(
        out,
        sort_keys=[
            ("query_id", "ascending"),
            ("score", "descending"),
            (id_col, "ascending"),
        ],
    )
    return ray.data.from_arrow(out.take(order))
