"""BM25 top-k search (stages/search.py) vs a single-process reference."""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

import ray.data


def _bm25_ref(docs, queries, k, k1=1.2, b=0.75):
    """Plain-Python BM25 (same formula, independent code path)."""
    toks = {d: (t.split(" ") if t is not None else []) for d, t in docs}
    n = len(docs)
    avgdl = max(sum(len(v) for v in toks.values()) / n, 1e-12)
    out = {}
    for qi, q in enumerate(queries):
        qterms = [t for t in q.split(" ") if t]
        scored = []
        for did, words in toks.items():
            s = 0.0
            dl = len(words)
            for t in qterms:  # qtf via repetition in the list
                tf = words.count(t)
                df = sum(1 for w in toks.values() if t in w)
                idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
                s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
            if s > 0:
                scored.append((did, s))
        scored.sort(key=lambda p: (-p[1], p[0]))
        out[qi] = scored[:k]
    return out


def _mk(docs):
    t = pa.table(
        {
            "doc_id": pa.array([d for d, _ in docs], pa.int64()),
            "text": pa.array([s for _, s in docs]),
        }
    )
    return ray.data.from_arrow(t).repartition(4)


def test_bm25_matches_reference(ray_session):
    from fineweb2_ro_ray.stages.search import bm25_topk

    rng = np.random.default_rng(4)
    vocab = ["apple", "pear", "plum", "kiwi", "fig", "date", "lime"]
    docs = [
        (did, " ".join(rng.choice(vocab, size=int(rng.integers(1, 12)))))
        for did in range(50)
    ]
    docs.append((50, None))  # null text never scores
    queries = ["apple fig", "plum", "kiwi kiwi lime"]  # repeated term -> qtf 2
    out = (
        bm25_topk(_mk(docs), queries, k=5)
        .to_pandas()
        .sort_values(["query_id", "score", "doc_id"], ascending=[True, False, True])
    )
    ref = _bm25_ref(docs, queries, 5)
    for qi, hits in ref.items():
        got = out[out["query_id"] == qi]
        assert list(got["doc_id"]) == [d for d, _ in hits]
        np.testing.assert_allclose(
            got["score"].to_numpy(), [s for _, s in hits], rtol=1e-12
        )


def test_bm25_edge_cases(ray_session):
    from fineweb2_ro_ray.stages.search import bm25_topk

    docs = [(1, "a b c"), (2, "c d"), (3, "e")]
    # term absent from corpus -> no hits for that query
    out = bm25_topk(_mk(docs), ["zzz"], k=3).to_pandas()
    assert len(out) == 0
    # empty query list / empty vocab
    out2 = bm25_topk(_mk(docs), [], k=3).to_pandas()
    assert len(out2) == 0
    # k larger than matches
    out3 = bm25_topk(_mk(docs), ["c"], k=10).to_pandas()
    assert sorted(out3["doc_id"]) == [1, 2]


def test_bm25_tie_break_on_id(ray_session):
    from fineweb2_ro_ray.stages.search import bm25_topk

    # identical docs -> identical scores -> ascending id order, k cuts
    docs = [(i, "x y") for i in range(6)]
    out = bm25_topk(_mk(docs), ["x"], k=3).to_pandas()
    assert list(out["doc_id"]) == [0, 1, 2]
