"""Distributed BPE trainer vs the pure-Python reference trainer
(`functions.bpe.train_bpe`): merge-for-merge equality, tie-break and
overlap (aaaa) semantics, parallelism invariance, and the vectorized
merge-application kernel against a sequential scan.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

from fineweb2_ro_ray.functions.bpe import train_bpe
from fineweb2_ro_ray.stages.bpe_train import (
    _apply_merge,
    bpe_vocab_stats,
    fit_bpe,
    word_freq_table,
)


def _texts(seed: int = 5, n: int = 400) -> list[str]:
    rng = np.random.default_rng(seed)
    vocab = ["mare", "lac", "maremare", "aaaa", "ab", "abab", "lacul",
             "apa", "apele", "mara", "", "a", "zz", "șarpe", "țară"]
    return [
        " ".join(rng.choice(vocab, size=rng.integers(0, 12)))
        for _ in range(n)
    ]


def _ref_merges(texts: list[str], n: int) -> list[tuple[int, int]]:
    return train_bpe(texts, n_merges=n)


def _dist_merges(texts: list[str], n: int, blocks: int = 13) -> list[tuple[int, int]]:
    ds = rd.from_arrow(pa.table({"text": texts})).repartition(blocks)
    t = fit_bpe(ds, text_col="text", n_merges=n)
    return list(zip(t["p1"].to_pylist(), t["p2"].to_pylist()))


def test_fit_bpe_equals_reference_trainer(ray_session):
    texts = _texts()
    ref = _ref_merges(texts, 48)
    got = _dist_merges(texts, 48)
    assert got == ref
    assert len(got) > 10  # the corpus actually produces merges


def test_fit_bpe_parallelism_invariant(ray_session):
    texts = _texts(seed=11, n=150)
    a = _dist_merges(texts, 24, blocks=1)
    b = _dist_merges(texts, 24, blocks=29)
    assert a == b == _ref_merges(texts, 24)


def test_fit_bpe_overlap_and_ties(ray_session):
    # 'aaaa' forces the left==right consecutive-run rule; equal-count
    # pairs force the smallest-(p1,p2) tie-break
    texts = ["aaaa aaaa bcbc", "aaaa bc zq zq"]
    assert _dist_merges(texts, 16) == _ref_merges(texts, 16)


def test_fit_bpe_empty_and_stop(ray_session):
    # all-singleton words: no pair ever reaches count 2 except none exist
    ds = rd.from_arrow(pa.table({"text": ["a b c", "d e", ""]}))
    t = fit_bpe(ds, text_col="text", n_merges=8)
    assert t.num_rows == 0
    ds2 = rd.from_arrow(pa.table({"text": pa.array([], pa.string())}))
    assert fit_bpe(ds2, text_col="text", n_merges=8).num_rows == 0


def test_apply_merge_kernel_matches_sequential():
    rng = np.random.default_rng(3)
    for _ in range(50):
        lens = rng.integers(1, 9, size=rng.integers(1, 8))
        vals = rng.integers(0, 3, size=lens.sum()).astype(np.int32)
        offs = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
        p1, p2 = int(rng.integers(0, 3)), int(rng.integers(0, 3))
        got_v, got_o = _apply_merge(vals, offs, p1, p2, 99)
        # sequential reference scan per word
        exp_words = []
        for i in range(len(offs) - 1):
            seq = list(vals[offs[i] : offs[i + 1]])
            out, j = [], 0
            while j < len(seq):
                if j + 1 < len(seq) and (seq[j], seq[j + 1]) == (p1, p2):
                    out.append(99)
                    j += 2
                else:
                    out.append(seq[j])
                    j += 1
            exp_words.append(out)
        exp_v = [x for w in exp_words for x in w]
        exp_o = np.concatenate([[0], np.cumsum([len(w) for w in exp_words])])
        assert list(got_v) == exp_v
        assert list(got_o) == list(exp_o)


def test_word_freq_table_and_stats(ray_session):
    texts = ["ab ab cd", "ab", "", "cd cd"]
    ds = rd.from_arrow(pa.table({"text": texts}))
    wf = {
        r["word"]: r["f"]
        for r in word_freq_table(ds, "text").take_all()
    }
    assert wf == {"ab": 3, "cd": 3}
    s = bpe_vocab_stats(ds, text_col="text", n_merges=4).to_pylist()[0]
    assert s["distinct_words"] == 2
    assert s["corpus_tokens_bytes"] == 12  # 6 words x 2 bytes
    # both words collapse to single tokens after 2 merges
    assert s["corpus_tokens_bpe"] == 6
    assert s["n_merges"] == 2
