"""Self-contained byte-level BPE tokenizer (A6/M8 parity).

The reference counts tokens with a pretrained ``AutoTokenizer``
(``/root/reference/small_model_inference/token_stats.py:8-13``,
``fineweb/tokenize_fineweb2.py:20-22``); pretrained vocabularies are not
available offline in this sandbox, so we vendor the ALGORITHM — classic
byte-pair encoding (Sennrich et al. 2016, public) over raw UTF-8 bytes —
and train a small deterministic merge table on the repo's own synthetic
corpus (``scripts/train_bpe.py`` → ``fineweb2_ro_ray/data/bpe_merges.json``,
committed). The regex token count in ``stages/analysis.py`` remains the
SQL-checkable rule input; this is the true-subword path for token-budget
accounting.

Conventions (pinned for determinism):
- pre-tokenize on ASCII whitespace (``text.split()``); a document's
  token count is the sum of its words' BPE token counts — whitespace
  itself is not tokenized;
- base vocabulary = 256 byte values; merges applied by rank (lowest
  rank first), ties in training broken by the lexicographically
  smallest pair, so training is fully deterministic.
"""

from __future__ import annotations

import json
import os
from collections import Counter

_DATA = os.path.join(os.path.dirname(__file__), "..", "data", "bpe_merges.json")


def train_bpe(texts: list[str], n_merges: int = 256) -> list[tuple[int, int]]:
    """Learn ``n_merges`` byte-pair merges. New token ids are allocated
    sequentially from 256. Deterministic: best pair = (max count, then
    smallest pair id tuple)."""
    word_freq: Counter[tuple[int, ...]] = Counter()
    for t in texts:
        for w in (t or "").split():
            word_freq[tuple(w.encode("utf-8"))] += 1
    merges: list[tuple[int, int]] = []
    next_id = 256
    words = dict(word_freq)
    for _ in range(n_merges):
        pair_counts: Counter[tuple[int, int]] = Counter()
        for seq, f in words.items():
            for i in range(len(seq) - 1):
                pair_counts[(seq[i], seq[i + 1])] += f
        if not pair_counts:
            break
        best = min(pair_counts, key=lambda p: (-pair_counts[p], p))
        if pair_counts[best] < 2:
            break
        merges.append(best)
        new_words: dict[tuple[int, ...], int] = {}
        for seq, f in words.items():
            out, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and (seq[i], seq[i + 1]) == best:
                    out.append(next_id)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            nseq = tuple(out)
            new_words[nseq] = new_words.get(nseq, 0) + f
        words = new_words
        next_id += 1
    return merges


class BPETokenizer:
    """Apply a trained merge table. Stateful (word → ids cache) — built
    once per actor, reused across batches (SURVEY.md §2.3 scorer-state
    pattern)."""

    def __init__(self, merges: list[tuple[int, int]] | None = None) -> None:
        if merges is None:
            merges = load_merges()
        self.rank = {tuple(p): i for i, p in enumerate(merges)}
        self.pair_id = {tuple(p): 256 + i for i, p in enumerate(merges)}
        self._cache: dict[str, list[int]] = {}

    def _encode_word(self, w: str) -> list[int]:
        ids = self._cache.get(w)
        if ids is not None:
            return ids
        seq = list(w.encode("utf-8"))
        while len(seq) > 1:
            best, best_rank, best_i = None, None, -1
            for i in range(len(seq) - 1):
                r = self.rank.get((seq[i], seq[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best, best_rank, best_i = (seq[i], seq[i + 1]), r, i
            if best is None:
                break
            nid = self.pair_id[best]
            out, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and (seq[i], seq[i + 1]) == best:
                    out.append(nid)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            seq = out
        self._cache[w] = seq
        return seq

    def encode(self, text: str) -> list[int]:
        out: list[int] = []
        for w in (text or "").split():
            out.extend(self._encode_word(w))
        return out

    def count(self, text: str) -> int:
        return sum(len(self._encode_word(w)) for w in (text or "").split())


def load_merges(path: str | None = None) -> list[tuple[int, int]]:
    with open(path or _DATA) as f:
        return [tuple(p) for p in json.load(f)["merges"]]


def save_merges(merges: list[tuple[int, int]], path: str | None = None) -> None:
    p = path or _DATA
    os.makedirs(os.path.dirname(p), exist_ok=True)
    with open(p, "w") as f:
        json.dump({"merges": [list(m) for m in merges]}, f)
