"""Vectorized per-turn text statistics (Gopher/C4-style heuristic inputs).

One batch function computes every rule input column in Arrow/numpy
kernels — no Python loop over rows except the dup-line fraction (few
lines per turn). Canonical definitions (pinned so the pure-Python
oracle in ``fineweb2_ro_ray/oracle.py`` can reproduce them bit-exactly):

- tokens     = ``text.split()`` (Python whitespace semantics; Arrow's
  ``utf8_split_whitespace`` keeps empty boundary tokens, so zero-length
  tokens are masked out)
- n_chars    = ``len(text)`` (codepoints)
- n_words    = number of tokens
- n_lines    = ``text.count("\\n") + 1``
- mean_word_len = sum(len(tok)) / n_words  (0.0 if no tokens)
- max_word_len  = max(len(tok))            (0 if no tokens)
- stopword_ratio = |{tok : tok.lower().strip(PUNCT) in STOPWORDS}| / n_words
- symbol_ratio   = count of chars matching ``[^0-9A-Za-zăâîșțĂÂÎȘȚ\\s]`` / n_chars
- dup_line_frac  = (L - distinct(L)) / L over non-empty stripped lines
  (0.0 when L == 0)

All ratios are a single IEEE division of exact integers, so results are
bit-identical across engines and parallelism levels (SURVEY.md §7.4).

Reference parity: these are the heuristic inputs of the FineWeb2
Gopher/C4 rule family the reference inherits from upstream (visible as
passenger columns, ``/root/reference/fineweb/fineweb2_download.py:14-24``)
plus the token-count stat pattern (``fineweb/tokenize_fineweb2.py:20-22``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

PUNCT = ".,!?;:()[]{}\"'"
# explicit ASCII whitespace, NOT \s: RE2 (Arrow/DuckDB) treats \s as
# ASCII-only while Python re is Unicode-aware — an explicit class is the
# only definition all three engines agree on (found by property tests)
SYMBOL_PATTERN = r"[^0-9A-Za-zăâîșțĂÂÎȘȚ\t\n\f\r ]"

# Combined RO+EN stopword list for the stopword-ratio rule (C4-style
# "document must contain common words" heuristic).
RO_STOPWORDS = frozenset(
    "și de la cu pentru este sunt care nu se în pe un o ce mai din ale "
    "dar fi fost a al ai această acest să iar eu tu el ea noi voi ei ele".split()
)
EN_STOPWORDS = frozenset(
    "the of and a to in is you that it he was for on are as with his "
    "they i at be this have from or one had by word but not what all".split()
)
STOPWORDS = RO_STOPWORDS | EN_STOPWORDS


def _segment_sums(values: np.ndarray, lens: np.ndarray, how: str) -> np.ndarray:
    """Per-row reduction of a flattened token array. ``lens`` are tokens
    per row; rows with 0 tokens get 0 (np.reduceat misbehaves on empty
    segments, so they are zeroed explicitly)."""
    n = len(lens)
    out = np.zeros(n, dtype=values.dtype if how != "sum" else np.int64)
    if len(values) == 0:
        return out
    offsets = np.zeros(n, dtype=np.int64)
    np.cumsum(lens[:-1], out=offsets[1:])
    # clamp offsets of trailing empty rows into range
    offsets = np.minimum(offsets, len(values) - 1)
    if how == "sum":
        out = np.add.reduceat(values.astype(np.int64), offsets)
    elif how == "max":
        out = np.maximum.reduceat(values, offsets)
    else:
        raise ValueError(how)
    out[lens == 0] = 0
    return out


_STOPWORDS_ARR = None  # built lazily (module import order safety)


def _stopword_set() -> "pa.Array":
    global _STOPWORDS_ARR
    if _STOPWORDS_ARR is None:
        _STOPWORDS_ARR = pa.array(sorted(STOPWORDS))
    return _STOPWORDS_ARR


def _dup_line_fracs(text: pa.Array, n_lines_np: np.ndarray) -> np.ndarray:
    """Only rows with >= 2 lines can have dup lines — materialize just
    those (usually a small fraction of the batch)."""
    out = np.zeros(len(text), dtype=np.float64)
    multi = np.flatnonzero(n_lines_np > 1)
    if len(multi):
        subset = text.take(pa.array(multi)).to_pylist()
        for j, t in zip(multi, subset):
            lines = [ln.strip() for ln in t.split("\n")]
            lines = [ln for ln in lines if ln]
            if lines:
                out[j] = (len(lines) - len(set(lines))) / len(lines)
    return out


def compute_text_stats(
    batch: pa.Table, text_col: str = "text", share_tokens: bool = False
) -> pa.Table:
    """Append the rule-input columns to ``batch`` (zero-copy for the
    untouched columns — the reference's column-accretion model,
    SURVEY.md §1.2).

    ``share_tokens=True`` additionally appends a transient ``_toks``
    column (trimmed, lowercased token list) so the downstream LID stage
    reuses this stage's tokenization instead of re-splitting — the
    stages stay logically separate but share the expensive kernel work;
    LID drops the column."""
    text = batch[text_col]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    text = pc.fill_null(text, "")  # null text == empty turn

    n_chars = pc.utf8_length(text).cast(pa.int64())
    n_lines = pc.add(pc.count_substring(text, "\n"), 1).cast(pa.int64())
    n_sym = pc.count_substring_regex(text, SYMBOL_PATTERN).to_numpy(zero_copy_only=False)

    words = pc.utf8_split_whitespace(text)
    raw_lens = pc.list_value_length(words).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(words)
    flat_len = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
    nonempty = (flat_len > 0).astype(np.int64)

    n_words = _segment_sums(nonempty, raw_lens, "sum")
    sum_word_len = _segment_sums(flat_len, raw_lens, "sum")
    max_word_len = _segment_sums(flat_len, raw_lens, "max")

    # lower+trim+lookup run on UNIQUE tokens only (dictionary encode):
    # natural text repeats tokens heavily, so this cuts the stopword
    # chain roughly in half (measured 62.6 → 35.1 ms on an 800k-token
    # batch); per-instance results come back via index gather
    dic = flat.dictionary_encode()
    toks_u = pc.utf8_trim(pc.utf8_lower(dic.dictionary), PUNCT)
    stop_u = pc.is_in(toks_u, value_set=_stopword_set()).to_numpy(zero_copy_only=False)
    tok_idx = dic.indices.to_numpy(zero_copy_only=False)
    stop_mask = stop_u[tok_idx]
    n_stop = _segment_sums(stop_mask.astype(np.int64), raw_lens, "sum")

    nc = n_chars.to_numpy(zero_copy_only=False)
    with np.errstate(divide="ignore", invalid="ignore"):
        mean_word_len = np.where(n_words > 0, sum_word_len / np.maximum(n_words, 1), 0.0)
        stop_ratio = np.where(n_words > 0, n_stop / np.maximum(n_words, 1), 0.0)
        sym_ratio = np.where(nc > 0, n_sym / np.maximum(nc, 1), 0.0)

    n_lines_np = n_lines.to_numpy(zero_copy_only=False)
    dup = _dup_line_fracs(text, n_lines_np)

    out = (
        batch.append_column("n_chars", n_chars)
        .append_column("n_words", pa.array(n_words, pa.int64()))
        .append_column("n_lines", n_lines)
        .append_column("mean_word_len", pa.array(mean_word_len, pa.float64()))
        .append_column("max_word_len", pa.array(max_word_len, pa.int64()))
        .append_column("stopword_ratio", pa.array(stop_ratio, pa.float64()))
        .append_column("symbol_ratio", pa.array(sym_ratio, pa.float64()))
        .append_column("dup_line_frac", pa.array(dup, pa.float64()))
    )
    if share_tokens:
        toks = toks_u.take(dic.indices)
        toks_list = pa.ListArray.from_arrays(words.offsets, toks)
        out = out.append_column("_toks", toks_list)
    return out
