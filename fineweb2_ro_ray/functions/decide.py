"""Keep/drop decision — declarative ordered rule list.

The reference's production filters are conjunctive threshold predicates
with CLI-injected thresholds (``/root/reference/ro_vs_eng/filter_jql.py:27``
— keep iff all three scores >= thresholds; ``small_model_inference/
filter.py:22`` — single-score variant; thresholds in ``run.sh:2-6``).
We generalize that to an ordered rule list over the appended columns:
``keep`` = every rule passes; ``drop_reason`` = name of the FIRST
failing rule in canonical order ("" when kept) — the first-failure
attribution mirrors the reference's drop-accounting philosophy while
staying deterministic.

Evaluation is fully vectorized (numpy boolean algebra + ``np.select``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa


@dataclass(frozen=True)
class FilterConfig:
    """Thresholds for the rule pack. Defaults are FineWeb2/Gopher-style
    (C4: min length / common-word requirement; Gopher: symbol & dup-line
    ratios, word-length sanity)."""

    min_chars: int = 15
    max_chars: int = 100_000
    min_words: int = 5
    min_mean_word_len: float = 2.0
    max_mean_word_len: float = 12.0
    max_word_len: int = 40
    max_symbol_ratio: float = 0.20
    max_dup_line_frac: float = 0.30
    min_stopword_ratio: float = 0.05
    required_lang: str = "ro"
    min_lang_score: float = 0.15
    max_ppl: float = 120.0
    max_tox_hits: int = 0
    # roles exempt from language rules (tool output is code/JSON-ish)
    lang_exempt_roles: tuple[str, ...] = ("tool",)


# canonical rule order — drop_reason is the first failure
RULE_NAMES = [
    "min_chars",
    "max_chars",
    "min_words",
    "word_len",
    "max_word_len",
    "symbol_ratio",
    "dup_lines",
    "stopwords",
    "lang",
    "lang_score",
    "ppl",
    "toxicity",
]


def decide_batch(batch: pa.Table, cfg: FilterConfig) -> pa.Table:
    """Append ``keep`` + ``drop_reason`` from the rule columns."""
    col = lambda name: batch[name].to_numpy(zero_copy_only=False)  # noqa: E731
    n_chars = col("n_chars")
    n_words = col("n_words")
    mean_wl = col("mean_word_len")
    max_wl = col("max_word_len")
    sym = col("symbol_ratio")
    dup = col("dup_line_frac")
    stop = col("stopword_ratio")
    lang = col("lang")
    lang_score = col("lang_score")
    ppl = col("ppl")
    tox = col("tox_hits")
    role = col("role")

    lang_exempt = np.isin(role, np.array(cfg.lang_exempt_roles))

    fails = [
        n_chars < cfg.min_chars,
        n_chars > cfg.max_chars,
        n_words < cfg.min_words,
        (mean_wl < cfg.min_mean_word_len) | (mean_wl > cfg.max_mean_word_len),
        max_wl > cfg.max_word_len,
        sym > cfg.max_symbol_ratio,
        dup > cfg.max_dup_line_frac,
        stop < cfg.min_stopword_ratio,
        (lang != cfg.required_lang) & ~lang_exempt,
        (lang_score < cfg.min_lang_score) & ~lang_exempt,
        (ppl > cfg.max_ppl) & ~lang_exempt,
        tox > cfg.max_tox_hits,
    ]
    assert len(fails) == len(RULE_NAMES)
    any_fail = np.logical_or.reduce(fails)
    reason = np.select(fails, RULE_NAMES, default="")
    return batch.append_column("keep", pa.array(~any_fail, pa.bool_())).append_column(
        "drop_reason", pa.array(reason.astype(object), pa.string())
    )
