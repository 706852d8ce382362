"""Single-threaded pure-Python oracle — the golden reference labeler.

Mirrors the reference's golden-comparison strategy: an independent
implementation produces frozen labels once, and the engine is asserted
against them row-by-row after a key join (``/root/reference/
small_model_inference/test.py:18-47`` joins on ``id`` and asserts
match rates; we join on ``(conv_id, turn_idx)`` and require keep/drop
F1 >= 0.99 plus byte-exact ``scrubbed_text``).

Everything here uses ``re`` / ``str`` / ``math`` only — no Arrow, no
Ray — implementing the canonical definitions pinned in
``functions/textstats.py``'s docstring. The only shared artifacts are
the frozen model tables (LOGP bigram table, lexicons, regex pack
*specs*), which are data, not execution paths.
"""

from __future__ import annotations

import re

import numpy as np

from .functions.decide import RULE_NAMES, FilterConfig
from .functions.lid import DIACRITICS_PATTERN, EN_LEXICON, RO_LEXICON
from .functions.perplexity import LOGP
from .functions.scrub import scrub_text
from .functions.textstats import PUNCT, STOPWORDS, SYMBOL_PATTERN

_SYM_RE = re.compile(SYMBOL_PATTERN)
_DIA_RE = re.compile(DIACRITICS_PATTERN)


def label_row(row: dict, cfg: FilterConfig | None = None) -> dict:
    """Label one transcript row: returns the row plus every engine
    column, computed the slow, obvious way."""
    cfg = cfg or FilterConfig()
    text: str = row["text"] or ""
    out = dict(row)

    toks = text.split()
    n_chars = len(text)
    n_words = len(toks)
    n_lines = text.count("\n") + 1
    sum_wl = sum(len(w) for w in toks)
    max_wl = max((len(w) for w in toks), default=0)
    norm = [w.lower().strip(PUNCT) for w in toks]
    n_stop = sum(1 for w in norm if w in STOPWORDS)
    n_sym = len(_SYM_RE.findall(text))

    lines = [ln.strip() for ln in text.split("\n")]
    lines = [ln for ln in lines if ln]
    if "\n" in text and lines:
        dup = (len(lines) - len(set(lines))) / len(lines)
    else:
        dup = 0.0

    out["n_chars"] = n_chars
    out["n_words"] = n_words
    out["n_lines"] = n_lines
    out["mean_word_len"] = (sum_wl / n_words) if n_words else 0.0
    out["max_word_len"] = max_wl
    out["stopword_ratio"] = (n_stop / n_words) if n_words else 0.0
    out["symbol_ratio"] = (n_sym / n_chars) if n_chars else 0.0
    out["dup_line_frac"] = dup

    # --- LID ---
    ro_hits = sum(1 for w in norm if w in RO_LEXICON)
    en_hits = sum(1 for w in norm if w in EN_LEXICON)
    n_dia = len(_DIA_RE.findall(text))
    best = max(ro_hits, en_hits)
    if best == 0:
        lang, score = "und", 0.0
    else:
        if ro_hits > en_hits:
            lang = "ro"
        elif en_hits > ro_hits:
            lang = "en"
        else:
            lang = "ro" if n_dia > 0 else "en"
        score = best / n_words
    out["lang"] = lang
    out["lang_score"] = score

    # --- perplexity (sequential float64 sum over the frozen table) ---
    b = text.encode("utf-8")
    if len(b) < 2:
        out["ppl"] = 0.0
    else:
        total = np.float64(0.0)
        for i in range(len(b) - 1):
            total = total + LOGP[b[i], b[i + 1]]
        out["ppl"] = float(np.exp(-(total / np.float64(len(b) - 1))))

    # --- scrub ---
    scrubbed, pii, tox = scrub_text(text)
    out["scrubbed_text"] = scrubbed
    out["pii_hits"] = pii
    out["tox_hits"] = tox

    # --- decision (same canonical order as decide_batch) ---
    exempt = row["role"] in cfg.lang_exempt_roles
    checks = [
        ("min_chars", n_chars < cfg.min_chars),
        ("max_chars", n_chars > cfg.max_chars),
        ("min_words", n_words < cfg.min_words),
        (
            "word_len",
            out["mean_word_len"] < cfg.min_mean_word_len
            or out["mean_word_len"] > cfg.max_mean_word_len,
        ),
        ("max_word_len", max_wl > cfg.max_word_len),
        ("symbol_ratio", out["symbol_ratio"] > cfg.max_symbol_ratio),
        ("dup_lines", dup > cfg.max_dup_line_frac),
        ("stopwords", out["stopword_ratio"] < cfg.min_stopword_ratio),
        ("lang", lang != cfg.required_lang and not exempt),
        ("lang_score", score < cfg.min_lang_score and not exempt),
        ("ppl", out["ppl"] > cfg.max_ppl and not exempt),
        ("toxicity", tox > cfg.max_tox_hits),
    ]
    assert [n for n, _ in checks] == RULE_NAMES
    reason = next((name for name, failed in checks if failed), "")
    out["keep"] = reason == ""
    out["drop_reason"] = reason
    return out


def label_table(rows: list[dict], cfg: FilterConfig | None = None) -> list[dict]:
    """Label a list of transcript rows sequentially (the frozen-oracle
    generator for fixtures)."""
    return [label_row(r, cfg) for r in rows]
