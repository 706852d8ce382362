"""PII + toxicity scrubbing with checksum validation.

Canonical, pinned application order (SURVEY.md §7.4 — exact per-turn
scrubbed-text equality requires one order): IBAN → CNP → EMAIL → PHONE
→ TOX.  Candidates are found by regex; IBAN and CNP candidates are only
replaced when their public checksum validates (near-miss invalid
identifiers planted by the synthesizer must survive), mirroring the
reference's "never fail a row, degrade to a sentinel" philosophy
(``/root/reference/fineweb/big_inference.py:109-115``).

Replacement tokens: ``<IBAN> <CNP> <EMAIL> <PHONE> <TOX>``.
Outputs: ``scrubbed_text`` (byte-exact reproducible), ``pii_hits``
(count of replaced PII spans), ``tox_hits`` (toxicity replacements).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from .pii import CNP_RE, EMAIL_RE, IBAN_RE, PHONE_RE, cnp_valid, iban_valid

TOX_TERMS = ["prostule", "idiotule", "naibii", "dracului", "tâmpitule"]
TOX_RE = re.compile(
    r"(?<![0-9A-Za-zăâîșțĂÂÎȘȚ])(?:" + "|".join(TOX_TERMS) + r")(?![0-9A-Za-zăâîșțĂÂÎȘȚ])",
    re.IGNORECASE,
)


def scrub_text(text: str) -> tuple[str, int, int]:
    """Scrub one turn. Returns (scrubbed_text, pii_hits, tox_hits).
    Pure function — shared semantics are re-derived independently by the
    oracle; this is the engine implementation."""
    pii = 0

    def _iban(m: re.Match) -> str:
        nonlocal pii
        if iban_valid(m.group(0)):
            pii += 1
            return "<IBAN>"
        return m.group(0)

    def _cnp(m: re.Match) -> str:
        nonlocal pii
        if cnp_valid(m.group(0)):
            pii += 1
            return "<CNP>"
        return m.group(0)

    text = IBAN_RE.sub(_iban, text)
    text = CNP_RE.sub(_cnp, text)
    text, n = EMAIL_RE.subn("<EMAIL>", text)
    pii += n
    text, n = PHONE_RE.subn("<PHONE>", text)
    pii += n
    text, tox = TOX_RE.subn("<TOX>", text)
    return text, pii, tox


class Scrubber:
    """Actor-pool stage: regex packs compiled once per actor (reference
    stateful-stage pattern, SURVEY.md §2.3). Fast path: batches with no
    regex hits skip row processing entirely (vector pre-filter)."""

    def __init__(self, text_col: str = "text") -> None:
        self.text_col = text_col
        # quick rejection pattern: any candidate trigger
        self._trigger = re.compile(
            r"@|RO\d{2}[A-Z]{4}|(?<!\d)[1-9]\d{12}(?!\d)|(?:\+40|0040|07)\s?\d",
        )
        self._tox_trigger = re.compile("|".join(TOX_TERMS), re.IGNORECASE)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        out_texts: list[str] = []
        pii = np.zeros(len(texts), dtype=np.int32)
        tox = np.zeros(len(texts), dtype=np.int32)
        for i, t in enumerate(texts):
            t = t or ""
            if self._trigger.search(t) or self._tox_trigger.search(t):
                s, p, x = scrub_text(t)
                out_texts.append(s)
                pii[i] = p
                tox[i] = x
            else:
                out_texts.append(t)
        return (
            batch.append_column("scrubbed_text", pa.array(out_texts, pa.string()))
            .append_column("pii_hits", pa.array(pii, pa.int32()))
            .append_column("tox_hits", pa.array(tox, pa.int32()))
        )
