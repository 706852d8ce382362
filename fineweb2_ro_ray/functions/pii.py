"""PII detection primitives: regexes + checksum validators.

The reference scrubs nothing itself (PII handling is inherited from the
upstream FineWeb-2 pipeline); the north rule requires a regex scrub of
emails, phones, IBANs, CNPs and toxicity terms.  Semantically these are
M6-class parsers/normalizers (SURVEY.md §2.2; reference parser shape:
``/root/reference/fineweb/big_inference.py:84-115``).

Canonical application order (pinned for exact-text reproducibility,
SURVEY.md §7.4): IBAN → CNP → EMAIL → PHONE → TOX.  IBAN before CNP and
PHONE because an IBAN's digit run could otherwise be partially matched;
each pass uses Python ``re`` leftmost, non-overlapping semantics.

CNP = Romanian personal numeric code: 13 digits, weighted checksum with
weights 279146358279 (public algorithm).  IBAN check: ISO 7064 mod 97-10.
"""

from __future__ import annotations

import re

# --- regex candidates -------------------------------------------------------

EMAIL_RE = re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}")

# Romanian phone formats: +40 7xx xxx xxx, 0040..., 07xxxxxxxx, with
# optional separators. Anchored on non-digit boundaries to avoid eating
# parts of longer digit runs (IBAN/CNP handled before this pass anyway).
# A space after the country prefix is only allowed for +40 / 0040 — a
# bare leading 0 must attach directly to the 7, so that every PHONE_RE
# match is guaranteed to contain one of the RE2-safe trigger literals
# in scrub._TRIGGER_RE2 ('+40' | '0040' | '07[0-9]'); see
# tests/test_functions.py::test_phone_trigger_consistency.
PHONE_RE = re.compile(
    r"(?<!\d)(?:(?:\+40|0040)\s?|0)7\d{2}[\s.-]?\d{3}[\s.-]?\d{3}(?!\d)"
)

# Romanian IBAN: RO + 2 check digits + 4-char bank code + 16 alphanumerics.
IBAN_RE = re.compile(r"(?<![A-Z0-9])RO\d{2}[A-Z]{4}[A-Z0-9]{16}(?![A-Z0-9])")

CNP_RE = re.compile(r"(?<!\d)[1-9]\d{12}(?!\d)")

_CNP_WEIGHTS = (2, 7, 9, 1, 4, 6, 3, 5, 8, 2, 7, 9)


def cnp_valid(cnp: str) -> bool:
    """True iff ``cnp`` is a checksum-valid Romanian CNP (13 digits)."""
    if len(cnp) != 13 or not cnp.isdigit() or cnp[0] == "0":
        return False
    s = sum(int(d) * w for d, w in zip(cnp[:12], _CNP_WEIGHTS))
    ctrl = s % 11
    if ctrl == 10:
        ctrl = 1
    return ctrl == int(cnp[12])


def cnp_control_digit(first12: str) -> str:
    """Control digit for a 12-digit CNP prefix (used by the synthesizer)."""
    s = sum(int(d) * w for d, w in zip(first12, _CNP_WEIGHTS))
    ctrl = s % 11
    if ctrl == 10:
        ctrl = 1
    return str(ctrl)


def iban_valid(iban: str) -> bool:
    """ISO 7064 mod-97 check (rearrange, map letters A=10..Z=35, mod 97 == 1)."""
    if len(iban) != 24 or not iban.startswith("RO"):
        return False
    rearranged = iban[4:] + iban[:4]
    digits = "".join(
        str(ord(c) - 55) if c.isalpha() else c for c in rearranged
    )
    try:
        return int(digits) % 97 == 1
    except ValueError:
        return False


def iban_make_valid(bank: str, account: str) -> str:
    """Build a checksum-valid Romanian IBAN from a 4-letter bank code and a
    16-char alphanumeric account (synthesizer helper)."""
    assert len(bank) == 4 and len(account) == 16
    body = bank + account
    rearranged = body + "RO00"
    digits = "".join(str(ord(c) - 55) if c.isalpha() else c for c in rearranged)
    check = 98 - int(digits) % 97
    return f"RO{check:02d}{body}"
