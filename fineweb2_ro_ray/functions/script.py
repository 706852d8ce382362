"""Unicode-script detection — FineWeb-2's script-consistency filter.

FineWeb-2 (the corpus the reference consumes,
`/root/reference/fineweb/fineweb2_download.py`) language-filters with
a SCRIPT check alongside LID: a document claiming to be Romanian whose
letters are mostly Cyrillic (or CJK spam wrapped in Latin boilerplate)
is dropped. The deterministic core is a per-script codepoint census —
one RE2 ``count_substring_regex`` kernel per script class over the
whole batch, zero shuffle, no per-row Python.

The script classes are fixed contiguous-range approximations (the
classic heuristic; a full Unicode Script property table would slot in
the same way). ``main_script`` is argmax with FIRST-IN-ORDER tie-break
over ``SCRIPTS`` — mirrored in SQL as a ``>=``-chained CASE.
``script_ratio`` = main-script letters / all scripted letters, one
float division of exact integers (NULL when the text has no scripted
letters at all — digits/punctuation-only rows carry no signal).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# (name, RE2 class) in tie-break priority order
SCRIPTS: list[tuple[str, str]] = [
    ("latin", r"[A-Za-zÀ-ɏ]"),
    ("cyrillic", r"[Ѐ-ӿ]"),
    ("greek", r"[Ͱ-Ͽ]"),
    ("arabic", r"[؀-ۿ]"),
    ("cjk", r"[一-鿿]"),
]


def script_census(
    b: pa.Table, *, text_col: str = "text", id_col: str = "doc_id"
) -> pa.Table:
    """(doc_id, n_<script>…, main_script, script_ratio) per row; NULL
    text → NULL counts/main/ratio."""
    text = b[text_col]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    null_mask = pc.is_null(text)
    filled = pc.fill_null(text, "")
    counts = []
    for _, pat in SCRIPTS:
        c = pc.count_substring_regex(filled, pat).cast(pa.int64())
        counts.append(c.to_numpy(zero_copy_only=False))
    mat = np.stack(counts, axis=1)  # rows × scripts
    total = mat.sum(axis=1)
    main_idx = np.argmax(mat, axis=1)  # first max wins
    n_main = mat[np.arange(len(mat)), main_idx]
    names = np.array([n for n, _ in SCRIPTS])
    ratio = np.where(total > 0, n_main / np.maximum(total, 1), np.nan)
    null_np = null_mask.to_numpy(zero_copy_only=False)
    cols: dict = {id_col: b[id_col]}
    ni64 = pa.scalar(None, pa.int64())
    for j, (name, _) in enumerate(SCRIPTS):
        cols[f"n_{name}"] = pc.if_else(null_mask, ni64, pa.array(mat[:, j]))
    cols["main_script"] = pc.if_else(
        pc.or_(null_mask, pa.array(total == 0)),
        pa.scalar(None, pa.string()),
        pa.array(names[main_idx]),
    )
    cols["script_ratio"] = pc.if_else(
        pc.or_(null_mask, pa.array(total == 0)),
        pa.scalar(None, pa.float64()),
        pa.array(ratio),
    )
    return pa.table(cols)


def script_consistent_mask(
    census: pa.Table, *, expect: str, min_ratio: float = 0.8
) -> pa.Array:
    """Keep-mask for the FineWeb-2-style script gate: the dominant
    script must be ``expect`` with at least ``min_ratio`` of scripted
    letters. No-signal rows (NULL ratio) are DROPPED."""
    ok = pc.and_(
        pc.equal(census["main_script"], expect),
        pc.greater_equal(census["script_ratio"], min_ratio),
    )
    return pc.fill_null(ok, False)
