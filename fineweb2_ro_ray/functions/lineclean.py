"""C4-style intra-document line cleaning — vectorized, shuffle-free.

The C4 dataset (Raffel et al. 2020, §2.2) cleans pages line-by-line
BEFORE any document-level filter: a line survives only if it ends in a
terminal punctuation mark, has enough words, and carries no boilerplate
marker ("javascript" notices, template braces). The reference inherits
this family upstream (its FineWeb-2 input is C4/Gopher-filtered —
passenger columns at ``/root/reference/fineweb/fineweb2_download.py:14-24``);
here the rule runs as a first-class operator so a corpus that skipped
the upstream pass can be cleaned in-engine.

Canonical, engine-agnostic semantics (pinned so the DuckDB oracle
reproduces them bit-exactly):

- lines      = ``text.split("\\n")`` (empty text -> one empty line)
- s          = line trimmed of ``' '``, ``'\\t'``, ``'\\r'`` on both sides
- keep(line) iff ALL of:
    * ``s`` ends in one of ``. ! ? "``        (RE2 ``[.!?"]$``)
    * count of non-space runs in ``s`` >= ``min_words`` (RE2 ``[^ ]+``)
    * ``lower(s)`` does not contain ``"javascript"``
    * ``s`` does not contain ``"{"``
- clean_text = kept ORIGINAL lines (untrimmed) joined with ``"\\n"``
  ("" when nothing survives)

Everything is Arrow compute over the flattened line array — one regex
pass per rule, no Python loop, no shuffle; the per-row rebuild is a
reduceat over the split offsets.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

TERMINAL_RE = r'[.!?"]$'
WORD_RUN_RE = r"[^ ]+"
TRIM_SET = " \t\r"
BAN_SUBSTRING = "javascript"  # matched on the lowercased trimmed line


def clean_lines_batch(
    batch: pa.Table,
    text_col: str = "text",
    min_words: int = 5,
) -> pa.Table:
    """Append ``clean_text``, ``n_lines_total``, ``n_lines_kept`` to the
    batch (null ``text`` rows must be filtered by the caller — same
    convention as the other per-doc Gopher kernels)."""
    col = batch[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    lines = pc.split_pattern(col, pattern="\n")
    lens = pc.list_value_length(lines).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(lines)

    s = pc.utf8_trim(flat, TRIM_SET)
    keep = (
        pc.match_substring_regex(s, TERMINAL_RE).to_numpy(zero_copy_only=False)
        & (
            pc.count_substring_regex(s, WORD_RUN_RE).to_numpy(zero_copy_only=False)
            >= min_words
        )
        & ~pc.match_substring(pc.utf8_lower(s), BAN_SUBSTRING).to_numpy(
            zero_copy_only=False
        )
        & ~pc.match_substring(s, "{").to_numpy(zero_copy_only=False)
    )

    n = batch.num_rows
    kept_per_row = np.zeros(n, dtype=np.int64)
    if len(keep):
        offsets = np.zeros(n, dtype=np.int64)
        np.cumsum(lens[:-1], out=offsets[1:])
        ok = offsets < len(keep)  # trailing all-empty rows (lens==0 can't
        # occur for split_pattern output, but stay defensive)
        if ok.any():
            kept_per_row[ok] = np.add.reduceat(keep.astype(np.int64), offsets[ok])
        kept_per_row[lens == 0] = 0

    kept_flat = flat.filter(pa.array(keep))
    new_offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(kept_per_row, out=new_offsets[1:])
    kept_lists = pa.LargeListArray.from_arrays(
        pa.array(new_offsets, pa.int64()),
        kept_flat.cast(pa.large_string())
        if pa.types.is_string(kept_flat.type)
        else kept_flat,
    )
    clean = pc.binary_join(
        kept_lists, pa.scalar("\n", pa.large_string())
    ).cast(pa.string())

    return (
        batch.append_column("clean_text", clean)
        .append_column("n_lines_total", pa.array(lens, pa.int64()))
        .append_column("n_lines_kept", pa.array(kept_per_row, pa.int64()))
    )
