"""M6: structured-output parser — ``key: value`` blocks → columns.

The reference parses LLM generations line-by-line: strip ``*`` bullets,
partition on the first ``:``, map localized keys to schema fields,
coerce the score to int, and fill anything missing/unparseable with the
``"ERROR"`` sentinel instead of failing the row
(``/root/reference/fineweb/big_inference.py:84-115``; variant
``benchmark/benchmark_llms.py:39-62``).  Same semantics here over a
configurable key map; per-row Python inside ``map_batches`` (parse cost
is trivial next to the generation that produced the text).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

ERROR = "ERROR"

DEFAULT_KEYMAP = {
    "scor": "int_score",
    "explicatie": "explanation",
    "grupa de varsta": "age_group",
    "tema": "topic",
    "subtema": "subtopic",
    "format": "format",
}


def parse_kv_text(text: str, keymap: dict[str, str] | None = None) -> dict[str, str]:
    """Parse one generated block. Missing fields → "ERROR"; the int
    field keeps only digit values (ref ``:102-103``)."""
    keymap = keymap or DEFAULT_KEYMAP
    out = {v: ERROR for v in keymap.values()}
    for raw_line in (text or "").split("\n"):
        line = raw_line.strip().lstrip("*").strip()
        if ":" not in line:
            continue
        key, _, value = line.partition(":")
        key = key.strip().lower()
        value = value.strip()
        field = keymap.get(key)
        if field is None or not value:
            continue
        if field == "int_score":
            out[field] = value if value.isdigit() else ERROR
        else:
            out[field] = value
    return out


def parse_kv_batch(
    batch: pa.Table, text_col: str = "text", keymap: dict[str, str] | None = None
) -> pa.Table:
    keymap = keymap or DEFAULT_KEYMAP
    texts = batch[text_col].to_pylist()
    parsed = [parse_kv_text(t, keymap) for t in texts]
    for field in keymap.values():
        batch = batch.append_column(
            field, pa.array([p[field] for p in parsed], pa.string())
        )
    # int coercion column (keeps "ERROR" rows as null — schema stays numeric)
    ints = [int(p["int_score"]) if p["int_score"].isdigit() else None for p in parsed]
    return batch.append_column("int_score_num", pa.array(ints, pa.int64()))
