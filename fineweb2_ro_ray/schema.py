"""Arrow schemas for the transcript engine.

The reference's schema is implicit and accretes columns per stage
(SURVEY.md §1.2; e.g. ``/root/reference/ro_vs_eng/fineweb2_jql.py:23``
adds three score columns, ``small_model_inference/small_model_inference.py:77-93``
adds score/label columns). We make both edges explicit: the transcript
input schema (from BASELINE.json input_hint) and the labeled output
schema, while intermediate stages still accrete columns zero-copy via
``pyarrow.Table.append_column``.
"""

from __future__ import annotations

import pyarrow as pa

# Input: multi-turn conversation / agent transcripts.
TRANSCRIPT_SCHEMA = pa.schema(
    [
        pa.field("conv_id", pa.string()),
        pa.field("turn_idx", pa.int32()),
        pa.field("role", pa.string()),  # user / assistant / tool / system
        pa.field("text", pa.string()),
        pa.field("tool", pa.string()),  # tool name or ""
        pa.field("ts", pa.timestamp("us")),
    ]
)

# Columns appended by the engine, in stage order.
LID_COLUMNS = [
    pa.field("lang", pa.string()),
    pa.field("lang_score", pa.float64()),
]
PPL_COLUMNS = [pa.field("ppl", pa.float64())]
RULE_COLUMNS = [
    pa.field("n_chars", pa.int64()),
    pa.field("n_words", pa.int64()),
    pa.field("n_lines", pa.int64()),
    pa.field("mean_word_len", pa.float64()),
    pa.field("max_word_len", pa.int64()),
    pa.field("stopword_ratio", pa.float64()),
    pa.field("symbol_ratio", pa.float64()),
    pa.field("dup_line_frac", pa.float64()),
]
SCRUB_COLUMNS = [
    pa.field("scrubbed_text", pa.string()),
    pa.field("pii_hits", pa.int32()),
    pa.field("tox_hits", pa.int32()),
]
DECIDE_COLUMNS = [
    pa.field("keep", pa.bool_()),
    pa.field("drop_reason", pa.string()),  # first failing rule name, "" if kept
]

LABELED_SCHEMA = pa.schema(
    list(TRANSCRIPT_SCHEMA)
    + LID_COLUMNS
    + PPL_COLUMNS
    + RULE_COLUMNS
    + SCRUB_COLUMNS
    + DECIDE_COLUMNS
)

# Conversation-level output of the reassembly stage.
CONVERSATION_SCHEMA = pa.schema(
    [
        pa.field("conv_id", pa.string()),
        pa.field("n_turns", pa.int64()),
        pa.field("n_kept", pa.int64()),
        pa.field("conv_keep", pa.bool_()),  # conversation survives iff >=1 kept turn
        pa.field("text", pa.string()),  # kept turns' scrubbed_text joined in turn order
        pa.field("first_ts", pa.timestamp("us")),
        pa.field("last_ts", pa.timestamp("us")),
    ]
)


def from_pandas_clean(df, **kwargs) -> pa.Table:
    """``pa.Table.from_pandas`` WITHOUT the ``b'pandas'`` schema
    metadata. The metadata blob makes the Arrow schema unhashable in
    Ray's block-unification fast path (``set(schemas)`` →
    "Failed to hash the schemas" warnings in every reduce task) and
    serves no purpose inside an engine that pins dtypes explicitly."""
    t = pa.Table.from_pandas(df, preserve_index=False, **kwargs)
    return t.replace_schema_metadata(None)


def strip_metadata(t: pa.Table) -> pa.Table:
    """Zero-copy schema-metadata strip — applied at every Parquet read
    boundary (files written by pandas embed the ``b'pandas'`` blob in
    the file schema, which would otherwise taint every downstream
    block)."""
    return t.replace_schema_metadata(None)
