"""fineweb2_ro_ray — a Ray-Data-native quality-filter engine.

A from-scratch reimplementation of the *capabilities* of the reference
pipeline ``VladNegoita/FineWeb2-Ro`` (language-ID + quality filtering +
PII/toxicity scrubbing for pretraining-corpus construction), re-expressed
as idiomatic Ray Data: ``ray.data.Dataset`` pipelines of ``map_batches``
over zero-copy Arrow batches, actor pools for stateful scorer stages,
``groupby`` for the single wide operation (conversation reassembly), and
partitioned, resumable Parquet output with per-partition lineage.

The primary input is a Parquet table of multi-turn conversation/agent
transcripts ``(conv_id, turn_idx, role, text, tool, ts)``; the engine
appends per-turn columns ``lang, lang_score, ppl, rule_*, pii_hits,
tox_hits, keep, drop_reason, scrubbed_text`` (mirroring the reference's
column-accretion data model, see ``/root/reference`` e.g.
``ro_vs_eng/fineweb2_jql.py:23``, ``small_model_inference/
small_model_inference.py:77-93``) and reassembles conversations under a
stable ``(conv_id, turn_idx)`` ordering.

No code is copied from the reference; it is cited (file:line) in
docstrings purely so semantics can be checked for parity.
"""

__version__ = "0.1.0"
