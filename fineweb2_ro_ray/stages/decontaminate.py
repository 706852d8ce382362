"""Benchmark decontamination — flag corpus documents that contain an
evaluation-set phrase (n-gram) as a substring.

A FineWeb-style training-data pipeline must remove benchmark
contamination before training (the upstream FineWeb-2 pipeline the
reference consumes performs this class of filtering; the reference
itself inherits the cleaned corpus — SURVEY.md §1.2 passenger columns).
Engine shape:

- the EVAL SIDE is small (benchmark suites are thousands of phrases):
  collected once on the driver and broadcast as ONE compiled RE2
  literal-alternation via ``ray.put`` — the "broadcast small side"
  join rule, never a shuffle;
- the CORPUS SIDE streams: one vectorized ``match_substring_regex``
  pass per batch (RE2 compiles a literal alternation into an efficient
  multi-pattern automaton — the same mechanism as an Aho-Corasick
  scan). No Python loop over rows or phrases in the hot path.

SQL-checkable: phrase containment is plain ``instr(text, phrase) > 0``,
so the DuckDB oracle reproduces the flags exactly.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data


def eval_phrases_from_docs(
    ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    modulus: int = 97,
    n_words: int = 8,
) -> list[str]:
    """Deterministic stand-in eval set: the first ``n_words``
    single-space words of every doc with ``id % modulus == 0`` (and at
    least ``n_words`` words). Mirrors the SQL
    ``array_to_string(string_split(text,' ')[1:n], ' ')`` exactly, so
    the contamination flags are oracle-checkable end-to-end. Swap in a
    real benchmark phrase list in production."""
    def pick(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False)
        m = (ids % modulus) == 0
        sub = b.filter(pa.array(m))
        texts = sub[text_col].to_pylist()
        out = []
        for t in texts:
            if t is None:
                continue
            w = t.split(" ")
            if len(w) >= n_words:
                out.append(" ".join(w[:n_words]))
        return pa.table({"phrase": pa.array(out, pa.string())})

    phrases: list[str] = []
    for b in (
        ds.select_columns([id_col, text_col])
        .map_batches(pick, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
    ):
        phrases.extend(b["phrase"].to_pylist())
    return sorted(set(phrases))


def _pattern_chunks(phrases: list[str]) -> list[str]:
    """Chunked RE2 literal alternations. Empty phrases are DROPPED —
    ``re.escape('') == ''`` would create an empty alternation branch
    that matches every document (a blank line in a real benchmark file
    would otherwise flag the whole corpus)."""
    CHUNK = 1000
    clean = [p for p in phrases if p]
    return [
        "|".join(re.escape(p) for p in clean[i : i + CHUNK])
        for i in range(0, len(clean), CHUNK)
    ]


def _hit_mask(filled: pa.Array, pats: list[str], n: int) -> np.ndarray:
    hit = np.zeros(n, dtype=bool)
    for p in pats:
        if p:
            hit |= pc.match_substring_regex(filled, p).to_numpy(
                zero_copy_only=False
            )
    return hit


def contamination_flags(
    ds: ray.data.Dataset,
    phrases: list[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """(id, contaminated 0/1) per document: 1 iff the text contains ANY
    eval phrase as a substring. NULL text is never contaminated.

    One broadcast of the compiled alternation; one RE2 pass per batch.
    At very large phrase counts, shard the alternation into several
    regexes (RE2 program-size limit) — handled below."""
    # RE2 has a program-size limit; chunk the alternation defensively
    pats_ref = ray.put(_pattern_chunks(phrases))

    def flag(b: pa.Table) -> pa.Table:
        ps = ray.get(pats_ref)
        text = b[text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        valid = pc.is_valid(text).to_numpy(zero_copy_only=False)
        filled = pc.fill_null(text, "")
        hit = _hit_mask(filled, ps, b.num_rows)
        hit &= valid
        return pa.table(
            {
                id_col: b[id_col],
                "contaminated": pa.array(hit.astype(np.int64), pa.int64()),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        flag, batch_format="pyarrow"
    )


def decontaminate(
    ds: ray.data.Dataset,
    phrases: list[str],
    *,
    text_col: str = "text",
) -> ray.data.Dataset:
    """Filter variant: drop contaminated documents, keep the rest with
    all their columns (the actual pipeline step; ``contamination_flags``
    is the auditable report)."""
    pats_ref = ray.put(_pattern_chunks(phrases))

    def keep(b: pa.Table) -> pa.Table:
        ps = ray.get(pats_ref)
        text = b[text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        filled = pc.fill_null(text, "")  # null text can't be contaminated
        hit = _hit_mask(filled, ps, b.num_rows)
        return b.filter(pa.array(~hit))

    return ds.map_batches(keep, batch_format="pyarrow")
