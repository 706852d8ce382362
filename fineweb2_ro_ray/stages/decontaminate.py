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


def eval_ngram_keys(
    ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 13,
    sep: str = " ",
    modulus: int = 97,
    max_eval_grams: int = 2_000_000,
) -> tuple[np.ndarray, np.ndarray]:
    """Distinct 128-bit word n-gram keys (g1, g2) of the EVAL slice
    (``id % modulus == 0`` — the same deterministic stand-in eval set
    as ``eval_phrases_from_docs``; swap in real benchmark docs in
    production). The eval side is SMALL by definition (benchmark
    suites, not the corpus), so the distinct key set is pulled to the
    driver under an explicit ``max_eval_grams`` bound and broadcast
    once; the corpus side never shuffles. Gram keys reuse
    ``spans._batch_windows`` (per-word hash + rolling polynomial, two
    independent 64-bit lanes): a false hit needs a simultaneous
    128-bit collision, negligible at any corpus size."""
    from .spans import _PAIR_DT, _batch_windows

    def grams(t: pa.Table) -> pa.Table:
        ids = t[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        m = (ids.to_numpy(zero_copy_only=False) % modulus) == 0
        sub = t.filter(pa.array(m))
        _, _, _, _, g1, g2 = _batch_windows(sub, text_col=text_col, k=n, sep=sep)
        pairs = np.empty(len(g1), dtype=_PAIR_DT)
        pairs["g1"], pairs["g2"] = g1, g2
        u = np.unique(pairs)
        return pa.table(
            {"g1": pa.array(u["g1"], pa.uint64()), "g2": pa.array(u["g2"], pa.uint64())}
        )

    chunks: list[np.ndarray] = []
    total = 0
    stream = ds.select_columns([id_col, text_col]).map_batches(
        grams, batch_format="pyarrow"
    )
    for b in stream.iter_batches(batch_format="pyarrow"):
        p = np.empty(b.num_rows, dtype=_PAIR_DT)
        p["g1"] = b["g1"].to_numpy(zero_copy_only=False)
        p["g2"] = b["g2"].to_numpy(zero_copy_only=False)
        chunks.append(p)
        total += len(p)
        if total > 4 * max_eval_grams:  # re-dedupe periodically
            chunks = [np.unique(np.concatenate(chunks))]
            total = len(chunks[0])
    allp = np.unique(np.concatenate(chunks)) if chunks else np.empty(0, _PAIR_DT)
    if len(allp) > max_eval_grams:
        raise ValueError(
            f"eval n-gram set ({len(allp)}) exceeds max_eval_grams "
            f"({max_eval_grams}) — the eval side must stay broadcastable"
        )
    return allp["g1"].copy(), allp["g2"].copy()


def ngram_contamination_report(
    ds: ray.data.Dataset,
    eval_keys: tuple[np.ndarray, np.ndarray],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 13,
    sep: str = " ",
    threshold: tuple[int, int] = (4, 5),
) -> ray.data.Dataset:
    """Pile/GPT-3-style n-gram overlap decontamination report
    (arXiv:2101.00027 §G, arXiv:2005.14165 §C): per document, how many
    of its word ``n``-gram POSITIONS carry a gram present in the eval
    set, and a ``contaminated`` flag when the overlap fraction reaches
    ``threshold`` (a ratio num/den compared in INTEGER math —
    ``n_hit * den >= n_grams * num`` — so the flag is value-exact vs
    the SQL oracle, no float comparison anywhere).

    Engine shape: the (g1, g2) eval key set is broadcast sorted; each
    corpus batch builds its gram keys from ONE flat word array
    (``spans._batch_windows``), membership is a vectorized
    ``searchsorted`` on g1 with a g2 confirm over the (tiny, bounded)
    maximal equal-g1 run, and per-doc counts fall out of two
    ``bincount`` calls. No Python over rows, grams, or phrases.

    Complements ``contamination_flags`` (substring scan of whole eval
    PHRASES): the n-gram form catches partial overlap — a document
    that shares 80% of its 13-grams with an eval doc without containing
    any full phrase verbatim. Documents shorter than ``n`` words have
    ``n_grams = 0`` and are never contaminated."""
    from .spans import _batch_windows

    g1s, g2s = eval_keys
    order = np.lexsort((g2s, g1s))
    G1, G2 = np.ascontiguousarray(g1s[order]), np.ascontiguousarray(g2s[order])
    if len(G1):
        _, run_counts = np.unique(G1, return_counts=True)
        max_run = int(run_counts.max())
    else:
        max_run = 0
    ref = ray.put((G1, G2, max_run))
    num, den = threshold

    def report(t: pa.Table) -> pa.Table:
        gg1, gg2, mr = ray.get(ref)
        _, parents, _, win, g1, g2 = _batch_windows(t, text_col=text_col, k=n, sep=sep)
        par = parents[win] if len(win) else np.array([], np.int64)
        hit = np.zeros(len(g1), dtype=bool)
        if len(gg1) and len(g1):
            lo = np.searchsorted(gg1, g1, side="left")
            top = len(gg1) - 1
            for off in range(mr):
                idx = lo + off
                ok = idx <= top
                idxc = np.minimum(idx, top)
                hit |= ok & (gg1[idxc] == g1) & (gg2[idxc] == g2)
        nrows = t.num_rows
        n_grams = np.bincount(par, minlength=nrows).astype(np.int64)
        n_hit = np.bincount(par[hit], minlength=nrows).astype(np.int64)
        contaminated = (n_grams > 0) & (n_hit * den >= n_grams * num)
        return pa.table(
            {
                id_col: t[id_col],
                "n_grams": pa.array(n_grams, pa.int64()),
                "n_hit": pa.array(n_hit, pa.int64()),
                "contaminated": pa.array(contaminated, pa.bool_()),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        report, batch_format="pyarrow"
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
