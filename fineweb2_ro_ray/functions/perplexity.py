"""KenLM-style n-gram perplexity — frozen byte-bigram LM, add-one smoothing.

The reference's quality scores come from learned models loaded once per
worker (JQL heads, ``/root/reference/ro_vs_eng/fineweb2_jql.py:13-45``);
no model files are shippable here, so the perplexity scorer is a frozen
byte-bigram language model whose counts are trained at import time from
an embedded, deterministically generated Romanian-like seed corpus.
Same interface: per-turn float score, lower = more natural Romanian.

Determinism (SURVEY.md §7.4): log-probs are float64 and each turn's
summation covers exactly its own byte pairs, so scores are stable to
within one pairwise-summation rounding (~1e-13 relative) across
engines; across *runs and parallelism levels of this engine* they are
bit-identical (same reduceat segments). Tests compare ppl with
rtol=1e-9; keep/drop and scrubbed text are compared exactly.

``ppl(text) = exp(-mean(log P(b_{i+1} | b_i)))`` over the UTF-8 bytes;
texts with < 2 bytes score 0.0.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_SEED_VOCAB = (
    "și de la cu pentru este sunt care nu se în pe un o ce mai din ale "
    "acest aceasta dar fi fost avea face timp zi an oameni lume țară oraș "
    "casă apă foc munte carte limbă frumos mare mic bun rău repede încet "
    "astăzi mâine ieri noi voi ei ele eu tu el ea datele modelul sistemul "
    "procesul rezultatul întrebarea răspunsul conversația agentul utilizatorul"
).split()


def _build_seed_corpus() -> bytes:
    """~60 KB of deterministic Romanian-like prose (seeded rng; no
    external data)."""
    rng = np.random.default_rng(1234)
    parts: list[str] = []
    for _ in range(700):
        n = int(rng.integers(5, 14))
        idx = rng.integers(0, len(_SEED_VOCAB), size=n)
        sent = " ".join(_SEED_VOCAB[i] for i in idx)
        sent = sent.capitalize() + "."
        parts.append(sent)
        if rng.random() < 0.1:
            parts.append("\n")
    return " ".join(parts).encode("utf-8")


def _train_logp() -> np.ndarray:
    corpus = np.frombuffer(_build_seed_corpus(), dtype=np.uint8)
    counts = np.zeros((256, 256), dtype=np.float64)
    np.add.at(counts, (corpus[:-1], corpus[1:]), 1.0)
    row = counts.sum(axis=1, keepdims=True)
    return np.log((counts + 1.0) / (row + 256.0))


LOGP = _train_logp()  # frozen at import; deterministic
_LOGP_FLAT = LOGP.reshape(-1)  # 1-D gather is ~20x faster than 2-D fancy indexing


def _utf8_flat_view(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Zero-copy (bytes, per-row lengths) view of a string array: an
    Arrow StringArray's data buffer IS the concatenated UTF-8 payload,
    so no to_pylist/encode/join round-trip is needed."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    import pyarrow.compute as pc

    arr = pc.fill_null(arr, "")
    if pa.types.is_large_string(arr.type):
        off_dtype = np.int64
    else:
        off_dtype = np.int32
    buffers = arr.buffers()
    offsets = np.frombuffer(buffers[1], dtype=off_dtype)
    offsets = offsets[arr.offset : arr.offset + len(arr) + 1].astype(np.int64)
    data = np.frombuffer(buffers[2], dtype=np.uint8) if buffers[2] is not None else np.zeros(0, np.uint8)
    flat = data[offsets[0] : offsets[-1]]
    lens = np.diff(offsets)
    return flat, lens


def perplexity_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Append a ``ppl`` float64 column — fully vectorized over the
    batch's UTF-8 bytes, read zero-copy from the Arrow string buffer."""
    flat_all, lens = _utf8_flat_view(batch[text_col])
    n = len(lens)
    ppl = np.zeros(n, dtype=np.float64)
    if len(flat_all) >= 2:
        flat = flat_all
        ends = np.cumsum(lens)
        # drop pairs that span a row boundary so each row's segment holds
        # EXACTLY its own len-1 pairs — the summation (numpy pairwise
        # blocking) then depends only on the row's own bytes, making ppl
        # bit-identical regardless of batch boundaries / parallelism.
        keep_pair = np.ones(len(flat) - 1, dtype=bool)
        boundary = ends[:-1] - 1
        boundary = boundary[(boundary >= 0) & (boundary < len(keep_pair))]
        keep_pair[boundary] = False
        a = flat[:-1][keep_pair].astype(np.int32)
        b2 = flat[1:][keep_pair].astype(np.int32)
        lp = _LOGP_FLAT[(a << 8) + b2]  # == LOGP[a, b2], single 1-D gather
        npairs = np.maximum(lens - 1, 0)
        offsets = np.zeros(n, dtype=np.int64)
        np.cumsum(npairs[:-1], out=offsets[1:])
        # rows whose segment would start past the end of lp (trailing
        # empty/1-byte rows) are excluded; their sums stay 0. Rows with an
        # empty segment mid-array pick up a neighbour's value via reduceat
        # semantics — discarded by the valid mask below.
        ok = offsets < len(lp)
        sums = np.zeros(n, dtype=np.float64)
        if ok.any():
            sums[ok] = np.add.reduceat(lp, offsets[ok])
        valid = npairs >= 1
        with np.errstate(divide="ignore", invalid="ignore", over="ignore"):
            ppl = np.where(valid, np.exp(-(sums / np.maximum(npairs, 1))), 0.0)
    return batch.append_column("ppl", pa.array(ppl, pa.float64()))


class PerplexityScorer:
    """Actor-pool stage: the frozen log-prob table is bound once per
    actor (reference pattern A1: load model once per GPU worker,
    ``/root/reference/ro_vs_eng/fineweb2_jql.py:29-45``)."""

    def __init__(self) -> None:
        self._logp = LOGP

    def __call__(self, batch: pa.Table) -> pa.Table:
        return perplexity_batch(batch)
