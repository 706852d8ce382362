"""Deduplication operators — exact, MinHash+LSH, SimHash, n-gram Jaccard.

The reference performs no dedup itself; it *consumes* the upstream
FineWeb-2 MinHash dedup as the passenger column ``minhash_cluster_size``
(``/root/reference/fineweb/fineweb2_download.py:22``) and asserts split
disjointness (``training/shard_loader.py:72-74``).  A corpus engine at
10^12-turn scale needs the dedup stage itself, so these are first-class
operators here (SURVEY.md §2.7).

Scale notes (100 TB):
- exact dedup = map-side combiner (drop dups inside each batch) then ONE
  ``groupby(hash)`` shuffle over already-thinned rows;
- MinHash: signatures are computed batch-local (actor pool), the only
  shuffle is the banded ``groupby(band_id, band_hash)`` whose rows are
  32-byte keys, not documents;
- SimHash: same banding trick on 16-bit chunks of the 64-bit hash.
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data
from ray.data.aggregate import Min

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def add_md5(batch: pa.Table, col: str = "text", out: str = "text_md5") -> pa.Table:
    """Content fingerprint (md5 hex — matches DuckDB ``md5()`` for the
    oracle)."""
    texts = batch[col].to_pylist()
    h = [hashlib.md5((t or "").encode("utf-8")).hexdigest() for t in texts]
    return batch.append_column(out, pa.array(h, pa.string()))


def _batch_min_by_key(batch: pa.Table, key: str, id_col: str) -> pa.Table:
    """Map-side combiner: one (key, min id) row per distinct key per
    batch — thins the shuffle input (ray_guide 'pre-aggregate first')."""
    df = batch.select([key, id_col]).to_pandas()
    out = df.groupby(key, as_index=False)[id_col].min()
    return pa.Table.from_pandas(out, preserve_index=False)


def dedup_exact(
    ds: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """Exact dedup: canonical row per distinct text = the MIN id.
    hash → map-side partial min → small groupby shuffle → global min.
    Returns columns (text_md5, doc_id)."""
    ds = ds.map_batches(
        lambda b: _batch_min_by_key(add_md5(b, text_col), "text_md5", id_col),
        batch_format="pyarrow",
    )
    out = ds.groupby("text_md5").aggregate(Min(id_col, alias_name=id_col))
    return out


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

_MERSENNE = (1 << 61) - 1


class MinHasher:
    """Actor-pool stage: char-shingle MinHash signatures.

    State (permutation coefficients) built once per actor — the
    reference's scorer-state pattern (SURVEY.md §2.3). Signature: for
    each of ``num_perm`` universal hashes h_i(x) = (a_i x + b_i) mod p,
    the min over the document's shingle set (base hash = crc32 of the
    k-char shingle)."""

    def __init__(self, k: int = 5, num_perm: int = 64, seed: int = 1717) -> None:
        rng = np.random.default_rng(seed)
        self.k = k
        self.num_perm = num_perm
        self.a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)

    def signature(self, text: str) -> np.ndarray:
        k = self.k
        data = text.encode("utf-8", "ignore")
        if len(data) < k:
            shingles = {zlib.crc32(data)}
        else:
            shingles = {zlib.crc32(data[i : i + k]) for i in range(len(data) - k + 1)}
        x = np.fromiter(shingles, dtype=np.uint64, count=len(shingles))
        # (a*x + b) mod p, batched over perms; object dtype avoided by
        # doing the mod-mersenne trick in uint64 with Python ints fallback
        vals = (x[None, :] * self.a[:, None] + self.b[:, None]) % np.uint64(_MERSENNE)
        return vals.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        sigs = np.stack([self.signature(t or "") for t in texts]) if texts else np.zeros((0, self.num_perm), np.uint64)
        sig_col = pa.FixedSizeListArray.from_arrays(
            pa.array(sigs.reshape(-1).astype(np.uint64)), self.num_perm
        )
        return batch.append_column("minhash", sig_col)


def minhash_signatures(
    ds: ray.data.Dataset, *, k: int = 5, num_perm: int = 64, concurrency=(1, 8)
) -> ray.data.Dataset:
    return ds.map_batches(
        MinHasher,
        fn_constructor_kwargs={"k": k, "num_perm": num_perm},
        batch_format="pyarrow",
        concurrency=concurrency,
    )


def _explode_bands(batch: pa.Table, bands: int, rows: int, id_col: str) -> pa.Table:
    """(doc, signature) → ``bands`` rows of (band_id, band_hash, id,
    signature) — the LSH bucketing key. band_hash = md5 of the band's
    rows (stable, collision-safe enough for bucketing)."""
    ids = batch[id_col].to_pylist()
    sigs = batch["minhash"].to_pylist()
    out_band, out_hash, out_id, out_sig = [], [], [], []
    for i, sig in enumerate(sigs):
        arr = np.asarray(sig, dtype=np.uint64)
        for b in range(bands):
            chunk = arr[b * rows : (b + 1) * rows]
            h = hashlib.md5(chunk.tobytes()).hexdigest()[:16]
            out_band.append(b)
            out_hash.append(h)
            out_id.append(ids[i])
            out_sig.append(sig)
    return pa.table(
        {
            "band_id": pa.array(out_band, pa.int32()),
            "band_hash": pa.array(out_hash, pa.string()),
            id_col: pa.array(out_id),
            "minhash": pa.array(out_sig),
        }
    )


def _bucket_pairs(group: pd.DataFrame, id_col: str) -> pd.DataFrame:
    """Candidate pairs within one LSH bucket, with estimated Jaccard =
    fraction of matching signature positions."""
    if len(group) < 2:
        return pd.DataFrame({"doc_a": [], "doc_b": [], "est_jaccard": []})
    g = group.sort_values(id_col)
    ids = g[id_col].to_numpy()
    sigs = np.stack(g["minhash"].to_numpy())
    a_idx, b_idx = np.triu_indices(len(ids), k=1)
    est = (sigs[a_idx] == sigs[b_idx]).mean(axis=1)
    return pd.DataFrame(
        {"doc_a": ids[a_idx], "doc_b": ids[b_idx], "est_jaccard": est}
    )


def minhash_lsh_pairs(
    ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    k: int = 5,
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.7,
) -> ray.data.Dataset:
    """Near-duplicate candidate pairs via banded LSH: signature →
    explode to (band_id, band_hash) keys → groupby buckets → pairwise
    inside buckets → distinct pairs ≥ threshold.

    The shuffle moves (key, id, signature) rows only — never documents.
    Output: (doc_a, doc_b, est_jaccard) distinct pairs."""
    rows = num_perm // bands
    sigs = minhash_signatures(ds, k=k, num_perm=num_perm)
    exploded = sigs.map_batches(
        lambda b: _explode_bands(b, bands, rows, id_col), batch_format="pyarrow"
    )
    pairs = exploded.groupby(["band_id", "band_hash"]).map_groups(
        lambda g: _bucket_pairs(g, id_col), batch_format="pandas"
    )
    # same pair can surface from several bands → dedup, then threshold
    uniq = pairs.groupby(["doc_a", "doc_b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )
    import pyarrow.compute as pc

    return uniq.map_batches(
        lambda t: t.filter(pc.greater_equal(t["est_jaccard"], threshold)),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


class SimHasher:
    """64-bit SimHash over whitespace tokens (crc32-seeded bit mixing;
    weight = term frequency). Near-dups differ in few bits."""

    def __init__(self) -> None:
        rng = np.random.default_rng(4242)
        # 64 random odd multipliers to spread crc32 into 64 bits
        self.mix = rng.integers(1, 2**63, size=2, dtype=np.uint64) | np.uint64(1)

    @staticmethod
    def _token_hash64(tok: str) -> int:
        h = hashlib.md5(tok.encode("utf-8")).digest()[:8]
        return int.from_bytes(h, "little")

    def simhash(self, text: str) -> int:
        from collections import Counter

        toks = Counter((text or "").split())
        if not toks:
            return 0
        acc = np.zeros(64, dtype=np.int64)
        for tok, w in toks.items():
            h = self._token_hash64(tok)
            bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
            acc += np.where(bits.astype(bool), w, -w)
        out = 0
        for i in range(64):
            if acc[i] > 0:
                out |= 1 << i
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        hs = np.array([self.simhash(t) for t in texts], dtype=np.uint64)
        return batch.append_column("simhash", pa.array(hs, pa.uint64()))


def simhash_pairs(
    ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    max_hamming: int = 3,
    concurrency=(1, 8),
) -> ray.data.Dataset:
    """Near-dup pairs with Hamming(simhash) <= max_hamming, found by
    bucketing on each of 4 16-bit chunks (any pair within Hamming<=3
    shares at least one exact chunk — pigeonhole)."""
    hashed = ds.map_batches(SimHasher, batch_format="pyarrow", concurrency=concurrency)

    def explode(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_pylist()
        hs = b["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        out_chunk, out_key, out_id, out_h = [], [], [], []
        for c in range(4):
            key = ((hs >> np.uint64(16 * c)) & np.uint64(0xFFFF)).astype(np.int64)
            out_chunk += [c] * len(ids)
            out_key += key.tolist()
            out_id += ids
            out_h += hs.tolist()
        return pa.table(
            {
                "chunk": pa.array(out_chunk, pa.int32()),
                "chunk_key": pa.array(out_key, pa.int64()),
                id_col: pa.array(out_id),
                "simhash": pa.array(np.array(out_h, dtype=np.uint64), pa.uint64()),
            }
        )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": [], "hamming": []})
        g = g.sort_values(id_col)
        ids = g[id_col].to_numpy()
        hs = g["simhash"].to_numpy().astype(np.uint64)
        a, b = np.triu_indices(len(ids), k=1)
        x = hs[a] ^ hs[b]
        ham = np.array([bin(int(v)).count("1") for v in x])
        m = ham <= max_hamming
        return pd.DataFrame({"doc_a": ids[a][m], "doc_b": ids[b][m], "hamming": ham[m]})

    pairs = (
        hashed.map_batches(explode, batch_format="pyarrow")
        .groupby(["chunk", "chunk_key"])
        .map_groups(bucket_pairs, batch_format="pandas")
    )
    return pairs.groupby(["doc_a", "doc_b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# exact word-set Jaccard (SQL-checkable near-dup measure)
# ---------------------------------------------------------------------------


def jaccard_pairs_by_group(
    ds: ray.data.Dataset,
    *,
    group_col: str = "source",
    id_col: str = "doc_id",
    threshold: float = 0.5,
) -> ray.data.Dataset:
    """All pairs within a group with word-set Jaccard >= threshold.

    Canonical tokenization: ``text.split(' ')`` (single space — matches
    DuckDB ``string_split(text, ' ')`` for the oracle), sets include
    empty tokens.  Vectorized per group: binary token-incidence matrix,
    intersections = integer matmul (exact), union = |A|+|B|-∩.
    Partitioning assumption: pairs only exist within ``group_col``."""

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col)
        ids = g[id_col].to_numpy()
        sets = [set((t or "").split(" ")) for t in g["text"]]
        vocab: dict[str, int] = {}
        for s in sets:
            for w in s:
                vocab.setdefault(w, len(vocab))
        m = np.zeros((len(sets), len(vocab)), dtype=np.int32)
        for i, s in enumerate(sets):
            for w in s:
                m[i, vocab[w]] = 1
        inter = m @ m.T
        sizes = m.sum(axis=1)
        a, b = np.triu_indices(len(ids), k=1)
        union = sizes[a] + sizes[b] - inter[a, b]
        with np.errstate(divide="ignore", invalid="ignore"):
            jac = np.where(union > 0, inter[a, b] / np.maximum(union, 1), 0.0)
        keep = jac >= threshold
        return pd.DataFrame(
            {
                "doc_a": ids[a][keep],
                "doc_b": ids[b][keep],
                "jaccard": jac[keep],
            }
        )

    return ds.select_columns([group_col, id_col, "text"]).groupby(group_col).map_groups(
        per_group, batch_format="pandas"
    )
