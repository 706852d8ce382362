"""Edit-distance (Levenshtein) near-duplicate pairs — Ed-Join on Ray.

Finds all document pairs within byte-level Levenshtein distance
``max_dist`` using the Ed-Join q-gram prefix filter (Xiao, Wang & Lin,
"Ed-Join: an efficient algorithm for similarity joins with edit
distance constraints", VLDB 2008) followed by an EXACT banded-DP
verification, so the result is value-exact (DuckDB's byte-based
``levenshtein`` is the oracle). Completes the dedup family (exact /
MinHash / SimHash / Jaccard / span / embedding) with the edit-distance
member the reference corpus' dedup tooling delegates to external
systems for.

Soundness of the candidate filter (why no true pair is missed):

* one edit operation destroys at most ``q`` of a string's distinct
  q-grams, so ``ed(a,b) <= K`` implies the q-gram SETS differ by at
  most ``qK`` elements per side;
* by the prefix-filter theorem, under ANY one total order of grams
  the first ``qK + 1`` grams of each side must then intersect — grams
  are ordered by (document frequency asc, gram) per group, the
  candidate-minimizing Ed-Join order;
* the shared-prefix-gram guarantee needs ``max(|Sa|, |Sb|) > qK``
  (only then is the overlap bound ``max - qK`` at least 1) — two
  LOW-GRAM documents (each with at most ``qK`` distinct grams: short
  strings, and long-but-repetitive ones) can sit within distance ``K``
  with fully disjoint gram sets, so every document with
  ``n_grams <= qK`` additionally emits length-band sentinel keys (its
  band ``blen // K`` and the next — two docs within ``K`` bytes of
  length always share one); a mixed low/high pair is always caught by
  the gram prefixes, since the low side's prefix is its entire set;
* ``|byte_len(a) - byte_len(b)| <= K`` is a necessary condition and
  prunes candidate buckets.

All wide steps run on the tree-merged hash exchange; texts move only
for documents that survive candidate generation (semi-join-filtered
payload attach, the same dup-rate-bounded shape as
``stages/dedup.py``). The verifier is the exact O(len_a x len_b) DP
evaluated band-free but row-vectorized in numpy (prefix-min transform
for the sequential insertion term) with early abandon once a whole row
exceeds ``K`` — exact, not an approximation.

Reference parity note: the reference pipeline inherits its dedup from
the FineWeb2 corpus tooling (see ``fineweb/fineweb2_download.py``);
this member exceeds that surface, like the rest of the dedup family.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data



def _flat_bytes(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(flat uint8 data, int64 offsets) of a string/binary array,
    honouring the array's slice offset."""
    a = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    a = a.cast(pa.binary())
    off = np.frombuffer(a.buffers()[1], np.int32)[
        a.offset : a.offset + len(a) + 1
    ].astype(np.int64)
    buf = a.buffers()[2]
    data = (
        np.frombuffer(buf, np.uint8) if buf is not None else np.zeros(0, np.uint8)
    )
    return data, off


def _doc_gram_rows(
    texts: pa.Array, q: int, max_dist: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Per-document DISTINCT q-gram hashes, packed exactly (q <= 8
    bytes into one int64 — collision-free, so the filter's soundness
    doesn't rest on a hash). Returns (doc_row_idx, gram, n_grams_of_doc,
    byte_len_of_doc) flat row arrays, sentinel rows included."""
    assert 1 <= q <= 7, "q-gram bytes must pack into a signed int64"
    data, off = _flat_bytes(texts)
    n = len(off) - 1
    blen = off[1:] - off[:-1]
    total = int(off[-1] - off[0])
    base = off[0]
    if total >= q:
        d = data[base : base + total].astype(np.uint64)
        w = d[: total - q + 1].copy()
        for j in range(1, q):
            w = (w << np.uint64(8)) | d[j : total - q + 1 + j]
        starts = np.arange(total - q + 1, dtype=np.int64)
        row = np.searchsorted(off - base, starts, side="right") - 1
        ok = starts + q <= (off - base)[row + 1]  # window within one row
        row, w = row[ok], w[ok]
        # distinct per doc: unique of (row << 56 | gram) is unsafe for
        # q == 7, so unique over the pair via lexsort + neighbor-diff
        order = np.lexsort((w, row))
        row, w = row[order], w[order]
        keep = np.concatenate(
            [[True], (row[1:] != row[:-1]) | (w[1:] != w[:-1])]
        )
        row, w = row[keep], w[keep]
        grams = w.astype(np.int64) & np.int64(0x7FFF_FFFF_FFFF_FFFF)
        ngr = np.bincount(row, minlength=n).astype(np.int64)
    else:
        row = np.zeros(0, np.int64)
        grams = np.zeros(0, np.int64)
        ngr = np.zeros(n, np.int64)
    # Sentinel rows for LOW-GRAM documents. The prefix-filter theorem
    # guarantees a shared prefix gram only when max(|Sa|, |Sb|) > qK
    # (then |Sa ∩ Sb| >= max - qK >= 1 and both qK+1 prefixes must
    # intersect); two docs whose DISTINCT gram sets are both <= qK can
    # be within distance K with fully disjoint grams (e.g. 'a'*19 vs
    # 'aab'*6+'a' at q=3, K=16 — ed 6, no shared gram). So every doc
    # with n_grams <= qK (which subsumes gram-less sub-q-byte strings
    # AND long-but-repetitive ones) also routes through sentinels. A
    # mixed pair (one side > qK grams) is always caught by the gram
    # prefixes themselves: the low side's prefix is its whole set.
    # Sentinels are sub-bucketed by length band — each doc emits its
    # band key f(blen // K) and the next band's f(blen // K + 1), with
    # f(x) = -1 - x (always < 0, never colliding with a packed q-gram):
    # two docs with |blen diff| <= K have bands differing by at most 1
    # and so always share a key, while length-incompatible low-gram
    # docs never meet — a single global bucket would go quadratic at
    # corpus scale.
    kk = max(1, max_dist)
    sent = np.flatnonzero(ngr <= q * max_dist).astype(np.int64)
    band = blen[sent] // kk
    row = np.concatenate([row, sent, sent])
    grams = np.concatenate([grams, -1 - band, -1 - (band + 1)])
    return row, grams, ngr, blen


def _banded_lev_batch(
    ta: list[bytes], tb: list[bytes], k: int
) -> np.ndarray:
    """Exact byte Levenshtein per pair, -1 where > k. Row-vectorized
    DP: the sequential insertion recurrence cur[j] = min(m[j],
    cur[j-1] + 1) is the prefix-min transform cur = accmin(c - j) + j,
    one ``np.minimum.accumulate`` per row; rows whose minimum exceeds
    k abandon early (the true distance can only grow)."""
    out = np.empty(len(ta), np.int64)
    for i, (a, b) in enumerate(zip(ta, tb)):
        la, lb = len(a), len(b)
        if abs(la - lb) > k:
            out[i] = -1
            continue
        if la == 0 or lb == 0:
            d = max(la, lb)
            out[i] = d if d <= k else -1
            continue
        if la < lb:  # fewer DP rows
            a, b, la, lb = b, a, lb, la
        av = np.frombuffer(a, np.uint8)
        bv = np.frombuffer(b, np.uint8)
        idx = np.arange(lb + 1, dtype=np.int64)
        prev = idx.copy()
        c = np.empty(lb + 1, np.int64)
        dist = -1
        for r in range(la):
            c[0] = r + 1
            np.minimum(prev[:-1] + (bv != av[r]), prev[1:] + 1, out=c[1:])
            cur = np.minimum.accumulate(c - idx) + idx
            if cur.min() > k:
                break
            prev, c = cur, prev
        else:
            dist = int(prev[-1]) if prev[-1] <= k else -1
        out[i] = dist
    return out


def editdistance_pairs_distributed(
    ds: ray.data.Dataset,
    *,
    max_dist: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str | None = None,
    q: int = 3,
) -> ray.data.Dataset:
    """All pairs (``doc_a`` < ``doc_b``, same ``group_col`` when given)
    with byte-level Levenshtein distance <= ``max_dist``; emits
    (doc_a, doc_b, dist). Four keyed exchanges, none of which moves
    document text: gram df -> per-doc Ed-Join prefix -> bucket pairs ->
    pair distinct; texts travel once, semi-join-filtered to candidate
    survivors, for the exact verify."""
    import pyarrow.compute as pc

    from .dedup import attach_payload_exchange, distinct_pair_ids
    from .exchange import hash_exchange_map_groups

    k, qq = int(max_dist), int(q)
    grp = group_col

    def explode(b: pa.Table) -> pa.Table:
        texts = pc.fill_null(b[text_col], "")
        row, grams, ngr, blen = _doc_gram_rows(
            texts.combine_chunks()
            if isinstance(texts, pa.ChunkedArray)
            else texts,
            qq,
            k,
        )
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        cols = {
            "_id": pa.array(ids[row], pa.int64()),
            "gram": pa.array(grams, pa.int64()),
            "n_grams": pa.array(ngr[row], pa.int64()),
            "blen": pa.array(blen[row], pa.int64()),
        }
        if grp is not None:
            g = b[grp].to_pandas().to_numpy()
            cols[grp] = pa.array(g[row])
        return pa.table(cols)

    gram_rows = ds.select_columns(
        [c for c in (grp, id_col, text_col) if c is not None]
    ).map_batches(explode, batch_format="pyarrow")

    gkey = [grp, "gram"] if grp is not None else ["gram"]
    dkey = [grp, "_id"] if grp is not None else ["_id"]

    def add_df(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["df"] = g.groupby(gkey, dropna=False)["_id"].transform("size")
        return g

    with_df = hash_exchange_map_groups(gram_rows, add_df, key=gkey)

    def take_prefix(g: pd.DataFrame) -> pd.DataFrame:
        # sentinel rows (gram < 0: length-band keys) always survive and
        # must NOT consume prefix slots (the theorem needs the first
        # qK + 1 REAL grams)
        is_sent = g["gram"].to_numpy() < 0
        real = g[~is_sent].sort_values(dkey + ["df", "gram"], kind="mergesort")
        pos = real.groupby(dkey, dropna=False).cumcount()
        out = pd.concat([real[pos < qq * k + 1], g[is_sent]])
        return out[gkey + ["_id", "blen"]]

    prefixes = hash_exchange_map_groups(with_df, take_prefix, key=dkey)

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(gkey + ["_id"], kind="mergesort")
        if grp is not None:
            keyv = (
                g[grp].astype(str) + "\x00" + g["gram"].astype(str)
            ).to_numpy()
        else:
            keyv = g["gram"].to_numpy()
        ids = g["_id"].to_numpy()
        bl = g["blen"].to_numpy()
        starts = np.flatnonzero(
            np.concatenate([[True], keyv[1:] != keyv[:-1]])
        )
        ends = np.concatenate([starts[1:], [len(keyv)]])
        out_a, out_b = [], []
        for s, e in zip(starts, ends):
            m = e - s
            if m < 2:
                continue
            # output-bounded pair generation: length-sort the bucket,
            # pair each doc only with the following docs inside the
            # |blen diff| <= K window (searchsorted bound) — O(bucket
            # + pairs) instead of the dense triu O(bucket^2), which a
            # hot gram would otherwise blow up on
            order = np.argsort(bl[s:e], kind="stable")
            blo = bl[s:e][order]
            ido = ids[s:e][order]
            hi = np.searchsorted(blo, blo + k, side="right")
            cnt = hi - np.arange(m) - 1
            total = int(cnt.sum())
            if total <= 0:
                continue
            ai = np.repeat(np.arange(m), cnt)
            offs = np.concatenate([[0], np.cumsum(cnt)])
            bj = np.arange(total) - offs[ai] + ai + 1
            ia, ib = ido[ai], ido[bj]
            out_a.append(np.minimum(ia, ib))
            out_b.append(np.maximum(ia, ib))
        if not out_a:
            return pd.DataFrame(
                {"doc_a": np.array([], np.int64), "doc_b": np.array([], np.int64)}
            )
        return pd.DataFrame(
            {"doc_a": np.concatenate(out_a), "doc_b": np.concatenate(out_b)}
        ).drop_duplicates()

    pair_schema = pa.schema(
        [pa.field("doc_a", pa.int64()), pa.field("doc_b", pa.int64())]
    )
    cand = hash_exchange_map_groups(
        hash_exchange_map_groups(
            prefixes, bucket_pairs, key=gkey, out_schema=pair_schema
        ),
        lambda df: df.drop_duplicates(),  # equal pairs share a partition
        key=["doc_a", "doc_b"],
        out_schema=pair_schema,
    ).materialize()  # consumed twice: involved-id scan + attach

    involved = distinct_pair_ids(cand, "doc_a", "doc_b")
    ids_arr = pa.array(involved.astype(np.int64), pa.int64())

    def fill_text(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_in(b[id_col].cast(pa.int64()), value_set=ids_arr))
        i = b.schema.get_field_index(text_col)
        return b.set_column(i, text_col, pc.fill_null(b[text_col], ""))

    sub = (
        ds.select_columns([id_col, text_col])
        .map_batches(fill_text, batch_format="pyarrow")
        .materialize()  # involved texts only; consumed by both attaches
    )
    wa = attach_payload_exchange(
        cand, sub, key="doc_a", id_col=id_col, payload_col=text_col,
        out_col="_ta", pairs_schema=pair_schema, payload_type=pa.string(),
    )
    wab = attach_payload_exchange(
        wa, sub, key="doc_b", id_col=id_col, payload_col=text_col,
        out_col="_tb",
        pairs_schema=pair_schema.append(pa.field("_ta", pa.string())),
        payload_type=pa.string(),
    )

    def verify(b: pa.Table) -> pa.Table:
        ta = [x.encode() for x in b["_ta"].to_pylist()]
        tb = [x.encode() for x in b["_tb"].to_pylist()]
        d = _banded_lev_batch(ta, tb, k)
        ok = d >= 0
        return pa.table(
            {
                "doc_a": b["doc_a"].cast(pa.int64()).filter(pa.array(ok)),
                "doc_b": b["doc_b"].cast(pa.int64()).filter(pa.array(ok)),
                "dist": pa.array(d[ok], pa.int64()),
            }
        )

    return wab.map_batches(verify, batch_format="pyarrow")
