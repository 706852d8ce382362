"""Unit tests for dedup / similarity / analysis / multimodal stages."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from fineweb2_ro_ray.stages.analysis import (
    grouped_counts,
    percentiles_from_counts,
    top_k,
)
from fineweb2_ro_ray.stages.dedup import (
    dedup_exact,
    jaccard_pairs_by_group,
    minhash_lsh_pairs,
    simhash_pairs,
    MinHasher,
    SimHasher,
)
from fineweb2_ro_ray.stages.multimodal import (
    MediaDecoder,
    decode_and_featurize,
    synth_media,
)
from fineweb2_ro_ray.stages.similarity import knn_bruteforce, knn_lsh


def _docs(texts, sources=None):
    n = len(texts)
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": texts,
                "source": sources or ["s0"] * n,
            }
        )
    )


def test_dedup_exact_min_id():
    ds = _docs(["aaa", "bbb", "aaa", "ccc", "bbb", "aaa"])
    out = dedup_exact(ds).to_pandas()
    assert len(out) == 3
    import hashlib

    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    got = dict(zip(out["text_md5"], out["doc_id"]))
    assert got[md5("aaa")] == 0 and got[md5("bbb")] == 1 and got[md5("ccc")] == 3


def test_minhash_identical_and_disjoint():
    base = "ana are mere si pere si struguri in gradina de acasa " * 3
    other = "cu totul alt continut fara nicio legatura cu primul text " * 3
    ds = _docs([base, base, other])
    pairs = minhash_lsh_pairs(ds, threshold=0.7).to_pandas()
    assert len(pairs) == 1
    assert (pairs.iloc[0]["doc_a"], pairs.iloc[0]["doc_b"]) == (0, 1)
    assert pairs.iloc[0]["est_jaccard"] == 1.0


def test_minhash_signature_similarity_monotone():
    mh = MinHasher()
    a = "the quick brown fox jumps over the lazy dog near the river bank today"
    b = a.replace("dog", "cat")
    c = "complet diferit text fara cuvinte comune cu celelalte doua propozitii"
    sim_ab = (mh.signature(a) == mh.signature(b)).mean()
    sim_ac = (mh.signature(a) == mh.signature(c)).mean()
    assert sim_ab > sim_ac


def test_simhash_pairs():
    t = "unu doi trei patru cinci sase sapte opt noua zece"
    ds = _docs([t, t, "cu totul altceva complet diferit aici acum"])
    out = simhash_pairs(ds, max_hamming=3).to_pandas()
    assert len(out) == 1 and out.iloc[0]["hamming"] == 0
    sh = SimHasher()
    assert sh.simhash(t) == sh.simhash(t)
    assert sh.simhash("") == 0


def test_jaccard_pairs_hand_checked():
    ds = _docs(["a b c d", "a b c e", "x y z w"], ["s0", "s0", "s0"])
    out = jaccard_pairs_by_group(ds, threshold=0.5).to_pandas()
    # {a,b,c,d} vs {a,b,c,e}: 3/5 = 0.6 >= 0.5; others 0
    assert len(out) == 1
    assert out.iloc[0]["doc_a"] == 0 and out.iloc[0]["doc_b"] == 1
    assert out.iloc[0]["jaccard"] == 3 / 5


def _convex_percentile(vals: np.ndarray, q: float) -> float:
    """DuckDB quantile_cont reference: (1-g)*a + g*b over sorted order
    statistics (differs from np.percentile's lerp in the last bit on
    some inputs)."""
    v = np.sort(vals.astype(np.float64))
    pos = q / 100.0 * (len(v) - 1)
    lo, hi = int(np.floor(pos)), int(np.ceil(pos))
    g = pos - lo
    return (1.0 - g) * v[lo] + g * v[hi]


def test_percentiles_match_quantile_cont():
    rng = np.random.default_rng(3)
    vals = rng.integers(0, 500, size=997)
    uniq, counts = np.unique(vals, return_counts=True)
    got = percentiles_from_counts(uniq, counts, [50.0, 90.5, 92.0, 99.0])
    for q, v in got.items():
        assert v == _convex_percentile(vals, q), q
        assert abs(v - np.percentile(vals.astype(np.float64), q)) < 1e-9


def test_grouped_counts_matches_pandas():
    df = pd.DataFrame({"k": ["a", "b", "a", "c", "a"], "v": range(5)})
    out = grouped_counts(rd.from_pandas(df), ["k"]).to_pandas().set_index("k")["n"]
    assert out.to_dict() == {"a": 3, "b": 1, "c": 1}


def test_top_k_deterministic_ties():
    df = pd.DataFrame({"doc_id": [5, 1, 3, 2], "n": [9, 9, 9, 1]})
    out = top_k(rd.from_pandas(df), "n", 2, tiebreak="doc_id")
    assert out["doc_id"].tolist() == [1, 3]


def test_knn_bruteforce_exact():
    vecs = np.eye(4, dtype=np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(4), pa.int64()),
            "embedding": pa.array([list(v) for v in vecs]),
        }
    )
    q = np.array([[1.0, 0.1, 0.0, 0.0]])
    out = knn_bruteforce(rd.from_arrow(tbl), q, k=2)
    assert out["vec_id"].tolist() == [0, 1]
    assert out["rank"].tolist() == [1, 2]


def test_knn_lsh_returns_ranked_subset():
    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((100, 16)).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(100), pa.int64()),
            "embedding": pa.array([list(v) for v in vecs]),
        }
    )
    out = knn_lsh(rd.from_arrow(tbl), vecs[:2], k=5, dim=16, n_planes=4)
    assert set(out["query_id"]) <= {0, 1}
    # the query vector itself always lands in its own bucket → rank 1
    r1 = out[out["rank"] == 1]
    assert set(r1["vec_id"]) == {0, 1}


def test_multimodal_stub_raises_without_fake():
    dec = MediaDecoder(fake=False)
    with pytest.raises(NotImplementedError):
        dec._decode(b"xx", "image")


def test_multimodal_fake_pipeline_deterministic():
    ds = rd.from_arrow(synth_media(30))
    out = decode_and_featurize(ds, fake=True).to_pandas().sort_values("media_id")
    out2 = decode_and_featurize(rd.from_arrow(synth_media(30)), fake=True).to_pandas().sort_values("media_id")
    assert (out["checksum"].values == out2["checksum"].values).all()
    assert len(out.iloc[0]["features"]) == 16
    # feature vector sums ~1 (normalized histogram)
    assert abs(float(np.sum(out.iloc[0]["features"])) - 1.0) < 1e-5


def test_tumbling_and_sliding_windows():
    import pandas as pd
    from fineweb2_ro_ray.stages.windows import sliding_counts, tumbling_counts

    ts = pd.to_datetime(
        ["2026-01-01 10:05", "2026-01-01 10:40", "2026-01-01 11:05", "2026-01-01 10:10"]
    )
    t = pa.table({"event_type": ["a", "a", "a", "b"],
                  "ts": pa.array(ts.astype("datetime64[us]"))})
    tum = tumbling_counts(rd.from_arrow(t)).to_pandas()
    got = {(r["event_type"], r["window_start"]): r["n"] for _, r in tum.iterrows()}
    assert got[("a", "2026-01-01 10:00")] == 2
    assert got[("a", "2026-01-01 11:00")] == 1
    assert got[("b", "2026-01-01 10:00")] == 1

    sl = sliding_counts(rd.from_arrow(t)).to_pandas()
    got = {(r["event_type"], r["window_start"]): r["n"] for _, r in sl.iterrows()}
    # window [w, w+60) with w % 30 == 0:
    # 10:05 -> 09:30, 10:00 ; 10:40 -> 10:00, 10:30 ; 11:05 -> 10:30, 11:00
    assert got[("a", "2026-01-01 09:30")] == 1
    assert got[("a", "2026-01-01 10:00")] == 2
    assert got[("a", "2026-01-01 10:30")] == 2
    assert got[("a", "2026-01-01 11:00")] == 1


def test_session_windows():
    import pandas as pd
    from fineweb2_ro_ray.stages.windows import session_windows

    ts = pd.to_datetime([
        "2026-01-01 10:00", "2026-01-01 10:10",  # session 0 (user 1)
        "2026-01-01 11:30",                        # session 1 (gap > 30m)
        "2026-01-01 10:00",                        # user 2, session 0
    ])
    t = pa.table({"user_id": pa.array([1, 1, 1, 2], pa.int64()),
                  "ts": pa.array(ts.astype("datetime64[us]"))})
    out = session_windows(rd.from_arrow(t)).to_pandas().sort_values(["user_id", "session_id"])
    assert out[out.user_id == 1]["session_id"].tolist() == [0, 1]
    assert out[out.user_id == 1]["n_events"].tolist() == [2, 1]
    assert out[out.user_id == 2]["n_events"].tolist() == [1]


def test_asof_join_hand_checked():
    import pandas as pd
    from fineweb2_ro_ray.stages.joins import asof_join

    ev = pa.table({
        "event_id": pa.array([1, 2, 3], pa.int64()),
        "user_id": pa.array([7, 7, 8], pa.int64()),
        "ts": pa.array(pd.to_datetime(["2026-01-05", "2026-01-20", "2026-01-05"]).astype("datetime64[us]")),
    })
    od = pa.table({
        "o_custkey": pa.array([7, 7, 9], pa.int64()),
        "o_orderdate": pa.array(pd.to_datetime(["2026-01-01", "2026-01-10", "2026-01-01"]).astype("datetime64[us]")),
    })
    out = (
        asof_join(rd.from_arrow(ev), rd.from_arrow(od),
                  key="user_id", right_key="o_custkey", left_ts="ts", right_ts="o_orderdate")
        .to_pandas().sort_values("event_id")
    )
    # event 1 -> order 01-01; event 2 -> order 01-10; event 3 (user 8): no match
    assert out["event_id"].tolist() == [1, 2]
    assert out["o_orderdate"].dt.strftime("%Y-%m-%d").tolist() == ["2026-01-01", "2026-01-10"]


def test_minhash_verified_pairs_exact_gate():
    from fineweb2_ro_ray.stages.dedup import char_shingle_jaccard, minhash_verified_pairs

    base = "ana are mere si pere si struguri in gradina de acasa langa rau " * 3
    near = base.replace("mere", "pere")
    far = "cu totul alt continut fara nicio legatura comuna aici acum deloc " * 3
    ds = _docs([base, near, far])
    out = minhash_verified_pairs(ds, candidate_threshold=0.2, verify_threshold=0.5)
    assert len(out) == 1
    a, b = int(out.iloc[0]["doc_a"]), int(out.iloc[0]["doc_b"])
    assert (a, b) == (0, 1)
    # the reported jaccard IS the exact one
    assert out.iloc[0]["jaccard"] == char_shingle_jaccard(base, near)


def test_knn_lsh_recall_vs_bruteforce():
    """Recall@10 of the single-probe LSH path vs exact brute force on
    clustered data (random data has no structure; use planted clusters
    so bucketing is meaningful)."""
    rng = np.random.default_rng(11)
    centers = rng.standard_normal((8, 32)) * 3
    vecs = np.vstack([c + rng.standard_normal((50, 32)) * 0.1 for c in centers]).astype(np.float32)
    tbl = pa.table({"vec_id": pa.array(range(len(vecs)), pa.int64()),
                    "embedding": pa.array([list(v) for v in vecs])})
    ds = rd.from_arrow(tbl)
    q = vecs[:2].astype(np.float64)
    exact = knn_bruteforce(ds, q, k=10)
    approx = knn_lsh(ds, q, k=10, dim=32, n_planes=4)
    recalls = []
    for qi in range(2):
        e = set(exact[exact.query_id == qi]["vec_id"])
        a = set(approx[approx.query_id == qi]["vec_id"])
        recalls.append(len(e & a) / len(e))
    assert min(recalls) >= 0.5, recalls  # tight clusters land in one bucket


def test_jaccard_prefix_filter_matches_bruteforce():
    """The AllPairs prefix-filter candidate generation must find exactly
    the pairs a brute-force all-pairs scan finds (completeness guard for
    the skew-safe rewrite)."""
    rng = np.random.default_rng(5)
    words = [f"w{i}" for i in range(40)]
    texts, n = [], 60
    for _ in range(n):
        k = rng.integers(1, 12)
        texts.append(" ".join(rng.choice(words, size=k)))
    # plant exact + near duplicates
    texts[10] = texts[3]
    texts[20] = texts[7] + " extra"
    df = pd.DataFrame({"doc_id": range(n), "source": "s", "text": texts})

    for thr in (0.3, 0.5, 0.8):
        got = (
            jaccard_pairs_by_group(rd.from_pandas(df), threshold=thr)
            .to_pandas()
            .sort_values(["doc_a", "doc_b"], ignore_index=True)
        )
        exp_rows = []
        sets = [set(t.split(" ")) for t in texts]
        for i in range(n):
            for j in range(i + 1, n):
                inter = len(sets[i] & sets[j])
                union = len(sets[i] | sets[j])
                jac = inter / union if union else 0.0
                if jac >= thr:
                    exp_rows.append((i, j, jac))
        exp = pd.DataFrame(exp_rows, columns=["doc_a", "doc_b", "jaccard"])
        assert len(got) == len(exp), thr
        assert (got["doc_a"].values == exp["doc_a"].values).all()
        assert (got["doc_b"].values == exp["doc_b"].values).all()
        assert np.allclose(got["jaccard"].values, exp["jaccard"].values)


def test_jaccard_skewed_group_bounded():
    """VERDICT r1: a single dominant group must not allocate a dense
    docs x vocab matrix. 20k docs in ONE group completes quickly in
    bounded memory (the old path would build a ~20k x vocab dense
    matrix and 20k^2 pair indices)."""
    rng = np.random.default_rng(6)
    n = 20_000
    words = np.array([f"tok{i}" for i in range(30_000)])
    texts = [" ".join(rng.choice(words, size=8, replace=False)) for _ in range(n)]
    for i in range(0, 50):  # plant some duplicate pairs
        texts[n - 1 - i] = texts[i]
    df = pd.DataFrame({"doc_id": range(n), "source": "only", "text": texts})
    out = jaccard_pairs_by_group(rd.from_pandas(df), threshold=0.5).to_pandas()
    assert len(out) == 50
    assert (out["jaccard"] == 1.0).all()


def test_simhash_chunk_layout_pigeonhole():
    """For any max_hamming, flipping <= max_hamming bits leaves at least
    one chunk byte-identical (the recall guarantee simhash_pairs relies
    on; round 1's fixed 4x16 layout silently broke this above 3)."""
    from fineweb2_ro_ray.stages.dedup import _popcount64, _simhash_chunk_layout

    rng = np.random.default_rng(7)
    for max_h in (1, 3, 8, 15):
        layout = _simhash_chunk_layout(max_h)
        assert sum(w for _, w in layout) == 64
        assert len(layout) == max_h + 1
        for _ in range(200):
            h = rng.integers(0, 2**63, dtype=np.uint64)
            flips = rng.choice(64, size=rng.integers(1, max_h + 1), replace=False)
            h2 = h
            for f in flips:
                h2 = np.uint64(h2) ^ (np.uint64(1) << np.uint64(f))
            assert any(
                (int(h) >> s) & ((1 << w) - 1) == (int(h2) >> s) & ((1 << w) - 1)
                for s, w in layout
            )
    # popcount sanity
    xs = rng.integers(0, 2**63, size=100, dtype=np.uint64)
    assert (_popcount64(xs) == [bin(int(v)).count("1") for v in xs]).all()


def test_simhash_pairs_finds_high_hamming_pair():
    """End-to-end: a near-dup pair at Hamming ~4-8 (beyond the old 4x16
    guarantee) is still found when max_hamming=8."""
    rng = np.random.default_rng(8)
    words = [f"w{i}" for i in range(400)]
    base = " ".join(rng.choice(words, size=120))
    # perturb a few tokens -> a handful of simhash bit flips
    toks = base.split()
    toks[5], toks[50] = "xqz1", "xqz2"
    near = " ".join(toks)
    fill = [" ".join(rng.choice(words, size=30)) for _ in range(20)]
    df = pd.DataFrame(
        {"doc_id": range(22), "text": [base, near] + fill}
    )
    from fineweb2_ro_ray.stages.dedup import SimHasher, simhash_pairs

    sh = SimHasher()
    ham = bin(sh.simhash(base) ^ sh.simhash(near)).count("1")
    out = simhash_pairs(rd.from_pandas(df), max_hamming=8).to_pandas()
    if ham <= 8:
        assert ((out["doc_a"] == 0) & (out["doc_b"] == 1)).any()
        got = out[(out["doc_a"] == 0) & (out["doc_b"] == 1)]["hamming"].iloc[0]
        assert got == ham


def test_embedding_neardup_block_exact_and_lsh_recall():
    """Exact block-pair path must equal a brute-force O(n^2) scan even
    across block boundaries (block_rows smaller than n forces multi-
    block pairs); the LSH path must be a subset with high recall."""
    from fineweb2_ro_ray.stages.similarity import (
        embedding_neardup_lsh,
        embedding_neardup_pairs,
    )

    rng = np.random.default_rng(17)
    n, d = 600, 64
    base = rng.standard_normal((n, d))
    # plant near-duplicate pairs (i, i+300): tiny perturbations
    base[300:] = base[:300] + 0.05 * rng.standard_normal((300, d))
    ids = np.arange(n)
    tbl = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(base.reshape(-1), pa.float64()), d
            ),
        }
    )
    ds = rd.from_arrow(tbl)
    thr = 0.8
    got = (
        embedding_neardup_pairs(ds, threshold=thr, block_rows=128)
        .to_pandas()
        .sort_values(["vec_a", "vec_b"], ignore_index=True)
    )
    mn = base / np.linalg.norm(base, axis=1, keepdims=True)
    sims = mn @ mn.T
    ia, ib = np.nonzero(np.triu(sims >= thr, k=1))
    assert len(got) == len(ia)
    assert (got["vec_a"].values == ia).all() and (got["vec_b"].values == ib).all()

    approx = embedding_neardup_lsh(ds, threshold=thr, n_tables=16).to_pandas()
    exact_set = set(zip(ia.tolist(), ib.tolist()))
    approx_set = set(zip(approx["vec_a"], approx["vec_b"]))
    assert approx_set <= exact_set  # exact verify => precision 1.0
    assert len(approx_set) >= 0.9 * len(exact_set)  # recall bar


def test_asof_join_preserves_dtypes():
    """Regression (VERDICT r1): the union pads sides with nulls and
    pandas upcasts int64+null -> float64 inside the group; the output
    schema must still carry the SOURCE Arrow dtypes."""
    from fineweb2_ro_ray.stages.joins import asof_join

    left = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "user_id": pa.array([7, 7, 8], pa.int64()),
            "ts": pa.array(
                np.array(["2024-01-02", "2024-01-05", "2024-01-02"], "datetime64[us]")
            ),
        }
    )
    right = pa.table(
        {
            "o_custkey": pa.array([7, 7, 8], pa.int64()),
            "o_orderdate": pa.array(
                np.array(["2024-01-01", "2024-01-04", "2024-01-03"], "datetime64[us]")
            ),
            "amount": pa.array([1.5, 2.5, 3.5], pa.float64()),
        }
    )
    out = asof_join(
        rd.from_arrow(left),
        rd.from_arrow(right),
        key="user_id",
        right_key="o_custkey",
        left_ts="ts",
        right_ts="o_orderdate",
    )
    tbl = pa.concat_tables(out.iter_batches(batch_format="pyarrow"))
    assert tbl.schema.field("event_id").type == pa.int64()
    assert tbl.schema.field("o_custkey").type == pa.int64()
    assert pa.types.is_timestamp(tbl.schema.field("o_orderdate").type)
    assert tbl.schema.field("amount").type == pa.float64()
    df = tbl.to_pandas().sort_values("event_id")
    # event 1 @01-02 -> order 01-01; event 2 @01-05 -> 01-04; event 3 @01-02 -> none
    assert df["event_id"].tolist() == [1, 2]
    assert df["amount"].tolist() == [1.5, 2.5]


def test_knn_ivf_recall_vs_bruteforce():
    """IVF with a trained codebook: ranked subset of the exact answer
    with high recall at n_probe=4/16 cells on clustered data."""
    from fineweb2_ro_ray.stages.similarity import knn_bruteforce, knn_ivf

    rng = np.random.default_rng(23)
    centers = rng.standard_normal((8, 32)) * 3
    pts = np.concatenate(
        [c + rng.standard_normal((80, 32)) * 0.3 for c in centers]
    )
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(len(pts)), pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(pts.reshape(-1), pa.float64()), 32
            ),
        }
    )
    ds = rd.from_arrow(tbl)
    q = pts[[5, 200, 400]] + 0.01
    exact = knn_bruteforce(ds, q, k=10)
    approx = knn_ivf(ds, q, k=10, n_centroids=16, n_probe=4, sample_rows=640)
    assert (approx["rank"].values <= 10).all()
    recalls = []
    for qid in range(3):
        e = set(exact[exact["query_id"] == qid]["vec_id"])
        a = set(approx[approx["query_id"] == qid]["vec_id"])
        recalls.append(len(e & a) / len(e))
    assert sum(recalls) / len(recalls) >= 0.8, recalls


def test_grouped_percentiles_topk_rolling():
    """New grouped/window operators vs pandas equivalents."""
    from fineweb2_ro_ray.stages.analysis import (
        grouped_percentiles,
        grouped_top_k,
        rolling_sum_cents,
    )

    rng = np.random.default_rng(31)
    n = 400
    df = pd.DataFrame(
        {
            "lang": rng.choice(["ro", "en", "de"], size=n),
            "doc_id": np.arange(n),
            "n_chars": rng.integers(10, 500, size=n),
        }
    )
    ds = rd.from_pandas(df)

    gp = grouped_percentiles(ds, ["lang"], "n_chars", [50.0]).to_pandas()
    for lang, g in df.groupby("lang"):
        got = gp[(gp["lang"] == lang) & (gp["q"] == 50.0)]["value"].iloc[0]
        assert got == _convex_percentile(g["n_chars"].to_numpy(), 50.0)

    tk = grouped_top_k(ds, ["lang"], "n_chars", 3, tiebreak="doc_id").to_pandas()
    for lang, g in df.groupby("lang"):
        exp = g.sort_values(["n_chars", "doc_id"], ascending=[False, True]).head(3)
        got = tk[tk["lang"] == lang].sort_values(["n_chars", "doc_id"], ascending=[False, True])
        assert got["doc_id"].tolist() == exp["doc_id"].tolist()

    ev = pd.DataFrame(
        {
            "user_id": rng.integers(0, 5, size=60),
            "event_id": np.arange(60),
            "ts": pd.to_datetime("2024-01-01") + pd.to_timedelta(rng.integers(0, 3600, size=60), unit="s"),
            "value": np.round(rng.uniform(0, 50, size=60), 2),
        }
    )
    roll = rolling_sum_cents(
        rd.from_pandas(ev), key="user_id", id_col="event_id", ts_col="ts",
        val_col="value", window=3,
    ).to_pandas().sort_values("event_id")
    exp = ev.assign(cents=np.rint(ev["value"] * 100).astype(np.int64))
    exp = exp.sort_values(["user_id", "ts", "event_id"])
    exp["roll"] = (
        exp.groupby("user_id")["cents"].rolling(3, min_periods=1).sum().reset_index(drop=True).values
    )
    exp = exp.sort_values("event_id")
    assert roll["roll_cents"].tolist() == exp["roll"].astype(int).tolist()


def test_hll_approx_distinct_accuracy_and_stability():
    """HLL sketch: within ~5% of exact at p=12, bit-stable across batch
    sizes (merge is max), works for int and string columns."""
    from fineweb2_ro_ray.stages.sketches import approx_distinct

    rng = np.random.default_rng(41)
    vals = rng.integers(0, 50_000, size=120_000)  # ~45.5k distinct
    exact = len(np.unique(vals))
    df = pd.DataFrame({"user_id": vals})
    est1 = approx_distinct(rd.from_pandas(df), "user_id")["approx_distinct"].iloc[0]
    assert abs(est1 - exact) / exact < 0.05, (est1, exact)
    # stability across block layouts
    est2 = approx_distinct(
        rd.from_pandas(df).repartition(13), "user_id"
    )["approx_distinct"].iloc[0]
    assert est1 == est2
    # strings
    sdf = pd.DataFrame({"k": [f"user-{v}" for v in vals[:30_000]]})
    s_exact = sdf["k"].nunique()
    s_est = approx_distinct(rd.from_pandas(sdf), "k")["approx_distinct"].iloc[0]
    assert abs(s_est - s_exact) / s_exact < 0.05


def test_multimodal_resize_and_frame_sample():
    """Resize reduces payloads to target dims; frame sampler explodes
    each video into n frames (flat-map over binary), passes non-video
    rows through; real-codec paths stay NotImplementedError."""
    from fineweb2_ro_ray.stages.multimodal import (
        FrameSampler,
        MediaResizer,
        sample_frames,
        synth_media,
    )

    t = synth_media(30)
    ds = rd.from_arrow(t)
    resized = ds.map_batches(
        MediaResizer,
        fn_constructor_kwargs={"target_w": 8, "target_h": 8, "fake": True},
        batch_format="pyarrow",
        batch_size=16,
        concurrency=2,
    ).to_pandas()
    assert (resized["width"] == 8).all() and (resized["height"] == 8).all()
    assert resized["payload"].map(len).max() <= 64

    frames = sample_frames(ds, n_frames=4).to_pandas()
    vids = t.to_pandas()
    n_videos = (vids["kind"] == "video").sum()
    assert (frames[frames["frame_idx"] > 0]["media_id"].isin(
        vids[vids["kind"] == "video"]["media_id"]
    )).all()
    assert len(frames) == (len(vids) - n_videos) + 4 * n_videos

    with pytest.raises(Exception):  # ray surfaces the NotImplementedError
        ds.map_batches(MediaResizer, batch_format="pyarrow", concurrency=1).to_pandas()
    with pytest.raises(Exception):
        ds.map_batches(FrameSampler, batch_format="pyarrow", concurrency=1).to_pandas()


def test_correlation_stats_matches_numpy():
    """Histogram-based Pearson/Spearman equals direct computation over
    raw rows (ties included) on random integer data."""
    from fineweb2_ro_ray.stages.analysis import correlation_stats

    rng = np.random.default_rng(47)
    a = rng.integers(0, 30, size=500)  # heavy ties
    b = (a * 3 + rng.integers(0, 20, size=500)).astype(np.int64)
    df = pd.DataFrame({"a": a, "b": b})
    out = correlation_stats(rd.from_pandas(df), "a", "b").iloc[0]

    assert abs(out["pearson"] - np.corrcoef(a, b)[0, 1]) < 1e-12

    def avg_rank(x):
        order = np.argsort(x, kind="mergesort")
        ranks = np.empty(len(x), dtype=np.float64)
        sx = x[order]
        i = 0
        while i < len(x):
            j = i
            while j < len(x) and sx[j] == sx[i]:
                j += 1
            ranks[order[i:j]] = (i + j - 1) / 2 + 1
            i = j
        return ranks

    ra, rb = avg_rank(a), avg_rank(b)
    assert abs(out["spearman"] - np.corrcoef(ra, rb)[0, 1]) < 1e-12
    assert out["n"] == 500


def test_review_regressions_round2():
    """Fixes from the round-2 self-review, pinned."""
    from fineweb2_ro_ray.stages.analysis import (
        grouped_counts,
        grouped_top_k,
        round_half_away,
    )
    from fineweb2_ro_ray.stages.sketches import approx_distinct

    # 1) SQL round() semantics on exact .5 ties (np.rint would give 12)
    assert round_half_away(np.array([12.5])).tolist() == [13]
    assert round_half_away(np.array([-12.5])).tolist() == [-13]
    assert round_half_away(np.array([12.4, 12.6])).tolist() == [12, 13]

    # 2) null group keys survive grouped_counts / grouped_top_k
    df = pd.DataFrame(
        {"lang": ["ro", None, "ro", None, "en"], "doc_id": range(5), "n_chars": [5, 4, 3, 2, 1]}
    )
    gc = grouped_counts(rd.from_pandas(df), ["lang"]).to_pandas()
    assert int(gc[gc["lang"].isna()]["n"].iloc[0]) == 2
    tk = grouped_top_k(rd.from_pandas(df), ["lang"], "n_chars", 1, tiebreak="doc_id").to_pandas()
    assert tk["lang"].isna().sum() == 1  # null partition emits its top row

    # 3) HLL ignores nulls (COUNT DISTINCT semantics) and no NaN warnings
    hdf = pd.DataFrame({"k": pd.array([1, 2, None, 2, None], dtype="Int64")})
    est = approx_distinct(rd.from_pandas(hdf), "k")["approx_distinct"].iloc[0]
    assert abs(est - 2) < 0.5


def test_verify_pairs_exact_null_text():
    """A candidate pair whose doc has null text must still be verified
    (null == empty document), not silently dropped."""
    from fineweb2_ro_ray.stages.dedup import verify_pairs_exact

    docs = pd.DataFrame(
        {"doc_id": [1, 2, 3], "text": ["ana are mere", "ana are mere", None]}
    )
    pairs = rd.from_pandas(pd.DataFrame({"doc_a": [1, 3], "doc_b": [2, 1]}))
    # orient (3,1): verify gate takes pairs as given
    out = verify_pairs_exact(
        pairs, rd.from_pandas(docs), verify_threshold=0.0, num_partitions=8
    ).to_pandas().sort_values(["doc_a", "doc_b"], ignore_index=True)
    assert len(out) == 2  # the null-text pair is present, not dropped
    exact = out[(out["doc_a"] == 1) & (out["doc_b"] == 2)]["jaccard"].iloc[0]
    assert exact == 1.0


def test_round_half_away_matches_duckdb_round():
    """Parity with SQL round() including near-tie doubles in both
    directions (floor(x+0.5) would misround just-below-.5 values; a
    lossy x-floor(x) tie test would misround just-above negatives)."""
    import duckdb

    from fineweb2_ro_ray.stages.analysis import round_half_away

    con = duckdb.connect()
    cases = [0.49999999999999994, -0.49999999999999994, 12.5, -12.5, 0.5, -0.5]
    halves = np.array([k + 0.5 for k in range(-20, 20)])
    cases += list(halves)
    cases += list(np.nextafter(halves, -np.inf)) + list(np.nextafter(halves, np.inf))
    rng = np.random.default_rng(2)
    cases += list(rng.uniform(-1e5, 1e5, 300))
    ours = round_half_away(np.array(cases))
    for c, o in zip(cases, ours):
        d = con.execute("SELECT CAST(round(?) AS BIGINT)", [float(c)]).fetchone()[0]
        assert d == o, (c, o, d)


def test_word_counts_null_text_matches_unnest_semantics():
    """NULL text contributes nothing (string_split(NULL) unnests to
    zero rows); empty text contributes one '' token (both engines)."""
    import duckdb

    from fineweb2_ro_ray.stages.analysis import word_counts

    df = pd.DataFrame({"text": ["a b", None, "", "a"]})
    got = word_counts(rd.from_pandas(df)).to_pandas().set_index("word")["n"].to_dict()
    con = duckdb.connect()
    con.register("documents", df)
    exp = dict(
        con.execute(
            "SELECT word, count(*) FROM (SELECT unnest(string_split(text,' ')) word FROM documents) GROUP BY word"
        ).fetchall()
    )
    assert got == exp == {"a": 2, "b": 1, "": 1}


def test_range_join_one_to_many_and_bounds():
    """Interval join: inclusive start, exclusive end, one left row can
    match many intervals, dtypes preserved through the union."""
    from fineweb2_ro_ray.stages.joins import range_join

    left = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4],
            "user_id": [7, 7, 7, 8],
            "ts": pd.to_datetime(
                ["2024-01-10", "2024-01-01", "2024-01-31", "2024-01-05"]
            ),
        }
    )
    right = pd.DataFrame(
        {
            "o_key": [7, 7, 8],
            "start": pd.to_datetime(["2024-01-01", "2024-01-05", "2024-02-01"]),
        }
    )
    right["end"] = right["start"] + pd.Timedelta(days=30)
    out = range_join(
        rd.from_pandas(left),
        rd.from_pandas(right),
        key="user_id",
        right_key="o_key",
        left_ts="ts",
        right_start="start",
        right_end="end",
    ).to_pandas()
    got = sorted(zip(out["event_id"], out["start"].dt.strftime("%m-%d")))
    # event 1 @01-10: both user-7 windows; event 2 @01-01: [01-01,..) only
    # (inclusive start); event 3 @01-31: 01-01+30d = exclusive end -> only
    # the 01-05 window; event 4: user 8's window starts 02-01 -> no match
    assert got == [(1, "01-01"), (1, "01-05"), (2, "01-01"), (3, "01-05")]
    assert out["event_id"].dtype == np.int64  # no float upcast leak


def test_dedup_keep_best_and_hash_sampling():
    from fineweb2_ro_ray.stages.dedup import dedup_keep_best, sample_fraction_by_hash

    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "n_chars": [10, 30, 30, 5, 99],
            "text": ["same", "same", "same", "other", "third"],
        }
    )
    out = dedup_keep_best(rd.from_pandas(df)).to_pandas().sort_values("doc_id")
    # 'same': max n_chars=30 tie between ids 2,3 -> smallest id 2
    assert sorted(out["doc_id"]) == [2, 4, 5]

    big = pd.DataFrame({"doc_id": range(5000), "lang": "ro"})
    got = sample_fraction_by_hash(rd.from_pandas(big), "doc_id", 10).to_pandas()
    assert 0.07 < len(got) / 5000 < 0.13  # ~10%, deterministic
    got2 = sample_fraction_by_hash(rd.from_pandas(big).repartition(7), "doc_id", 10).to_pandas()
    assert sorted(got["doc_id"]) == sorted(got2["doc_id"])  # layout-stable
    assert len(sample_fraction_by_hash(rd.from_pandas(big), "doc_id", 0).to_pandas()) == 0
    assert len(sample_fraction_by_hash(rd.from_pandas(big), "doc_id", 100).to_pandas()) == 5000


def test_third_review_regressions():
    """Fixes from the third self-review pass, pinned."""
    from fineweb2_ro_ray.stages.dedup import (
        add_md5,
        dedup_exact,
        dedup_keep_best,
        sample_fraction_by_hash,
    )

    # md5(NULL) is NULL: null-text and empty-text are SEPARATE groups
    t = pa.table({"doc_id": [1, 2, 3], "text": [None, "", None]})
    md5s = add_md5(t)["text_md5"].to_pylist()
    assert md5s[0] is None and md5s[2] is None and md5s[1] is not None
    df = pd.DataFrame(
        {"doc_id": [1, 2, 3, 4], "n_chars": [0, 0, 5, 7],
         "text": [None, "", "x", None]}
    )
    de = dedup_exact(rd.from_pandas(df)).to_pandas()
    assert len(de) == 3  # null group, '' group, 'x' group
    assert de[de["text_md5"].isna()]["doc_id"].iloc[0] == 1  # min id of nulls
    kb = dedup_keep_best(rd.from_pandas(df)).to_pandas()
    assert len(kb) == 3
    assert kb[kb["text_md5"].isna()]["doc_id"].iloc[0] == 4  # best score null

    # null sampling key excluded, not crashed
    sdf = pd.DataFrame({"doc_id": pd.array([1, 2, None, 4], dtype="Int64"),
                        "lang": "ro"})
    out = sample_fraction_by_hash(rd.from_pandas(sdf), "doc_id", 100).to_pandas()
    assert sorted(out["doc_id"].dropna()) == [1, 2, 4] and len(out) == 3


def test_publish_dataset_replace_and_empty(tmp_path):
    """Re-publish REPLACES (no stale shards / double counts); an empty
    dataset publishes an empty-but-valid repo."""
    from fineweb2_ro_ray.sources.io import publish_dataset

    repo = str(tmp_path / "repo")
    ds = rd.from_items([{"doc_id": i} for i in range(100)])
    m1 = publish_dataset(ds, repo)
    m2 = publish_dataset(ds, repo)  # re-publish: same totals, no append
    assert m1["total_rows"] == m2["total_rows"] == 100
    assert rd.read_parquet(str(tmp_path / "repo" / "data")).count() == 100

    empty = ds.filter(lambda r: False)
    m3 = publish_dataset(empty, str(tmp_path / "empty"))
    assert m3["total_rows"] == 0 and m3["files"] == []


def test_advice_round2_regressions():
    """Round-2 ADVICE findings, pinned.

    1) sample_fraction_by_hash on an ALL-null key batch (empty
       dictionary) filters to empty instead of IndexError.
    2) round_half_away leaves even integers in [2^52, 2^53) alone
       (fl+0.5 is unrepresentable there; the tie test must exclude
       integral inputs).
    3) verify_pairs_exact keeps int64 ids above 2^53 exact (Arrow-side
       side split; a whole-bucket pandas conversion would collapse
       them via float64).
    4) doc_stats propagates NULL text -> NULL stats (SQL
       len(string_split(NULL,' ')) IS NULL).
    """
    from fineweb2_ro_ray.stages.analysis import doc_stats, round_half_away
    from fineweb2_ro_ray.stages.dedup import sample_fraction_by_hash, verify_pairs_exact

    # 1) all-null key batch
    sdf = pd.DataFrame({"doc_id": pd.array([None, None, None], dtype="Int64")})
    out = sample_fraction_by_hash(rd.from_pandas(sdf), "doc_id", 100).to_pandas()
    assert len(out) == 0

    # 2) huge even integers are not ties
    big = float(2**52)
    got = round_half_away(np.array([big, big + 2.0, -big]))
    assert got.tolist() == [2**52, 2**52 + 2, -(2**52)]
    # and true ties at normal magnitudes still round away
    assert round_half_away(np.array([0.5, -0.5, 2.5])).tolist() == [1, -1, 3]

    # 3) ids above 2^53: adjacent int64 ids that float64 would merge
    base = (1 << 53) + 2  # 2^53+1 unrepresentable; +2 is
    ids = [base, base + 2, base + 4]
    docs = pd.DataFrame({"doc_id": pd.array(ids, dtype="Int64"),
                         "text": ["hello world", "hello world", "different"]})
    pairs = rd.from_arrow(pa.table({
        "doc_a": pa.array([ids[0], ids[0]], pa.int64()),
        "doc_b": pa.array([ids[1], ids[2]], pa.int64()),
    }))
    v = verify_pairs_exact(pairs, rd.from_pandas(docs), verify_threshold=0.9).to_pandas()
    assert v["doc_a"].tolist() == [ids[0]] and v["doc_b"].tolist() == [ids[1]]
    assert v["doc_a"].dtype == np.int64 and v["doc_b"].dtype == np.int64

    # 4) null text -> null stats
    t = pa.table({"text": ["a b", None, ""]})
    st = doc_stats(t)
    assert st["n_space_words"].to_pylist() == [2, None, 1]
    assert st["n_tokens"].to_pylist() == [2, None, 0]
    assert st["n_lines"].to_pylist() == [1, None, 1]


def test_jaccard_distributed_matches_per_group():
    """The prefix-token-partitioned AllPairs (large-group scale path)
    returns EXACTLY the per-group single-task result — same candidates
    survive the exact verify regardless of prefix tiebreak order."""
    from fineweb2_ro_ray.stages.dedup import (
        jaccard_pairs_by_group,
        jaccard_pairs_distributed,
        jaccard_pairs_skew_safe,
    )

    rng = np.random.default_rng(42)
    words = [f"w{i}" for i in range(60)]
    rows = []
    for i in range(250):
        n = int(rng.integers(3, 12))
        toks = list(rng.choice(words, size=n, replace=True))
        rows.append({"doc_id": i, "source": f"s{int(rng.integers(0, 2))}",
                     "text": " ".join(toks)})
    # inject guaranteed near-dup pairs (same group)
    rows.append({"doc_id": 900, "source": "s0", "text": "a b c d e f"})
    rows.append({"doc_id": 901, "source": "s0", "text": "a b c d e g"})
    rows.append({"doc_id": 902, "source": "s1", "text": None})  # null text
    df = pd.DataFrame(rows)
    ds = rd.from_pandas(df)

    ref = (jaccard_pairs_by_group(ds, threshold=0.5).to_pandas()
           .sort_values(["doc_a", "doc_b"], ignore_index=True))
    got = (jaccard_pairs_distributed(ds, threshold=0.5).to_pandas()
           .sort_values(["doc_a", "doc_b"], ignore_index=True))
    pd.testing.assert_frame_equal(ref, got, check_dtype=False)
    assert ((ref["doc_a"] == 900) & (ref["doc_b"] == 901)).any()

    # the dispatcher with a tiny cutoff routes everything distributed
    got2 = (jaccard_pairs_skew_safe(ds, threshold=0.5, large_group_cutoff=10)
            .to_pandas().sort_values(["doc_a", "doc_b"], ignore_index=True))
    pd.testing.assert_frame_equal(ref, got2, check_dtype=False)


def test_joins_string_keys_and_vectorized_range():
    """Round-2 judge items: asof/range joins accept STRING equality
    keys (key partitioning via vectorized hash, not int64 casts), and
    the across-keys vectorized range join matches a brute-force
    nested-loop reference."""
    from fineweb2_ro_ray.stages.joins import asof_join, range_join

    rng = np.random.default_rng(7)
    keys = [f"conv-{i}" for i in range(12)]
    l = pd.DataFrame({
        "k": rng.choice(keys, 300),
        "lts": rng.integers(0, 1000, 300).astype(np.int64),
        "lv": np.arange(300, dtype=np.int64),
    })
    starts = rng.integers(0, 900, 80).astype(np.int64)
    r = pd.DataFrame({
        "rk": rng.choice(keys, 80),
        "rstart": starts,
        "rend": starts + rng.integers(1, 200, 80).astype(np.int64),
        "rv": np.arange(80, dtype=np.int64),
    })
    got = (range_join(rd.from_pandas(l), rd.from_pandas(r), key="k",
                      right_key="rk", left_ts="lts", right_start="rstart",
                      right_end="rend")
           .to_pandas().sort_values(["lv", "rv"], ignore_index=True))
    # brute force
    rows = []
    for _, lr in l.iterrows():
        for _, rr in r.iterrows():
            if lr["k"] == rr["rk"] and rr["rstart"] <= lr["lts"] < rr["rend"]:
                rows.append({**lr.to_dict(), **rr.to_dict()})
    ref = pd.DataFrame(rows, columns=list(l.columns) + list(r.columns))
    ref = ref.sort_values(["lv", "rv"], ignore_index=True)
    pd.testing.assert_frame_equal(ref, got, check_dtype=False)
    assert len(ref) > 0

    # asof with string keys: greatest rstart <= lts per key
    got_a = (asof_join(rd.from_pandas(l), rd.from_pandas(r), key="k",
                       right_key="rk", left_ts="lts", right_ts="rstart")
             .to_pandas().sort_values("lv", ignore_index=True))
    ref_rows = []
    for _, lr in l.iterrows():
        cand = r[(r["rk"] == lr["k"]) & (r["rstart"] <= lr["lts"])]
        if len(cand):
            best = cand.sort_values(["rstart", "rv"]).iloc[-1]
            ref_rows.append({**lr.to_dict(), **best.to_dict()})
    ref_a = pd.DataFrame(ref_rows).sort_values("lv", ignore_index=True)
    assert len(got_a) == len(ref_a)
    pd.testing.assert_frame_equal(
        ref_a[["lv", "rstart"]], got_a[["lv", "rstart"]], check_dtype=False
    )


def test_lsh_broadcast_equals_distributed_paths():
    """The bounded broadcast fast path and the fully distributed keyed
    attach produce IDENTICAL results for both LSH near-dup operators
    (broadcast-vs-shuffle selection must never change answers)."""
    from fineweb2_ro_ray.stages.dedup import minhash_lsh_pairs
    from fineweb2_ro_ray.stages.similarity import embedding_neardup_lsh

    rng = np.random.default_rng(11)
    base = "ana are mere si pere multe in cosul cel mare de nuiele"
    texts, ids = [], []
    for i in range(120):
        t = base + f" varianta {i % 7}"
        if i % 3 == 0:
            t += " plus un sufix diferit " + str(rng.integers(0, 3))
        texts.append(t)
        ids.append(i)
    ds = rd.from_arrow(pa.table({"doc_id": ids, "text": texts}))
    a = (minhash_lsh_pairs(ds, threshold=0.5).to_pandas()
         .sort_values(["doc_a", "doc_b"], ignore_index=True))
    b = (minhash_lsh_pairs(ds, threshold=0.5, broadcast_involved_limit=0)
         .to_pandas().sort_values(["doc_a", "doc_b"], ignore_index=True))
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0

    emb = rng.standard_normal((80, 16))
    emb[40:] = emb[:40] + 0.01 * rng.standard_normal((40, 16))  # near-dups
    vt = pa.table({
        "vec_id": pa.array(range(80), pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in emb],
                              pa.list_(pa.float64())),
    })
    vds = rd.from_arrow(vt)
    ea = (embedding_neardup_lsh(vds, threshold=0.9).to_pandas()
          .sort_values(["vec_a", "vec_b"], ignore_index=True))
    eb = (embedding_neardup_lsh(vds, threshold=0.9, broadcast_involved_limit=0)
          .to_pandas().sort_values(["vec_a", "vec_b"], ignore_index=True))
    pd.testing.assert_frame_equal(ea, eb)
    assert len(ea) > 0


def test_review_round3_regressions():
    """Round-3 self-review findings, pinned.

    1) asof/range joins: equal logical keys match across physical
       representations — int32 left vs int64 right, and a left batch
       containing a NULL key (whose pandas form upcasts to float64)
       must not scatter the other keys; NULL keys never match.
    2) fit_softmax_head survives batches whose labels are all unknown.
    """
    from fineweb2_ro_ray.stages.joins import range_join

    l = pd.DataFrame({
        "k": pd.array([1, 2, None, 3], dtype="Int32"),
        "lts": np.array([5, 5, 5, 5], dtype=np.int64),
        "lv": np.arange(4, dtype=np.int64),
    })
    r = pd.DataFrame({
        "rk": np.array([1, 2, 3], dtype=np.int64),
        "rstart": np.array([0, 0, 0], dtype=np.int64),
        "rend": np.array([10, 10, 10], dtype=np.int64),
        "rv": np.arange(3, dtype=np.int64),
    })
    got = (range_join(rd.from_pandas(l), rd.from_pandas(r), key="k",
                      right_key="rk", left_ts="lts", right_start="rstart",
                      right_end="rend").to_pandas()
           .sort_values("lv", ignore_index=True))
    # all three non-null keys match; the null-key row is dropped
    assert got["lv"].tolist() == [0, 1, 3]

    from fineweb2_ro_ray.stages.model_scoring import TASKS
    from fineweb2_ro_ray.training import fit_softmax_head

    df = pd.DataFrame({
        "text": ["a b c"] * 4 + ["d e f"] * 4,
        "topic_label": [None] * 4 + [TASKS["topic"][0]] * 4,
    })
    # batches of 4: the first is entirely unknown-label
    W = fit_softmax_head(
        rd.from_pandas(df).repartition(2), TASKS["topic"],
        label_col="topic_label", n_iter=3,
    )
    assert np.isfinite(W).all()


def test_reassemble_precombine_null_ts_parity():
    """first_ts/last_ts skip NULL timestamps exactly like the plain
    path (pandas groupby.first semantics), including a conversation
    whose FIRST turn has a null ts and one whose every ts is null."""
    import ray.data as rdx

    from fineweb2_ro_ray.pipelines.quality_filter import reassemble

    ts = pa.array(
        pd.to_datetime([None, "2025-01-02", "2025-01-03",
                        None, None, "2025-01-05", None]),
        pa.timestamp("us"),
    )
    t = pa.table({
        "conv_id": ["c1", "c1", "c1", "c2", "c2", "c3", "c3"],
        "turn_idx": pa.array([0, 1, 2, 0, 1, 0, 1], pa.int32()),
        "ts": ts,
        "keep": [False, True, True, False, False, True, False],
        "scrubbed_text": ["x", "hello", "world", "y", "z", "ok", "no"],
    })
    ds = rdx.from_arrow(t)
    a = (reassemble(ds, precombine=False).to_pandas()
         .sort_values("conv_id", ignore_index=True))
    b = (reassemble(ds, precombine=True).to_pandas()
         .sort_values("conv_id", ignore_index=True))
    pd.testing.assert_frame_equal(a, b)
    assert str(b.loc[0, "first_ts"])[:10] == "2025-01-02"  # null ts skipped
    assert pd.isna(b.loc[1, "first_ts"])  # all-null conv -> NaT
    # three-way: the pandas combined reduce must also match
    c = (reassemble(ds, precombine=True, reduce_impl="pandas").to_pandas()
         .sort_values("conv_id", ignore_index=True))
    pd.testing.assert_frame_equal(a, c)


def test_reassemble_arrow_reduce_matches_pandas_randomized():
    """Kernel-level parity of the Arrow-native combined reduce vs the
    pandas one on randomized partitions: multi-batch precombine partials
    per conversation, null timestamps, all-dropped and all-kept convs,
    unsorted arrival order."""
    from fineweb2_ro_ray.pipelines.quality_filter import (
        _precombine_dropped,
        _reassemble_partition_combined,
        _reassemble_partition_combined_arrow,
    )

    rng = np.random.default_rng(31)
    for trial in range(8):
        rows = []
        for c in range(rng.integers(1, 12)):
            n = int(rng.integers(1, 9))
            for ti in range(n):
                rows.append(
                    {
                        "conv_id": f"c{c:02d}",
                        "turn_idx": ti,
                        "ts": None
                        if rng.random() < 0.3
                        else pd.Timestamp("2025-01-01")
                        + pd.Timedelta(minutes=int(rng.integers(0, 5000))),
                        "keep": bool(rng.random() < 0.55),
                        "scrubbed_text": f"t{c}-{ti}",
                    }
                )
        rng.shuffle(rows)
        df = pd.DataFrame(rows)
        t = pa.Table.from_pandas(df, preserve_index=False).set_column(
            1, "turn_idx", pa.array(df["turn_idx"], pa.int32())
        )
        # several precombine batches, concatenated = one exchange partition
        nb = int(rng.integers(1, 4))
        cuts = np.linspace(0, t.num_rows, nb + 1).astype(int)
        parts = [
            _precombine_dropped(t.slice(cuts[i], cuts[i + 1] - cuts[i]))
            for i in range(nb)
            if cuts[i + 1] > cuts[i]
        ]
        part_t = pa.concat_tables(parts).combine_chunks()
        want = (
            _reassemble_partition_combined(part_t.to_pandas())
            .sort_values("conv_id", ignore_index=True)
        )
        got = (
            _reassemble_partition_combined_arrow(part_t)
            .to_pandas()
            .sort_values("conv_id", ignore_index=True)
        )
        pd.testing.assert_frame_equal(
            got.astype(want.dtypes.to_dict()), want, check_dtype=False
        )


def test_decontamination_flags_and_filter():
    """Contamination = eval phrase appears as a SUBSTRING; null text is
    clean; regex metacharacters in phrases are literals; the filter
    variant drops exactly the flagged docs."""
    from fineweb2_ro_ray.stages.decontaminate import (
        contamination_flags,
        decontaminate,
        eval_phrases_from_docs,
    )

    docs = pd.DataFrame({
        "doc_id": [0, 1, 2, 3, 4],
        "text": [
            "alpha beta gamma delta eps zeta eta theta tail",  # eval doc (0%97==0)
            "prefix alpha beta gamma delta eps zeta eta theta suffix",  # contains
            "unrelated words only here",
            None,
            "alpha beta gamma delta eps zeta eta NOPE",  # partial, no match
        ],
    })
    ds = rd.from_pandas(docs)
    phrases = eval_phrases_from_docs(ds)
    assert phrases == ["alpha beta gamma delta eps zeta eta theta"]
    out = (contamination_flags(ds, phrases).to_pandas()
           .sort_values("doc_id", ignore_index=True))
    assert out["contaminated"].tolist() == [1, 1, 0, 0, 0]
    kept = decontaminate(ds, phrases).to_pandas()
    assert sorted(kept["doc_id"]) == [2, 3, 4]

    # regex metacharacters stay literal
    ds2 = rd.from_pandas(pd.DataFrame({
        "doc_id": [10, 11],
        "text": ["price (a+b)*c here", "price a+b c here"],
    }))
    out2 = (contamination_flags(ds2, ["(a+b)*c"]).to_pandas()
            .sort_values("doc_id", ignore_index=True))
    assert out2["contaminated"].tolist() == [1, 0]

    # empty eval set: nothing contaminated
    out3 = contamination_flags(ds, []).to_pandas()
    assert out3["contaminated"].sum() == 0


def test_connected_components_and_cluster_ops():
    """Label propagation finds exact components on hand-built graphs:
    a chain (worst-case diameter), a clique, singleton-free semantics,
    plus cluster sizes and keep-min dedup."""
    from fineweb2_ro_ray.stages.components import (
        cluster_sizes,
        connected_components,
        dedup_by_components,
    )

    # chain 1-2-3-4-5, clique {10,11,12}, pair {20,21}
    pairs = pd.DataFrame({
        "doc_a": [1, 2, 3, 4, 10, 10, 11, 20],
        "doc_b": [2, 3, 4, 5, 11, 12, 12, 21],
    })
    comp = (connected_components(rd.from_pandas(pairs)).to_pandas()
            .sort_values("doc_id", ignore_index=True))
    expect = {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}
    assert dict(zip(comp["doc_id"], comp["component"])) == expect
    # distributed label-propagation path (driver_edge_limit=0) agrees —
    # the chain exercises multi-round propagation
    comp_d = (connected_components(rd.from_pandas(pairs), driver_edge_limit=0)
              .to_pandas().sort_values("doc_id", ignore_index=True))
    assert dict(zip(comp_d["doc_id"], comp_d["component"])) == expect
    sizes = cluster_sizes(rd.from_pandas(comp)).to_pandas()
    assert dict(zip(sizes["component"], sizes["cluster_size"])) == {1: 5, 10: 3, 20: 2}
    keep = dedup_by_components(rd.from_pandas(comp)).to_pandas()
    assert sorted(keep["doc_id"]) == [1, 10, 20]


def test_bloom_semi_join_bounded_driver():
    """The fixed-memory Bloom involved-id path (ROADMAP known-limit 3):
    membership has NO false negatives, the FP rate stays within the
    design bound, and verify_pairs_exact produces identical output
    whether the involved ids are pulled exactly or Bloom-filtered
    (involved_limit=0 forces the overflow path)."""
    from fineweb2_ro_ray.stages.bloom import bloom_contains, build_id_bloom
    from fineweb2_ro_ray.stages.dedup import verify_pairs_exact

    rng = np.random.default_rng(17)
    ids = np.unique(rng.integers(0, 2**62, size=5000, dtype=np.int64))
    pairs_tbl = pa.table(
        {
            "doc_a": pa.array(ids[: len(ids) // 2], pa.int64()),
            "doc_b": pa.array(ids[len(ids) // 2 : 2 * (len(ids) // 2)], pa.int64()),
        }
    )
    bm = build_id_bloom(rd.from_arrow(pairs_tbl), ["doc_a", "doc_b"], m_bits=1 << 20)
    inserted = np.concatenate(
        [ids[: len(ids) // 2], ids[len(ids) // 2 : 2 * (len(ids) // 2)]]
    )
    assert bloom_contains(bm, inserted).all()  # no false negatives, ever
    probe = rng.integers(0, 2**62, size=20000, dtype=np.int64)
    probe = probe[~np.isin(probe, inserted)]
    # load ≈ 5000·4/2^20 ≈ 1.9% → FP ≈ load^4 ≈ 1e-7; 1% is generous
    assert bloom_contains(bm, probe).mean() < 0.01

    texts = ["ana are mere si pere " * 4 + str(i % 3) for i in range(30)]
    docs = rd.from_arrow(
        pa.table(
            {"doc_id": pa.array(range(30), pa.int64()), "text": pa.array(texts)}
        )
    )
    cand = rd.from_arrow(
        pa.table(
            {
                "doc_a": pa.array([0, 1, 2, 3], pa.int64()),
                "doc_b": pa.array([3, 4, 5, 6], pa.int64()),
            }
        )
    )
    a = (verify_pairs_exact(cand, docs, verify_threshold=0.5).to_pandas()
         .sort_values(["doc_a", "doc_b"], ignore_index=True))
    b = (verify_pairs_exact(cand, docs, verify_threshold=0.5, involved_limit=0)
         .to_pandas().sort_values(["doc_a", "doc_b"], ignore_index=True))
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0


def test_hash_exchange_multi_key_pyarrow_matches_groupby():
    """The generalized exchange (multi-column key, Arrow reduce path)
    computes the same grouped result as a pandas groupby: every
    (k1, k2) key's rows land in exactly one reduce partition, whatever
    the key dtypes (string + int, with nulls and a uint64 column above
    2^63 exercising the unsigned canonical hash)."""
    from fineweb2_ro_ray.stages.exchange import hash_exchange_map_groups

    rng = np.random.default_rng(11)
    n = 5000
    t = pa.table(
        {
            "k1": pa.array(
                [None if i % 97 == 0 else f"s{i % 37}" for i in range(n)]
            ),
            "k2": pa.array((rng.integers(0, 23, n)).astype(np.int64)),
            "ku": pa.array(
                (rng.integers(0, 5, n).astype(np.uint64) + np.uint64(1 << 63))
            ),
            "v": pa.array(rng.integers(0, 1000, n).astype(np.int64)),
        }
    )

    def per_part(tt: pa.Table) -> pa.Table:
        df = tt.to_pandas().fillna({"k1": "<null>"})
        g = (
            df.groupby(["k1", "k2", "ku"], as_index=False)["v"]
            .sum()
            .rename(columns={"v": "v_sum"})
        )
        return pa.table(
            {
                "k1": pa.array(g["k1"].astype(str)),
                "k2": pa.array(g["k2"].to_numpy(np.int64)),
                "ku": pa.array(g["ku"].to_numpy(np.uint64)),
                "v_sum": pa.array(g["v_sum"].to_numpy(np.int64)),
            }
        )

    out = hash_exchange_map_groups(
        rd.from_arrow(t),
        per_part,
        key=["k1", "k2", "ku"],
        n_reducers=13,
        batch_format="pyarrow",
    ).to_pandas()
    ref = (
        t.to_pandas()
        .fillna({"k1": "<null>"})
        .groupby(["k1", "k2", "ku"], as_index=False)["v"]
        .sum()
        .rename(columns={"v": "v_sum"})
    )
    out = out.sort_values(["k1", "k2", "ku"], ignore_index=True)
    ref = ref.sort_values(["k1", "k2", "ku"], ignore_index=True)
    # if any key were split across partitions, per-partition sums would
    # produce duplicate key rows and this exact-frame compare would fail
    pd.testing.assert_frame_equal(out, ref.astype(out.dtypes.to_dict()))


def test_hash_exchange_single_int_key_routes_complete_groups():
    """A single NON-string key takes the canonical-hash route (not the
    crc32 string path); each key must still be partition-complete."""
    from fineweb2_ro_ray.stages.exchange import hash_exchange_map_groups

    t = pa.table(
        {
            "k": pa.array(np.repeat(np.arange(40, dtype=np.int64), 25)),
            "v": pa.array(np.arange(1000, dtype=np.int64)),
        }
    )

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("k", as_index=False)["v"].count().rename(columns={"v": "n"})

    out = (
        hash_exchange_map_groups(rd.from_arrow(t), per_part, key="k", n_reducers=7)
        .to_pandas()
        .sort_values("k", ignore_index=True)
    )
    assert (out["n"] == 25).all() and len(out) == 40


def test_hash_exchange_key_named_part_and_part_payload_column():
    """The exchange must not collide with user columns named "part" —
    the bucketed joins key their exchange on a column literally named
    "part" (pyarrow drop_columns raises on duplicate names; regression:
    r3 asof/range joins failed with KeyError('part'))."""
    from fineweb2_ro_ray.stages.exchange import hash_exchange_map_groups

    t = pa.table(
        {
            "part": pa.array(np.repeat(np.arange(10, dtype=np.int32), 8)),
            "v": pa.array(np.arange(80, dtype=np.int64)),
        }
    )

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("part", as_index=False)["v"].sum().rename(columns={"v": "s"})

    out = (
        hash_exchange_map_groups(rd.from_arrow(t), per_part, key="part", n_reducers=5)
        .to_pandas()
        .sort_values("part", ignore_index=True)
    )
    exp = t.to_pandas().groupby("part", as_index=False)["v"].sum()
    assert (out["s"].to_numpy() == exp["v"].to_numpy()).all() and len(out) == 10

    # string key + unrelated existing "part" payload column (crc32 route)
    t2 = pa.table(
        {
            "k": pa.array([f"u{i % 6}" for i in range(60)]),
            "part": pa.array(np.arange(60, dtype=np.int32)),
        }
    )

    def per_part2(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("k", as_index=False)["part"].sum().rename(columns={"part": "s"})

    out2 = (
        hash_exchange_map_groups(rd.from_arrow(t2), per_part2, key="k", n_reducers=5)
        .to_pandas()
        .sort_values("k", ignore_index=True)
    )
    exp2 = t2.to_pandas().groupby("k", as_index=False)["part"].sum()
    assert (out2["s"].to_numpy() == exp2["part"].to_numpy()).all() and len(out2) == 6


def test_hash_exchange_streams_lazy_upstream_and_empty_input():
    """The exchange's map side consumes the upstream STREAM (no
    materialize-the-input barrier): a lazy map_batches chain feeds the
    split tasks directly and the grouped result is still exact. An
    empty input with a pinned out_schema yields a schema-identical
    empty dataset (the reduce fn never runs)."""
    import pyarrow.compute as pc

    from fineweb2_ro_ray.stages.exchange import hash_exchange_map_groups

    n = 4000
    t = pa.table(
        {
            "k": pa.array((np.arange(n) % 31).astype(np.int64)),
            "v": pa.array(np.arange(n, dtype=np.int64)),
        }
    )
    lazy = rd.from_arrow(t).map_batches(
        lambda b: b.append_column("v2", pc.multiply(b["v"], pa.scalar(2, pa.int64()))),
        batch_format="pyarrow",
    )

    def per_part(tt: pa.Table) -> pa.Table:
        df = tt.to_pandas().groupby("k", as_index=False)["v2"].sum()
        return pa.table(
            {
                "k": pa.array(df["k"].to_numpy(np.int64)),
                "v2_sum": pa.array(df["v2"].to_numpy(np.int64)),
            }
        )

    out = (
        hash_exchange_map_groups(
            lazy, per_part, key="k", n_reducers=9, batch_format="pyarrow"
        )
        .to_pandas()
        .sort_values("k", ignore_index=True)
    )
    exp = (
        t.to_pandas()
        .assign(v2=lambda d: d["v"] * 2)
        .groupby("k", as_index=False)["v2"]
        .sum()
        .rename(columns={"v2": "v2_sum"})
    )
    pd.testing.assert_frame_equal(out, exp)

    out_schema = pa.schema([("k", pa.int64()), ("v2_sum", pa.int64())])
    empty = rd.from_arrow(t.slice(0, 0)).filter(lambda r: False)
    got = hash_exchange_map_groups(
        empty, per_part, key="k", n_reducers=9,
        batch_format="pyarrow", out_schema=out_schema,
    )
    assert got.count() == 0
    assert set(got.schema().names) == {"k", "v2_sum"}


# ---------------------------------------------------------------------------
# round-3 widening: reshape (explode/unpivot), set ops, ntile, grouped mode
# ---------------------------------------------------------------------------


def test_explode_list_positions_and_null_lists():
    from fineweb2_ro_ray.stages.reshape import explode_list

    tbl = pa.table(
        {
            "id": pa.array([10, 11, 12, 13], pa.int64()),
            "xs": pa.array([[1.0, 2.0], None, [], [5.0]], pa.list_(pa.float32())),
        }
    )
    out = (
        explode_list(rd.from_arrow(tbl), list_col="xs", id_cols=["id"])
        .to_pandas()
        .sort_values(["id", "pos"])
    )
    # NULL and empty lists emit no rows (SQL UNNEST); positions 1-based
    assert out["id"].tolist() == [10, 10, 13]
    assert out["pos"].tolist() == [1, 2, 1]
    assert out["val"].tolist() == [1.0, 2.0, 5.0]


def test_unpivot_melts_wide_to_long():
    from fineweb2_ro_ray.stages.reshape import unpivot

    df = pd.DataFrame({"k": [1, 2], "a": [10.0, 20.0], "b": [0.5, 0.25]})
    out = (
        unpivot(rd.from_pandas(df), id_cols=["k"], value_cols=["a", "b"])
        .to_pandas()
        .sort_values(["k", "measure"])
    )
    assert out["measure"].tolist() == ["a", "b", "a", "b"]
    assert out["value"].tolist() == [10.0, 0.5, 20.0, 0.25]
    ref = df.melt(id_vars=["k"], var_name="measure", value_name="value")
    assert (
        out.reset_index(drop=True).sort_values(["k", "measure"]).values.tolist()
        == ref.sort_values(["k", "measure"])[["k", "measure", "value"]].values.tolist()
    )


def test_setops_match_python_sets():
    from fineweb2_ro_ray.stages.setops import except_distinct, intersect_distinct

    a = pd.DataFrame({"k": [1, 1, 2, 3, 4], "g": list("xxyzz")})
    b = pd.DataFrame({"k": [2, 4, 5], "g": list("yzq")})
    inter = (
        intersect_distinct(rd.from_pandas(a), rd.from_pandas(b), ["k", "g"])
        .to_pandas()
        .sort_values(["k", "g"])
    )
    exc = (
        except_distinct(rd.from_pandas(a), rd.from_pandas(b), ["k", "g"])
        .to_pandas()
        .sort_values(["k", "g"])
    )
    sa = {(1, "x"), (2, "y"), (3, "z"), (4, "z")}
    sb = {(2, "y"), (4, "z"), (5, "q")}
    assert set(map(tuple, inter.values.tolist())) == sa & sb
    assert set(map(tuple, exc.values.tolist())) == sa - sb


def test_ntile_matches_sql_definition():
    from fineweb2_ro_ray.stages.analysis import per_key_ntile

    # key u: 7 rows -> ntile(3) buckets sized 3,2,2; key v: 2 rows -> 1,2
    df = pd.DataFrame(
        {
            "u": ["u"] * 7 + ["v"] * 2,
            "id": list(range(7)) + [0, 1],
            "o": [0] * 9,  # all ties: order falls back to id
        }
    )
    out = (
        per_key_ntile(rd.from_pandas(df), key="u", order_col="o", id_col="id", n=3)
        .to_pandas()
        .sort_values(["u", "id"])
    )
    assert out[out["u"] == "u"]["tile"].tolist() == [1, 1, 1, 2, 2, 3, 3]
    assert out[out["u"] == "v"]["tile"].tolist() == [1, 2]
    # cross-check vs duckdb on a random layout
    rng = np.random.default_rng(11)
    df2 = pd.DataFrame(
        {
            "u": rng.integers(0, 5, 137),
            "id": np.arange(137),
            "o": rng.integers(0, 10, 137),
        }
    )
    out2 = (
        per_key_ntile(rd.from_pandas(df2), key="u", order_col="o", id_col="id", n=4)
        .to_pandas()
        .sort_values(["u", "id"])
        .reset_index(drop=True)
    )
    import duckdb

    ref = (
        duckdb.query(
            "SELECT u, id, CAST(ntile(4) OVER (PARTITION BY u ORDER BY o, id) AS BIGINT)"
            " AS tile FROM df2"
        )
        .to_df()
        .sort_values(["u", "id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out2, ref, check_dtype=False)


def test_grouped_mode_deterministic_tiebreak():
    from fineweb2_ro_ray.stages.analysis import grouped_mode

    df = pd.DataFrame(
        {
            "g": ["a"] * 4 + ["b"] * 3,
            "v": ["x", "y", "y", "x", "q", "p", "q"],
        }
    )
    out = (
        grouped_mode(rd.from_pandas(df), key="g", value_col="v")
        .to_pandas()
        .sort_values("g")
    )
    # group a: x and y tie at 2 -> min value x; group b: q wins outright
    assert out.values.tolist() == [["a", "x"], ["b", "q"]]


def test_heavy_hitters_exact_skewed_corpus():
    from fineweb2_ro_ray.stages.sketches import heavy_hitters_exact

    # zipf-ish corpus: 'hot' is 30% of tokens, 'warm' ~8%, 200 rare words
    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(200)]
    docs = []
    for _ in range(300):
        words = ["hot"] * 30 + ["warm"] * 8 + list(rng.choice(vocab, 62))
        rng.shuffle(words)
        docs.append(" ".join(words))
    docs.append(None)  # null text must be ignored, not counted as ""
    ds = rd.from_pandas(pd.DataFrame({"text": docs}))
    out = (
        heavy_hitters_exact(ds, "text", k=10)
        .to_pandas()
        .sort_values("word")
        .reset_index(drop=True)
    )
    # exact reference
    from collections import Counter

    c = Counter(w for d in docs if d for w in d.split(" "))
    total = sum(c.values())
    ref = sorted((w, n) for w, n in c.items() if n * 10 > total)
    assert list(map(tuple, out.values.tolist())) == ref
    assert [w for w, _ in ref] == ["hot"]  # only the 30% word beats 10%


def test_quantile_sketch_rank_error_bound():
    from fineweb2_ro_ray.stages.sketches import quantile_sketch

    rng = np.random.default_rng(7)
    vals = np.concatenate(
        [rng.lognormal(3, 1, 20000), rng.integers(0, 50, 5000).astype(float)]
    )
    df = pd.DataFrame({"x": vals})
    qs = [10.0, 50.0, 90.0, 99.0]
    out = quantile_sketch(rd.from_pandas(df), "x", qs, m=256)
    s = np.sort(vals)
    for _, row in out.iterrows():
        # verify by RANK (the sketch's actual guarantee): the returned
        # value's position in the sorted data must be within ~3/m of q
        pos = np.searchsorted(s, row["value"]) / len(s)
        assert abs(pos - row["q"] / 100.0) <= 3.0 / 256 + 0.005, (row["q"], pos)

    # determinism across block layouts
    out2 = quantile_sketch(rd.from_pandas(df).repartition(7), "x", qs, m=256)
    # same summary algebra, different batching -> values may differ but
    # both must satisfy the rank gate; and identical layout is bit-equal
    out3 = quantile_sketch(rd.from_pandas(df), "x", qs, m=256)
    assert out["value"].tolist() == out3["value"].tolist()
    for _, row in out2.iterrows():
        pos = np.searchsorted(s, row["value"]) / len(s)
        assert abs(pos - row["q"] / 100.0) <= 3.0 / 256 + 0.005, (row["q"], pos)


def test_winnow_fingerprints_guarantee_and_determinism():
    from fineweb2_ro_ray.stages.fingerprint import winnow_fingerprints

    k, w = 8, 16
    rng = np.random.default_rng(13)
    alphabet = list("abcdefgh ")
    base = "".join(rng.choice(alphabet, 400))
    shared = "".join(rng.choice(alphabet, k + w - 1))  # minimal guaranteed span
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3, 4],
            "text": [
                base,
                base,  # identical doc -> identical fingerprint set
                "".join(rng.choice(alphabet, 200)) + shared,
                shared + "".join(rng.choice(alphabet, 200)),
                "tiny",  # < k+w-1: no full window -> no fingerprints
            ],
        }
    )
    out = winnow_fingerprints(
        rd.from_pandas(docs), text_col="text", id_col="doc_id", k=k, w=w
    ).to_pandas()
    by_doc = {d: set(g["fingerprint"]) for d, g in out.groupby("doc_id")}
    assert by_doc[0] == by_doc[1]  # identical docs, identical sketch
    # shared substring of length w+k-1 -> at least one common fingerprint
    assert by_doc[2] & by_doc[3]
    assert 4 not in by_doc
    # density: winnowing keeps roughly 2/(w+1) of positions, never all
    assert 0 < len(by_doc[0]) < len(base) / 2
    # block-layout determinism
    out2 = winnow_fingerprints(
        rd.from_pandas(docs).repartition(3), text_col="text", id_col="doc_id", k=k, w=w
    ).to_pandas()
    by_doc2 = {d: set(g["fingerprint"]) for d, g in out2.groupby("doc_id")}
    assert by_doc == by_doc2


def test_hash_join_matches_pandas_merge():
    from fineweb2_ro_ray.stages.joins import hash_join

    rng = np.random.default_rng(17)
    left = pd.DataFrame(
        {
            "k": rng.choice(["a", "b", "c", "d", None], 80),
            "lv": np.arange(80, dtype=np.int64),
        }
    )
    right = pd.DataFrame(
        {
            "rk": rng.choice(["a", "b", "e", None], 30),
            "rv": (np.arange(30, dtype=np.int64) + 2**53 + 3),  # > 2^53: dtype probe
        }
    )
    out = (
        hash_join(rd.from_pandas(left), rd.from_pandas(right), key="k", right_key="rk")
        .to_pandas()
        .sort_values(["k", "lv", "rv"])
        .reset_index(drop=True)
    )
    ref = (
        left.dropna(subset=["k"])
        .merge(right.dropna(subset=["rk"]), left_on="k", right_on="rk", how="inner")
        .sort_values(["k", "lv", "rv"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out[ref.columns], ref, check_dtype=False)
    assert out["rv"].dtype == np.int64  # no float64 upcast above 2^53


def test_hash_join_left_keeps_unmatched_and_null_keys():
    from fineweb2_ro_ray.stages.joins import hash_join

    left = pd.DataFrame({"k": ["a", "b", None, "c"], "lv": [1, 2, 3, 4]})
    right = pd.DataFrame({"rk": ["a", "a", "d"], "rv": [10, 11, 12]})
    out = (
        hash_join(
            rd.from_pandas(left), rd.from_pandas(right), key="k", right_key="rk", how="left"
        )
        .to_pandas()
        .sort_values(["lv", "rv"])
        .reset_index(drop=True)
    )
    # a matches twice; b, c and the NULL-key row survive unmatched
    assert out["lv"].tolist() == [1, 1, 2, 3, 4]
    assert out["rv"].tolist()[:2] == [10, 11]
    assert out["rv"].isna().tolist() == [False, False, True, True, True]
    assert out["k"].isna().tolist() == [False, False, False, True, False]


def test_hash_join_composite_keys():
    from fineweb2_ro_ray.stages.joins import hash_join

    rng = np.random.default_rng(23)
    left = pd.DataFrame(
        {
            "a": rng.integers(0, 4, 60),
            "b": rng.choice(["x", "y", None], 60),
            "lv": np.arange(60),
        }
    )
    right = pd.DataFrame(
        {
            "ra": rng.integers(0, 4, 25),
            "rb": rng.choice(["x", "y", "z"], 25),
            "rv": np.arange(25) + 100,
        }
    )
    for how in ("inner", "left"):
        out = (
            hash_join(
                rd.from_pandas(left),
                rd.from_pandas(right),
                key=["a", "b"],
                right_key=["ra", "rb"],
                how=how,
            )
            .to_pandas()
            .sort_values(["lv", "rv"])
            .reset_index(drop=True)
        )
        if how == "inner":
            ref = left.dropna(subset=["b"]).merge(
                right, left_on=["a", "b"], right_on=["ra", "rb"], how="inner"
            )
        else:
            ref = left.merge(
                right, left_on=["a", "b"], right_on=["ra", "rb"], how="left"
            )
        ref = ref.sort_values(["lv", "rv"]).reset_index(drop=True)
        assert out["lv"].tolist() == ref["lv"].tolist(), how
        assert out["rv"].fillna(-1).tolist() == ref["rv"].fillna(-1).tolist(), how


# ---------------------------------------------------------------------------
# round-3 continuation: word-level Gopher-rule kernels + join-shape queries
# ---------------------------------------------------------------------------


def _docs_dir(tmp_path, rows):
    import pyarrow.parquet as pq

    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_word_repetition_edge_cases(tmp_path):
    """Empty string, consecutive spaces (empty tokens), all-duplicate
    doc, and NULL text (excluded) — duckdb string_split semantics."""
    from fineweb2_ro_ray.pipelines.parity import q_doc_word_repetition

    d = _docs_dir(
        tmp_path,
        [(1, "a a a"), (2, ""), (3, "x  y"), (4, None), (5, "a b a b c")],
    )
    df = q_doc_word_repetition(d).to_pandas().set_index("doc_id").sort_index()
    # "" splits to [''] (1 word); "x  y" -> ['x','','y'] (3 words, 3 distinct)
    assert df.loc[1].tolist() == [3, 1]
    assert df.loc[2].tolist() == [1, 1]
    assert df.loc[3].tolist() == [3, 3]
    assert 4 not in df.index
    assert df.loc[5].tolist() == [5, 3]


def test_stopword_counts_edge_cases(tmp_path):
    from fineweb2_ro_ray.pipelines.parity import q_doc_stopword_counts

    d = _docs_dir(
        tmp_path,
        [(1, "the a the"), (2, "xyz"), (3, ""), (4, "row the data qq")],
    )
    df = q_doc_stopword_counts(d).to_pandas().set_index("doc_id").sort_index()
    assert df.loc[1].tolist() == [3, 3]
    assert df.loc[2].tolist() == [1, 0]
    assert df.loc[3].tolist() == [1, 0]
    assert df.loc[4].tolist() == [4, 3]


def test_line_clean_edge_cases(tmp_path):
    """C4 line rules: terminal punctuation, min-words, javascript /
    brace markers, trim set, original (untrimmed) lines rejoined."""
    from fineweb2_ro_ray.pipelines.parity import q_doc_line_clean

    d = _docs_dir(
        tmp_path,
        [
            (1, "one two three four five.\nshort line.\nno terminal punct here"),
            (2, "  padded one two three four five!  \t\nEnable JavaScript to view."),
            (3, 'this line has template {braces} one two.\nquoted one two three four "'),
            (4, ""),
            (5, None),
            (6, "first good line stays right here?\r\nsecond good line stays too, yes."),
        ],
    )
    df = q_doc_line_clean(d).to_pandas().set_index("doc_id").sort_index()
    assert df.loc[1, "clean_text"] == "one two three four five."
    assert df.loc[1].tolist()[1:] == [3, 1]
    # trailing spaces/tab trimmed for the TEST, but the kept line is original
    assert df.loc[2, "clean_text"] == "  padded one two three four five!  \t"
    assert df.loc[2, "n_lines_kept"] == 1  # javascript line dropped
    assert df.loc[3, "clean_text"] == 'quoted one two three four "'
    assert df.loc[4].tolist() == ["", 1, 0]
    assert 5 not in df.index
    # \r is in the trim set, so line 1 of doc 6 ends in '?' after trim
    assert df.loc[6, "n_lines_kept"] == 2
    assert "\r" in df.loc[6, "clean_text"]  # original bytes preserved


def test_top_bigram_edge_cases(tmp_path):
    """Gopher top-2-gram counts: single word (0 bigrams), repeated
    bigram, empty string, tie between distinct bigrams."""
    from fineweb2_ro_ray.pipelines.parity import q_doc_top_bigram

    d = _docs_dir(
        tmp_path,
        [
            (1, "a b a b a b"),  # 'a b' x3, 'b a' x2
            (2, "word"),
            (3, ""),
            (4, None),
            (5, "x y z"),  # two distinct bigrams, both count 1
        ],
    )
    df = q_doc_top_bigram(d).to_pandas().set_index("doc_id").sort_index()
    assert df.loc[1].tolist() == [5, 3]
    assert df.loc[2].tolist() == [0, 0]
    assert df.loc[3].tolist() == [0, 0]
    assert 4 not in df.index
    assert df.loc[5].tolist() == [2, 1]


def test_user_first_last_single_event(tmp_path):
    """A single-event user has first == last; combiner dedup keeps it."""
    import pyarrow.parquet as pq

    from fineweb2_ro_ray.pipelines.parity import q_user_first_last

    t = pa.table(
        {
            "user_id": pa.array([7, 7, 9], pa.int64()),
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array(
                pd.to_datetime(["2024-01-01", "2024-01-02", "2024-01-03"]),
                pa.timestamp("us"),
            ),
            "event_type": pa.array(["a", "b", "c"], pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    df = q_user_first_last(str(tmp_path)).to_pandas().set_index("user_id").sort_index()
    assert df.loc[7, "first_type"] == "a" and df.loc[7, "last_type"] == "b"
    assert df.loc[9, "first_type"] == "c" and df.loc[9, "last_type"] == "c"
    assert df.loc[9, "first_event_id"] == 3 and df.loc[9, "last_event_id"] == 3


def test_hash_join_right_and_full_outer():
    """RIGHT / FULL OUTER on the exchange hash join vs pandas merge,
    including null-key rows on both sides (SQL: null keys match
    nothing but survive on their preserved side)."""
    from fineweb2_ro_ray.stages.joins import hash_join

    rng = np.random.default_rng(31)
    left = pd.DataFrame(
        {
            "a": rng.integers(0, 6, 50),
            "b": rng.choice(["x", "y", None], 50),
            "lv": np.arange(50),
        }
    )
    right = pd.DataFrame(
        {
            "ra": rng.integers(2, 9, 30),
            "rb": rng.choice(["x", "y", None, "z"], 30),
            "rv": np.arange(30) + 100,
        }
    )
    for how, phow in (("right", "right"), ("full", "outer")):
        out = (
            hash_join(
                rd.from_pandas(left),
                rd.from_pandas(right),
                key=["a", "b"],
                right_key=["ra", "rb"],
                how=how,
            )
            .to_pandas()
            .sort_values(["lv", "rv"])
            .reset_index(drop=True)
        )
        # pandas merge MATCHES NaN==NaN; SQL does not — emulate SQL by
        # merging only non-null-key rows, then appending preserved sides
        ln = left.dropna(subset=["b"])
        rn = right.dropna(subset=["rb"])
        ref = ln.merge(rn, left_on=["a", "b"], right_on=["ra", "rb"], how=phow)
        parts = [ref]
        if how == "full":
            parts.append(left[left["b"].isna()])
        parts.append(right[right["rb"].isna()])
        ref = pd.concat(parts, ignore_index=True)
        ref = ref.sort_values(["lv", "rv"]).reset_index(drop=True)
        assert out["lv"].fillna(-1).tolist() == ref["lv"].fillna(-1).tolist(), how
        assert out["rv"].fillna(-1).tolist() == ref["rv"].fillna(-1).tolist(), how
        assert len(out) == len(ref), how


def test_broadcast_join_matches_hash_join():
    """Broadcast (map-side, zero-shuffle) join ≡ exchange hash join on
    INNER and LEFT, composite keys, nulls both sides."""
    from fineweb2_ro_ray.stages.joins import broadcast_join, hash_join

    rng = np.random.default_rng(47)
    left = pd.DataFrame(
        {
            "a": rng.integers(0, 5, 80),
            "b": rng.choice(["x", "y", None], 80),
            "lv": np.arange(80),
        }
    )
    right = pd.DataFrame(
        {
            "ra": rng.integers(0, 7, 12),
            "rb": rng.choice(["x", "y", None], 12),
            "rv": np.arange(12) + 100,
        }
    )
    for how in ("inner", "left"):
        kw = dict(key=["a", "b"], right_key=["ra", "rb"], how=how)
        got = (
            broadcast_join(rd.from_pandas(left), rd.from_pandas(right), **kw)
            .to_pandas()
            .sort_values(["lv", "rv"])
            .reset_index(drop=True)
        )
        want = (
            hash_join(rd.from_pandas(left), rd.from_pandas(right), **kw)
            .to_pandas()
            .sort_values(["lv", "rv"])
            .reset_index(drop=True)
        )
        assert got["lv"].tolist() == want["lv"].tolist(), how
        assert got["rv"].fillna(-1).tolist() == want["rv"].fillna(-1).tolist(), how


def test_broadcast_join_build_cap_and_empty():
    from fineweb2_ro_ray.stages.joins import broadcast_join

    left = rd.from_pandas(pd.DataFrame({"k": [1, 2], "lv": [10, 20]}))
    big = rd.from_pandas(pd.DataFrame({"rk": np.arange(100), "rv": np.arange(100)}))
    with pytest.raises(ValueError, match="max_build_rows"):
        broadcast_join(left, big, key="k", right_key="rk", max_build_rows=10)
    empty = rd.from_pandas(pd.DataFrame({"rk": pd.array([], dtype="int64"),
                                         "rv": pd.array([], dtype="int64")}))
    out = broadcast_join(left, empty, key="k", right_key="rk", how="left").to_pandas()
    assert out["lv"].tolist() == [10, 20] and out["rv"].isna().all()
    out_i = broadcast_join(left, empty, key="k", right_key="rk", how="inner").to_pandas()
    assert len(out_i) == 0


@pytest.mark.parametrize("seed", [3, 11])
def test_hash_join_all_hows_vs_duckdb(seed):
    """All four join modes vs a DuckDB oracle (independent of the
    pandas emulation used elsewhere): SQL null-key semantics, composite
    keys, unmatched rows both sides."""
    import duckdb

    from fineweb2_ro_ray.stages.joins import hash_join

    rng = np.random.default_rng(seed)
    left = pd.DataFrame(
        {
            "a": rng.integers(0, 5, 40),
            "b": rng.choice(["x", "y", None], 40),
            "lv": np.arange(40),
        }
    )
    right = pd.DataFrame(
        {
            "ra": rng.integers(2, 8, 25),
            "rb": rng.choice(["x", "y", None, "z"], 25),
            "rv": np.arange(25) + 100,
        }
    )
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    for how, sql_how in (
        ("inner", "JOIN"),
        ("left", "LEFT JOIN"),
        ("right", "RIGHT JOIN"),
        ("full", "FULL OUTER JOIN"),
        ("semi", "SEMI JOIN"),
        ("anti", "ANTI JOIN"),
    ):
        sort_cols = ["lv"] if how in ("semi", "anti") else ["lv", "rv"]
        got = (
            hash_join(
                rd.from_pandas(left),
                rd.from_pandas(right),
                key=["a", "b"],
                right_key=["ra", "rb"],
                how=how,
            )
            .to_pandas()
            .sort_values(sort_cols)
            .reset_index(drop=True)
        )
        want = (
            con.sql(f"SELECT * FROM l {sql_how} r ON a = ra AND b = rb")
            .df()
            .sort_values(sort_cols)
            .reset_index(drop=True)
        )
        assert len(got) == len(want), how
        assert got["lv"].fillna(-1).tolist() == want["lv"].fillna(-1).tolist(), how
        if how not in ("semi", "anti"):
            assert got["rv"].fillna(-1).tolist() == want["rv"].fillna(-1).tolist(), how
        else:
            assert list(got.columns) == ["a", "b", "lv"], how


def test_events_props_extract_edges(tmp_path):
    """Non-matching and NULL props extract as NULL (excluded from sum
    and count), matching DuckDB NULLIF/TRY_CAST oracle semantics."""
    import duckdb
    import pyarrow.parquet as pq

    from fineweb2_ro_ray.pipelines.parity import q_events_props_extract

    t = pa.table(
        {
            "event_type": pa.array(["a", "a", "b", "b", "b", "c"], pa.string()),
            "props": pa.array(
                ['{"k": 7}', "garbage", None, '{"k": 0}', '{"j": 5}', "nope"],
                pa.string(),
            ),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    got = (
        q_events_props_extract(str(tmp_path))
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("events", t)
    import __ray_entry__ as E

    want = (
        con.sql(E.oracle_sql()["events_props_extract"])
        .df()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    assert got["sum_k"].fillna(-1).tolist() == want["sum_k"].fillna(-1).tolist()
    assert got["n_extracted"].tolist() == want["n_extracted"].tolist()


def test_multimodal_real_wav_bmp_decode():
    """Non-fake decode is REAL for uncompressed formats: BMP dims and
    WAV rate/duration/RMS recover the synthesized ground truth; BMP
    encode/decode round-trips bit-exact; real nearest-neighbor resize
    produces the target grid."""
    import json

    from fineweb2_ro_ray.stages.multimodal import (
        MediaResizer,
        decode_bmp,
        decode_wav,
        encode_bmp,
        encode_wav,
    )

    px = np.random.default_rng(5).integers(0, 256, (13, 6, 3), dtype=np.uint8)
    assert (decode_bmp(encode_bmp(px)) == px).all()
    rate, ch, samp = decode_wav(encode_wav(np.arange(-500, 500, dtype=np.int16), 8000))
    assert (rate, ch) == (8000, 1) and (samp == np.arange(-500, 500)).all()

    t = synth_media(24, real=True)
    out = (
        decode_and_featurize(rd.from_arrow(t), fake=False)
        .to_pandas()
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    metas = [json.loads(m) for m in t["meta"].to_pylist()]
    for i, m in enumerate(metas):
        if m["codec"] in ("bmp", "png", "jpeg", "gif"):
            assert (out.loc[i, "width"], out.loc[i, "height"]) == (m["width"], m["height"])
            assert np.isnan(out.loc[i, "sample_rate"])
        elif m["codec"] == "gif-anim":
            # animated GIF video: true dims + delay-summed duration
            assert (out.loc[i, "width"], out.loc[i, "height"]) == (m["width"], m["height"])
            assert np.isnan(out.loc[i, "sample_rate"])
            assert out.loc[i, "duration_ms"] > 0
        else:
            assert out.loc[i, "sample_rate"] == m["rate"]
            expect_ms = round(1000 * m["samples"] / m["rate"])
            assert abs(out.loc[i, "duration_ms"] - expect_ms) <= 1
            # sine amplitude 12000/32768 ≈ 0.366 → RMS ≈ 0.366/sqrt(2) ≈ 0.259
            assert 0.2 < out.loc[i, "rms"] < 0.3

    imgs = (
        rd.from_arrow(t)
        .map_batches(
            lambda b: b.filter(pa.compute.equal(b["kind"], "image")),
            batch_format="pyarrow",
        )
        .map_batches(
            MediaResizer,
            fn_constructor_kwargs={"target_w": 5, "target_h": 4, "fake": False},
            batch_format="pyarrow",
            concurrency=1,
        )
        .to_pandas()
    )
    from fineweb2_ro_ray.stages.jpeg import decode_jpeg
    from fineweb2_ro_ray.stages.multimodal import decode_png

    def _any_decode(p: bytes) -> np.ndarray:
        if p[:4] == b"\x89PNG":
            return decode_png(p)
        if p[:2] == b"\xff\xd8":
            return decode_jpeg(p)
        if p[:6] in (b"GIF87a", b"GIF89a"):
            from fineweb2_ro_ray.stages.gif import decode_gif

            return decode_gif(p)[0][0]
        return decode_bmp(p)

    assert all(_any_decode(p).shape == (4, 5, 3) for p in imgs["payload"])


def test_mixing_stage_edges(ray_session):
    """Mixture family edges: null/unlisted keys drop (sample) or take
    the default factor (upsample); the hash-band sample is identical
    across batch sizes; weights give rate 1.0 to the most
    under-represented key and 0 to untargeted keys."""
    from fineweb2_ro_ray.stages.mixing import (
        band_1e6,
        mixture_sample,
        mixture_weights,
        upsample_by_key,
    )

    t = pa.table(
        {
            "doc_id": pa.array(range(200), pa.int64()),
            "k": pa.array(
                (["a"] * 120 + ["b"] * 60 + ["c"] * 18 + [None, "zz"]), pa.string()
            ),
        }
    )
    ds = rd.from_arrow(t)
    w = mixture_weights(ds, "k", {"a": 0.5, "b": 0.5})
    w = w.set_index("k")
    # b is most under-represented vs target → rate 1.0; c untargeted → 0
    assert w.loc["b", "rate"] == 1.0
    assert w.loc["c", "rate"] == 0.0
    assert 0 < w.loc["a", "rate"] < 1

    rates = {"a": 0.5, "b": 1.0}
    kept = mixture_sample(ds, "k", rates, id_col="doc_id").to_pandas()
    assert set(kept["k"]) <= {"a", "b"}  # null/c/zz dropped
    assert (kept[kept["k"] == "b"].shape[0]) == 60  # rate 1.0 keeps all
    # deterministic + batch-size invariant
    kept2 = (
        mixture_sample(
            rd.from_arrow(t).repartition(7), "k", rates, id_col="doc_id"
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        kept.sort_values("doc_id").reset_index(drop=True), kept2
    )
    # matches the scalar definition
    import hashlib

    for _, r in kept.iterrows():
        b = int.from_bytes(
            hashlib.md5(str(r["doc_id"]).encode()).digest()[:6], "big"
        ) % 1_000_000
        assert b < int(np.floor(rates[r["k"]] * 1_000_000))
    bands = band_1e6(pa.array(["0", "1", "42"]))
    assert bands[2] == 378754  # pinned against the DuckDB mirror

    up = upsample_by_key(ds, "k", {"a": 2, "c": 0}, default=1).to_pandas()
    assert (up[up["k"] == "a"].shape[0]) == 240
    assert (up[up["k"] == "c"].shape[0]) == 0
    assert (up[up["k"] == "b"].shape[0]) == 60  # default 1
    assert up[up["k"].isna()].shape[0] == 1  # null key → default
    assert set(up[up["k"] == "a"]["copy_idx"]) == {0, 1}


def test_mediaprobe_mp3_mp4_ground_truth():
    """Header-level MP3/MP4 metadata probes recover synthesized ground
    truth exactly: frame-walked MP3 duration/rate/bitrate (with and
    without a leading ID3v2 tag), mvhd duration at both box versions,
    64-bit largesize boxes; the MediaDecoder routes both and leaves rms
    null (no sample decode is claimed)."""
    import pytest

    from fineweb2_ro_ray.stages.mediaprobe import (
        encode_mp3_silence,
        encode_mp4_stub,
        probe_mp3,
        probe_mp4,
    )
    from fineweb2_ro_ray.stages.multimodal import MediaDecoder

    for id3 in (False, True):
        mp3 = encode_mp3_silence(50, rate=44100, bitrate_kbps=128, id3=id3)
        info = probe_mp3(mp3)
        assert info["n_frames"] == 50
        assert info["sample_rate"] == 44100
        # 50 frames x 1152 samples @ 44100 Hz = 1306.1 ms
        assert abs(info["duration_ms"] - round(50 * 1152 / 44100 * 1000)) <= 1
        assert info["bitrate_kbps"] == 128
    info = probe_mp3(encode_mp3_silence(30, rate=32000, bitrate_kbps=64))
    assert info["sample_rate"] == 32000 and info["n_frames"] == 30
    with pytest.raises(ValueError):
        probe_mp3(b"\x00" * 64)

    for version in (0, 1):
        mp4 = encode_mp4_stub(7500, timescale=600, version=version)
        info = probe_mp4(mp4)
        assert info["duration_ms"] == 7500
        assert info["timescale"] == 600
        assert info["brand"] == "isom"
    with pytest.raises(ValueError):
        probe_mp4(b"\x00\x00\x00\x08free")

    dec = MediaDecoder(fake=False)
    t = pa.table(
        {
            "media_id": pa.array([0, 1], pa.int64()),
            "conv_id": ["c", "c"],
            "kind": ["audio", "video"],
            "payload": pa.array(
                [encode_mp3_silence(25), encode_mp4_stub(3200)], pa.binary()
            ),
            "meta": ["{}", "{}"],
        }
    )
    out = dec(t).to_pandas()
    assert out.loc[0, "sample_rate"] == 44100
    assert abs(out.loc[0, "duration_ms"] - round(25 * 1152 / 44100 * 1000)) <= 1
    assert pd.isna(out.loc[0, "rms"])  # no sample decode claimed
    assert out.loc[1, "duration_ms"] == 3200


def test_jpeg_codec_ground_truth_recovery():
    """Real baseline JPEG decode (pure numpy Huffman + IDCT): exact on
    flat single-block images, ±2/channel on 4:4:4 quality-100 round
    trips (DCT rounding only), bounded loss under 4:2:0 subsampling and
    coarse quantization, restart-marker streams, grayscale; honest
    refusal for progressive (SOF2)."""
    import struct

    import pytest

    from fineweb2_ro_ray.stages.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(41)
    flat = np.full((8, 8, 3), 77, np.uint8)
    assert (decode_jpeg(encode_jpeg(flat)) == flat).all()

    x, y = np.linspace(0, 255, 37), np.linspace(0, 255, 23)
    img = np.stack(
        [np.add.outer(y, x) / 2, np.tile(x, (23, 1)), np.tile(y[:, None], (1, 37))],
        -1,
    ).astype(np.uint8)
    err = lambda d: np.abs(d.astype(int) - img.astype(int)).max()  # noqa: E731
    assert err(decode_jpeg(encode_jpeg(img, quality=100))) <= 2
    assert err(decode_jpeg(encode_jpeg(img, quality=100, subsampling="420"))) <= 12
    assert err(decode_jpeg(encode_jpeg(img, quality=100, restart_interval=2))) <= 2
    assert err(decode_jpeg(encode_jpeg(img, quality=70))) <= 24

    noise = rng.integers(0, 256, (16, 24, 3), dtype=np.uint8)
    d = decode_jpeg(encode_jpeg(noise, quality=100))
    assert np.abs(d.astype(int) - noise.astype(int)).max() <= 2

    g = np.add.outer(np.arange(19), np.arange(31)).astype(np.uint8)
    dg = decode_jpeg(encode_jpeg(g, quality=100))
    assert dg.shape == (19, 31) and (dg == g).all()
    # grayscale + restart markers: the single-component scan path
    assert (decode_jpeg(encode_jpeg(g, quality=100, restart_interval=3)) == g).all()
    # truncated restart-interval stream: entropy data cut before the
    # expected RSTn must surface as the module's ValueError contract
    # (not a bare IndexError) on every scan path
    import pytest as _pytest

    for px, kw in [(g, {}), (img, {})]:
        buf = bytearray(encode_jpeg(px, quality=100, restart_interval=1, **kw))
        first_rst = next(
            i for i in range(2, len(buf) - 1)
            if buf[i] == 0xFF and 0xD0 <= buf[i + 1] <= 0xD7
        )
        truncated = bytes(buf[:first_rst]) + bytes(buf[-2:])  # keep EOI
        with _pytest.raises(ValueError):
            decode_jpeg(truncated)

    # progressive (SOF2): both spectral-selection-only and full
    # successive-approximation streams decode BIT-IDENTICAL to the
    # baseline decode of the same pixels (the coefficients are equal by
    # construction, so any decoder divergence is a scan-algorithm bug)
    for px, kw in [
        (img, {}),
        (img, {"subsampling": "420"}),
        (noise, {}),
        (g, {}),
        (img, {"quality": 70}),
        (rng.integers(0, 256, (8, 8, 3), dtype=np.uint8), {}),  # 1 block
        (rng.integers(0, 256, (9, 17, 3), dtype=np.uint8), {"subsampling": "420"}),
    ]:
        base = decode_jpeg(encode_jpeg(px, **kw))
        assert (decode_jpeg(encode_jpeg(px, progressive=True, **kw)) == base).all()
        assert (
            decode_jpeg(encode_jpeg(px, progressive=True, successive=True, **kw))
            == base
        ).all()
    # lossless/arithmetic SOF refusal: rewrite SOF0 → SOF3 (lossless)
    payload = bytearray(encode_jpeg(flat))
    i = payload.find(b"\xff\xc0")
    payload[i + 1] = 0xC3
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(payload))
    # not-a-jpeg refusal
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01\x02")
    _ = struct  # imported for parity with sibling codec test


def test_png_codec_ground_truth_recovery():
    """Real zlib PNG decode: every spec filter (None/Sub/Up/Average/
    Paeth) un-filters back to the exact source pixels, for gray / RGB /
    RGBA; multi-IDAT streams parse; dims recover through the Ray decode
    stage; honest refusals for palette and interlace."""
    import struct
    import zlib as _z

    import pytest

    from fineweb2_ro_ray.stages.multimodal import (
        _png_chunk,
        decode_png,
        encode_png,
    )

    rng = np.random.default_rng(9)
    for ch in (1, 3, 4):
        shape = (11, 7) if ch == 1 else (11, 7, ch)
        px = rng.integers(0, 256, shape, dtype=np.uint8)
        for ft in range(5):
            got = decode_png(encode_png(px, filter_type=ft))
            assert got.shape == px.shape and (got == px).all(), (ch, ft)

    # gradient images make Sub/Average/Paeth predictions non-trivial
    grad = (
        np.arange(24 * 17 * 3, dtype=np.int64).reshape(24, 17, 3) % 256
    ).astype(np.uint8)
    for ft in range(5):
        assert (decode_png(encode_png(grad, filter_type=ft)) == grad).all()

    # multi-IDAT: split the compressed stream across two chunks
    px = rng.integers(0, 256, (6, 5, 3), dtype=np.uint8)
    whole = encode_png(px, filter_type=2)
    sig, rest = whole[:8], whole[8:]
    (ln,) = struct.unpack_from(">I", rest, 0)
    ihdr_chunk = rest[: 12 + ln]
    after = rest[12 + ln :]
    (ln2,) = struct.unpack_from(">I", after, 0)
    idat = after[8 : 8 + ln2]
    two = (
        sig
        + ihdr_chunk
        + _png_chunk(b"IDAT", idat[: len(idat) // 2])
        + _png_chunk(b"IDAT", idat[len(idat) // 2 :])
        + _png_chunk(b"IEND", b"")
    )
    assert (decode_png(two) == px).all()

    # palette (color type 3): indices through PLTE recover exact RGB
    pal = rng.integers(0, 256, (7, 3), dtype=np.uint8)
    idx = rng.integers(0, 7, (5, 9), dtype=np.uint8)
    lines = b"".join(b"\x00" + idx[r].tobytes() for r in range(5))
    ihdr_pal = struct.pack(">IIBBBBB", 9, 5, 8, 3, 0, 0, 0)
    pal_png = (
        sig
        + _png_chunk(b"IHDR", ihdr_pal)
        + _png_chunk(b"PLTE", pal.tobytes())
        + _png_chunk(b"IDAT", _z.compress(lines))
        + _png_chunk(b"IEND", b"")
    )
    got = decode_png(pal_png)
    assert got.shape == (5, 9, 3) and (got == pal[idx]).all()
    # Adam7 interlace: every pass layout (incl. widths/heights that
    # leave some passes empty) de-interlaces back to the exact pixels,
    # for every filter type and channel count
    for shape in ((11, 7, 3), (8, 8, 1), (3, 2, 4), (1, 1, 3), (2, 9, 3)):
        pxi = rng.integers(0, 256, shape, dtype=np.uint8)
        if shape[-1] == 1:
            pxi = pxi[:, :, 0]
        for ft in (0, 2, 4):
            gi = decode_png(encode_png(pxi, filter_type=ft, interlace=True))
            assert gi.shape == pxi.shape and (gi == pxi).all(), (shape, ft)
    _ = pytest  # refusals for palette-missing-PLTE covered in decode


def test_adaptive_threshold_filter_bounds_and_nulls():
    """Per-key derived [q_lo, q_hi] bounds; null keys and null values
    are excluded (SQL NULL-comparison semantics); keys absent from the
    bounds table (all-null value groups) are excluded."""
    import duckdb

    from fineweb2_ro_ray.stages.analysis import adaptive_threshold_filter

    rng = np.random.default_rng(7)
    n = 400
    langs = rng.choice(["ro", "en", "de"], size=n).tolist()
    vals = rng.integers(10, 5000, size=n).astype("float64")
    # inject nulls on both columns
    langs[5] = None
    vals[11] = np.nan
    t = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "lang": pa.array(langs, pa.string()),
            "n_chars": pa.array([None if np.isnan(v) else int(v) for v in vals], pa.int64()),
        }
    )
    out = (
        adaptive_threshold_filter(
            rd.from_arrow(t), key="lang", col="n_chars", q_lo=10.0, q_hi=90.0
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", t.to_pandas())
    want = con.execute(
        """
        WITH b AS (
            SELECT lang, quantile_cont(n_chars, 0.10) lo, quantile_cont(n_chars, 0.90) hi
            FROM documents GROUP BY lang
        )
        SELECT d.doc_id FROM documents d JOIN b USING (lang)
        WHERE d.n_chars >= b.lo AND d.n_chars <= b.hi
        ORDER BY d.doc_id
        """
    ).df()
    assert out["doc_id"].tolist() == want["doc_id"].tolist()


def test_hll_approx_distinct_by_group_accuracy():
    """Grouped HLL within 5% of the exact per-group distinct; NULL key
    is a real group; null values ignored (COUNT DISTINCT semantics)."""
    import pandas as pd

    from fineweb2_ro_ray.stages.sketches import approx_distinct_by

    rng = np.random.default_rng(3)
    n = 30_000
    keys = rng.choice(["click", "view", "buy"], size=n, p=[0.5, 0.4, 0.1]).tolist()
    users = rng.integers(0, 5000, size=n).tolist()
    keys[0] = None
    keys[1] = None
    users[2] = None
    t = pa.table(
        {
            "event_type": pa.array(keys, pa.string()),
            "user_id": pa.array(users, pa.int64()),
        }
    )
    got = (
        approx_distinct_by(rd.from_arrow(t).repartition(6), "event_type", "user_id")
        .to_pandas()
        .set_index("event_type")["approx_distinct"]
    )
    df = t.to_pandas()
    exact = df.groupby("event_type", dropna=False)["user_id"].nunique(dropna=True)
    assert len(got) == len(exact) == 4  # 3 types + the NULL group
    for k, want in exact.items():
        est = got[k] if not pd.isna(k) else got[got.index.isna()].iloc[0]
        if want >= 100:
            assert abs(est - want) / want < 0.05, (k, est, want)
        else:  # tiny groups: linear counting is near-exact
            assert abs(est - want) <= max(2, 0.05 * want), (k, est, want)


def test_jaccard_ngram_pairs_edges(tmp_path):
    """3-gram-set Jaccard vs the DuckDB oracle on hand-built docs:
    shared shingles pair, word-set-equal-but-order-different docs do
    NOT (order sensitivity), sub-3-word / empty / NULL docs never pair."""
    import duckdb
    import pandas as pd

    import __ray_entry__ as E
    from fineweb2_ro_ray.pipelines.parity import q_jaccard_ngram_pairs

    docs = pd.DataFrame(
        {
            "doc_id": range(8),
            "source": ["s1"] * 8,
            "text": [
                "the quick brown fox jumps over",      # 0: pairs with 1
                "a the quick brown fox jumps over b",  # 1
                "fox brown quick the over jumps",      # 2: same WORD SET as 0, no shared 3-gram
                "tiny doc",                            # 3: < 3 words
                "",                                    # 4: empty
                None,                                  # 5: NULL
                "xx yy",                               # 6: < 3 words
                "zz ww",                               # 7: < 3 words (6+7 must NOT pair)
            ],
        }
    )
    docs.to_parquet(f"{tmp_path}/documents.parquet", index=False)
    got = (
        q_jaccard_ngram_pairs(str(tmp_path))
        .to_pandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", docs)
    want = (
        con.execute(E.oracle_sql()["jaccard_ngram_pairs"])
        .df()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    assert got["doc_a"].tolist() == want["doc_a"].tolist() == [0]
    assert got["doc_b"].tolist() == want["doc_b"].tolist() == [1]
    assert np.allclose(got["jaccard"], want["jaccard"])


def test_pack_spans_scan_exact(ray_session):
    """The distributed ordered prefix-scan (stages/packing.py) against
    a driver-side cumsum on adversarial shapes: unsorted input,
    many ranges vs few rows (empty ranges), n_ranges=1 (no interior
    boundary), a single row, budget-straddling documents, and a
    zero-token row."""
    import numpy as np
    import pandas as pd

    import ray as _ray
    import ray.data

    from fineweb2_ro_ray.stages.packing import pack_spans

    rng = np.random.RandomState(7)
    ids = rng.permutation(np.arange(0, 5000, 3, dtype=np.int64))  # sparse, shuffled
    toks = rng.randint(0, 900, size=len(ids)).astype(np.int64)
    toks[5] = 0
    df = pd.DataFrame({"doc_id": ids, "n_tok": toks})

    for n_ranges, budget in [(None, 256), (1, 256), (64, 10**9), (7, 1)]:
        thin = ray.data.from_pandas(df).repartition(9)
        got = (
            pack_spans(thin, budget=budget, n_ranges=n_ranges)
            .to_pandas()
            .sort_values("doc_id", ignore_index=True)
        )
        ref = df.sort_values("doc_id", ignore_index=True).copy()
        ref["tok_start"] = ref["n_tok"].cumsum() - ref["n_tok"]
        ref["pack_first"] = ref["tok_start"] // budget
        ref["pack_last"] = (ref["tok_start"] + ref["n_tok"] - 1) // budget
        for col in ["doc_id", "n_tok", "tok_start", "pack_first", "pack_last"]:
            assert got[col].tolist() == ref[col].tolist(), (n_ranges, budget, col)

    # single row
    one = ray.data.from_pandas(pd.DataFrame({"doc_id": [42], "n_tok": [5]}))
    got = pack_spans(one, budget=4).to_pandas()
    assert got.iloc[0].tolist() == [42, 5, 0, 0, 1]

    # empty input: typed empty dataset, no crash (Ray's to_pandas drops
    # columns of a fully empty dataset, but schema() keeps the contract)
    empty = ray.data.from_pandas(
        pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                      "n_tok": pd.Series([], dtype=np.int64)})
    )
    es = pack_spans(empty, budget=8)
    assert es.count() == 0
    assert set(es.schema().names) == {
        "doc_id", "n_tok", "tok_start", "pack_first", "pack_last",
    }

    # empty stream through the sketch: NaN quantiles, no crash
    from fineweb2_ro_ray.stages.sketches import quantile_sketch

    qdf = quantile_sketch(empty, "n_tok", [25.0, 75.0])
    assert qdf["q"].tolist() == [25.0, 75.0] and qdf["value"].isna().all()


def test_hash_exchange_coalesced_split_groups(ray_session):
    """The map-side block coalescing must be invisible: many tiny
    upstream blocks (smaller than the 64MB target, forcing real
    grouping), interleaved 0-row blocks, and a pandas-backed upstream
    all reduce to the same grouped result as a driver-side pandas
    groupby."""
    import pandas as pd

    from fineweb2_ro_ray.stages.exchange import hash_exchange_map_groups

    rng = np.random.default_rng(5)
    frames = []
    for i in range(40):  # 40 tiny blocks, some empty
        m = 0 if i % 7 == 3 else int(rng.integers(1, 50))
        frames.append(
            pd.DataFrame(
                {
                    "k": [f"g{int(x)}" for x in rng.integers(0, 13, m)],
                    "v": rng.integers(0, 100, m).astype(np.int64),
                }
            )
        )
    # from_pandas keeps per-frame blocks; override_num_blocks not needed
    ds = rd.from_pandas(frames)

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("k", as_index=False)["v"].sum()

    got = (
        hash_exchange_map_groups(ds, per_part, key="k")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    want = (
        pd.concat(frames)
        .groupby("k", as_index=False)["v"]
        .sum()
        .sort_values("k")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_hash_exchange_split_bytes_env_override(ray_session, monkeypatch):
    """FW2_EXCHANGE_SPLIT_BYTES=0 degenerates to one split task per
    upstream block — result identical."""
    import pandas as pd

    from fineweb2_ro_ray.stages.exchange import hash_exchange_map_groups

    monkeypatch.setenv("FW2_EXCHANGE_SPLIT_BYTES", "0")
    frames = [
        pd.DataFrame({"k": ["a", "b"], "v": [i, 2 * i]}) for i in range(6)
    ]
    ds = rd.from_pandas(frames)

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("k", as_index=False)["v"].sum()

    got = (
        hash_exchange_map_groups(ds, per_part, key="k")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert got.to_dict("list") == {"k": ["a", "b"], "v": [15, 30]}


def test_hash_exchange_tree_merge_equals_flat(ray_session, monkeypatch):
    """Forcing the tree path (fan-in 2, one split per upstream block →
    3+ merge levels over 40 map groups) must produce the exact same
    result as the default flat wiring, on string AND multi-column keys,
    empty blocks included."""
    import pandas as pd

    from fineweb2_ro_ray.stages.exchange import hash_exchange_map_groups

    rng = np.random.default_rng(11)
    frames = []
    for i in range(40):
        m = 0 if i % 9 == 2 else int(rng.integers(1, 40))
        frames.append(
            pd.DataFrame(
                {
                    "k": [f"g{int(x)}" for x in rng.integers(0, 17, m)],
                    "j": rng.integers(0, 3, m).astype(np.int64),
                    "v": rng.integers(0, 100, m).astype(np.int64),
                }
            )
        )

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["k", "j"], as_index=False)["v"].sum()

    def run() -> pd.DataFrame:
        ds = rd.from_pandas(frames)
        return (
            hash_exchange_map_groups(ds, per_part, key=["k", "j"])
            .to_pandas()
            .sort_values(["k", "j"])
            .reset_index(drop=True)
        )

    def run_str() -> pd.DataFrame:
        ds = rd.from_pandas(frames)
        return (
            hash_exchange_map_groups(
                ds, lambda df: df.groupby("k", as_index=False)["v"].sum(), key="k"
            )
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )

    flat, flat_str = run(), run_str()
    monkeypatch.setenv("FW2_EXCHANGE_SPLIT_BYTES", "0")  # M = 40 map groups
    monkeypatch.setenv("FW2_EXCHANGE_MERGE_FANIN", "2")  # log2(40) merge levels
    tree, tree_str = run(), run_str()
    pd.testing.assert_frame_equal(tree, flat)
    pd.testing.assert_frame_equal(tree_str, flat_str)
    want = (
        pd.concat(frames)
        .groupby(["k", "j"], as_index=False)["v"]
        .sum()
        .sort_values(["k", "j"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(tree, want)


def test_exchange_auto_reducers_byte_sizing():
    """Reducer count follows input bytes past the CPU floor and is
    clamped by the max-reducers guard."""
    from fineweb2_ro_ray.stages.exchange import _auto_reducers

    floor = max(8, 2 * 32)
    assert _auto_reducers(0, 32) == floor
    assert _auto_reducers(10 << 20, 32) == floor  # small input: CPU floor
    assert _auto_reducers(floor * (256 << 20), 32) == floor  # exactly at floor
    assert _auto_reducers(1000 * (256 << 20), 32) == 1000  # byte-sized
    assert _auto_reducers(1 << 60, 32) == 1 << 16  # clamped
    assert _auto_reducers(1, 1) == 8  # min floor


def test_exchange_byte_sized_reducers_end_to_end(ray_session, monkeypatch):
    """Byte-dominated reducer sizing (1-byte partition target, capped
    at a non-power-of-2 23) produces identical results to the default
    CPU-floor sizing — covering many mostly-empty reduce partitions
    flowing through from_arrow_refs with a pinned schema (no row-count
    sync) and without one."""
    import pandas as pd

    from fineweb2_ro_ray.stages.exchange import hash_exchange_map_groups

    rng = np.random.default_rng(13)
    frames = [
        pd.DataFrame(
            {
                "k": [f"g{int(x)}" for x in rng.integers(0, 7, 40)],
                "v": rng.integers(0, 100, 40).astype(np.int64),
            }
        )
        for _ in range(6)
    ]
    out_schema = pa.schema([("k", pa.string()), ("v", pa.int64())])

    def per_part(t: pa.Table) -> pa.Table:
        g = t.group_by("k").aggregate([("v", "sum")])
        return pa.table({"k": g["k"], "v": g["v_sum"]})

    def run() -> pd.DataFrame:
        return (
            hash_exchange_map_groups(
                rd.from_pandas(frames),
                per_part,
                key="k",
                out_schema=out_schema,
                batch_format="pyarrow",
            )
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )

    def run_noschema() -> pd.DataFrame:
        return (
            hash_exchange_map_groups(
                rd.from_pandas(frames),
                lambda df: df.groupby("k", as_index=False)["v"].sum(),
                key="k",
            )
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )

    base, base_ns = run(), run_noschema()
    monkeypatch.setenv("FW2_EXCHANGE_PARTITION_BYTES", "1")
    monkeypatch.setenv("FW2_EXCHANGE_MAX_REDUCERS", "23")
    wide, wide_ns = run(), run_noschema()
    pd.testing.assert_frame_equal(wide, base)
    pd.testing.assert_frame_equal(wide_ns, base_ns)
    want = (
        pd.concat(frames)
        .groupby("k", as_index=False)["v"]
        .sum()
        .sort_values("k")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(wide, want)


def test_exchange_schema_drift_names_schemas():
    """A non-unifiable schema drift across coalesced blocks fails with
    the distinct schemas in the message (not a bare Arrow error)."""
    import pytest

    from fineweb2_ro_ray.stages.exchange import _concat_named

    a = pa.table({"k": pa.array(["x"]), "v": pa.array([1], pa.int64())})
    # null-typed drift (an all-null block whose type Arrow re-inferred
    # as null) promotes losslessly to the pinned type
    c = pa.table({"k": pa.array(["z"]), "v": pa.array([None], pa.null())})
    merged = _concat_named([a, c], "test")
    assert merged.num_rows == 2 and merged["v"].type == pa.int64()
    # TWO DISTINCT NON-NULL types for the same field must raise the
    # named error, even when Arrow could promote them (int32 vs int64,
    # and the int64-vs-float64 id-collapse class): pinned-schema
    # producers never legitimately disagree on a concrete type
    for other in (pa.array([3], pa.int32()), pa.array([3.0], pa.float64())):
        with pytest.raises(ValueError, match="conflicting non-null types"):
            _concat_named([a, pa.table({"k": pa.array(["z"]), "v": other})], "test")
    with pytest.raises(ValueError, match="schema drift"):
        # same-name structurally incompatible types
        d = pa.table({"k": pa.array(["x"]), "v": pa.array([[1]], pa.list_(pa.int64()))})
        _concat_named([a, d], "test")


def test_exact_percentiles_routes_high_cardinality_to_sketch(
    ray_session, caplog
):
    """A continuous float column past max_distinct must auto-route to
    the quantile sketch (logged), with rank error within the sketch
    bound; under the bound the exact path is untouched."""
    import logging

    from fineweb2_ro_ray.stages.analysis import exact_percentiles

    rng = np.random.default_rng(23)
    vals = rng.normal(50.0, 10.0, 4000)  # ~all distinct
    ds = rd.from_arrow(pa.table({"x": pa.array(vals, pa.float64())}))
    qs = [10.0, 50.0, 90.0]

    exact = exact_percentiles(ds, "x", qs)  # default bound: exact path
    want = {q: float(np.percentile(vals, q)) for q in qs}
    for q, v in zip(exact["q"], exact["value"]):
        assert abs(v - want[q]) < 1e-9

    with caplog.at_level(logging.WARNING, "fineweb2_ro_ray.stages.analysis"):
        approx = exact_percentiles(ds, "x", qs, max_distinct=100)
    assert any("quantile_sketch" in r.message for r in caplog.records)
    srt = np.sort(vals)
    for q, v in zip(approx["q"], approx["value"]):
        # rank error <= 3/m (m=256) of n=4000 → ~47 ranks; assert loose
        rank = np.searchsorted(srt, v)
        assert abs(rank - q / 100.0 * len(srt)) < 0.05 * len(srt)


def test_lm_artifact_roundtrip_and_scorer_paths(ray_session, tmp_path):
    """save_lm_artifact → load_lm_model must equal the in-memory fit
    exactly (vocab, counts, packed keys, total_tokens), and the
    broadcast / per-actor scorer paths must produce identical ppl."""
    from fineweb2_ro_ray.stages.lm import (
        fit_word_bigram_counts,
        lm_artifact_nbytes,
        load_lm_model,
        save_lm_artifact,
        score_word_bigram,
        score_word_bigram_artifact,
    )

    rng = np.random.default_rng(19)
    vocab = [f"w{i}" for i in range(15)]
    texts = [
        " ".join(vocab[int(x)] for x in rng.integers(0, len(vocab), int(k)))
        for k in rng.integers(0, 12, 120)
    ]
    t = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": pa.array(texts)}
    )
    ds = rd.from_arrow(t)

    fit = fit_word_bigram_counts(ds, min_count=2)
    meta = save_lm_artifact(ds, str(tmp_path / "lm"), min_count=2, n_parts=5)
    assert meta["total_tokens"] == fit["total_tokens"]
    loaded = load_lm_model(str(tmp_path / "lm"))
    assert loaded["vocab"].equals(fit["vocab"])
    assert (loaded["uni_counts"] == fit["uni_counts"]).all()
    assert (loaded["bigram_keys"] == fit["bigram_keys"]).all()
    assert (loaded["bigram_counts"] == fit["bigram_counts"]).all()
    assert lm_artifact_nbytes(str(tmp_path / "lm")) > 0

    import ray as _ray

    base = (
        score_word_bigram(ds, _ray.put(fit))
        .to_pandas()
        .sort_values("doc_id")["lm_ppl"]
        .to_numpy()
    )
    for kwargs in (
        {},  # broadcast route (artifact is tiny)
        {"max_broadcast_bytes": 0, "concurrency": 2},  # force actor route
    ):
        got = (
            score_word_bigram_artifact(ds, str(tmp_path / "lm"), **kwargs)
            .to_pandas()
            .sort_values("doc_id")["lm_ppl"]
            .to_numpy()
        )
        assert (got == base).all()
    # past the actor bound: the in-place scorer refuses (appending a
    # column needs a resident model)...
    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        score_word_bigram_artifact(
            ds, str(tmp_path / "lm"), max_broadcast_bytes=0, max_actor_bytes=0
        )
    # re-fitting INTO THE SAME PATH with fewer partitions must clear
    # the prior artifact: stale part=K files from the 5-part fit would
    # otherwise be silently mixed into the 2-part model (review item)
    half = rd.from_arrow(t.slice(0, 60))
    save_lm_artifact(half, str(tmp_path / "lm"), min_count=2, n_parts=2)
    refit = load_lm_model(str(tmp_path / "lm"))
    fresh_fit = fit_word_bigram_counts(half, min_count=2)
    assert refit["vocab"].equals(fresh_fit["vocab"])
    assert (refit["bigram_keys"] == fresh_fit["bigram_keys"]).all()
    assert (refit["bigram_counts"] == fresh_fit["bigram_counts"]).all()
    # ...and the exchange-join path scores without any resident model:
    # each reduce task reads exactly one artifact partition. Equal to
    # the broadcast scorer up to float summation order; OOV-only,
    # empty and None docs hit the 0.0 convention identically.
    from fineweb2_ro_ray.stages.lm import score_word_bigram_exchange

    texts2 = texts[:]
    texts2[3] = None
    texts2[5] = ""
    texts2[7] = "zzz qqq xxx"  # OOV-only
    t2 = pa.table(
        {"doc_id": pa.array(range(len(texts2)), pa.int64()), "text": pa.array(texts2)}
    )
    ds2 = rd.from_arrow(t2)
    fit2 = fit_word_bigram_counts(ds2, min_count=2)
    save_lm_artifact(ds2, str(tmp_path / "lm2"), min_count=2, n_parts=5)
    b2 = (
        score_word_bigram(ds2, _ray.put(fit2))
        .to_pandas()
        .sort_values("doc_id")["lm_ppl"]
        .to_numpy()
    )
    e2 = (
        score_word_bigram_exchange(ds2, str(tmp_path / "lm2"))
        .to_pandas()
        .sort_values("doc_id")["lm_ppl"]
        .to_numpy()
    )
    assert len(e2) == len(b2)
    assert np.allclose(e2, b2, rtol=1e-9)


def test_lm_ppl_matches_pure_python_oracle(ray_session):
    """The corpus-trained word-bigram LM: fit counts are exact, and
    every document's add-alpha perplexity matches an independent
    pure-Python recompute; results are identical across batch sizes
    (per-doc fixed-order reduction)."""
    import math

    from fineweb2_ro_ray.stages.lm import fit_word_bigram_counts, lm_ppl_pipeline

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(12)]
    texts, ids = [], []
    for i in range(80):
        k = int(rng.integers(0, 9))
        words = [vocab[int(x)] for x in rng.integers(0, len(vocab), k)]
        t = " ".join(words)
        if i % 11 == 4:
            t += "  "  # doubled separator: empty word must be dropped
        texts.append(t if i % 17 else None)
        ids.append(i)
    t = pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)})

    # pure-Python oracle
    from collections import Counter

    uni, bi = Counter(), Counter()
    docs_words = []
    for txt in texts:
        ws = [w for w in (txt or "").split(" ") if w]
        docs_words.append(ws)
        uni.update(ws)
        bi.update(zip(ws, ws[1:]))
    min_count, alpha = 2, 1.0
    V = sum(1 for w, c in uni.items() if c >= min_count)
    vv = {w for w, c in uni.items() if c >= min_count}
    bi_kept = {p: c for p, c in bi.items() if c >= min_count and p[0] in vv and p[1] in vv}

    def oracle_ppl(ws):
        pairs = list(zip(ws, ws[1:]))
        if not pairs:
            return 0.0
        s = 0.0
        for w1, w2 in pairs:
            c2 = bi_kept.get((w1, w2), 0) if (w1 in vv and w2 in vv) else 0
            c1 = uni[w1] if w1 in vv else 0
            s += math.log(c2 + alpha) - math.log(c1 + alpha * (V + 1))
        return math.exp(-s / len(pairs))

    for bs in (7, 80):
        ds = rd.from_arrow(t).map_batches(
            lambda b: b, batch_format="pyarrow", batch_size=bs
        )
        model = fit_word_bigram_counts(ds, min_count=min_count, alpha=alpha)
        assert len(model["vocab"]) == V
        got = (
            lm_ppl_pipeline(ds, min_count=min_count, alpha=alpha)
            .to_pandas()
            .sort_values("doc_id")["lm_ppl"]
            .to_numpy()
        )
        want = np.array([oracle_ppl(ws) for ws in docs_words])
        assert np.allclose(got, want, rtol=1e-12), np.abs(got - want).max()
