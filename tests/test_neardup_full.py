"""Round-5 composed near-dedup funnel (VERDICT r4 #1) and the LAG/LEAD
window op (VERDICT r4 #5)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from fineweb2_ro_ray.stages.dedup import minhash_dedup_full, near_dedup_full
from fineweb2_ro_ray.stages.windows import lag_lead_delta


def _docs(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    )


def test_near_dedup_full_clusters_and_singletons(ray_session):
    # pair graph: {1,2,3} chained cluster, {10,11} cluster, 20/21 singletons
    docs = _docs(
        [(1, "a"), (2, "a"), (3, "a"), (10, "b"), (11, "b"), (20, "c"), (21, "d")]
    )
    pairs = ray.data.from_arrow(
        pa.table(
            {
                "doc_a": pa.array([1, 2, 10], pa.int64()),
                "doc_b": pa.array([2, 3, 11], pa.int64()),
            }
        )
    )
    out = near_dedup_full(docs, pairs, keep_all=True).to_pandas()
    out = out.sort_values("doc_id", ignore_index=True)
    assert list(out["doc_id"]) == [1, 2, 3, 10, 11, 20, 21]
    assert list(out["cluster_size"]) == [3, 3, 3, 2, 2, 1, 1]
    # survivor = MIN doc id per cluster; singletons always kept
    assert list(out["kept"]) == [True, False, False, True, False, True, True]
    # ds columns ride along untouched
    assert "text" in out.columns

    survivors = near_dedup_full(docs, pairs).to_pandas()
    assert sorted(survivors["doc_id"]) == [1, 10, 20, 21]
    assert "kept" not in survivors.columns


def test_near_dedup_full_no_pairs(ray_session):
    docs = _docs([(5, "x"), (6, "y")])
    pairs = ray.data.from_arrow(
        pa.table(
            {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())}
        )
    )
    out = near_dedup_full(docs, pairs, keep_all=True).to_pandas()
    assert sorted(out["doc_id"]) == [5, 6]
    assert set(out["cluster_size"]) == {1}
    assert out["kept"].all()


def test_minhash_dedup_full_end_to_end(ray_session):
    # two exact-duplicate families + distinct docs: LSH must pair the
    # identical texts (identical signatures collide in every band)
    base = "the quick brown fox jumps over the lazy dog again and again"
    other = "entirely different words compose this second document body text"
    rows = [(i, base) for i in range(4)] + [(10 + i, other) for i in range(3)]
    rows += [(100, "unique text one for the corpus"), (101, "another standalone body")]
    docs = _docs(rows)
    out = minhash_dedup_full(docs, threshold=0.9, keep_all=True).to_pandas()
    out = out.sort_values("doc_id", ignore_index=True)
    by_id = dict(zip(out["doc_id"], out["cluster_size"]))
    assert [by_id[i] for i in range(4)] == [4, 4, 4, 4]
    assert [by_id[10 + i] for i in range(3)] == [3, 3, 3]
    assert by_id[100] == by_id[101] == 1
    kept = set(out[out["kept"]]["doc_id"])
    assert kept == {0, 10, 100, 101}


def test_lag_lead_delta_matches_pandas_oracle(ray_session):
    rng = np.random.default_rng(7)
    n = 500
    df = pd.DataFrame(
        {
            "user_id": rng.integers(0, 20, n),
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 10_000, n), unit="s"),
            "value": rng.uniform(0, 50, n).round(2),
        }
    )
    ds = ray.data.from_pandas(df)
    got = (
        lag_lead_delta(ds)
        .to_pandas()
        .sort_values(["user_id", "event_id"], ignore_index=True)
    )

    exp = df.copy()
    exp["cents"] = (exp["value"] * 100).round().astype(np.int64)
    exp = exp.sort_values(["user_id", "ts", "event_id"], ignore_index=True)
    g = exp.groupby("user_id", sort=False)
    exp["prev_event_id"] = g["event_id"].shift(1).fillna(-1).astype(np.int64)
    exp["next_event_id"] = g["event_id"].shift(-1).fillna(-1).astype(np.int64)
    exp["delta_cents"] = (exp["cents"] - g["cents"].shift(1)).fillna(0).astype(np.int64)
    exp = exp[
        ["user_id", "event_id", "cents", "prev_event_id", "next_event_id", "delta_cents"]
    ].sort_values(["user_id", "event_id"], ignore_index=True)

    pd.testing.assert_frame_equal(got[exp.columns.tolist()], exp)


def test_lag_lead_delta_single_row_keys(ray_session):
    df = pd.DataFrame(
        {
            "user_id": [1, 2],
            "event_id": np.array([7, 8], np.int64),
            "ts": pd.to_datetime(["2024-01-01", "2024-01-02"]),
            "value": [1.25, 2.50],
        }
    )
    out = lag_lead_delta(ray.data.from_pandas(df)).to_pandas()
    assert set(out["prev_event_id"]) == {-1}
    assert set(out["next_event_id"]) == {-1}
    assert set(out["delta_cents"]) == {0}
    assert sorted(out["cents"]) == [125, 250]


def test_minhash_dedup_full_collapse_exact_equivalence(ray_session):
    """The exact-duplicate star pre-collapse (hot-bucket defense) must
    leave clusters, sizes, and survivors IDENTICAL: exact families are
    J=1 cliques and a clique's components equal its star's."""
    base = "the quick brown fox jumps over the lazy dog again and again"
    near = base.replace("lazy", "hazy")
    other = "entirely different words compose this second document body text"
    rows = (
        [(i, base) for i in range(6)]        # exact family
        + [(50, near)]                        # near-dup of the family
        + [(10 + i, other) for i in range(3)]  # second exact family
        + [(100, "unique text one for the corpus"), (101, "another standalone body")]
    )
    docs = _docs(rows)
    a = (
        minhash_dedup_full(docs, threshold=0.5, keep_all=True, mode="pairs", collapse_exact=True)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    b = (
        minhash_dedup_full(docs, threshold=0.5, keep_all=True, mode="pairs", collapse_exact=False)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    pd.testing.assert_frame_equal(
        a[["doc_id", "cluster_size", "kept"]], b[["doc_id", "cluster_size", "kept"]]
    )
    # the near-dup rides with the exact family through its representative
    by_id = dict(zip(a["doc_id"], a["cluster_size"]))
    assert by_id[50] == 7 and by_id[0] == 7
    assert set(a[a["kept"]]["doc_id"]) == {0, 10, 100, 101}


def test_minhash_dedup_full_cluster_mode_matches_pairs_mode(ray_session):
    """Default cluster mode (datatrove bucket-union star edges) finds
    the same clusters as the pairwise path on a corpus of clear-cut
    families (exact dups + a near-dup + singletons)."""
    base = "the quick brown fox jumps over the lazy dog again and again"
    near = base.replace("lazy", "hazy")
    other = "entirely different words compose this second document body text"
    rows = (
        [(i, base) for i in range(5)]
        + [(50, near)]
        + [(10 + i, other) for i in range(3)]
        + [(100, "unique text one for the corpus"), (101, "another standalone body")]
    )
    docs = _docs(rows)
    a = (
        minhash_dedup_full(docs, keep_all=True)  # cluster mode default
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    b = (
        minhash_dedup_full(docs, threshold=0.5, keep_all=True, mode="pairs")
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    pd.testing.assert_frame_equal(
        a[["doc_id", "cluster_size", "kept"]], b[["doc_id", "cluster_size", "kept"]]
    )
    by_id = dict(zip(a["doc_id"], a["cluster_size"]))
    assert by_id[0] == 6 and by_id[50] == 6 and by_id[10] == 3 and by_id[100] == 1


def test_range_frame_sum_peers_and_window(ray_session):
    """RANGE frame semantics: tied timestamps are peers (both see the
    full frame total), events outside the trailing interval fall out,
    and keys are isolated."""
    from fineweb2_ro_ray.stages.windows import range_frame_sum

    df = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 1, 2],
            "event_id": np.array([1, 2, 3, 4, 5], np.int64),
            "ts": pd.to_datetime(
                [
                    "2024-01-01 00:00:00",
                    "2024-01-01 00:30:00",
                    "2024-01-01 00:30:00",  # peer of event 2
                    "2024-01-01 02:00:00",  # outside 1h of everything
                    "2024-01-01 00:10:00",  # other key
                ]
            ),
            "value": [1.00, 2.00, 3.00, 4.00, 50.00],
        }
    )
    out = (
        range_frame_sum(ray.data.from_pandas(df), window_s=3600)
        .to_pandas()
        .set_index("event_id")["range_cents"]
        .to_dict()
    )
    assert out[1] == 100
    assert out[2] == out[3] == 600  # peers: 100+200+300 each
    assert out[4] == 400            # only itself
    assert out[5] == 5000           # key isolation


def test_round5_ops_layout_invariant(ray_session):
    """Determinism across block layouts: the funnel, LAG/LEAD, and the
    RANGE frame produce identical results whatever the input
    partitioning (the engine's parallelism-invariance contract)."""
    rng = np.random.default_rng(11)
    texts = [
        " ".join(
            rng.choice(["alpha", "beta", "gamma", "delta", "epsilon"], 12)
        )
        for _ in range(60)
    ] * 3  # plenty of exact dups
    docs = _docs(list(enumerate(texts)))

    a = (
        minhash_dedup_full(docs, keep_all=True)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    b = (
        minhash_dedup_full(docs.repartition(7), keep_all=True)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    pd.testing.assert_frame_equal(a, b)

    from fineweb2_ro_ray.stages.windows import lag_lead_delta, range_frame_sum

    n = 400
    ev = pd.DataFrame(
        {
            "user_id": rng.integers(0, 15, n),
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.Timestamp("2024-03-01")
            + pd.to_timedelta(rng.integers(0, 50_000, n), unit="s"),
            "value": rng.uniform(0, 30, n).round(2),
        }
    )
    for op in (lag_lead_delta, range_frame_sum):
        x = (
            op(ray.data.from_pandas(ev))
            .to_pandas()
            .sort_values(["user_id", "event_id"], ignore_index=True)
        )
        y = (
            op(ray.data.from_pandas(ev).repartition(9))
            .to_pandas()
            .sort_values(["user_id", "event_id"], ignore_index=True)
        )
        pd.testing.assert_frame_equal(x, y)
