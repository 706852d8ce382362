from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from fineweb2_ro_ray.stages.drift import word_drift_chi2, word_side_partials


def _ref_chi2(texts_a: list[str], texts_b: list[str], top_k: int) -> pd.DataFrame:
    rows: dict[str, list[int]] = {}
    for side, texts in ((0, texts_a), (1, texts_b)):
        for t in texts:
            for w in t.split(" "):
                rows.setdefault(w, [0, 0])[side] += 1
    df = pd.DataFrame(
        [(w, c[0], c[1]) for w, c in rows.items()],
        columns=["word", "cnt_a", "cnt_b"],
    )
    ta, tb = float(df["cnt_a"].sum()), float(df["cnt_b"].sum())
    o11 = df["cnt_a"].to_numpy(np.float64)
    o12 = df["cnt_b"].to_numpy(np.float64)
    o21, o22 = ta - o11, tb - o12
    d = o11 * o22 - o12 * o21
    df["chi2"] = ((ta + tb) * d * d) / ((o11 + o12) * (o21 + o22) * ta * tb)
    return (
        df.sort_values(["chi2", "word"], ascending=[False, True])
        .head(top_k)
        .reset_index(drop=True)
    )


def test_word_drift_matches_reference_with_topk_boundary():
    rng = np.random.default_rng(11)
    vocab = [f"w{i:03d}" for i in range(400)]
    # side A skews towards the low vocab ids, side B towards the high
    texts_a = [
        " ".join(rng.choice(vocab[:300], size=20)) for _ in range(150)
    ]
    texts_b = [
        " ".join(rng.choice(vocab[100:], size=20)) for _ in range(150)
    ]
    t = pa.table(
        {
            "text": texts_a + texts_b,
            "side": pa.array(
                [0] * len(texts_a) + [1] * len(texts_b), pa.int8()
            ),
        }
    )
    got = (
        word_drift_chi2(rd.from_arrow(t), top_k=50)
        .to_pandas()
        .reset_index(drop=True)
    )
    want = _ref_chi2(texts_a, texts_b, 50)
    assert list(got.columns) == ["word", "cnt_a", "cnt_b", "chi2"]
    pd.testing.assert_frame_equal(got, want, check_exact=True)


def test_word_side_partials_null_and_empty_tokens():
    b = pa.table(
        {
            "text": ["a  b", None, ""],
            "side": pa.array([0, 0, 1], pa.int8()),
        }
    )
    out = word_side_partials(b, "text", "side").to_pandas()
    out = out.sort_values("word").reset_index(drop=True)
    # "a  b" -> ["a", "", "b"]; "" -> [""]; NULL -> nothing
    assert list(out["word"]) == ["", "a", "b"]
    assert list(out["cnt_a"]) == [1, 1, 1]
    assert list(out["cnt_b"]) == [1, 0, 0]
