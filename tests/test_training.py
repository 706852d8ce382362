"""Distributed training loop (training/trainer.py): the engine's analog
of the reference's multitask fine-tune (training/all_tasks_bert.py) and
model-benchmark harness (benchmark/benchmark_llms.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from fineweb2_ro_ray.stages.model_scoring import FrozenLinearModel, score_documents
from fineweb2_ro_ray.training import (
    evaluate_models,
    fit_linear_head,
    fit_softmax_head,
)


def _corpus(n=600, seed=3):
    rng = np.random.default_rng(seed)
    vocab = [f"cuv{i}" for i in range(300)]
    texts = [
        " ".join(rng.choice(vocab, size=int(rng.integers(5, 30))))
        for _ in range(n)
    ]
    return texts


def test_linear_head_recovers_frozen_score_exactly():
    """The frozen score IS linear in the hashed-feature space, so exact
    distributed normal equations must recover it to float precision —
    the distillation closed loop (annotate -> train -> score)."""
    texts = _corpus()
    model = FrozenLinearModel()
    y = model.predict(texts)["score"]
    ds = rd.from_arrow(pa.table({"text": texts, "score": y}))
    w = fit_linear_head(ds, l2=1e-9)
    x = FrozenLinearModel._features(texts)
    pred = x @ w[:-1] + w[-1]
    assert float(np.sqrt(((pred - y) ** 2).mean())) < 1e-6
    # block-layout robustness: a different partitioning changes float
    # summation order in the Gram partials (~1e-6 weight wiggle on this
    # ill-conditioned system) but predictions must agree
    w2 = fit_linear_head(ds.repartition(7), l2=1e-9)
    pred2 = x @ w2[:-1] + w2[-1]
    assert float(np.abs(pred - pred2).max()) < 1e-4


def test_softmax_head_learns_frozen_topic_labels():
    texts = _corpus(800)
    model = FrozenLinearModel()
    probs = model.predict(texts)["topic"]
    from fineweb2_ro_ray.stages.model_scoring import TASKS

    labels = [TASKS["topic"][i] for i in probs.argmax(axis=1)]
    ds = rd.from_arrow(pa.table({"text": texts, "topic_label": labels}))
    W = fit_softmax_head(
        ds, TASKS["topic"], label_col="topic_label", n_iter=80
    )
    x = FrozenLinearModel._features(texts)
    x = np.concatenate([x, np.ones((len(x), 1))], axis=1)
    pred = x @ W
    acc = (pred.argmax(axis=1) == probs.argmax(axis=1)).mean()
    assert acc > 0.9, acc


def test_evaluate_models_hand_checked():
    df = pd.DataFrame(
        {
            "gold": [3.0, 4.0, 2.0, 5.0],
            "m_a": [3.0, 4.0, 2.0, 5.0],  # perfect
            "m_b": [2.0, 4.0, 2.0, 4.0],  # off by 1 twice
        }
    )
    out = evaluate_models(
        rd.from_pandas(df), {"a": "m_a", "b": "m_b"}, "gold"
    )
    a = out[out["model"] == "a"].iloc[0]
    b = out[out["model"] == "b"].iloc[0]
    assert a["rmse"] == 0.0 and a["accuracy"] == 1.0
    assert abs(b["rmse"] - np.sqrt(0.5)) < 1e-12
    assert b["mae"] == 0.5 and b["accuracy"] == 0.5 and b["n"] == 4


def test_distillation_end_to_end_metrics():
    """annotate (frozen scorer) -> train student heads -> evaluate:
    the full reference loop in-engine."""
    texts = _corpus(400, seed=9)
    ds = rd.from_arrow(pa.table({"doc_id": range(len(texts)), "text": texts}))
    scored = score_documents(ds, concurrency=(1, 2)).materialize()
    w = fit_linear_head(scored, y_col="score", l2=1e-9)

    def student(b: pa.Table) -> pa.Table:
        x = FrozenLinearModel._features(
            [t or "" for t in b["text"].to_pylist()]
        )
        pred = x @ w[:-1] + w[-1]
        return b.append_column("student_score", pa.array(pred, pa.float64()))

    both = scored.map_batches(student, batch_format="pyarrow")
    m = evaluate_models(
        both, {"teacher": "score", "student": "student_score"}, "score"
    )
    st = m[m["model"] == "student"].iloc[0]
    assert st["rmse"] < 1e-6 and st["n"] == 400
