"""Distributed training of the multi-task scorer heads — the engine's
restatement of the reference's fine-tuning stage.

Reference semantics (``/root/reference/training/all_tasks_bert.py:556-684``,
``multitask_bert.py``): fine-tune one shared encoder with a regression
head (score) plus three classification heads (topic / format /
age_group) over LLM-annotated documents, then evaluate RMSE / MAE /
accuracy per head (``small_model_inference/results.ipynb``). Here the
encoder is the engine's hashed bag-of-words featurizer (the same space
``FrozenLinearModel`` scores in), and the heads are trained with two
Ray-Data-native distributed algorithms — no driver-side data pull, no
parameter server:

- :func:`fit_linear_head` — EXACT ridge regression by distributed
  normal equations: one ``map_batches`` pass emits per-batch partial
  Gram matrices (Xᵀ X, Xᵀ y) that sum in the object store via Ray's
  aggregate tree; the driver solves the d×d system (d = 256). One pass
  over 100 TB, driver memory O(d²).

- :func:`fit_softmax_head` — multinomial logistic regression by
  full-batch Adam: per iteration, weights are broadcast via
  ``ray.put`` and ONE ``map_batches`` pass reduces the exact gradient
  (partials summed per batch, d×c floats each); the Adam step runs on
  the driver. Deterministic (no sampling), reproducible across block
  layouts up to float summation order.

Scale shape: every pass is a streaming map over Arrow batches with a
sum-of-partials reduction (the same combiner-then-thin-aggregate
pattern as grouped_counts); nothing materializes the dataset. The
GPU swap-in point mirrors scoring: replace the featurizer + heads with
a real model class and train via torch DDP outside the engine — this
module trains the engine's OWN stand-in so the whole
annotate → train → score → filter loop runs end-to-end in-sandbox.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..stages.model_scoring import _DIM, TASKS, FrozenLinearModel


def _sum_list_col(ds: ray.data.Dataset, col: str, size: int) -> np.ndarray:
    """Driver-side sum of a small list<float> partial column (one row
    per input batch — thousands of rows of size ``size``, not data)."""
    acc = np.zeros(size, dtype=np.float64)
    for b in ds.select_columns([col]).iter_batches(batch_format="pyarrow"):
        arr = b[col]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        flat = arr.flatten().to_numpy(zero_copy_only=False)
        acc += flat.reshape(-1, size).sum(axis=0)
    return acc


def fit_linear_head(
    ds: ray.data.Dataset,
    *,
    text_col: str = "text",
    y_col: str = "score",
    l2: float = 1e-6,
) -> np.ndarray:
    """Exact ridge regression weights for the score head (distributed
    normal equations; see module docstring). Returns w (d+1,) with the
    intercept LAST (features are augmented with a constant 1)."""

    def partial(b: pa.Table) -> pa.Table:
        texts = pc.fill_null(b[text_col], "").to_pylist()
        x = FrozenLinearModel._features(texts)
        x = np.concatenate([x, np.ones((len(x), 1))], axis=1)
        y = b[y_col].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "xtx": pa.array([(x.T @ x).reshape(-1)], pa.list_(pa.float64())),
                "xty": pa.array([x.T @ y], pa.list_(pa.float64())),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").materialize()
    d = _DIM + 1
    xtx = _sum_list_col(parts, "xtx", d * d).reshape(d, d)
    xty = _sum_list_col(parts, "xty", d)
    return np.linalg.solve(xtx + l2 * np.eye(d), xty)


def fit_softmax_head(
    ds: ray.data.Dataset,
    labels: list[str],
    *,
    text_col: str = "text",
    label_col: str,
    n_iter: int = 80,
    lr: float = 0.5,
    l2: float = 1e-6,
) -> np.ndarray:
    """Multinomial logistic head by distributed full-batch Adam.
    Returns W (d+1, c), intercept row LAST. Each iteration: broadcast
    W once (``ray.put``), one streaming pass reduces the EXACT
    gradient (no sampling — deterministic and reproducible across
    block layouts); the driver applies the Adam step. Plain GD needs
    thousands of iterations on these 1/len-normalized hashed features
    (ill-conditioned); full-batch Adam reaches separation in tens."""
    c = len(labels)
    d = _DIM + 1
    lab_to_idx = {l: i for i, l in enumerate(labels)}
    w = np.zeros((d, c), dtype=np.float64)

    # featurize + one-hot ONCE, keep the compact design matrix blocks in
    # the object store (score-scale features: d floats/row ≈ the text
    # itself; at 100 TB one would re-featurize per pass instead — flip
    # `cache` off to do that)
    empty_feats = pa.table(
        {"x": pa.array([], pa.list_(pa.float64())), "y": pa.array([], pa.int64())}
    )

    def feats(b: pa.Table) -> pa.Table:
        texts = pc.fill_null(b[text_col], "").to_pylist()
        yi = np.array(
            [lab_to_idx.get(v, -1) for v in b[label_col].to_pylist()], np.int64
        )
        keep = yi >= 0
        if not keep.any():
            # all labels absent/unknown: reshape(0, -1) would raise
            return empty_feats
        x = FrozenLinearModel._features([texts[i] for i in np.flatnonzero(keep)])
        x = np.concatenate([x, np.ones((len(x), 1))], axis=1)
        yi = yi[keep]
        return pa.table(
            {
                "x": pa.array(list(x), pa.list_(pa.float64())),
                "y": pa.array(yi, pa.int64()),
            }
        )

    fds = ds.map_batches(feats, batch_format="pyarrow").materialize()

    n_total = fds.count()
    if n_total == 0:
        return w
    m = np.zeros_like(w)
    v = np.zeros_like(w)
    b1, b2, eps = 0.9, 0.999, 1e-8
    for it in range(1, n_iter + 1):
        w_ref = ray.put(w)

        def grad_partial(b: pa.Table, w_ref=w_ref) -> pa.Table:
            if b.num_rows == 0:
                return pa.table(
                    {"g": pa.array([np.zeros(d * c)], pa.list_(pa.float64()))}
                )
            W = ray.get(w_ref)
            xs = b["x"]
            if isinstance(xs, pa.ChunkedArray):
                xs = xs.combine_chunks()
            x = xs.flatten().to_numpy(zero_copy_only=False).reshape(b.num_rows, -1)
            y = b["y"].to_numpy(zero_copy_only=False)
            logits = x @ W
            logits -= logits.max(axis=1, keepdims=True)
            e = np.exp(logits)
            p = e / e.sum(axis=1, keepdims=True)
            p[np.arange(len(y)), y] -= 1.0
            g = x.T @ p
            return pa.table(
                {"g": pa.array([g.reshape(-1)], pa.list_(pa.float64()))}
            )

        gp = fds.map_batches(grad_partial, batch_format="pyarrow").materialize()
        g = _sum_list_col(gp, "g", d * c).reshape(d, c) / n_total + l2 * w
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        mh = m / (1 - b1**it)
        vh = v / (1 - b2**it)
        w = w - lr * mh / (np.sqrt(vh) + eps)
    return w


def train_multitask_heads(
    ds: ray.data.Dataset,
    *,
    text_col: str = "text",
    score_col: str = "score",
    task_cols: dict[str, str] | None = None,
    n_iter: int = 60,
) -> dict[str, np.ndarray]:
    """Train ALL heads the reference fine-tunes (score regression +
    one softmax head per task, ``all_tasks_bert.py:556-684``). Returns
    {"score": w, task: W, ...}."""
    task_cols = task_cols or {t: f"{t}_label" for t in TASKS}
    out: dict[str, np.ndarray] = {
        "score": fit_linear_head(ds, text_col=text_col, y_col=score_col)
    }
    for task, col in task_cols.items():
        out[task] = fit_softmax_head(
            ds, TASKS[task], text_col=text_col, label_col=col, n_iter=n_iter
        )
    return out


def evaluate_models(
    ds: ray.data.Dataset,
    pred_cols: dict[str, str],
    gold_col: str,
    *,
    as_int: bool = False,
) -> "pd.DataFrame":
    """Per-model comparison harness — the reference's LLM-benchmark
    loop (``benchmark/benchmark_llms.py:65-96``: several models scored
    against human labels, RMSE / MAE / accuracy each). ``pred_cols``
    maps model name → its prediction column; metrics are computed in
    ONE distributed pass of per-batch sufficient-stat partials
    (Σerr², Σ|err|, Σhit, n) summed on the driver. Returns a small
    DataFrame (model, rmse, mae, accuracy, n)."""
    import pandas as pd

    names = list(pred_cols)

    def partial(b: pa.Table) -> pa.Table:
        gold = b[gold_col].to_numpy(zero_copy_only=False).astype(np.float64)
        rows = {"model": names}
        se, ae, hit, n = [], [], [], []
        for m in names:
            pred = b[pred_cols[m]].to_numpy(zero_copy_only=False).astype(np.float64)
            ok = ~(np.isnan(pred) | np.isnan(gold))
            p, g = pred[ok], gold[ok]
            if as_int:
                p = np.rint(p)
            se.append(float(((p - g) ** 2).sum()))
            ae.append(float(np.abs(p - g).sum()))
            hit.append(int((p == g).sum()))
            n.append(int(ok.sum()))
        rows.update({"se": se, "ae": ae, "hit": hit, "n": n})
        return pa.table(rows)

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    agg = parts.groupby("model", as_index=False)[["se", "ae", "hit", "n"]].sum()
    agg["rmse"] = np.sqrt(agg["se"] / agg["n"])
    agg["mae"] = agg["ae"] / agg["n"]
    agg["accuracy"] = agg["hit"] / agg["n"]
    return agg[["model", "rmse", "mae", "accuracy", "n"]].sort_values(
        "model", ignore_index=True
    )
