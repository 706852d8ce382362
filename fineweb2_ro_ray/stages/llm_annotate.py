"""A3: LLM annotation stage — the reference's big-inference shape with
a deterministic stub generator.

Reference semantics (``/root/reference/fineweb/big_inference.py``):
load the model once per GPU worker (``:160-167``), truncate each
document to fit the context budget (ctx 32768 − 512 output tokens,
``:31-32,190-199``), greedy-generate an annotation block (``:211-219``),
then parse it with the ``key: value`` parser, degrading to ``"ERROR"``
sentinels instead of failing (``:84-115``).

No GPU/LLM exists in this sandbox, so generation is STUBBED with a
deterministic template over text features — but the stage mechanics are
real: actor-pool with per-actor model state, the truncation policy, the
per-doc generate → parse loop, and the accreted output columns
(``output, int_score, topic, subtopic, format, age_group,
explanation``). Swap ``_generate`` for a real model call without
touching the pipeline.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data

from ..functions.parse import DEFAULT_KEYMAP, parse_kv_text

CTX_BUDGET_CHARS = 32_768 * 4  # the ref's token budget, char-approximated
OUTPUT_RESERVE_CHARS = 512 * 4

# M9 prompt construction (reference builds a fixed instruction prefix +
# document + answer-format suffix around each doc and pre-computes the
# prefix/suffix cost once, ``big_inference.py:31-39,190-199``).
PROMPT_PREFIX = (
    "Evalueaza calitatea educationala a documentului urmator pentru un "
    "corpus de antrenare in limba romana.\n\n<document>\n"
)
PROMPT_SUFFIX = (
    "\n</document>\n\nRaspunde EXACT in formatul:\n"
    "* scor: <0-5>\n* explicatie: <o fraza>\n* tema: <tema>\n"
    "* format: <format>\n* grupa de varsta: <grupa>"
)


def build_prompt(
    text: str,
    *,
    ctx_chars: int = CTX_BUDGET_CHARS,
    reserve_chars: int = OUTPUT_RESERVE_CHARS,
) -> str:
    """Truncate-to-fit prompt assembly: the document keeps whatever
    budget remains after the generation reserve and the fixed prefix/
    suffix (their cost is a module constant, computed once — the
    reference pre-tokenizes them once per worker)."""
    budget = ctx_chars - reserve_chars - len(PROMPT_PREFIX) - len(PROMPT_SUFFIX)
    return PROMPT_PREFIX + (text or "")[: max(0, budget)] + PROMPT_SUFFIX


class LLMAnnotator:
    """Actor-pool stage: one annotation per document (batch_size small —
    generation dominates; the reference uses batch 1 per GPU)."""

    def __init__(self, text_col: str = "text") -> None:
        self.text_col = text_col
        # model load would happen here, once per actor (ref :160-167)

    def _generate(self, prompt: str) -> str:
        """Deterministic stub for greedy generation over the FULL
        prompt (M9 assembly is real; only the model call is fake):
        scores length features of the embedded document into the
        reference's output template."""
        start = prompt.find("<document>\n") + len("<document>\n")
        end = prompt.rfind("\n</document>")
        text = prompt[start:end]
        words = text.split()
        score = min(5, len(set(words)) % 6)
        topic = ["stiri", "educatie", "divertisment"][len(words) % 3]
        fmt = ["articol", "blog", "forum"][len(text) % 3]
        return (
            f"* scor: {score}\n"
            f"* explicatie: text cu {len(words)} cuvinte\n"
            f"* tema: {topic}\n"
            f"* format: {fmt}\n"
            f"* grupa de varsta: adulti"
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        texts = pc.fill_null(batch[self.text_col], "").to_pylist()
        outputs = [self._generate(build_prompt(t)) for t in texts]
        parsed = [parse_kv_text(o) for o in outputs]
        batch = batch.append_column("output", pa.array(outputs, pa.string()))
        for field in DEFAULT_KEYMAP.values():
            batch = batch.append_column(
                field, pa.array([p[field] for p in parsed], pa.string())
            )
        return batch


def annotate_llm(
    ds: ray.data.Dataset,
    *,
    batch_size: int = 64,
    concurrency=(1, 4),
    num_gpus: float = 0,
    num_cpus: float | None = None,
) -> ray.data.Dataset:
    """``num_gpus``: per-actor GPU share for the real-LLM swap-in (the
    reference runs 2 vLLM workers × 1 GPU with strided shard
    assignment, ``fineweb/big_inference.py:251``; on a GPU cluster pass
    ``num_gpus=1`` and the actor pool lands on GPU nodes — the
    deterministic stub needs none)."""
    kw = {}
    if num_gpus:
        kw["num_gpus"] = num_gpus
    if num_cpus is not None:
        kw["num_cpus"] = num_cpus
    return ds.map_batches(
        LLMAnnotator, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, **kw,
    )
