"""The flagship pipeline: transcript quality filtering.

Ray Data restatement of the reference's production chain
(``/root/reference/run.sh:1-26``: download → JQL scoring → percentile
thresholds → conjunctive filter → join → parquet) as ONE streaming DAG
(SURVEY.md §3.1):

    read_parquet(transcripts)
      → map_batches(compute_text_stats)          # stateless tasks
      → map_batches(LangIdScorer,  actor pool)   # state loaded once/actor
      → map_batches(PerplexityScorer, actor pool)
      → map_batches(Scrubber, actor pool)
      → map_batches(decide)                      # keep/drop + drop_reason
      [→ groupby(conv_id).map_groups(reassemble)]  # the only wide op
      → write_parquet (partitioned, resumable — state/checkpoint.py)

Unlike the reference, no stage materializes the corpus to disk between
steps; the streaming executor pipelines blocks with backpressure.
"""

from __future__ import annotations

from functools import partial

import pandas as pd
import pyarrow as pa

import ray.data

from ..functions.decide import FilterConfig, decide_batch
from ..functions.lid import LangIdScorer
from ..functions.perplexity import PerplexityScorer
from ..functions.scrub import Scrubber
from ..functions.textstats import compute_text_stats


def read_transcripts(path: str | list[str]) -> ray.data.Dataset:
    """Source: the transcript Parquet table (reference source analog S1,
    ``/root/reference/fineweb/fineweb2_download.py:40-57`` — but a
    column-pruned parquet read instead of an HF stream)."""
    return ray.data.read_parquet(path)


def _default_pool() -> tuple[int, int]:
    """Autoscaling actor-pool bounds sized to the cluster: three scorer
    pools must coexist with the task stages, so each pool may grow to
    ~1/3 of the CPUs but demands only 1 up front (a fixed min that
    exceeds the cluster would stall the streaming executor)."""
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    except Exception:
        cpus = 8
    return (1, max(2, cpus // 3))


def annotate(
    ds: ray.data.Dataset,
    cfg: FilterConfig | None = None,
    *,
    batch_size: int = 4096,
    lid_actors: int | tuple[int, int] | None = None,
    ppl_actors: int | tuple[int, int] | None = None,
    scrub_actors: int | tuple[int, int] | None = None,
) -> ray.data.Dataset:
    """Append every engine column per turn. Stateless transforms run as
    tasks; scorer/scrubber stages run as autoscaling actor pools
    (reference stateful-stage pattern, SURVEY.md §2.3)."""
    cfg = cfg or FilterConfig()
    lid_actors = lid_actors or _default_pool()
    ppl_actors = ppl_actors or _default_pool()
    scrub_actors = scrub_actors or _default_pool()
    ds = ds.map_batches(compute_text_stats, batch_format="pyarrow", batch_size=batch_size)
    ds = ds.map_batches(
        LangIdScorer, batch_format="pyarrow", batch_size=batch_size, concurrency=lid_actors
    )
    ds = ds.map_batches(
        PerplexityScorer,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=ppl_actors,
    )
    ds = ds.map_batches(
        Scrubber, batch_format="pyarrow", batch_size=batch_size, concurrency=scrub_actors
    )
    ds = ds.map_batches(
        partial(decide_batch, cfg=cfg), batch_format="pyarrow", batch_size=batch_size
    )
    return ds


def _reassemble_group(group: pd.DataFrame) -> pd.DataFrame:
    """Per-conversation reassembly under a stable ``turn_idx`` sort —
    the single ordering contract (BASELINE.json: per-turn text equality
    under stable turn ordering). Group sizes are conversation-sized, so
    the in-group sort is cheap; skew is handled by the groupby shuffle,
    not here."""
    g = group.sort_values("turn_idx", kind="mergesort")
    kept = g[g["keep"]]
    return pd.DataFrame(
        {
            "conv_id": [g["conv_id"].iloc[0]],
            "n_turns": [len(g)],
            "n_kept": [int(kept.shape[0])],
            "conv_keep": [bool(kept.shape[0] > 0)],
            "text": ["\n".join(kept["scrubbed_text"].tolist())],
            "first_ts": [g["ts"].iloc[0]],
            "last_ts": [g["ts"].iloc[-1]],
        }
    )


def reassemble(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Conversation reassembly: the only all-to-all exchange in the
    pipeline. ``groupby(conv_id)`` hash-partitions by the ONE
    partitioning key used everywhere (SURVEY.md §7.2); ordering inside
    a group is explicit (`turn_idx` mergesort), never positional."""
    return ds.groupby("conv_id").map_groups(_reassemble_group, batch_format="pandas")


def ordered_turns(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Per-turn labeled output in stable (conv_id, turn_idx) order —
    Ray Data's sort is a distributed range-partitioned sort, so this is
    a wide op; use only when a globally ordered per-turn view is needed."""
    return ds.sort(["conv_id", "turn_idx"])


def filter_kept(ds: ray.data.Dataset) -> ray.data.Dataset:
    """The reference's final threshold filter analog
    (``/root/reference/small_model_inference/filter.py:22``): keep rows
    with ``keep``; vectorized Arrow predicate, not a per-row filter."""
    import pyarrow.compute as pc

    return ds.map_batches(
        lambda t: t.filter(pc.equal(t["keep"], True)), batch_format="pyarrow"
    )


def run_flagship(
    input_path: str | list[str],
    cfg: FilterConfig | None = None,
    *,
    batch_size: int = 4096,
) -> ray.data.Dataset:
    """read → annotate → reassemble. Returns the conversation-level
    Dataset (lazy; caller consumes)."""
    return reassemble(annotate(read_transcripts(input_path), cfg, batch_size=batch_size))
