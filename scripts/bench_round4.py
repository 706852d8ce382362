"""Round-4 quiet-window measurement battery (BASELINE.md protocol).

Waits (bounded) for a quiet host page-supply probe, then runs in order:

1. A/B: flagship reassembly reduce, Arrow-native vs pandas (min-of-N
   each, interleaved so neither impl owns a noise window), on the 1M-conv
   bench corpus.
2. Hot-key reducer-skew evidence at 1M hot turns
   (``scripts/bench_hotkey.py`` shape, in-process).

Prints one JSON line per section. bench.py / bench.py --scaling run
separately (they own their Ray sessions and quiet-window waits).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def probe_ms() -> float:
    import mmap

    t0 = time.perf_counter()
    m = mmap.mmap(-1, 1 << 26)
    m[:: 1 << 12] = b"\1" * (len(m) >> 12)
    dt = (time.perf_counter() - t0) * 1e3
    m.close()
    return round(dt, 1)


def wait_quiet(max_wait_s: float, thresh: float = 25.0) -> float:
    waited, streak = 0.0, 0
    p = probe_ms()
    streak = 1 if p <= thresh else 0
    while streak < 2 and waited < max_wait_s:
        time.sleep(20.0)
        waited += 20.0
        p = probe_ms()
        streak = streak + 1 if p <= thresh else 0
    return p


def main() -> None:
    max_wait = float(os.environ.get("R4_MAX_WAIT_S", "5400"))
    p = wait_quiet(max_wait)
    print(json.dumps({"section": "probe", "page_ms": p}), flush=True)

    import ray

    ray.init(
        address="local", num_cpus=32, include_dashboard=False, logging_level="ERROR"
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    # --- corpus (same as bench.py flagship) ---
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench as B

    n_turns = B._ensure_bench_transcripts()

    from fineweb2_ro_ray.pipelines.quality_filter import run_flagship

    def warm(d: str) -> None:
        for f in os.listdir(d):
            if f.endswith(".parquet"):
                with open(os.path.join(d, f), "rb") as fh:
                    while fh.read(1 << 24):
                        pass

    warm(B.BENCH_DIR)

    # --- 1. A/B arrow vs pandas reassembly reduce, interleaved ---
    reps = int(os.environ.get("R4_AB_REPEATS", "3"))
    times: dict[str, list[float]] = {"arrow": [], "pandas": []}
    import shutil

    for _ in range(reps):
        for impl in ("arrow", "pandas"):
            out_dir = f"/tmp/fineweb2_ro_bench/ab_{impl}"
            shutil.rmtree(out_dir, ignore_errors=True)
            warm(B.BENCH_DIR)
            t0 = time.time()
            run_flagship(B.BENCH_DIR, reduce_impl=impl).write_parquet(out_dir)
            times[impl].append(round(time.time() - t0, 2))
    print(
        json.dumps(
            {
                "section": "ab_reassembly_reduce",
                "turns": n_turns,
                "arrow_runs": times["arrow"],
                "pandas_runs": times["pandas"],
                "arrow_min": min(times["arrow"]),
                "pandas_min": min(times["pandas"]),
                "probe_after": probe_ms(),
            }
        ),
        flush=True,
    )

    # --- 2. hot-key evidence at 1M hot turns ---
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from bench_hotkey import build_frames, run

    frames = build_frames(1_000_000, 1_000_000)
    runs = [run(pp, frames) for pp in (16, 64, 256)]
    print(
        json.dumps(
            {
                "section": "hotkey_1m",
                "hot_turns": 1_000_000,
                "cold_turns": 1_000_000,
                "runs": runs,
                "probe_after": probe_ms(),
            }
        ),
        flush=True,
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
