"""Print the flagship pipeline's per-operator ``ds.stats()`` breakdown —
the measure-don't-guess artifact used to tune pool sizes, batch sizes
and the shuffle layout. Usage: python scripts/profile_flagship.py [dir]"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import ray


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/fineweb2_ro_bench/transcripts_1000000"
    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    ray.init(address="local", num_cpus=ncpu, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from fineweb2_ro_ray.pipelines.quality_filter import annotate, read_transcripts, run_flagship

    read_transcripts(path).count()  # warm

    t0 = time.time()
    ann = annotate(
        read_transcripts(path),
        project=["conv_id", "turn_idx", "ts", "keep", "scrubbed_text"],
    )
    n = ann.count()
    t_ann = time.time() - t0
    print(f"== annotate only: {n} rows in {t_ann:.1f}s ({n/t_ann:.0f} rows/s)\n")
    print(ann.stats())

    t0 = time.time()
    out = run_flagship(path)
    shutil.rmtree("/tmp/profile_out", ignore_errors=True)
    out.write_parquet("/tmp/profile_out")
    t_full = time.time() - t0
    print(f"\n== full flagship: {t_full:.1f}s (reassembly+write ≈ {t_full - t_ann:.1f}s)\n")
    print(out.stats())
    ray.shutdown()


if __name__ == "__main__":
    main()
