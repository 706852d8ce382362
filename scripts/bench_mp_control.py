"""No-Ray multiprocessing control for the N→4N scaling criterion.

Runs the EXACT flagship per-turn kernel (the fused ``Annotator``) over
the scaling corpus with plain ``multiprocessing`` — no Ray, no object
store, no shuffle — at two process counts. If this control shows the
same efficiency ratio as ``bench.py --scaling``, the ceiling is the
VM's DRAM bandwidth (each added core brings no added memory bandwidth
on one box), not the engine. The round-2 control pinned the 8→30
regime (0.45 efficiency, zero Ray); this script makes the 2→8 regime
reproducible the same way.

Usage: python scripts/bench_mp_control.py [lo] [hi]
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time
from concurrent.futures import ProcessPoolExecutor

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

CORPUS = os.environ.get(
    "MP_CONTROL_DIR", "/tmp/fineweb2_ro_bench/transcripts_500000"
)


def _work(files: list[str]) -> int:
    import pyarrow.parquet as pq

    from fineweb2_ro_ray.pipelines.quality_filter import Annotator

    ann = Annotator()
    n = 0
    for f in files:
        pf = pq.ParquetFile(f)
        for batch in pf.iter_batches(batch_size=4096):
            import pyarrow as pa

            out = ann(pa.Table.from_batches([batch]))
            n += out.num_rows
    return n


def run(nprocs: int, files: list[str]) -> tuple[float, int]:
    # contiguous file slices per worker (same data every run)
    chunks = [files[i::nprocs] for i in range(nprocs)]
    t0 = time.time()
    with ProcessPoolExecutor(max_workers=nprocs) as ex:
        total = sum(ex.map(_work, chunks))
    return time.time() - t0, total


def main() -> None:
    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    files = sorted(glob.glob(os.path.join(CORPUS, "*.parquet")))
    assert files, f"no corpus at {CORPUS} — run bench.py --scaling first"
    # warm page cache so both levels read from memory
    for f in files:
        with open(f, "rb") as fh:
            while fh.read(1 << 24):
                pass
    t_lo, n = run(lo, files)
    t_hi, n2 = run(hi, files)
    assert n == n2
    eff = (t_lo / t_hi) / (hi / lo)
    print(
        json.dumps(
            {
                "control": "multiprocessing, no Ray",
                f"sec_{lo}": round(t_lo, 2),
                f"sec_{hi}": round(t_hi, 2),
                f"rows_per_sec_{lo}": round(n / t_lo, 1),
                f"rows_per_sec_{hi}": round(n / t_hi, 1),
                "scaling_efficiency": round(eff, 3),
                "rows": n,
            }
        )
    )


if __name__ == "__main__":
    main()
