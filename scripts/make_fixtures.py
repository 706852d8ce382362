"""Generate the frozen test fixtures (FIXTURES.md §2, run ONCE, committed).

- fixtures/transcripts_unit.parquet    — small unit-test input
- fixtures/transcripts_golden.parquet  — golden input (incl. hot convs)
- fixtures/transcripts_golden_labeled.parquet — pure-Python oracle labels

The oracle labeling is single-threaded, no Ray (SURVEY.md §7.3 step 5);
tests read the frozen Parquet and never regenerate.
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from fineweb2_ro_ray.oracle import label_table  # noqa: E402
from fineweb2_ro_ray.sources.synth import gen_transcripts  # noqa: E402

FIXDIR = os.path.join(os.path.dirname(__file__), "..", "fixtures")


def main() -> None:
    os.makedirs(FIXDIR, exist_ok=True)

    unit = gen_transcripts(30, seed=42)
    pq.write_table(unit, os.path.join(FIXDIR, "transcripts_unit.parquet"))
    print("unit rows:", unit.num_rows)

    golden = gen_transcripts(800, seed=42)
    pq.write_table(golden, os.path.join(FIXDIR, "transcripts_golden.parquet"))
    print("golden rows:", golden.num_rows)

    labeled = label_table(golden.to_pylist())
    t = pa.Table.from_pylist(labeled)
    # normalize ts back to timestamp[us]
    t = t.set_column(
        t.schema.get_field_index("ts"), "ts", t["ts"].cast(pa.timestamp("us"))
    )
    pq.write_table(t, os.path.join(FIXDIR, "transcripts_golden_labeled.parquet"))
    print("labeled rows:", t.num_rows, "kept:", sum(r["keep"] for r in labeled))


if __name__ == "__main__":
    main()
