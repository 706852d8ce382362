"""Train the vendored mini-BPE merge table (deterministic, offline).

Corpus: the committed golden transcript fixture — self-contained, no
external data. Output: fineweb2_ro_ray/data/bpe_merges.json (committed
artifact; the engine loads it read-only). Re-run only when the fixture
or the BPE conventions change.

Usage: python scripts/train_bpe.py [n_merges]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import pyarrow.parquet as pq

from fineweb2_ro_ray.functions.bpe import save_merges, train_bpe


def main() -> None:
    n_merges = int(sys.argv[1]) if len(sys.argv) > 1 else 384
    fixture = os.path.join(os.path.dirname(__file__), "..", "fixtures", "transcripts_golden.parquet")
    texts = [t for t in pq.read_table(fixture, columns=["text"])["text"].to_pylist() if t]
    merges = train_bpe(texts, n_merges)
    save_merges(merges)
    print(f"trained {len(merges)} merges from {len(texts)} texts -> data/bpe_merges.json")


if __name__ == "__main__":
    main()
