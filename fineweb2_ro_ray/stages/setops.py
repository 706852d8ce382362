"""Distinct set operators: INTERSECT / EXCEPT over arbitrary key columns.

Both sides are tagged, unioned, and hash-partitioned by the key columns
on the raw exchange (``stages.exchange``), so every occurrence of a key
tuple lands in one reduce partition; each partition then emits its
distinct keys per the set predicate with ONE vectorized groupby — no
sort, no driver materialization. Cost is a single all-to-all of the
distinct-candidate columns only (callers should project first), which
is the minimum any distributed set op pays.

NULL keys follow SQL set-op semantics (NULLs compare equal for
INTERSECT/EXCEPT): pandas ``dropna=False`` groupbys keep them.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

import ray.data

_TAG = "__setop_side"


def _tagged_union(
    a: ray.data.Dataset, b: ray.data.Dataset, cols: list[str]
) -> ray.data.Dataset:
    def tag(side: int):
        def fn(t: pa.Table) -> pa.Table:
            t = t.select(cols)
            return t.append_column(_TAG, pa.array([side] * t.num_rows, pa.int8()))

        return fn

    return a.map_batches(tag(0), batch_format="pyarrow").union(
        b.map_batches(tag(1), batch_format="pyarrow")
    )


def _setop(
    a: ray.data.Dataset, b: ray.data.Dataset, cols: list[str], want: str
) -> ray.data.Dataset:
    from .exchange import hash_exchange_map_groups

    def reduce(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(cols, as_index=False, dropna=False)[_TAG].agg(["min", "max"])
        if want == "intersect":
            keep = (g["min"] == 0) & (g["max"] == 1)
        else:  # except: in a, never in b
            keep = g["max"] == 0
        return g.loc[keep, cols]

    return hash_exchange_map_groups(_tagged_union(a, b, cols), reduce, key=cols)


def intersect_distinct(
    a: ray.data.Dataset, b: ray.data.Dataset, cols: list[str]
) -> ray.data.Dataset:
    """SQL ``SELECT cols FROM a INTERSECT SELECT cols FROM b``."""
    return _setop(a, b, cols, "intersect")


def except_distinct(
    a: ray.data.Dataset, b: ray.data.Dataset, cols: list[str]
) -> ray.data.Dataset:
    """SQL ``SELECT cols FROM a EXCEPT SELECT cols FROM b``."""
    return _setop(a, b, cols, "except")
