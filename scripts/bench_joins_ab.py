"""A/B: positions-only Arrow asof/range join bodies vs the prior
full-frame pandas ones, at sf0.1 (events_asof_orders +
lineitem_range_orders shapes, min-of-N interleaved per BASELINE.md
quiet-window protocol).

Usage: python scripts/bench_joins_ab.py [sf_dir] [reps]
The "old" implementation is reconstructed inline (same bucket scaffold,
full-frame pandas merge bodies) so both run in one session against the
same inputs; the "new" one is the library code.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bench_round4 import probe_ms, wait_quiet  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    p = wait_quiet(float(os.environ.get("R4_MAX_WAIT_S", "1200")))
    print(json.dumps({"section": "probe", "page_ms": p}), flush=True)

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from fineweb2_ro_ray.schema import from_pandas_clean
    from fineweb2_ro_ray.stages import joins as J
    from fineweb2_ro_ray.stages.exchange import hash_exchange_map_groups

    # ---- old full-frame pandas bodies, reconstructed ----
    def old_asof(left, right, *, key, right_key, left_ts, right_ts,
                 n_partitions=512):
        both, l_cols, r_cols, out_schema = J._bucket_union(
            left, right, key, right_key, n_partitions)

        def per_part(g: pa.Table) -> pa.Table:
            side = g["_side"]
            l = g.filter(pc.equal(side, "l")).select(l_cols).to_pandas()
            r = g.filter(pc.equal(side, "r")).select(r_cols).to_pandas()
            if l.empty or r.empty:
                return out_schema.empty_table()
            l = l.sort_values(left_ts, kind="mergesort")
            r = r.sort_values(right_ts, kind="mergesort")
            out = pd.merge_asof(l, r, left_on=left_ts, right_on=right_ts,
                                left_by=key, right_by=right_key,
                                direction="backward")
            out = out[out[right_ts].notna()]
            return from_pandas_clean(out).select(out_schema.names).cast(out_schema)

        return hash_exchange_map_groups(both, per_part, key="part",
                                        batch_format="pyarrow",
                                        out_schema=out_schema)

    def old_range(left, right, *, key, right_key, left_ts, right_start,
                  right_end, n_partitions=512):
        both, l_cols, r_cols, out_schema = J._bucket_union(
            left, right, key, right_key, n_partitions)

        def per_part(g: pa.Table) -> pa.Table:
            side = g["_side"]
            l = g.filter(pc.equal(side, "l")).select(l_cols).to_pandas()
            r = g.filter(pc.equal(side, "r")).select(r_cols).to_pandas()
            if l.empty or r.empty:
                return out_schema.empty_table()
            codes, _ = pd.factorize(
                pd.concat([l[key], r[right_key]], ignore_index=True), sort=False)
            nl = len(l)
            l_codes, r_codes = codes[:nl], codes[nl:]
            r_ord = np.lexsort((r[right_start].to_numpy(), r_codes))
            r_codes_s = r_codes[r_ord]
            starts_s = r[right_start].to_numpy()[r_ord]
            ends_s = r[right_end].to_numpy()[r_ord]
            ts = l[left_ts].to_numpy()
            nr = len(r)
            comb_codes = np.concatenate([r_codes_s, l_codes])
            comb_vals = np.concatenate([starts_s, ts])
            comb_tag = np.concatenate([np.zeros(nr, np.int8), np.ones(nl, np.int8)])
            order = np.lexsort((comb_tag, comb_vals, comb_codes))
            cum_r = np.cumsum(np.concatenate([[0], (comb_tag[order] == 0)]))[1:]
            rank_of = np.empty(len(order), np.int64)
            rank_of[order] = np.arange(len(order))
            q_rank = cum_r[rank_of[nr:]]
            seg_lo = np.searchsorted(r_codes_s, l_codes, side="left")
            hi = np.maximum(q_rank - seg_lo, 0)
            total = int(hi.sum())
            if total == 0:
                return out_schema.empty_table()
            csum = np.zeros(nl + 1, np.int64)
            np.cumsum(hi, out=csum[1:])
            li = np.repeat(np.arange(nl), hi)
            flat_r = (np.arange(total, dtype=np.int64)
                      - np.repeat(csum[:-1], hi) + np.repeat(seg_lo, hi))
            m = ends_s[flat_r] > ts[li]
            if not m.any():
                return out_schema.empty_table()
            lo = l.iloc[li[m]].reset_index(drop=True)
            ro = r.iloc[r_ord[flat_r[m]]].reset_index(drop=True)
            merged = pd.concat([lo, ro], axis=1)
            return from_pandas_clean(merged).select(out_schema.names).cast(out_schema)

        return hash_exchange_map_groups(both, per_part, key="part",
                                        batch_format="pyarrow",
                                        out_schema=out_schema)

    # ---- inputs: the EXACT events_asof_orders / lineitem_range_orders
    # shapes from pipelines/parity.py ----
    def read_asof_sides():
        ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                                   columns=["event_id", "user_id", "ts"])
        od = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                   columns=["o_custkey", "o_orderdate"])
        return ev, od

    def read_range_sides():
        li = ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_linenumber", "l_shipdate"])
        li = li.map_batches(
            lambda b: b.rename_columns(
                ["li_orderkey", "l_linenumber", "l_shipdate"]),
            batch_format="pyarrow")
        od = ray.data.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_orderdate"])
        od = od.map_batches(
            lambda b: b.append_column(
                "o_end", pc.add(b["o_orderdate"],
                                pa.scalar(pd.Timedelta(days=90)))),
            batch_format="pyarrow")
        return li, od

    def run(tag, fn):
        t0 = time.perf_counter()
        n = fn().count()
        dt = time.perf_counter() - t0
        return dt, n

    def asof_new():
        ev, od = read_asof_sides()
        return J.asof_join(ev, od, key="user_id", right_key="o_custkey",
                           left_ts="ts", right_ts="o_orderdate")

    def asof_old():
        ev, od = read_asof_sides()
        return old_asof(ev, od, key="user_id", right_key="o_custkey",
                        left_ts="ts", right_ts="o_orderdate")

    def range_new2():
        li, od = read_range_sides()
        return J.range_join(li, od, key="li_orderkey", right_key="o_orderkey",
                            left_ts="l_shipdate", right_start="o_orderdate",
                            right_end="o_end")

    def range_old2():
        li, od = read_range_sides()
        return old_range(li, od, key="li_orderkey", right_key="o_orderkey",
                         left_ts="l_shipdate", right_start="o_orderdate",
                         right_end="o_end")

    results: dict[str, list[float]] = {}
    counts: dict[str, int] = {}
    cases = [("asof_new", asof_new), ("asof_old", asof_old),
             ("range_new", range_new2), ("range_old", range_old2)]
    for i in range(reps):
        for tag, f in cases:
            dt, n = run(tag, f)
            results.setdefault(tag, []).append(round(dt, 3))
            counts[tag] = n
        print(json.dumps({"rep": i, "probe_ms": probe_ms(),
                          **{k: v[-1] for k, v in results.items()}}),
              flush=True)
    assert counts["asof_new"] == counts["asof_old"], counts
    assert counts["range_new"] == counts["range_old"], counts
    print(json.dumps({"section": "joins_ab",
                      "rows": counts,
                      "min": {k: min(v) for k, v in results.items()},
                      "all": results}), flush=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
