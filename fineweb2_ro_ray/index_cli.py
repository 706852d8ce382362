"""Cross-snapshot dedup index CLI — the operational face of
``stages.incremental``.

One persisted index serves a whole sequence of snapshot jobs (the
FineWeb cross-dump recipe):

    # dump 0: hash everything into a fresh index
    python -m fineweb2_ro_ray.index_cli build  --input dump0/ --index idx/
    # dump 1..N: keep only never-seen texts, then admit their hashes
    python -m fineweb2_ro_ray.index_cli filter --input dump1/ --index idx/ \
        --output dump1_new/
    python -m fineweb2_ro_ray.index_cli update --input dump1_new/ --index idx/ \
        --snapshot dump1
    # between jobs: bound the per-partition file count
    python -m fineweb2_ro_ray.index_cli compact --index idx/
    python -m fineweb2_ro_ray.index_cli stats   --index idx/

On a real cluster each subcommand is one ``ray job submit`` invocation.
Owns the Ray session like ``runner`` (library code never calls
``ray.init``); prints one summary JSON line."""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="persisted hash-index jobs")
    ap.add_argument("cmd", choices=["build", "update", "filter", "compact", "stats"])
    ap.add_argument("--index", required=True, help="index directory")
    ap.add_argument("--input", help="parquet dir/file(s) (build/update/filter)")
    ap.add_argument("--output", help="survivors parquet dir (filter)")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--snapshot", default="s0000", help="snapshot name (build/update)")
    ap.add_argument("--n-parts", type=int, default=256, help="index partitions (build)")
    ap.add_argument("--no-bloom", action="store_true", help="skip the Bloom fast-path (filter)")
    ap.add_argument("--num-cpus", type=int, default=None)
    args = ap.parse_args(argv)

    from fineweb2_ro_ray.stages import incremental as inc

    if args.cmd == "stats":  # no Ray needed: footers + meta only
        print(json.dumps({"cmd": "stats", **inc.index_stats(args.index)}))
        return 0

    import ray

    started_ray = not ray.is_initialized()
    if started_ray:
        ray.init(
            address="local",
            include_dashboard=False,
            logging_level="ERROR",
            **({"num_cpus": args.num_cpus} if args.num_cpus else {}),
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    t0 = time.time()
    try:
        if args.cmd == "compact":
            res = inc.compact_index(args.index)
        else:
            if not args.input:
                print("--input required", file=sys.stderr)
                return 2
            import ray.data

            ds = ray.data.read_parquet(args.input)
            if args.cmd == "build":
                res = inc.build_hash_index(
                    ds,
                    args.index,
                    text_col=args.text_col,
                    n_parts=args.n_parts,
                    snapshot=args.snapshot,
                )
            elif args.cmd == "update":
                res = inc.update_index(
                    ds, args.index, snapshot=args.snapshot, text_col=args.text_col
                )
            else:  # filter
                if not args.output:
                    print("--output required for filter", file=sys.stderr)
                    return 2
                kept = inc.filter_against_index(
                    ds, args.index, text_col=args.text_col, use_bloom=not args.no_bloom
                )
                kept.write_parquet(args.output)
                res = {"output": args.output}
        res = {"cmd": args.cmd, "wall_sec": round(time.time() - t0, 3), **res}
        print(json.dumps(res))
        return 0
    finally:
        if started_ray:
            ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
