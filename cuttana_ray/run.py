"""CLI entry point — the `ray job submit` surface (SURVEY.md §3 target
lifecycle: ``ray job submit -- python -m cuttana_ray.run --input ... --workdir
...``).

Owns the Ray session (guarded init, always shuts down). Resumable: rerunning
with the same workdir skips completed manifest-gated stages.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        prog="cuttana_ray.run",
        description="Link-graph analytics over transcript parquet tables")
    ap.add_argument("--input", required=True,
                    help="transcript parquet file/dir (conv_id, turn_idx, "
                         "role, text, tool, ts)")
    ap.add_argument("--workdir", required=True,
                    help="output/checkpoint directory (resumable)")
    ap.add_argument("--num-partitions", type=int, default=16)
    ap.add_argument("--mode", choices=["csr", "sharded", "shuffle", "bigv"],
                    default="csr",
                    help="bigv = hash-id shard-resident pipeline: no O(V) "
                         "object on the driver or any single node")
    ap.add_argument("--routing", choices=["hash", "cuttana"],
                    default="hash",
                    help="bigv mode only: shard ownership — id%%k hash "
                         "(baseline) or the Cuttana-quality assignment "
                         "(fewer exchanged bytes per BSP round)")
    ap.add_argument("--partitioner", choices=["sequential", "sharded"],
                    default="sequential",
                    help="bigv --routing cuttana only: how the assignment "
                         "is produced — the reference-faithful one-task "
                         "stream, or the restreaming range-shard engine "
                         "with no O(V) state in any task")
    ap.add_argument("--pagerank-tol", type=float, default=1e-6)
    ap.add_argument("--lpa-iters", type=int, default=10)
    ap.add_argument("--num-cpus", type=int, default=None,
                    help="ray.init num_cpus (default: all)")
    ap.add_argument("--num-sub-partitions", type=int, default=4096)
    ap.add_argument("--balance-slack", type=float, default=0.05)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args(argv)

    import ray
    owns_session = not ray.is_initialized()
    if owns_session:
        ray.init(address="local", include_dashboard=False,
                 ignore_reinit_error=True,
                 **({"num_cpus": args.num_cpus} if args.num_cpus else {}))
    try:
        import ray.data as rd
        from cuttana_ray.config import CuttanaConfig
        from cuttana_ray.pipelines.flagship import (
            FLAGSHIP_COLUMNS,
            run_flagship,
            run_flagship_bigv,
        )

        # prune at the read: neither flagship mode touches the text column
        inp = rd.read_parquet(args.input, columns=list(FLAGSHIP_COLUMNS))
        if args.mode == "bigv":
            lineage = run_flagship_bigv(
                inp, args.workdir,
                num_shards=args.num_partitions,
                pagerank_tol=args.pagerank_tol, lpa_iters=args.lpa_iters,
                routing=args.routing, partitioner=args.partitioner)
        else:
            config = CuttanaConfig(num_sub_partitions=args.num_sub_partitions,
                                   balance_slack=args.balance_slack,
                                   seed=args.seed)
            lineage = run_flagship(
                inp, args.workdir,
                num_partitions=args.num_partitions, config=config,
                mode=args.mode, pagerank_tol=args.pagerank_tol,
                lpa_iters=args.lpa_iters)
        json.dump(lineage, sys.stdout, indent=2, default=str)
        print()
        return 0
    finally:
        if owns_session:
            ray.shutdown()


if __name__ == "__main__":
    raise SystemExit(main())
