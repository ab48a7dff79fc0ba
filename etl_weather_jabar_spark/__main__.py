"""Command-line entry point: run any registry query against a data dir.

    python -m etl_weather_jabar_spark list
    python -m etl_weather_jabar_spark run <query> [--sf-dir DIR]
        [--out PATH] [--format parquet|csv|json] [--limit N] [--explain]

``run`` executes one named query from the registry (the same callables the
driver contract exposes) and either pretty-prints up to ``--limit`` rows
(default) or writes the full result to ``--out`` in the chosen format —
the write path never collects to the driver. ``--explain`` prints the
formatted physical plan instead of executing.

Reference parity: the reference is driven by Airflow DAG tasks
(``dags/*.py``); this CLI is the engine's equivalent front door for
ad-hoc runs of any supported operator without writing a script.
"""

from __future__ import annotations

import argparse
import sys

from .queries import ALL, QUERIES
from .session import get_spark


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="etl_weather_jabar_spark")
    sub = p.add_subparsers(dest="cmd", required=True)
    sub.add_parser("list", help="list registry query names")
    runp = sub.add_parser("run", help="run one registry query")
    runp.add_argument("query", help="registry query name (see `list`)")
    runp.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    runp.add_argument("--out", default=None, help="write result here")
    runp.add_argument(
        "--format", default="parquet", choices=["parquet", "csv", "json"]
    )
    runp.add_argument("--limit", type=int, default=20)
    runp.add_argument("--explain", action="store_true")
    args = p.parse_args(argv)

    if args.cmd == "list":
        try:
            for name in ALL:
                print(name)
        except BrokenPipeError:  # `... | head` closed the pipe: fine
            sys.stderr.close()
        return 0

    if args.query not in QUERIES:
        print(f"unknown query: {args.query!r} (try `list`)", file=sys.stderr)
        return 2
    spark = get_spark("cli")
    spark.sparkContext.setLogLevel("ERROR")
    if args.explain:
        # plan-only construction: iterative builders run one
        # representative round and skip checkpoints/convergence probes,
        # so explain never executes jobs (planmode.plan_only)
        from .planmode import plan_only

        with plan_only():
            QUERIES[args.query](spark, args.sf_dir).explain("formatted")
        return 0
    df = QUERIES[args.query](spark, args.sf_dir)
    try:
        if args.out:
            w = df.write.mode("overwrite")
            if args.format == "csv":
                w = w.option("header", "true")
            getattr(w, args.format)(args.out)
            print(f"wrote {args.out} ({args.format})")
        else:
            df.show(args.limit, truncate=False)
    except BrokenPipeError:  # `... | head` closed the pipe: fine
        sys.stderr.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
