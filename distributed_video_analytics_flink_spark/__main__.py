"""CLI: run the engine without writing code.

    python -m distributed_video_analytics_flink_spark list
    python -m distributed_video_analytics_flink_spark run <query> \
        [--sf-dir DIR] [--limit N] [--explain] [--output PATH]
    python -m distributed_video_analytics_flink_spark probe <path> [--glob G]

``run`` executes any registered query (the same registry the driver
contract exposes) against a testdata directory, printing rows (bounded by
--limit) or writing parquet with --output; --explain prints the formatted
physical plan instead of executing. ``probe`` runs the MP4 container
probe over a file or directory. ``list`` prints the registry with oracle
coverage marks.
"""

from __future__ import annotations

import argparse
import sys

DEFAULT_SF_DIR = "/root/testdata/sf0.01"


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="distributed_video_analytics_flink_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list", help="list registered queries")

    runp = sub.add_parser("run", help="run a registered query")
    runp.add_argument("query")
    runp.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    runp.add_argument("--limit", type=int, default=20)
    runp.add_argument("--explain", action="store_true")
    runp.add_argument("--output", help="write full result as parquet here")

    probep = sub.add_parser("probe", help="probe MP4 container metadata")
    probep.add_argument("path")
    probep.add_argument("--glob", default="*.mp4")
    return p


def main(argv: list[str] | None = None, spark=None) -> int:
    args = _build_parser().parse_args(argv)
    from distributed_video_analytics_flink_spark.operators import QUERIES

    if args.cmd == "list":
        for name, spec in QUERIES.items():
            mark = "oracle" if spec.oracle else "rows-only"
            print(f"{name}\t{mark}")
        print(f"# {len(QUERIES)} queries", file=sys.stderr)
        return 0

    from distributed_video_analytics_flink_spark.session import get_spark

    own_session = spark is None
    spark = spark or get_spark()
    try:
        if args.cmd == "run":
            if args.query not in QUERIES:
                print(f"unknown query: {args.query}", file=sys.stderr)
                return 2
            df = QUERIES[args.query].fn(spark, args.sf_dir)
            if args.explain:
                from distributed_video_analytics_flink_spark.plans import formatted_plan

                print(formatted_plan(df))
            elif args.output:
                df.write.mode("overwrite").parquet(args.output)
                print(f"wrote {spark.read.parquet(args.output).count()} rows to {args.output}")
            else:
                df.show(args.limit, truncate=40)
            return 0

        if args.cmd == "probe":
            from distributed_video_analytics_flink_spark.sources.video_files import (
                video_container_metadata,
            )

            video_container_metadata(spark, args.path, glob=args.glob).show(
                100, truncate=60
            )
            return 0
    finally:
        if own_session:
            spark.stop()
    return 2


if __name__ == "__main__":
    raise SystemExit(main())
