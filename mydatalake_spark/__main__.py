"""CLI entry point — the OSS stand-in for the reference's notebook
orchestration (reference bronze/job.ipynb widgets job_type/job_name).

    python -m mydatalake_spark run-job \
        --metadata-root ./meta --warehouse ./warehouse \
        --job-type full --job-name bronze_full \
        --input-path assets=/data/raw/assets
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="mydatalake_spark")
    sub = parser.add_subparsers(dest="cmd", required=True)

    run = sub.add_parser("run-job", help="run a declared job")
    run.add_argument("--metadata-root", required=True)
    run.add_argument("--warehouse", required=True)
    run.add_argument(
        "--job-type", required=True,
        choices=["full", "cdc", "quality", "wap", "streaming", "reconcile"],
    )
    run.add_argument("--job-name", required=True)
    run.add_argument(
        "--input-path", action="append", default=[],
        metavar="TABLE=PATH", help="raw path per file-format table",
    )
    run.add_argument("--master", default=None)

    args = parser.parse_args(argv)

    from .catalog import Catalog
    from .jobs import JobRunner
    from .session import get_spark

    spark = get_spark(app_name=f"job-{args.job_name}", master=args.master)
    catalog = Catalog(spark, args.warehouse)
    paths = dict(p.split("=", 1) for p in args.input_path)
    written = JobRunner(
        spark, catalog, args.metadata_root, input_paths=paths
    ).run(args.job_type, args.job_name)
    print("\n".join(written))
    return 0


if __name__ == "__main__":
    sys.exit(main())
