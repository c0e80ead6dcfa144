"""CLI SQL shell (reference parity: ballista-cli REPL).

Usage:
    python -m arrow_ballista_spark --sf-dir /root/testdata/sf0.01   # REPL
    python -m arrow_ballista_spark -e "SELECT 1 AS x"               # one-shot

Driver tables found under --sf-dir are pre-registered as views; any SQL the
engine supports (including CREATE EXTERNAL TABLE) runs through
BallistaContext.sql().
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="arrow_ballista_spark")
    ap.add_argument("-e", "--execute", help="run one SQL statement and exit")
    ap.add_argument(
        "--sf-dir",
        default=None,
        help="testdata dir whose parquet tables get registered as views",
    )
    ap.add_argument("--max-rows", type=int, default=20)
    # convert mode — parity with the reference's `tpch convert`
    # (benchmarks/src/bin/tpch.rs:731-800): .tbl/csv -> parquet/csv/orc
    ap.add_argument(
        "--convert", nargs=2, metavar=("INPUT", "OUTPUT"),
        help="convert a delimited text dataset to --format and exit",
    )
    ap.add_argument("--format", default="parquet",
                    help="convert output format (parquet/csv/orc/json)")
    ap.add_argument("--partitions", type=int, default=1)
    ap.add_argument("--compression", default="snappy")
    ap.add_argument("--delimiter", default="|")
    ap.add_argument("--header", action="store_true")
    ap.add_argument("--columns", default=None,
                    help="comma-separated column names (drops the "
                         ".tbl trailing-delimiter artifact column)")
    args = ap.parse_args(argv)

    if args.convert:
        from arrow_ballista_spark.session import get_session
        from arrow_ballista_spark.sources.convert import convert_dataset

        n = convert_dataset(
            get_session(app_name="ballista-convert"),
            args.convert[0],
            args.convert[1],
            file_format=args.format,
            partitions=args.partitions,
            compression=args.compression,
            delimiter=args.delimiter,
            header=args.header,
            columns=args.columns.split(",") if args.columns else None,
        )
        print(f"converted {n} rows to {args.format} at {args.convert[1]}")
        return 0

    from arrow_ballista_spark.catalog import register_tables
    from arrow_ballista_spark.context import BallistaContext

    ctx = BallistaContext()
    if args.sf_dir:
        register_tables(ctx.spark, args.sf_dir)

    def run(sql: str) -> None:
        sql = sql.strip().rstrip(";")
        if not sql:
            return
        if sql.lower() in ("exit", "quit"):
            raise EOFError
        try:
            ctx.sql(sql).show(args.max_rows, truncate=False)
        except Exception as e:  # noqa: BLE001 — REPL surfaces, doesn't die
            print(f"Error: {e}", file=sys.stderr)

    if args.execute:
        run(args.execute)
        return 0

    print("arrow-ballista-spark SQL shell ('exit' to quit)")
    while True:
        try:
            run(input("ballista> "))
        except (EOFError, KeyboardInterrupt):
            print()
            return 0


if __name__ == "__main__":
    sys.exit(main())
