"""Interactive REPL — parity with the reference's CLI (src/main.rs:50-74:
a rustyline loop that feeds statements to OxidSQLDatabase::query and
prints result tables).

Usage: python -m oxidsql_spark.repl [DB_PATH] [--sf-dir DIR]

DB_PATH opens/creates a durable database at that directory (versioned
parquet snapshots) — the twin of the reference's `oxidsql <path>`
(main.rs:40: OxidSQLDatabase::new(path, 1024)); omitted = in-memory.

Statements go through the OxidSparkDatabase facade (CREATE TABLE /
INSERT / UPDATE / DELETE / DROP / any SELECT Spark SQL accepts). With
--sf-dir, the testdata tables are pre-registered as views so analytical
queries work immediately.
"""

from __future__ import annotations

import argparse
import sys

from .database import AnalyzerError, OxidSparkDatabase
from .session import get_spark
from .sources import register_views


def run_repl(sf_dir: str | None = None, in_stream=None, out=None, db_path: str | None = None) -> None:
    in_stream = in_stream or sys.stdin
    out = out or sys.stdout
    spark = get_spark("oxidsql-repl")
    db = OxidSparkDatabase(spark, storage_dir=db_path)
    if sf_dir:
        register_views(spark, sf_dir)
    print("oxidsql-spark repl — end statements with ';', exit with \\q", file=out)
    buf: list[str] = []
    for line in in_stream:
        line = line.rstrip("\n")
        if line.strip() == "\\q":
            break
        buf.append(line)
        if not line.rstrip().endswith(";"):
            continue
        stmt = "\n".join(buf).strip().rstrip(";")
        buf = []
        if not stmt:
            continue
        try:
            result = db.query(stmt)
            if result is not None:
                # Print-operator twin (plan.rs:70-118): header + rows
                print(result._show_string(100, 0, False), file=out)
            else:
                print("ok", file=out)
        except AnalyzerError as e:
            print(f"error: {e}", file=out)
        except Exception as e:  # Catalyst analysis/parse errors
            msg = str(e).splitlines()[0] if str(e) else type(e).__name__
            print(f"error: {msg}", file=out)
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("db_path", nargs="?", default=None,
                    help="durable database directory (omit for in-memory)")
    ap.add_argument("--sf-dir", default=None, help="pre-register testdata views from this dir")
    args = ap.parse_args()
    run_repl(args.sf_dir, db_path=args.db_path)


if __name__ == "__main__":
    main()
