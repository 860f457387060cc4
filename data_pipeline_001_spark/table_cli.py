"""Versioned-table operations CLI — the ops surface for
sources/versioned_table (the reference keeps comparable run metadata
in its drive table and exposes it only through SQL; here the manifest
history IS the metadata, so the CLI is a directory read away).

    python -m data_pipeline_001_spark.table_cli <root> history
    python -m data_pipeline_001_spark.table_cli <root> show [--version N]
    python -m data_pipeline_001_spark.table_cli <root> rollback --version N
    python -m data_pipeline_001_spark.table_cli <root> vacuum [--keep N]

``history`` and ``rollback`` are metadata-only (no SparkSession);
``show`` and ``vacuum`` start one.
"""

from __future__ import annotations

import argparse
import json


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="data_pipeline_001_spark.table_cli")
    ap.add_argument("root", help="table root directory")
    ap.add_argument(
        "action", choices=["history", "show", "rollback", "vacuum"]
    )
    ap.add_argument("--version", type=int, help="target version")
    ap.add_argument("--keep", type=int, default=3, help="vacuum retention")
    ap.add_argument("--limit", type=int, default=20, help="show row limit")
    args = ap.parse_args(argv)

    from data_pipeline_001_spark.sources.versioned_table import VersionedTable

    if args.action in ("history", "rollback"):
        # metadata-only paths: no Spark needed
        vt = VersionedTable.__new__(VersionedTable)
        vt.root = args.root
        import os

        vt.data_dir = os.path.join(args.root, "data")
        vt.manifest_dir = os.path.join(args.root, "_manifests")
        if args.action == "history":
            for m in vt.history():
                print(json.dumps(m))
            return 0
        if args.version is None:
            print("rollback requires --version")
            return 2
        v = vt.rollback(args.version)
        print(json.dumps({"rolled_back_to": args.version, "new_version": v}))
        return 0

    from data_pipeline_001_spark.session import get_spark

    spark = get_spark(app_name="table_cli")
    spark.sparkContext.setLogLevel("ERROR")
    vt = VersionedTable(spark, args.root)
    if args.action == "show":
        df = vt.read(args.version)
        for row in df.limit(args.limit).collect():
            print(json.dumps(row.asDict(), default=str))
        print(
            json.dumps(
                {"version": args.version or vt.current_version(),
                 "rows": df.count()}
            )
        )
        return 0
    removed = vt.vacuum(keep_versions=args.keep)
    print(json.dumps({"removed_dirs": removed, "kept_versions": args.keep}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
