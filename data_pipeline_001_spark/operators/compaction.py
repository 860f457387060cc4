"""Small-file compaction for partitioned parquet sinks.

The reference's windowed extract (pipeline_logic/core/
ingestion_engine.py — one staged file per chunk per window) and this
engine's per-window sink both accrete many small files: at one file
per window per task, a year of 5-minute windows × 32 tasks is ~3.4M
files — and at 100 TB the *file count*, not the byte count, becomes
the bottleneck (NameNode/S3 listing, task-per-file scheduling, footer
reads).

``compact_dir`` rewrites one directory to ``ceil(bytes/target)``
files; ``plan_compaction`` scans a sink root and returns only the
directories whose file population is worth rewriting (many files,
small average) so an incremental compactor touches cold, already-good
directories zero times. The rewrite is write-temp → two-rename swap
with crash recovery: the swap itself is NOT atomic (local filesystems
have no atomic directory exchange), so ``compact_dir`` first recovers
any half-finished swap a prior crash left behind — a stranded
``._compact_old`` is restored if the data directory is missing (crash
between the renames) and discarded if the data directory exists
(crash before the final cleanup) — and stale temp output is always
rebuilt. Net effect: at every entry the original data is intact and a
re-run converges.
"""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def _dir_stats(path: str) -> tuple[int, int]:
    """(n_data_files, total_bytes) for one directory (non-recursive)."""
    n, total = 0, 0
    for name in os.listdir(path):
        p = os.path.join(path, name)
        if os.path.isfile(p) and not name.startswith(("_", ".")):
            n += 1
            total += os.path.getsize(p)
    return n, total


def plan_compaction(
    root: str,
    target_bytes: int = 128 * 1024 * 1024,
    min_files: int = 4,
) -> list[dict]:
    """Walk a sink root; return compaction candidates as dicts of
    (path, n_files, total_bytes, target_files). A directory qualifies
    when it holds ≥ ``min_files`` data files AND more files than its
    bytes justify at ``target_bytes`` per file."""
    plans = []
    for dirpath, _dirnames, filenames in os.walk(root):
        if not any(
            f.endswith(".parquet") and not f.startswith(("_", "."))
            for f in filenames
        ):
            continue
        n, total = _dir_stats(dirpath)
        target = max(1, math.ceil(total / target_bytes))
        if n >= min_files and n > target:
            plans.append(
                {
                    "path": dirpath,
                    "n_files": n,
                    "total_bytes": total,
                    "target_files": target,
                }
            )
    return plans


def compact_dir(
    spark: SparkSession,
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
) -> dict:
    """Rewrite one parquet directory to ~``target_bytes`` files.

    Read → coalesce (no shuffle: compaction is IO rebinning, the data
    needs no redistribution) → write to a sibling temp dir → two-rename
    swap. The swap window (crash between the renames) is recovered on
    the next entry — see the module docstring. Returns before/after
    file counts."""
    tmp = path.rstrip("/") + "._compact_tmp"
    old = path.rstrip("/") + "._compact_old"
    # recover a prior crashed swap before touching anything:
    if os.path.isdir(old):
        if not os.path.isdir(path):
            # crashed between the renames — the original is in `old`
            os.rename(old, path)
        else:
            # crashed before cleanup — `path` is the compacted result
            shutil.rmtree(old)
    # stale temp output is from an interrupted write; always rebuild
    shutil.rmtree(tmp, ignore_errors=True)

    n_before, total = _dir_stats(path)
    target = max(1, math.ceil(total / target_bytes))
    df: DataFrame = spark.read.parquet(path)
    df.coalesce(target).write.mode("overwrite").parquet(tmp)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    n_after, _ = _dir_stats(path)
    return {
        "path": path,
        "files_before": n_before,
        "files_after": n_after,
        "bytes": total,
    }


def compact_sink(
    spark: SparkSession,
    root: str,
    target_bytes: int = 128 * 1024 * 1024,
    min_files: int = 4,
) -> list[dict]:
    """Plan + execute compaction across a whole sink root."""
    return [
        compact_dir(spark, p["path"], target_bytes)
        for p in plan_compaction(root, target_bytes, min_files)
    ]
