"""Run every registered query at a given SF dir and time it.

Usage: python tools/sweep_sf1.py [sf_dir] [out_json]

Finds scale-pathological plans: any query whose runtime at sf1
(~10x sf0.1) is an outlier relative to the pack is a candidate for a
plan fix.  Prints a sorted table and writes JSON.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import __spark_entry__ as mod
from data_pipeline_001_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.benchdata/sf1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sweep_sf1.json"
    spark = get_spark(app_name="sweep", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    qs = mod.queries()
    # the exact oracle twins are deliberately quadratic (documented
    # small-sf baselines); at the replicated sf1 each would dominate
    # the sweep. Their scale paths (dedup_embedding_lsh,
    # dedup_cluster_components_lsh, dedup_minhash_lsh) ARE swept.
    skip = {
        "dedup_embedding_cosine",
        "dedup_cluster_components",
        "ngram_jaccard_pairs",
        # within-lang pairwise gram jaccard — the oracle-expressible
        # quadratic twin of dedup_cluster_components_lsh (which IS swept)
        "dedup_cluster_canonical",
    }
    times: dict[str, float] = {}
    errors: dict[str, str] = {}
    # resume: skip anything already recorded in a previous partial run
    try:
        with open(out) as f:
            prev = json.load(f)
        times.update(prev.get("times", {}))
        skip |= set(times)
        print(f"resuming past {len(times)} recorded queries", flush=True)
    except (OSError, ValueError):
        pass
    for name, fn in qs.items():
        if name in skip:
            if name not in times:
                print(f"    skip  {name} (quadratic oracle twin)", flush=True)
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            n = df.count()
            times[name] = round(time.time() - t0, 2)
            print(f"{times[name]:8.2f}s  {n:>9} rows  {name}", flush=True)
        except Exception as e:  # noqa: BLE001 — sweep must survive one bad query
            errors[name] = f"{type(e).__name__}: {e}"[:200]
            print(f"   ERROR  {name}: {errors[name][:120]}", flush=True)
        with open(out, "w") as f:
            json.dump({"times": times, "errors": errors}, f, indent=1, sort_keys=True)
    ranked = sorted(times.items(), key=lambda kv: -kv[1])
    print("\n=== slowest 15 ===")
    for name, t in ranked[:15]:
        print(f"{t:8.2f}s  {name}")
    with open(out, "w") as f:
        json.dump({"times": times, "errors": errors}, f, indent=1, sort_keys=True)
    print(f"\nwrote {out}; total {sum(times.values()):.1f}s over {len(times)} queries; {len(errors)} errors")


if __name__ == "__main__":
    main()
