"""Generate a larger bench dataset by replicating a source SF with
key-space offsets (default: 10x sf0.1 -> "sf1").

The driver ships parquet only up to sf0.1; at that size the bench
measures scheduler overhead, not data processing. This tool builds a
K-fold replica where every key column is offset per replica so
cardinalities, join fan-outs, and group counts scale the way real
data would (10x customers, 10x orders per the same dims, same time
range at 10x event density). Document text gets a per-replica suffix
token so the dedup operators see near-duplicates across replicas, not
an explosion of exact ones. region/nation stay fixed (dimensions).

Output goes under .benchdata/ (gitignored); bench.py generates it
lazily on first use.
"""

from __future__ import annotations

import os
import sys

import duckdb

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# key column -> shared key-space (same space must offset identically
# everywhere it appears, so foreign keys stay consistent per replica)
KEY_SPACES = {
    "customer": {"c_custkey": "cust"},
    "supplier": {"s_suppkey": "supp"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "ord", "o_custkey": "cust"},
    "lineitem": {"l_orderkey": "ord", "l_partkey": "part", "l_suppkey": "supp"},
    "events": {"event_id": "evt", "user_id": "user"},
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
}

SPACE_SOURCE = {
    "cust": ("customer", "c_custkey"),
    "supp": ("supplier", "s_suppkey"),
    "part": ("part", "p_partkey"),
    "ord": ("orders", "o_orderkey"),
    "evt": ("events", "event_id"),
    "user": ("events", "user_id"),
    "doc": ("documents", "doc_id"),
    "vec": ("embeddings", "vec_id"),
}


def generate(src_dir: str, out_dir: str, replicas: int) -> None:
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    # stream the CROSS JOIN straight to parquet: with insertion order
    # preserved DuckDB buffers the whole result (the sf100 lineitem is
    # 600M rows — round-9 observed ~90 GB resident before the cap);
    # row order within a replica set is meaningless here, and every
    # consumer (Spark, the DuckDB oracle views) is order-agnostic
    con.sql("SET preserve_insertion_order = false")
    con.sql("SET memory_limit = '24GB'")

    spans = {
        space: con.sql(
            f"SELECT max({col}) + 1 FROM '{src_dir}/{tbl}.parquet'"
        ).fetchone()[0]
        for space, (tbl, col) in SPACE_SOURCE.items()
    }

    for tbl in TABLES:
        src = f"{src_dir}/{tbl}.parquet"
        dst = f"{out_dir}/{tbl}.parquet"
        if not os.path.exists(src):
            continue
        cols = [r[0] for r in con.sql(f"DESCRIBE SELECT * FROM '{src}'").fetchall()]
        keyed = KEY_SPACES.get(tbl, {})
        if not keyed:  # dimensions: copy as-is
            con.sql(f"COPY (SELECT * FROM '{src}') TO '{dst}' (FORMAT PARQUET)")
            continue
        exprs = []
        for c in cols:
            if c in keyed:
                exprs.append(f"{c} + i * {spans[keyed[c]]} AS {c}")
            elif tbl == "documents" and c == "text":
                # near-dup (not exact-dup) replicas for the dedup ops
                exprs.append("text || ' zrep' || i AS text")
            elif tbl == "documents" and c == "n_chars":
                exprs.append("n_chars + length(' zrep' || i) AS n_chars")
            else:
                exprs.append(c)
        con.sql(
            f"COPY (SELECT {', '.join(exprs)} FROM '{src}' "
            f"CROSS JOIN range({replicas}) r(i)) TO '{dst}' (FORMAT PARQUET)"
        )
    # explicit close releases DuckDB's spill files (cwd/.tmp — the
    # sf100 build spills ~20 GB under the 24 GB memory cap; leaving
    # the connection to the GC left those on disk long enough to
    # wedge a later bucketed write with ENOSPC)
    con.close()


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".benchdata",
        "sf1",
    )
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    generate(src, out, k)
    print(f"wrote {out} ({k}x {src})")
