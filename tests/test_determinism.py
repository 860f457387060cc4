"""Self-determinism of the rows-only (no-DuckDB-oracle) queries: the
driver's weaker check records row counts, which is only meaningful if
repeated runs produce identical results. Sketch seeds, hash params,
and sample bounds are all fixed, so two runs must match row-for-row."""

import pytest

SF = "/root/testdata/sf0.001"

ROWS_ONLY = [
    "dedup_minhash_lsh",
    "dedup_simhash",
    "similarity_lsh_topk",
    "similarity_ivf_topk",
    "similarity_pq_topk",
    "dedup_incremental_near",
    "dedup_embedding_lsh",
]


def _canon(df):
    cols = sorted(df.columns)
    return sorted(
        tuple(str(row[c]) for c in cols) for row in df.collect()
    )


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_is_deterministic(spark, name):
    import __spark_entry__ as entrymod

    q = entrymod.queries()[name]
    assert _canon(q(spark, SF)) == _canon(q(spark, SF))
