"""Self-determinism of the rows-only (no-DuckDB-oracle) queries: the
driver's weaker check records row counts, which is only meaningful if
repeated runs produce identical results. Sketch seeds, hash params,
and sample bounds are all fixed, so two runs must match row-for-row."""

import pytest

pytestmark = pytest.mark.slow  # lane 2: see pytest.ini

SF = "/root/testdata/sf0.001"

def _rows_only_names():
    """Derive the list from the registry so a new rows-only entry is
    covered the moment it registers (a stale static list silently
    skips it). dedup_incremental_near / multimodal etc. graduated to
    property-form oracles in round 3 and fall out automatically."""
    import __spark_entry__ as entrymod

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    return sorted(n for n in qs if n not in oracles)


ROWS_ONLY = _rows_only_names()


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
