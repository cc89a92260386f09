"""Differential test: every registered query vs its DuckDB oracle
(mirrors the driver's CORRECTNESS gate, at sf0.001 for speed)."""

import pytest

from ffiec_pq_spark import catalog
from tests.oracle_compare import compare

QUERIES = catalog.queries()
ORACLES = catalog.oracles()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    assert df.columns, f"{name}: no columns"
    if name not in ORACLES:
        # rows-only check, like the driver's weaker path
        assert df.count() >= 0
        return
    rel = duck.sql(ORACLES[name])
    problems = compare(df, rel)
    assert not problems, f"{name}: " + "; ".join(problems)
