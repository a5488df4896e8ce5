"""Driver-style DuckDB-oracle parity for every registered query.

This mirrors exactly what the driver's CORRECTNESS gate does (but with an
exact value compare instead of a hash, so failures are debuggable). Any
query registered with an oracle gets checked here automatically.
"""

from __future__ import annotations

import pytest

from project2_bigdata_spark.plans import REGISTRY

# The full parity sweep (300+ queries × Spark + DuckDB each) is the
# long pole of the suite (~4.5 min) and duplicates what
# tools/driver_replica.py sweeps before every milestone — slow-marked
# so the per-edit fast path (`pytest -m "not slow" tests/`) stays
# under 5 minutes while full CI still runs everything (VERDICT r9
# item 6). The fast path keeps every trap/plan/property/unit pin.
pytestmark = pytest.mark.slow

WITH_ORACLE = sorted(name for name, q in REGISTRY.items() if q.oracle)
NO_ORACLE = sorted(name for name, q in REGISTRY.items() if not q.oracle)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_query_matches_oracle(spark, sf_dir, name):
    from .oracle_harness import compare

    compare(spark, REGISTRY[name], sf_dir)


@pytest.mark.parametrize("name", NO_ORACLE)
def test_query_runs(spark, sf_dir, name):
    """Rows-only smoke for non-SQL-expressible queries (driver's weak check)."""
    df = REGISTRY[name].fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
