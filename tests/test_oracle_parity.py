"""Every SQL-expressible registry entry must match its DuckDB oracle at
sf0.001 — the local mirror of the driver's CORRECTNESS gate."""

import pytest

from tests.conftest import SF_SMOKE


def _registry():
    import ltss_spark.plans as plans

    return plans.REGISTRY


@pytest.mark.parametrize("q", _registry(), ids=lambda q: q.name)
def test_oracle_parity(spark, q):
    from ltss_spark.plans.parity import compare

    df = q.build(spark, SF_SMOKE)
    if q.oracle is None:
        # rows-only check, mirroring the driver's weaker path
        assert df.count() >= 0
        return
    ok, msg = compare(df, q.oracle, SF_SMOKE)
    assert ok, f"{q.name}: {msg}"
