"""Differential tests: every registered query vs its DuckDB oracle at
sf0.001 (the driver runs the same comparison at sf0.01)."""

from __future__ import annotations

import pytest

from tests._harness import compare
from tests.conftest import SF_SMOKE


def _names():
    from dataengineeringproject_spark import registry

    return sorted(registry.queries())


@pytest.mark.parametrize("name", _names())
def test_query_matches_oracle(spark, name):
    ok, msg = compare(spark, name, SF_SMOKE)
    assert ok, f"{name}: {msg}"
