"""Sketch-family invariants (r4): the DuckDB differential harness
already proves Spark and DuckDB compute the SAME sketch — these tests
pin the mathematical properties that make each sketch correct at all,
so a future edit that keeps the two engines consistent but breaks the
construction (wrong rank bit, missed register, hash reuse across CMS
rows) fails a named assertion instead of silently shipping a wrong-
but-consistent estimator.
"""

from __future__ import annotations

import pytest

from dataengineeringproject_spark import registry

from conftest import SF_ORACLE, SF_SMOKE


@pytest.mark.parametrize("sf_dir", [SF_SMOKE, SF_ORACLE])
def test_cms_never_underestimates(spark, sf_dir):
    """Count-Min's one-sided error guarantee: every estimate >= exact."""
    rows = registry.queries()["cms_heavy_hitters"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.overestimate >= 0, r
        assert r.cms_estimate >= r.n_exact, r


@pytest.mark.parametrize("sf_dir", [SF_SMOKE, SF_ORACLE])
def test_hll_error_within_bound(spark, sf_dir):
    """256 registers -> sigma ~ 1.04/sqrt(256) = 6.5%; assert a 3-sigma
    bound (plus slack for the tiny-cardinality smoke set)."""
    rows = registry.queries()["hll_distinct_users"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.rel_err <= 0.25, r


def test_bloom_no_false_negatives(spark):
    """THE Bloom property: every true match passes the filter, so
    pass-count >= true-count and fp_rate is non-negative."""
    (r,) = registry.queries()["bloom_prefilter_join"](spark, SF_ORACLE).collect()
    assert r.n_bloom_pass >= r.n_true_match, r
    assert r.n_bloom_pass <= r.n_probe, r
    assert r.fp_rate is None or 0.0 <= r.fp_rate <= 1.0, r


def test_hll_register_merge_is_lossless(spark):
    """max-merge of daily registers == direct monthly sketch, exactly."""
    rows = registry.queries()["hll_daily_to_monthly_rollup"](
        spark, SF_ORACLE
    ).collect()
    assert rows
    for r in rows:
        assert r.merge_lossless == 1, r
        assert r.est_merged == r.est_direct, r


def test_streaming_hll_matches_batch_registers(spark):
    """The streaming sketch's finished estimates equal the batch HLL
    built from the same events (same construction, so equality is
    exact, not approximate)."""
    import pyspark.sql.functions as F

    from dataengineeringproject_spark.queries.advanced import (
        _hll_bucket_rank,
        _hll_finish,
    )
    from dataengineeringproject_spark.schemas import load_table

    stream_rows = {
        r.day: r.hll_estimate
        for r in registry.queries()["streaming_hll_daily_distinct"](
            spark, SF_SMOKE
        ).collect()
    }
    ev = load_table(spark, SF_SMOKE, "events").select(
        F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day"), "user_id"
    )
    obs = _hll_bucket_rank(ev, ["day"], "user_id")
    regs = obs.groupBy("day", "bucket").agg(F.max("rk").alias("m_rank"))
    batch = {
        r.day: round(r.estimate, 2)
        for r in _hll_finish(regs, ["day"]).collect()
    }
    assert stream_rows == batch
