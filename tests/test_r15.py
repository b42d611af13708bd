"""Round-15 unit tests: recursive/nested source fingerprints,
content-addressed staged table names, the BEHAVIORAL
fingerprint-keyed staging check (ADVICE r14: the r14 test only
grepped for the string 'source_fingerprint' in producer source — a
docstring mention would have satisfied it), and the best-effort
bench drift control."""

from __future__ import annotations

import os

import pytest

from dataengineeringproject_spark.registry import (
    fingerprint_token,
    source_fingerprint,
)


def test_source_fingerprint_nested_layout(tmp_path):
    """Partitioned/nested parquet layouts: rewriting a NESTED part
    file in place (subdir mtime untouched) must change the key
    (ADVICE r14: the top-level-only listing missed this)."""
    sf = tmp_path / "sf"
    d = sf / "events.parquet" / "day=2024-01-01"
    d.mkdir(parents=True)
    part = d / "part-0.parquet"
    part.write_bytes(b"aaaa")
    k1 = source_fingerprint(str(sf), "events")
    # same size, same parent-dir mtime — only the nested file's mtime
    # moves, exactly the in-place rewrite case
    dir_stat = os.stat(d)
    part.write_bytes(b"bbbb")
    os.utime(d, ns=(dir_stat.st_mtime_ns, dir_stat.st_mtime_ns))
    k2 = source_fingerprint(str(sf), "events")
    assert k1 != k2


def test_source_fingerprint_missing_source(tmp_path):
    """A missing source parquet fails with a message naming the table
    and directory, not a bare FileNotFoundError (ADVICE r14)."""
    with pytest.raises(FileNotFoundError, match="documents.*not found"):
        source_fingerprint(str(tmp_path), "documents")


def test_fingerprint_token_content_addressed():
    """Table-name tokens are deterministic per key and distinct across
    keys, so two processes sharing a metastore never claim the same
    name for different source generations (ADVICE r14)."""
    k1 = ("sf", "documents", 1, 100)
    k2 = ("sf", "documents", 2, 100)
    assert fingerprint_token(k1) == fingerprint_token(k1)
    assert fingerprint_token(k1) != fingerprint_token(k2)
    assert len(fingerprint_token(k1)) == 12
    assert all(c in "0123456789abcdef" for c in fingerprint_token(k1))


def test_staged_tokset_restages_on_source_rewrite(spark, tmp_path):
    """BEHAVIORAL fingerprint-keyed staging (ADVICE r14): stage
    against a tmp fixture, rewrite the source parquet, and assert the
    producer returns a NEW staged artifact — not the stale cache."""
    from dataengineeringproject_spark.queries.llm_text import _staged_tokset

    sf = str(tmp_path)
    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon doc {i}", "s") for i in range(8)],
        "doc_id long, text string, source string",
    )
    docs.coalesce(1).write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    p1 = _staged_tokset(spark, sf)
    assert _staged_tokset(spark, sf) == p1  # unchanged source -> cached
    docs.limit(4).coalesce(1).write.mode("overwrite").parquet(
        f"{sf}/documents.parquet"
    )
    p2 = _staged_tokset(spark, sf)
    assert p2 != p1
    assert spark.read.parquet(p2).select("doc_id").distinct().count() == 4


def test_staged_fuz_keys_table_name_content_addressed(spark, tmp_path):
    """The bucketed fuzzy key table's CATALOG NAME embeds the source
    fingerprint token, and a source rewrite yields a different name
    (ADVICE r14: counter-derived names collide across processes)."""
    from dataengineeringproject_spark.queries.curation import _staged_fuz_keys

    sf = str(tmp_path)
    docs = spark.createDataFrame(
        [(i, f"the quick brown fox jumps over dog {i}", "s") for i in range(6)],
        "doc_id long, text string, source string",
    )
    docs.coalesce(1).write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    n1 = _staged_fuz_keys(spark, sf)
    tok1 = n1.rsplit("_", 1)[-1]
    assert n1 == f"deps_fuz_keys_bk_{tok1}" and len(tok1) == 12
    docs.limit(3).coalesce(1).write.mode("overwrite").parquet(
        f"{sf}/documents.parquet"
    )
    n2 = _staged_fuz_keys(spark, sf)
    assert n2 != n1
    assert spark.table(n2).select("doc_id").distinct().count() <= 3


def test_drift_control_best_effort(spark):
    """bench._drift_control must land null/err fields, not crash, when
    a probe's prerequisites are missing (ADVICE r14: a box without
    sf0.001 or daily_agg crashed every bench run pre-artifact)."""
    import bench

    out = bench._drift_control(spark, {})  # no daily_agg registered
    assert out["pandas_groupby_1m_sec"] is not None
    assert out["spark_daily_agg_sf0001_sec"] is None
    assert "spark_daily_agg_sf0001_err" in out


def test_sstr_gram_parts_thresholds(tmp_path):
    """Input-sized gram-shuffle partitioning (VERDICT r14 item 3):
    below the regime boundary the estimator returns None (stock plan
    preserved); above it, partitions scale with on-disk bytes."""
    from dataengineeringproject_spark.queries.llm_text import (
        _SSTR_WINDOWS_PER_BYTE,
        _SSTR_WINDOWS_PER_PART,
        _sstr_gram_parts,
    )

    class FakeConf:
        def get(self, k):
            assert k == "spark.sql.shuffle.partitions"
            return "32"

    class FakeSpark:
        conf = FakeConf()

    small = tmp_path / "small"
    small.mkdir()
    (small / "documents.parquet").write_bytes(b"x" * 1024)
    assert _sstr_gram_parts(FakeSpark(), str(small)) is None

    big = tmp_path / "big"
    big.mkdir()
    nbytes = 64 * 1024 * 1024
    with open(big / "documents.parquet", "wb") as f:
        f.truncate(nbytes)
    n = _sstr_gram_parts(FakeSpark(), str(big))
    assert n == int(nbytes * _SSTR_WINDOWS_PER_BYTE // _SSTR_WINDOWS_PER_PART)
    assert n > 32

    assert _sstr_gram_parts(FakeSpark(), str(tmp_path / "missing")) is None


def test_substr_plan_stock_below_regime(spark):
    """At provided-testdata scales the substring plan must stay the
    stock AQE-coalesced shape: no REPARTITION_BY_NUM exchange (the
    input-sized repartition engages only past the regime boundary)."""
    from dataengineeringproject_spark import registry

    import re

    df = registry.queries()["dedup_substring_exact"](
        spark, "/root/testdata/sf0.001"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    # ensure_min_parallelism's doc_id repartition is expected; the
    # GRAM-grain exchanges must stay ENSURE_REQUIREMENTS (coalescible)
    gram_pins = [
        ln
        for ln in plan.splitlines()
        if "REPARTITION_BY_NUM" in ln
        and re.search(r"hashpartitioning\([^)]*gram#", ln)
    ]
    assert gram_pins == []
