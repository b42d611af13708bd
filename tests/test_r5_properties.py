"""Oracle-INDEPENDENT invariant checks for the r5 operators: the
DuckDB differential harness proves engine agreement; these prove the
MATH is right by checking properties neither engine can satisfy by
accident (and, for the BPE trainer, against a third, pure-Python
implementation of the algorithm).
"""

from __future__ import annotations

from collections import Counter

import pytest

from dataengineeringproject_spark import registry

from conftest import SF_SMOKE, SF_ORACLE


def _q(spark, name, sf=SF_SMOKE):
    return registry.queries()[name](spark, sf)


# --- BPE trainer vs a pure-Python third implementation ----------------------


def _python_bpe(vocab: dict[str, int], rounds: int):
    """Reference greedy BPE trainer: count adjacent symbol pairs
    weighted by word freq, merge the (count desc, pair asc)-best pair
    everywhere (left-to-right non-overlapping), repeat."""
    words = {w: list(w) for w in vocab}
    out = []
    for rnd in range(1, rounds + 1):
        counts: Counter = Counter()
        for w, syms in words.items():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += vocab[w]
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), n = best
        out.append((rnd, f"{a} {b}", n))
        for w, syms in words.items():
            merged, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    merged.append(a + b)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            words[w] = merged
    return out


def test_bpe_trainer_matches_pure_python(spark):
    """The Spark trainer's learned merge table equals an independent
    pure-Python implementation of the same algorithm on the same
    corpus — a third vote besides the Spark plan and the DuckDB
    oracle."""
    import re

    from dataengineeringproject_spark.queries.llm_text import (
        _BPE_TRAIN_ROUNDS,
    )
    from dataengineeringproject_spark.schemas import load_table

    docs = load_table(spark, SF_SMOKE, "documents").select("text").collect()
    vocab: Counter = Counter()
    for row in docs:
        for w in (row.text or "").strip().lower().split():
            if len(w) >= 2 and re.fullmatch(r"[a-z]+", w):
                vocab[w] += 1
    expected = _python_bpe(dict(vocab), _BPE_TRAIN_ROUNDS)
    got = [
        (r["round"], r["pair"], r["n"])
        for r in sorted(
            _q(spark, "bpe_train_k_merges").collect(), key=lambda r: r["round"]
        )
    ]
    assert got == expected


# --- PageRank invariants ----------------------------------------------------


def test_pagerank_is_a_distribution(spark):
    """Ranks are positive and sum to ~1 (teleport mass conserves it;
    tolerance covers the 6dp per-iteration rounding and the absence of
    dangling redistribution documented in the docstring)."""
    rows = _q(spark, "pagerank_event_graph").collect()
    assert rows, "empty pagerank output"
    total = sum(r["pagerank"] for r in rows)
    assert all(r["pagerank"] > 0 for r in rows)
    assert total == pytest.approx(1.0, abs=1e-3)
    ranks = sorted(r["rnk"] for r in rows)
    assert ranks == list(range(1, len(rows) + 1))


# --- HLL set algebra invariants ---------------------------------------------


def test_hll_intersection_bounds(spark):
    """Sketch-algebra sanity: union estimate never exceeds est_a+est_b,
    never falls below max(est_a, est_b) (register-wise max dominates
    both inputs), and the inclusion-exclusion intersection is within
    sketch error of the exact count (256 registers → ~6.5% relative
    error 1σ; assert a generous 5σ at the union's scale)."""
    for r in _q(spark, "hll_intersection_estimate", SF_ORACLE).collect():
        assert r["est_union"] <= r["est_a"] + r["est_b"] + 1e-6
        assert r["est_union"] >= max(r["est_a"], r["est_b"]) - 1e-6
        scale = max(r["est_union"], 1.0)
        assert abs(r["est_intersection"] - r["n_exact"]) <= 0.33 * scale


# --- binned-quantile mergeability -------------------------------------------


def test_quantile_rollup_merged_equals_direct(spark):
    """The query's whole claim: day-shard histogram merge is LOSSLESS,
    so every (type, quantile) pair must report equal=True."""
    rows = _q(spark, "quantiles_binned_rollup", SF_ORACLE).collect()
    assert rows
    assert all(r["equal"] for r in rows)


# --- profiler invariants ----------------------------------------------------


def test_profile_table_consistency(spark):
    """Every column reports the same n_rows (one table); null fraction
    consistent with counts; distinct estimate positive and within HLL
    error of exact for the low-cardinality columns."""
    from dataengineeringproject_spark.schemas import load_table

    rows = {r["col_name"]: r for r in _q(spark, "profile_table", SF_ORACLE).collect()}
    n_rows = {r["n_rows"] for r in rows.values()}
    assert len(n_rows) == 1
    ev = load_table(spark, SF_ORACLE, "events")
    exact_types = ev.select("event_type").distinct().count()
    est = rows["event_type"]["distinct_est"]
    assert est == pytest.approx(exact_types, rel=0.35)
    for r in rows.values():
        assert r["null_frac"] == pytest.approx(
            r["n_null"] / r["n_rows"], abs=1e-6
        )


# --- sparse similarity invariants -------------------------------------------


def test_tfidf_cosine_pairs_well_formed(spark):
    """Pairs are ordered (id_a < id_b, no duplicates), cosines in
    (0, 1], and descending with the rank order of the top-k cut."""
    rows = _q(spark, "tfidf_cosine_pairs", SF_ORACLE).collect()
    assert rows
    seen = set()
    prev = None
    for r in rows:
        assert r["id_a"] < r["id_b"]
        key = (r["id_a"], r["id_b"])
        assert key not in seen
        seen.add(key)
        assert 0.0 < r["cosine"] <= 1.0 + 1e-9
        if prev is not None:
            assert r["cosine"] <= prev + 1e-9
        prev = r["cosine"]


# --- JS divergence invariants -----------------------------------------------


def test_js_divergence_bounded(spark):
    """JS divergence lives in [0, ln 2] by construction."""
    import math

    for r in _q(spark, "drift_js_binned", SF_ORACLE).collect():
        assert -1e-9 <= r["js_div"] <= math.log(2) + 1e-9


# --- streaming Bloom vs batch -----------------------------------------------


def test_streaming_bloom_equals_batch(spark):
    """The streaming-built filter must converge to the batch filter
    exactly (bit-or is order/batching-independent): identical full
    scorecards."""
    a = _q(spark, "streaming_bloom_dedup", SF_SMOKE).collect()
    b = _q(spark, "bloom_prefilter_join", SF_SMOKE).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_streaming_psi_equals_batch(spark):
    """The streaming drift monitor's converged state must reproduce the
    batch PSI scorecard exactly (bin counts are add-merge, grid frozen
    identically)."""
    a = sorted(map(tuple, _q(spark, "streaming_drift_psi", SF_SMOKE).collect()))
    b = sorted(map(tuple, _q(spark, "drift_psi_value", SF_SMOKE).collect()))
    assert a == b


# --- local_df helper --------------------------------------------------------


def test_local_df_matches_create_dataframe(spark):
    """The pure-JVM literal-plan helper must produce exactly the rows
    and schema of the createDataFrame call it replaces (its reason to
    exist is the execution path, not the semantics), including floats,
    negatives, and empty strings."""
    from dataengineeringproject_spark.schemas import local_df

    rows = [(0, "spark", 0.5), (-7, "", 2.25), (123456789, "join", -0.125)]
    schema = "k long, name string, w double"
    a = local_df(spark, rows, schema)
    b = spark.createDataFrame(rows, schema)
    # literal plans are non-nullable where createDataFrame is nullable —
    # strictly tighter, so compare names and types only
    assert [(f.name, f.dataType) for f in a.schema.fields] == [
        (f.name, f.dataType) for f in b.schema.fields
    ]
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    # and it must be a pure-JVM plan: no RDD scan node
    plan = a._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" not in plan, plan


def test_profile_table_null_accounting(spark, tmp_path):
    """NULL regression coverage for the profiler (r5 review finding:
    Spark format_string renders NULL as the string 'null', DuckDB's
    concat-of-NULL crashed the oracle) on a corpus WITH nulls — the
    shipped testdata has none, so this injects them: copy events with
    every 7th `value` and every 11th `props` nulled, then assert both
    engines agree AND the null counts are exactly right."""
    import duckdb

    from dataengineeringproject_spark import registry
    from dataengineeringproject_spark.schemas import load_table
    from tests._harness import normalize

    from pyspark.sql import functions as F

    d = str(tmp_path / "sfnull")
    ev = load_table(spark, SF_SMOKE, "events")
    ev.withColumn(
        "value",
        F.when(F.col("event_id") % 7 == 0, F.lit(None)).otherwise(
            F.col("value")
        ),
    ).withColumn(
        "props",
        F.when(F.col("event_id") % 11 == 0, F.lit(None)).otherwise(
            F.col("props")
        ),
    ).coalesce(1).write.parquet(d + "/events.parquet")
    # the other tables aren't read by profile_table, but load_table
    # paths exist per-table, so only events is needed
    spdf = registry.queries()["profile_table"](spark, d).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet/*.parquet'"
    )
    ddf = con.execute(registry.oracle_sql()["profile_table"]).df()
    assert sorted(spdf.columns) == sorted(ddf.columns)
    assert len(spdf) == len(ddf)
    assert normalize(spdf) == normalize(ddf)
    rows = {r["col_name"]: r for _, r in spdf.iterrows()}
    n = rows["event_id"]["n_rows"]
    assert rows["value"]["n_null"] == (n + 6) // 7
    assert rows["props"]["n_null"] == (n + 10) // 11
    assert rows["event_id"]["n_null"] == 0


def test_local_df_rejects_unsupported_input(spark):
    """The literal-plan helper fails loudly (instead of mis-parsing) on
    parameterized types and empty row lists (r5 review finding)."""
    from dataengineeringproject_spark.schemas import local_df

    with pytest.raises(ValueError):
        local_df(spark, [(1, 1.5)], "k long, w decimal(10,2)")
    with pytest.raises(ValueError):
        local_df(spark, [], "k long")
