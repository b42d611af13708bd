"""Round-15 optimization-round tests: pin the internals the r15
optimizations changed (OPTIMIZATION_r15.md).

1. graph_khop_reach's direction-optimizing hop 4: BOTH branches must
   produce identical results on the same fixture (the bottom-up
   complement algebra is only an optimization if it is exactly the
   top-down expansion's answer).
2. corpus_similarity_minhash's per-shingle pair expansion must equal
   the shingle-keyed self-join it replaced.
3. The spatial/DBSCAN offsets literals and heaps' cuts literal moved
   off createDataFrame: their plans must carry NO Python-RDD scan
   (local_df's pure-JVM guarantee — a regression re-introduces ~2-3 s
   of Python worker launches per broadcast-build execution).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


def _rows(df):
    return sorted(tuple(str(v) for v in r) for r in df.collect())


def test_khop_bottomup_equals_topdown(spark):
    import dataengineeringproject_spark.queries.graph_q as G

    try:
        G._KHOP_FORCE_DIRECTION = "topdown"
        top = _rows(G.graph_khop_reach(spark, SF01))
        G._KHOP_FORCE_DIRECTION = "bottomup"
        bot = _rows(G.graph_khop_reach(spark, SF01))
    finally:
        G._KHOP_FORCE_DIRECTION = None
    assert top == bot
    assert len(top) > 0


def test_khop_auto_picks_bottomup_on_saturated_fixture(spark):
    # at sf0.01 the hop-3 frontier saturates (measured in
    # exp_khop_bottomup_sf01_r15.json at sf0.1; same generator), so the
    # auto switch must take the bottom-up branch and still match the
    # pinned top-down result
    import dataengineeringproject_spark.queries.graph_q as G

    auto = _rows(G.graph_khop_reach(spark, SF01))
    # assert the DECISION itself (ADVICE r15: without this, a
    # non-saturating fixture would compare top-down to itself and the
    # test would pass without ever exercising the switch)
    assert G._KHOP_LAST_DIRECTION == "bottomup"
    try:
        G._KHOP_FORCE_DIRECTION = "topdown"
        top = _rows(G.graph_khop_reach(spark, SF01))
        assert G._KHOP_LAST_DIRECTION == "topdown"
    finally:
        G._KHOP_FORCE_DIRECTION = None
    assert auto == top


def test_corpus_sim_pair_expansion_equals_self_join(spark):
    from dataengineeringproject_spark.functions import text as X
    from dataengineeringproject_spark.operators import dedup as D
    from dataengineeringproject_spark.queries.llm_text import (
        _SHINGLE_K,
        _docs,
    )

    ss = (
        _docs(spark, SF)
        .select(
            "source",
            F.explode(D.shingles(F.col("text"), k=_SHINGLE_K)).alias("s"),
        )
        .distinct()
    )
    # old formulation: shingle-keyed self-join
    old = (
        ss.alias("a")
        .join(
            ss.alias("b"),
            (F.col("a.s") == F.col("b.s"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(F.col("a.source").alias("sa"), F.col("b.source").alias("sb"))
        .agg(F.count(F.lit(1)).alias("i"))
    )
    # new formulation: per-shingle sorted source set, in-set pairs
    new = (
        ss.groupBy("s")
        .agg(F.sort_array(F.collect_set("source")).alias("srcs"))
        .filter(F.size("srcs") >= 2)
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(srcs, (x, i) -> "
                    "transform(slice(srcs, i + 2, size(srcs)), "
                    "y -> struct(x AS sa, y AS sb))))"
                )
            ).alias("pr")
        )
        .groupBy(F.col("pr.sa").alias("sa"), F.col("pr.sb").alias("sb"))
        .agg(F.count(F.lit(1)).alias("i"))
    )
    assert _rows(old) == _rows(new)


@pytest.mark.parametrize(
    "qname",
    [
        "heaps_law_vocab_growth",
        "spatial_neighbor_join",
        "dbscan_core_points",
        "corpus_similarity_minhash",
    ],
)
def test_no_python_rdd_scan_in_plan(spark, qname):
    from dataengineeringproject_spark import registry

    df = registry.queries()[qname](spark, SF)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "ExistingRDD" not in plan, plan
    assert "BatchEvalPython" not in plan, plan
