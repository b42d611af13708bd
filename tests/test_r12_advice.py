"""Round-12 regression pins for the ADVICE r11 items.

1. `ensure_min_parallelism` is a no-op pass-through on streaming
   DataFrames (df.rdd raises AnalysisException there, so any streaming
   consumer of the MinHash/vector operator families would fail at plan
   time without the guard).
2. `assign_nearest`'s argmin ranks a NaN cosine FIRST — the pre-r11
   window (`ccos DESC`, Spark sorts NaN above +inf) and the unchanged
   DuckDB row_number oracles both do; the naive min(struct) with
   __neg = -NaN = NaN ranked it LAST. NULL (zero-norm) still loses.
3. `knn_classifier_eval`'s zip_with integer dot coalesces NULL pad
   products to 0, so a ragged embedding contributes its partial dot
   over shared indices (the old dimension-keyed join's and the DuckDB
   oracle's semantics) instead of silently dropping the pair.
4. `kmeans_cluster_stats` projects the interpreted-HOF ccos in its own
   select stage; __neg derives from the materialized column, so the
   dominant N×k cosine cost is evaluated once, not twice.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from _harness import compare
from dataengineeringproject_spark.operators import similarity as S

SF = "/root/testdata/sf0.001"


def test_min_parallelism_streaming_passthrough(spark):
    """ADVICE r11 item 1: a streaming frame must come back unchanged
    (identity, not a repartitioned copy) — df.rdd would raise."""
    sdf = spark.readStream.format("rate").option("rowsPerSecond", 1).load()
    assert sdf.isStreaming
    out = S.ensure_min_parallelism(sdf, "value")
    assert out is sdf


def _assign(spark, cents_rows):
    vecs = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id bigint, v array<double>"
    )
    cents = spark.createDataFrame(
        cents_rows, "cid bigint, cv array<double>"
    )
    rows = S.assign_nearest(vecs, cents, "vec_id").collect()
    assert len(rows) == 1
    return rows[0].cid


def test_assign_nearest_nan_cosine_ranks_first(spark):
    """ADVICE r11 item 3: NaN cosine must WIN against any real cosine
    (window/oracle `ccos DESC` semantics: NaN sorts above +inf)."""
    nan = float("nan")
    # cid 9 has perfect cosine 1.0; cid 5 yields a NaN cosine.
    assert _assign(spark, [(5, [nan, 0.0]), (9, [1.0, 0.0])]) == 5
    # multiple NaN centroids tie-break on min cid.
    assert _assign(spark, [(7, [nan, 0.0]), (4, [nan, 1.0]), (9, [1.0, 0.0])]) == 4


def test_assign_nearest_null_cosine_still_loses(spark):
    """Zero-norm (NULL via try_divide) keeps ranking LAST — the NaN
    sentinel must not disturb the NULL sentinel."""
    assert _assign(spark, [(1, [0.0, 0.0]), (2, [0.5, 0.5])]) == 2
    # all-NULL degenerates to min cid (both engines).
    assert _assign(spark, [(3, [0.0, 0.0]), (2, [0.0, 0.0])]) == 2


def test_knn_ragged_embedding_partial_dot_matches_oracle(spark, tmp_path):
    """ADVICE r11 item 2: on a fixture containing a RAGGED embedding
    (len 3 among len-4 vectors), the Spark query must still hash-match
    its DuckDB oracle — the oracle's dimension-join dot sums shared
    indices, so the ragged vector participates with a partial dot
    rather than dropping out of the vote via a NULL-poisoned sum."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    ids, embs, labels = [], [], []
    for i in range(60):
        dim = 3 if i == 0 else 4
        ids.append(i)
        embs.append([float((i * 7 + d * 3) % 11 - 5) for d in range(dim)])
        labels.append(i % 4)
    tbl = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(embs, pa.list_(pa.float32())),
            "label": pa.array(labels, pa.int32()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
    ok, msg = compare(spark, "knn_classifier_eval", str(tmp_path))
    assert ok, msg


def test_dbscan_edgecap_binding_cross_engine(spark, tmp_path):
    """r12 bounded-degree epsilon graph, verified where the cap BINDS
    (provided testdata never exceeds degree 28): 6,000 hashed points in
    the fixed extent give expected eps-degree ~68 > 64. The full
    differential is intractable here — the oracle's recursive reach CTE
    floods one giant dense component with |C|^2 (id,label) pairs — so
    the pin decomposes:

    1. the CAPPED+SYMMETRIZED core edge set built by the oracle's
       cek/ce SQL (non-recursive) equals Spark's capped edge list after
       the same symmetrization — the construction that r12 changed;
    2. Spark's full cluster census equals a union-find reference over
       that agreed edge set (components = min-id labels), with border
       and noise replicated from the capped border SQL — so the CC
       operator's behavior on a TRUNCATED (asymmetric-before-
       symmetrization) graph is pinned engine-independently."""
    import datetime as dt

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from dataengineeringproject_spark.queries.advanced import (
        _DBSCAN_EDGECAP,
        _DBSCAN_MINPTS,
        _GEO_EPS,
        _GEO_EXTENT,
        _GEO_SEED,
    )
    from dataengineeringproject_spark.functions.text import token_hash_sql
    from dataengineeringproject_spark.registry import queries

    n = 6000
    ts = dt.datetime(2024, 1, 1)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(n), pa.int64()),
                "ts": pa.array([ts] * n, pa.timestamp("us")),
                "user_id": pa.array(range(n), pa.int64()),
                "event_type": pa.array(["view"] * n),
                "value": pa.array([1.0] * n, pa.float64()),
                "props": pa.array(["{}"] * n),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    base_sql = f"""
    WITH u AS (SELECT DISTINCT user_id
               FROM '{tmp_path}/events.parquet'),
    pt AS (
      SELECT user_id,
             {token_hash_sql("CAST(user_id AS VARCHAR)", seed=_GEO_SEED + "-x")} % {_GEO_EXTENT} AS x,
             {token_hash_sql("CAST(user_id AS VARCHAR)", seed=_GEO_SEED + "-y")} % {_GEO_EXTENT} AS y
      FROM u
    ),
    cells AS (
      SELECT user_id, x, y, x // {_GEO_EPS} AS cx, y // {_GEO_EPS} AS cy
      FROM pt
    ),
    probe AS (
      SELECT c.user_id, c.x, c.y, c.cx + dx.d AS px, c.cy + dy.d AS py
      FROM cells c
      CROSS JOIN (SELECT unnest([-1, 0, 1]) AS d) dx
      CROSS JOIN (SELECT unnest([-1, 0, 1]) AS d) dy
    ),
    nbp AS (
      SELECT a.user_id AS id_a, b.user_id AS id_b
      FROM probe a JOIN cells b
        ON b.cx = a.px AND b.cy = a.py AND b.user_id <> a.user_id
       AND (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
             <= {_GEO_EPS * _GEO_EPS}
    ),
    deg AS (SELECT id_a AS user_id, count(*) AS nn FROM nbp GROUP BY 1),
    core AS (SELECT user_id FROM deg WHERE nn >= {_DBSCAN_MINPTS}),
    cek AS (
      SELECT id_a, id_b FROM (
        SELECT nbp.id_a, nbp.id_b,
               row_number() OVER (PARTITION BY nbp.id_a
                                  ORDER BY nbp.id_b ASC) AS rn
        FROM nbp
        JOIN core ca ON ca.user_id = nbp.id_a
        JOIN core cb ON cb.user_id = nbp.id_b
      ) WHERE rn <= {_DBSCAN_EDGECAP}
    ),
    ce AS (SELECT id_a, id_b FROM cek
           UNION SELECT id_b, id_a FROM cek)
    """
    con = duckdb.connect()
    dmax = con.execute(
        base_sql + "SELECT max(nn) FROM deg"
    ).fetchone()[0]
    assert dmax > _DBSCAN_EDGECAP, f"fixture not dense enough: {dmax}"
    duck_edges = set(
        map(tuple, con.execute(base_sql + "SELECT * FROM ce").fetchall())
    )
    duck_core = {
        r[0]
        for r in con.execute(base_sql + "SELECT user_id FROM core").fetchall()
    }
    # border candidates under the cap (cluster labels attached below).
    duck_border_pairs = con.execute(
        base_sql
        + f"""
        SELECT user_id, id_b FROM (
          SELECT nbp.id_a AS user_id, nbp.id_b,
                 row_number() OVER (PARTITION BY nbp.id_a
                                    ORDER BY nbp.id_b ASC) AS rn
          FROM nbp
          JOIN core cb ON cb.user_id = nbp.id_b
          LEFT JOIN core c1 ON c1.user_id = nbp.id_a
          WHERE c1.user_id IS NULL
        ) WHERE rn <= {_DBSCAN_EDGECAP}"""
    ).fetchall()
    n_points = con.execute(base_sql + "SELECT count(*) FROM pt").fetchone()[0]

    # (2) union-find reference over the agreed edge set.
    parent = {u: u for u in duck_core}

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for a, b in duck_edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min-id labels per component
    label = {}
    for u in duck_core:
        r = find(u)
        label.setdefault(r, u)
        label[r] = min(label[r], u)
    comp = {u: label[find(u)] for u in duck_core}
    border = {}
    for ida, idb in duck_border_pairs:
        c = comp[idb]
        border[ida] = min(border.get(ida, c), c)
    from collections import Counter

    census = Counter()
    for u, c in comp.items():
        census[(c, True)] += 1
    for u, c in border.items():
        census[(c, False)] += 1
    expected = {}
    for (c, is_core), cnt in census.items():
        row = expected.setdefault(c, [0, 0])
        row[0 if is_core else 1] += cnt
    n_noise = n_points - len(comp) - len(border)

    got = {
        r.cluster: (r.n_core, r.n_border, r.n_total)
        for r in queries()["dbscan_clusters"](spark, str(tmp_path)).collect()
    }
    assert got.pop(-1) == (0, 0, n_noise)
    assert got == {
        c: (nc, nb, nc + nb) for c, (nc, nb) in expected.items()
    }

    # (1) Spark's capped edge construction equals the oracle's, after
    # the operator's own symmetrization.
    from dataengineeringproject_spark.schemas import load_table
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from dataengineeringproject_spark.functions import text as XT

    u = load_table(spark, str(tmp_path), "events").select("user_id").distinct()
    xh = XT.token_hash(F.col("user_id").cast("string"), seed=_GEO_SEED + "-x")
    yh = XT.token_hash(F.col("user_id").cast("string"), seed=_GEO_SEED + "-y")
    cells = u.select(
        "user_id",
        (xh % _GEO_EXTENT).alias("x"),
        (yh % _GEO_EXTENT).alias("y"),
    ).select(
        "user_id", "x", "y",
        F.expr(f"x div {_GEO_EPS}").alias("cx"),
        F.expr(f"y div {_GEO_EPS}").alias("cy"),
    )
    offs = spark.createDataFrame(
        [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)], "dx int, dy int"
    )
    probe = cells.crossJoin(F.broadcast(offs)).select(
        F.col("user_id").alias("id_a"),
        F.col("x").alias("xa"), F.col("y").alias("ya"),
        (F.col("cx") + F.col("dx")).alias("px"),
        (F.col("cy") + F.col("dy")).alias("py"),
    )
    bb = cells.select(
        F.col("user_id").alias("id_b"),
        F.col("x").alias("xb"), F.col("y").alias("yb"),
        F.col("cx").alias("bcx"), F.col("cy").alias("bcy"),
    )
    d2 = (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb")) + (
        F.col("ya") - F.col("yb")
    ) * (F.col("ya") - F.col("yb"))
    nbp = (
        probe.join(
            bb,
            (F.col("bcx") == F.col("px")) & (F.col("bcy") == F.col("py"))
            & (F.col("id_a") != F.col("id_b")),
        )
        .filter(d2 <= _GEO_EPS * _GEO_EPS)
        .select("id_a", "id_b")
    )
    deg = nbp.groupBy(F.col("id_a").alias("user_id")).agg(
        F.count(F.lit(1)).alias("nn")
    )
    core = deg.filter(F.col("nn") >= _DBSCAN_MINPTS).select("user_id")
    wadj = Window.partitionBy("id_a").orderBy(F.asc("id_b"))
    cek = (
        nbp.join(core.select(F.col("user_id").alias("id_a")), "id_a")
        .join(core.select(F.col("user_id").alias("id_b")), "id_b")
        .withColumn("rn", F.row_number().over(wadj))
        .filter(F.col("rn") <= _DBSCAN_EDGECAP)
        .select("id_a", "id_b")
    )
    sym = cek.union(
        cek.select(F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b"))
    ).distinct()
    spark_edges = {(r.id_a, r.id_b) for r in sym.collect()}
    assert spark_edges == duck_edges


def test_kmeans_stats_ccos_projected_once(spark):
    """ADVICE r11 item 4: __neg must derive from the MATERIALIZED ccos
    attribute, not re-inline the N×k interpreted-HOF cosine — every
    optimized-plan line defining __neg is free of try_divide (the
    cosine marker), proving CollapseProject kept the two-select shape."""
    from dataengineeringproject_spark.registry import queries

    df = queries()["kmeans_cluster_stats"](spark, SF)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    neg_def_lines = [l for l in plan.split("\n") if "AS __neg" in l]
    assert neg_def_lines, "argmin __neg projection missing from plan"
    for line in neg_def_lines:
        assert "try_divide" not in line, (
            "ccos re-inlined into __neg (double evaluation):\n" + line
        )


def test_knn_lsh_cap_formula_cross_engine(spark):
    """VERDICT r11 item 3: the log-scaled per-bucket candidate cap must
    evaluate to the SAME integer on Spark, DuckDB, and the Python twin
    (_knn_lsh_cap) for the measured fixture sizes and the boundary
    cases (n <= capbase -> factor 1; exact power-of-two ratios, where
    log2 is IEEE-exact on both engines)."""
    import duckdb
    import pyspark.sql.functions as F

    from dataengineeringproject_spark.queries.llm_vectors import (
        _KNN_BUCKCAP,
        _KNN_CAPBASE,
        _knn_lsh_cap,
    )

    cases = [1, 100, 1405, _KNN_CAPBASE, 2 * _KNN_CAPBASE,
             4 * _KNN_CAPBASE, 13997, 140161, 10**9]
    expected = {1: 128, 1405: 128, _KNN_CAPBASE: 128,
                2 * _KNN_CAPBASE: 128, 4 * _KNN_CAPBASE: 256,
                13997: 384, 140161: 896}
    con = duckdb.connect()
    for n in cases:
        py = _knn_lsh_cap(n)
        duck = con.execute(
            f"SELECT {_KNN_BUCKCAP} * greatest(1, ceil(log2("
            f"greatest({n}, 1) / {_KNN_CAPBASE}e0)))"
        ).fetchone()[0]
        sp = (
            spark.range(1)
            .select(
                (
                    F.lit(_KNN_BUCKCAP)
                    * F.greatest(
                        F.lit(1).cast("long"),
                        F.ceil(
                            F.log2(
                                F.greatest(F.lit(n), F.lit(1))
                                / F.lit(float(_KNN_CAPBASE))
                            )
                        ),
                    )
                ).alias("cap")
            )
            .collect()[0].cap
        )
        assert py == int(duck) == int(sp), (n, py, duck, sp)
        if n in expected:
            assert py == expected[n], (n, py)


def test_nanvl_sentinel_value(spark):
    """The sentinel expression itself: -NaN→-inf (wins), NULL→+inf
    (loses), real cosine passes through negated."""
    row = spark.range(1).select(
        F.coalesce(
            F.nanvl(-F.lit(float("nan")), F.lit(float("-inf"))),
            F.lit(float("inf")),
        ).alias("nan_case"),
        F.coalesce(
            F.nanvl(-F.lit(None).cast("double"), F.lit(float("-inf"))),
            F.lit(float("inf")),
        ).alias("null_case"),
        F.coalesce(
            F.nanvl(-F.lit(0.25), F.lit(float("-inf"))),
            F.lit(float("inf")),
        ).alias("real_case"),
    ).collect()[0]
    assert row.nan_case == float("-inf")
    assert row.null_case == float("inf")
    assert row.real_case == -0.25
    assert not math.isnan(row.nan_case)


def test_fuzzy_bucket_cap_binding_cross_engine(spark, monkeypatch, tmp_path):
    """r12 _FUZ_BUCKCAP: where the per-(band, bkey) rep cap BINDS, both
    engines must keep the identical rep subset and produce identical
    member pairs. Provided testdata only ever emits distance-0
    (identical-prefix) pairs, which the cap never drops — so this runs
    on a dense synthetic fixture: 30 docs whose 40-char prefixes share
    37 chars (pairwise edit distance 3, one shared hot band bucket)
    plus one identical-prefix pair for the diagonal path. The engine
    reads the module global at call time (monkeypatched to 5) and the
    oracle template is re-rendered with the same cap."""
    import duckdb

    from dataengineeringproject_spark import registry
    from dataengineeringproject_spark.queries import curation as C

    base = "the quick brown fox jumps over the lazy dogs"[:40]
    assert len(base) == 40
    rows = []
    for i in range(30):
        # mutate chars 31..33 only: every pair differs in <= 3 chars,
        # all 3-grams outside 29..35 are shared across the family
        t = base[:31] + f"{i:03d}" + base[34:]
        rows.append((100 + 7 * i, t))
    rows.append((9001, rows[0][1]))  # identical prefix -> diagonal pair
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE docs (doc_id BIGINT, text VARCHAR, lang VARCHAR,"
        " source VARCHAR, n_chars BIGINT)"
    )
    con.executemany(
        "INSERT INTO docs VALUES (?, ?, 'en', 'synth', ?)",
        [(i, t, len(t)) for i, t in rows],
    )
    fx = tmp_path / "fixture"
    fx.mkdir()
    con.execute(
        f"COPY docs TO '{fx}/documents.parquet' (FORMAT PARQUET)"
    )
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM"
        f" read_parquet('{fx}/documents.parquet')"
    )
    cap = 5
    oracle = registry.oracle_sql()["fuzzy_pairs_blocked"]
    assert f"rn <= {C._FUZ_BUCKCAP}" in oracle
    capped_sql = oracle.replace(f"rn <= {C._FUZ_BUCKCAP}", f"rn <= {cap}")
    # the fixture must actually overflow a bucket (else the test is
    # vacuous): hottest (band, bkey) holds > cap reps
    occ_sql = capped_sql.split("kk AS")[0] + (
        "o AS (SELECT band, bkey, count(*) AS n FROM k GROUP BY 1, 2) "
        "SELECT max(n) FROM o"
    )
    max_occ = con.execute(occ_sql).fetchone()[0]
    assert max_occ > cap, f"fixture not dense enough: {max_occ}"
    duck = sorted(map(tuple, con.execute(capped_sql).fetchall()))
    uncapped = sorted(
        map(
            tuple,
            con.execute(
                capped_sql.replace(f"rn <= {cap}", "rn <= 1000000")
            ).fetchall(),
        )
    )
    assert len(uncapped) > len(duck) > 0, (len(uncapped), len(duck))
    monkeypatch.setattr(C, "_FUZ_BUCKCAP", cap)
    sp = sorted(
        (r.id_a, r.id_b, r.edit_dist)
        for r in registry.queries()["fuzzy_pairs_blocked"](
            spark, str(fx)
        ).collect()
    )
    assert sp == duck, (len(sp), len(duck), sp[:3], duck[:3])
    # the diagonal (identical-prefix) pair survives any cap
    assert (100, 9001, 0) in sp


def test_fuzzy_cap_no_bite_on_provided_testdata(spark):
    """The production _FUZ_BUCKCAP=256 must yield OUTPUT identical to
    uncapped at EVERY provided sf (ADVICE r12 item 3) — not just
    sf0.001 where the cap never binds. At sf0.1 the cap provably trims
    ~4.8% of rep-band candidate rows (max occupancy 529 > 256), yet
    every surviving pair's members co-rank within the cap in some
    shared bucket, so the pair output stays row-identical. DuckDB-only
    (the oracle mirrors the engine construction row-for-row), so the
    three-sf loop runs in seconds and pins the no-bite guarantee where
    the cap actually trims candidates."""
    import duckdb

    from dataengineeringproject_spark import registry
    from dataengineeringproject_spark.queries import curation as C

    oracle = registry.oracle_sql()["fuzzy_pairs_blocked"]
    for sf_dir in (SF, "/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM"
            f" read_parquet('{sf_dir}/documents.parquet')"
        )
        capped = sorted(map(tuple, con.execute(oracle).fetchall()))
        uncapped = sorted(
            map(
                tuple,
                con.execute(
                    oracle.replace(f"rn <= {C._FUZ_BUCKCAP}", "rn <= 1000000")
                ).fetchall(),
            )
        )
        assert capped == uncapped and len(capped) > 0, sf_dir
        con.close()
