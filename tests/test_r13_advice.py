"""Round-13 ADVICE regression pins (ADVICE r12).

Item 4: `fuzzy_pairs_blocked`'s oracle was rewritten in r12 to mirror
the engine's rep-collapse + per-bucket cap + member-expansion
construction row-for-row (a member-level oracle cannot express a
rep-level cap).  That makes the cross-engine check self-consistent
rather than independent — so the equivalence of the rep construction
(cap disabled) to the ORIGINAL raw member-level band-join formulation
must be pinned by its own test, else a future edit to the shared
expansion logic could silently change semantics in both engines at
once.  DuckDB-only; runs in seconds.
"""

from __future__ import annotations

import duckdb

SF = "/root/testdata/sf0.001"


def _raw_member_level_sql() -> str:
    """The pre-r12 raw formulation (git ff2f717^, curation.py): every
    MEMBER doc derives its band keys directly and the band equi-join
    runs over members — no rep collapse, no bucket cap, no expansion.
    Rebuilt from the module's live constants so a constant change
    cannot desynchronize the two formulations under test."""
    from dataengineeringproject_spark.queries.curation import (
        _FUZ_BANDS,
        _FUZ_ROWS,
        _LEV_MAX,
        _LEV_PREFIX,
        _fuz_band_min_sql,
    )

    bkey = " || ".join(
        "CASE band "
        + " ".join(
            f"WHEN {b} THEN {_fuz_band_min_sql(b, r)}"
            for b in range(_FUZ_BANDS)
        )
        + " END"
        for r in range(_FUZ_ROWS)
    )
    bands = ", ".join(str(b) for b in range(_FUZ_BANDS))
    return f"""
    WITH p AS (
      SELECT doc_id,
             substr(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')),
                    1, {_LEV_PREFIX}) AS pfx
      FROM documents
    ),
    k AS (
      SELECT doc_id, pfx, band, {bkey} AS bkey
      FROM p, (SELECT unnest([{bands}]) AS band) bands
    )
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(levenshtein(a.pfx, b.pfx) AS BIGINT) AS edit_dist
    FROM k a JOIN k b
      ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
    WHERE levenshtein(a.pfx, b.pfx) <= {_LEV_MAX}
    """


def test_fuzzy_rewritten_oracle_equals_raw_formulation():
    """The r12 construction-mirrored oracle, with the cap DISABLED,
    must reproduce the pre-r12 raw member-level band join exactly.
    This is the semantics anchor the mirrored oracle lost: rep
    collapse + distance-0 diagonal expansion + member re-join is a
    pure refactoring of the raw join (band keys and levenshtein
    depend only on the normalized prefix), and any edit that breaks
    that equality changes the query's MEANING, not its physical
    shape (ADVICE r12 item 4)."""
    from dataengineeringproject_spark import registry
    from dataengineeringproject_spark.queries import curation as C

    mirrored = registry.oracle_sql()["fuzzy_pairs_blocked"]
    assert f"rn <= {C._FUZ_BUCKCAP}" in mirrored
    uncapped = mirrored.replace(f"rn <= {C._FUZ_BUCKCAP}", "rn <= 1000000")
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM"
        f" read_parquet('{SF}/documents.parquet')"
    )
    rep = sorted(map(tuple, con.execute(uncapped).fetchall()))
    raw = sorted(map(tuple, con.execute(_raw_member_level_sql()).fetchall()))
    assert len(raw) > 0
    assert rep == raw, (len(rep), len(raw), rep[:3], raw[:3])


def test_staged_producers_match_inline_build(spark):
    """r13 staged shared producers (VERDICT r12 item 4): the parquet
    round-trip must be value-lossless — the staged tokset equals the
    inline explode+distinct shingle build, and the staged fuzzy
    band-key frame equals the inline rep+HOF derivation. If either
    drifts (a schema change, a normalization edit on one side only),
    every consumer goes wrong in a way the construction-mirrored
    oracles might not catch."""
    import pyspark.sql.functions as F

    from dataengineeringproject_spark.operators import dedup as D
    from dataengineeringproject_spark.queries import curation as C
    from dataengineeringproject_spark.queries import llm_text as L

    docs = L._docs(spark, SF)
    staged = set(
        map(
            tuple,
            spark.read.parquet(L._staged_tokset(spark, SF)).collect(),
        )
    )
    inline = set(
        map(
            tuple,
            docs.select(
                "doc_id",
                F.explode(D.shingles(F.col("text"), L._SHINGLE_K)).alias("w"),
            )
            .distinct()
            .collect(),
        )
    )
    assert staged == inline and len(staged) > 0

    staged_g = set(
        map(
            tuple,
            spark.read.parquet(L._staged_docg(spark, SF)).collect(),
        )
    )
    inline_g = set(
        map(
            tuple,
            docs.select(
                "doc_id",
                F.explode(D.shingles(F.col("text"), L._SHINGLE_K)).alias("w"),
            )
            .distinct()
            .groupBy("doc_id")
            .agg(
                F.md5(
                    F.concat_ws("\n", F.array_sort(F.collect_list("w")))
                ).alias("gh")
            )
            .collect(),
        )
    )
    assert staged_g == inline_g and len(staged_g) > 0

    # r14: _staged_fuz_keys returns a (band, bkey)-bucketed catalog
    # table name rather than a parquet path
    staged_k = set(
        map(
            tuple,
            spark.table(C._staged_fuz_keys(spark, SF))
            .select("doc_id", "pfx", "band", "bkey")
            .collect(),
        )
    )
    pfx = F.substring(
        F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " ")),
        1,
        C._LEV_PREFIX,
    )
    reps = (
        docs.select("doc_id", pfx.alias("pfx"))
        .groupBy("pfx")
        .agg(F.min("doc_id").alias("doc_id"))
    )
    inline_k = set()
    for b in range(C._FUZ_BANDS):
        key = F.expr(
            "concat("
            + ", ".join(
                f"array_min(transform(sequence(1, greatest(length(pfx) - 2,"
                f" 1)), i -> md5(concat('{b}r{r}|', substring(pfx, i, 3)))))"
                for r in range(C._FUZ_ROWS)
            )
            + ")"
        )
        inline_k |= set(
            map(
                tuple,
                reps.select(
                    "doc_id", "pfx", F.lit(b).alias("band"), key.alias("bkey")
                ).collect(),
            )
        )
    assert staged_k == inline_k and len(staged_k) > 0


# --- r13 _DBSCAN_CELLCAP (VERDICT r12 item 2) ------------------------------


def test_dbscan_cellcap_no_bite_on_provided_testdata():
    """The production _DBSCAN_CELLCAP=64 must yield OUTPUT identical to
    uncapped at EVERY provided sf (max cell occupancy is 12 at sf0.1,
    so the cap never binds on provided data). DuckDB-only, so the
    three-sf loop over both DBSCAN queries runs in seconds."""
    from dataengineeringproject_spark import registry
    from dataengineeringproject_spark.queries.advanced import (
        _DBSCAN_CELLCAP,
    )

    for name in ("dbscan_clusters", "dbscan_core_points"):
        oracle = registry.oracle_sql()[name]
        assert f"crn <= {_DBSCAN_CELLCAP}" in oracle
        for sf_dir in (SF, "/root/testdata/sf0.01", "/root/testdata/sf0.1"):
            con = duckdb.connect()
            con.execute(
                "CREATE VIEW events AS SELECT * FROM"
                f" read_parquet('{sf_dir}/events.parquet')"
            )
            capped = sorted(map(tuple, con.execute(oracle).fetchall()))
            uncapped = sorted(
                map(
                    tuple,
                    con.execute(
                        oracle.replace(
                            f"crn <= {_DBSCAN_CELLCAP}", "crn <= 1000000"
                        )
                    ).fetchall(),
                )
            )
            assert capped == uncapped and len(capped) > 0, (name, sf_dir)
            con.close()


def test_dbscan_cellcap_binding_cross_engine(spark, monkeypatch):
    """Where _DBSCAN_CELLCAP BINDS, both engines must keep the
    identical per-cell build subset and produce the identical cluster
    census. Provided sf0.01 has cells at occupancy 3, so a cap of 2
    genuinely binds there (asserted non-vacuous below); the engine
    reads the module global at call time (monkeypatched) and the
    oracle is re-rendered with the same cap."""
    from dataengineeringproject_spark import registry
    from dataengineeringproject_spark.queries import advanced as A

    sf_dir = "/root/testdata/sf0.01"
    cap = 2
    prod_cap = A._DBSCAN_CELLCAP
    monkeypatch.setattr(A, "_DBSCAN_CELLCAP", cap)
    for name in ("dbscan_clusters", "dbscan_core_points"):
        # derive the pattern from the production constant (saved above
        # before the monkeypatch) so a future cap change cannot turn
        # the replace into a silent no-op (ADVICE r13)
        pattern = f"crn <= {prod_cap}"
        assert pattern in registry.oracle_sql()[name], (name, pattern)
        oracle = registry.oracle_sql()[name].replace(
            pattern, f"crn <= {cap}"
        )
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW events AS SELECT * FROM"
            f" read_parquet('{sf_dir}/events.parquet')"
        )
        # non-vacuity: at least one epsilon-grid cell holds > cap points
        occ_sql = oracle.split("bcells AS")[0] + (
            "o AS (SELECT cx, cy, count(*) AS n FROM cells GROUP BY 1, 2) "
            "SELECT max(n) FROM o"
        )
        assert con.execute(occ_sql).fetchone()[0] > cap, name
        duck = sorted(map(tuple, con.execute(oracle).fetchall()))
        sp = sorted(
            map(
                tuple,
                registry.queries()[name](spark, sf_dir)
                .toPandas()
                .itertuples(index=False, name=None),
            )
        )
        assert sp == duck, (name, sp[:3], duck[:3])
        con.close()
