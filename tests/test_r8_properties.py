"""Round-8 property pins: the streaming twins' correctness rests on
fold-invariance claims — merging a change log (or candidate set) in
micro-batch pieces must equal the one-shot batch computation no matter
how the pieces are cut or ordered. The symmetry tests in
test_streaming.py pin the 3-chronological-slice case the staged
landing zones produce; these tests attack the CLAIM itself with
adversarial partitions: hash splits (wildly out-of-order event time
across slices), reversed slice order, and a per-key-interleaved split.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF_SMOKE = "/root/testdata/sf0.001"


def _final(df):
    cols = ["user_id", "last_op", "last_ts", "last_value"]
    return {
        tuple(r)
        for r in df.filter(F.col("last_op") != "error").select(*cols).collect()
    }


@pytest.mark.parametrize(
    "n_slices,key",
    [
        (1, "event_id"),          # degenerate fold = one-shot
        (4, "event_id"),          # hash-ish split: event time interleaved
        (5, "user_id"),           # per-key split: a key's history in ONE slice
        (3, "value_bucket"),      # arbitrary content split
    ],
)
def test_cdc_merge_fold_is_partition_invariant(spark, n_slices, key):
    """Folding cdc_merge_frames over ANY partition of the change log —
    including splits that deliver a key's changes wildly out of event-
    time order — must equal the batch full-log collapse. This is the
    retained-tombstone design's load-bearing claim: dropping tombstones
    at merge time instead of read-back time fails this test (an older
    change in a later slice resurrects the deleted key)."""
    from dataengineeringproject_spark.queries import advanced
    from dataengineeringproject_spark.schemas import load_table

    ev = load_table(spark, SF_SMOKE, "events")
    if key == "value_bucket":
        part = (F.abs(F.hash(F.col("value"))) % n_slices)
    else:
        part = F.col(key) % n_slices
    state = None
    # reversed slice order: later-modulus slices fold FIRST
    for i in reversed(range(n_slices)):
        state = advanced.cdc_merge_frames(state, ev.filter(part == i))
        # materialize each fold step like the stream's per-trigger
        # parquet commit does (also keeps the lineage shallow)
        state = state.localCheckpoint()
    batch = _final(advanced.cdc_latest_state_tombstones(spark, SF_SMOKE))
    assert _final(state) == batch
    assert len(batch) > 0


def test_cdc_merge_drop_tombstones_early_would_be_wrong(spark):
    """Negative control: the test above must actually discriminate.
    Build a 2-slice fold where the DELETE arrives in slice 1 and an
    OLDER update for the same key arrives in slice 2; early tombstone
    dropping resurrects the key, retained tombstones do not."""
    from dataengineeringproject_spark.queries import advanced

    rows = [
        # (event_id, ts, user_id, event_type, value, props)
        (1, "2024-01-01 00:00:00", 7, "signup", 1.0, None),
        (2, "2024-01-03 00:00:00", 7, "error", 0.0, None),   # DELETE
        (3, "2024-01-02 00:00:00", 7, "click", 2.0, None),   # older, late
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    s1 = advanced.cdc_merge_frames(None, ev.filter(F.col("event_id") <= 2))
    s2 = advanced.cdc_merge_frames(s1, ev.filter(F.col("event_id") == 3))
    assert _final(s2) == set(), "tombstone must survive the late older row"
    # and the tombstone row itself is still IN state (filtered at read)
    assert s2.count() == 1 and s2.first()["last_op"] == "error"


@pytest.mark.parametrize("n_slices", [1, 4])
def test_incr_dedup_accept_fold_is_partition_invariant(spark, n_slices):
    """Folding incr_dedup_accept over ANY partition of the daily batch
    — each step banding only its slice and probing corpus index plus
    previously accepted bands — must reproduce the batch twin's exact
    pair set (ids, jaccard, pair_type). Slices fold in REVERSED
    doc_id-mod order to rule out any accidental order dependence; a
    cross-slice near-dup pair is found once, when its later-folded
    member arrives."""
    from dataengineeringproject_spark.queries import llm_text
    from dataengineeringproject_spark.schemas import load_table

    sf = "/root/testdata/sf0.001"
    d = load_table(spark, sf, "documents")
    batch = d.filter(
        llm_text._incr_bucket("doc_id") >= llm_text._INCR_EXISTING_PCT
    )
    prior = spark.read.parquet(llm_text._staged_sig_index(spark, sf))
    cols = ["id_a", "id_b", "jaccard", "pair_type"]
    folded: set = set()
    for i in reversed(range(n_slices)):
        sl = batch.filter(F.col("doc_id") % n_slices == i)
        pairs, bands = llm_text.incr_dedup_accept(prior, sl, d)
        folded |= {tuple(r) for r in pairs.select(*cols).collect()}
        prior = prior.unionByName(
            bands.select(*[f.name for f in prior.schema.fields])
        ).localCheckpoint()
    expect = {
        tuple(r)
        for r in llm_text.dedup_incremental_minhash(spark, sf)
        .select(*cols)
        .collect()
    }
    assert folded == expect
    assert len(expect) > 0


@pytest.mark.parametrize("how", ["inner", "left"])
def test_salted_join_is_row_identical_to_plain_join(spark, how):
    """salted_join must be row-identical to the unsalted join for
    inner AND left shapes — including an unmatched fact key (left:
    exactly ONE null-extended row, not one per salt replica) and an
    unmatched dim key (dropped both ways). The salt never reaches
    the output schema."""
    from dataengineeringproject_spark.operators.relational import salted_join

    fact = spark.createDataFrame(
        [(i, ["a", "a", "a", "b", "orphan"][i % 5], float(i)) for i in range(40)]
        + [(100, None, 0.0)],  # null join key: dropped inner, kept left
        "fid INT, k STRING, v DOUBLE",
    )
    dim = spark.createDataFrame(
        [("a", 1.0), ("b", 2.0), ("unused", 9.0)], "k STRING, dv DOUBLE"
    )
    got = salted_join(fact, dim, ["k"], salt_buckets=4, salt_on="fid", how=how)
    want = fact.join(dim, ["k"], how)
    assert got.columns == want.columns
    assert "__salt" not in got.columns
    key = lambda r: tuple((v is None, v) for v in r)  # noqa: E731
    assert sorted(got.collect(), key=key) == sorted(want.collect(), key=key)


def test_salted_join_rejects_unsupported_how(spark):
    from dataengineeringproject_spark.operators.relational import salted_join

    df = spark.range(1).withColumnRenamed("id", "k")
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(df, df, ["k"], how="full")
