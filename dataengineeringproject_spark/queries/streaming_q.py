"""Structured Streaming analogs as ORACLE-CHECKED driver queries
(SURVEY.md §2.7, §7.2.9).

Streaming results are usually exempted to rows-only checks, but
update-mode output lets us do better: every micro-batch re-emits the
current aggregate for each touched key, and the per-key counter
(n_seen / n_events) grows monotonically — so the emission with the
max counter IS the final converged state, equal to the batch answer
over the same data. We stage the events table into a multi-file
directory, drive the stream with maxFilesPerTrigger=1 + availableNow
(so the watermark genuinely advances across micro-batches), collect
the update log from a memory sink, and reduce it to final state with
one window — which the DuckDB oracle can then check like any batch
query.
"""

from __future__ import annotations

import atexit
import contextlib
import itertools
import shutil
import tempfile
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dataengineeringproject_spark.registry import register, register_prestage
from dataengineeringproject_spark.schemas import load_table, local_df
from dataengineeringproject_spark.session import ensure_package_on_workers
from dataengineeringproject_spark.streaming.daily import (
    daily_means_stream,
    daily_mode_stream,
    read_events_stream,
    run_to_memory,
)

_RUN_ID = itertools.count()
_N_FILES = 3
# One staged landing-zone dir per (sf_dir, duplicated) for the whole
# process: the 4 streaming queries re-read the same slices instead of
# re-writing them per query (a correctness-sweep cost saver; the dirs
# are read-only once written).
_STAGED: dict[tuple[str, bool, bool], str] = {}


@atexit.register
def _cleanup_staged() -> None:
    """Remove the staged landing-zone dirs at interpreter exit so
    repeated driver sweeps don't accumulate /tmp copies of events
    (VERDICT r2 item 7); a dir at sf0.1 is ~6 MB, but a long-lived
    host running many sweeps shouldn't leak them."""
    for d in _STAGED.values():
        shutil.rmtree(d, ignore_errors=True)
    _STAGED.clear()


@contextlib.contextmanager
def _pinned_shuffle_partitions(spark: SparkSession, n: int) -> Iterator[None]:
    """Scoped shuffle-partition pin: stateful streaming allocates one
    state store per shuffle partition and cannot AQE-coalesce them, so
    32+ stores for a 30-key state is pure overhead. The previous value
    is restored on exit so batch queries running later in the same
    session keep their configured parallelism. (Local-mode pin — a
    cluster job sizes this per-job.)"""
    key = "spark.sql.shuffle.partitions"
    prev = spark.conf.get(key)
    spark.conf.set(key, str(n))
    try:
        yield
    finally:
        spark.conf.set(key, prev)


def _staged_events(
    spark: SparkSession, sf_dir: str, *, dups: bool = False, sentinel: bool = False
) -> str:
    """Stage events into a parquet dir of _N_FILES chronological slices,
    written oldest-first (the file-drop landing zone a stream would
    watch; FileStreamSource picks files up oldest-modTime-first, so
    micro-batches arrive in event-time order and a 1-day watermark
    never drops data — the realistic stream-arrival shape). load_table
    handles the TIMESTAMP(NANOS) conversion before restaging.

    With dups=True every slice is written TWICE — the at-least-once
    delivery shape (each record redelivered one micro-batch later),
    driving dropDuplicatesWithinWatermark's cross-batch state.

    With sentinel=True two far-future marker slices (ts = max+40/+80
    days) are appended: a stream that needs to EMIT on watermark
    passage (outer-join null emission, final session close) can only
    flush its last rows if something later arrives to push the
    watermark — the punctuation/heartbeat pattern. The markers carry
    REAL event types ('purchase'/'click') with negative event_id and
    user_id, because punctuation must be in-band: a marker with a
    made-up type would be row-group-pruned by the consumer's pushed
    event-type filter at the parquet scan and never reach the
    watermark operator at all. Consumers exclude event_id < 0 at the
    pipeline edge.

    The staged dir is cached per (sf_dir, dups, sentinel) so the whole
    streaming query family stages at most a few times per process."""
    key = (sf_dir, dups, sentinel)
    if key in _STAGED:
        return _STAGED[key]
    ensure_package_on_workers(spark)
    events = load_table(spark, sf_dir, "events")
    lo, hi = events.select(
        F.min("ts").cast("long"), F.max("ts").cast("long")
    ).first()
    step = (hi - lo) // _N_FILES + 1
    d = tempfile.mkdtemp(prefix="deps_stream_events_")
    for i in range(_N_FILES):
        sl = events.filter(
            (F.col("ts").cast("long") >= lo + i * step)
            & (F.col("ts").cast("long") < lo + (i + 1) * step)
        )
        sl.coalesce(1).write.mode("append").parquet(d)
        if dups:
            sl.coalesce(1).write.mode("append").parquet(d)  # redelivery
    if sentinel:
        # TWO marker slices: the watermark a batch computes only takes
        # effect in a LATER batch, so sentinel slice #1 raises it and
        # the batch processing slice #2 evicts/emits under it (no
        # reliance on a trailing no-data micro-batch firing). One row
        # per consumed event type so BOTH join sides' event-time moves.
        for n, extra_days in ((1, 40), (3, 80)):
            mx = events.agg(F.max("ts").alias("ts"))
            marker = mx.select(
                F.explode(
                    F.array(
                        F.struct(
                            F.lit(-n).cast("long").alias("event_id"),
                            F.lit("purchase").alias("event_type"),
                        ),
                        F.struct(
                            F.lit(-n - 1).cast("long").alias("event_id"),
                            F.lit("click").alias("event_type"),
                        ),
                    )
                ).alias("m"),
                (F.col("ts") + F.expr(f"INTERVAL {extra_days} DAYS")).alias("ts"),
            ).select(
                F.col("m.event_id").alias("event_id"),
                "ts",
                F.lit(-1).cast("long").alias("user_id"),
                F.col("m.event_type").alias("event_type"),
                F.lit(0.0).alias("value"),
                F.lit(None).cast("string").alias("props"),
            )
            marker = marker.select(*[f.name for f in events.schema.fields])
            marker.coalesce(1).write.mode("append").parquet(d)
    _STAGED[key] = d
    return d


def _prestage_events(spark: SparkSession, sf_dir: str) -> str:
    """Prestage hook: the plain (no-dups, no-sentinel) staged landing
    zone consumed by streaming_cdc_scd1_upsert and the daily-agg
    streams — file ARRIVAL cost stays out of benchmark timed regions."""
    return _staged_events(spark, sf_dir)


register_prestage(_prestage_events)


def _final_state(update_log: DataFrame, key: str, counter: str) -> DataFrame:
    """Reduce an update-mode emission log to the final row per key: the
    counter is monotone per key, so max(counter) marks convergence."""
    w = Window.partitionBy(key).orderBy(F.desc(counter))
    return (
        update_log.distinct()
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


@register(
    "streaming_daily_mode",
    oracle="""
    WITH src AS (SELECT strftime(ts, '%Y-%m-%d') AS day, event_type FROM events),
    c AS (
      SELECT day, event_type AS v, count(*) AS cnt
      FROM src WHERE event_type IS NOT NULL GROUP BY 1, 2
    ),
    r AS (
      SELECT day, v,
             row_number() OVER (PARTITION BY day ORDER BY cnt DESC, v ASC) AS rn,
             sum(cnt) OVER (PARTITION BY day) AS total
      FROM c
    ),
    d AS (SELECT DISTINCT day FROM src)
    SELECT d.day, r.v AS mode_event_type,
           CAST(COALESCE(r.total, 0) AS BIGINT) AS n_seen
    FROM d LEFT JOIN (SELECT day, v, total FROM r WHERE rn = 1) r USING (day)
    """,
)
def streaming_daily_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 (deterministic mode) as a custom stateful streaming operator
    (applyInPandasWithState) driven to convergence; final state checked
    against the batch oracle — the 'custom stateful streaming' item
    from SURVEY.md §7.2.9, with a full hash check instead of the
    rows-only exemption."""
    d = _staged_events(spark, sf_dir)
    name = f"daily_mode_q_{next(_RUN_ID)}"
    with _pinned_shuffle_partitions(spark, 8):
        stream = daily_mode_stream(
            read_events_stream(spark, d, max_files_per_trigger=1)
        )
        run_to_memory(stream, name, output_mode="update")
    return _final_state(spark.table(name), "day", "n_seen")


@register(
    "streaming_daily_means",
    oracle="""
    SELECT strftime(ts, '%Y-%m-%d') AS day,
           ROUND(avg(value), 6) AS avg_value,
           CAST(count(*) AS BIGINT) AS n_events
    FROM events GROUP BY 1
    """,
)
def streaming_daily_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 as a watermarked tumbling-window streaming aggregate, driven
    across 3 micro-batches (watermark advances between them); final
    per-day emission equals the batch aggregate."""
    d = _staged_events(spark, sf_dir)
    name = f"daily_means_q_{next(_RUN_ID)}"
    with _pinned_shuffle_partitions(spark, 8):
        stream = daily_means_stream(
            read_events_stream(spark, d, max_files_per_trigger=1)
        )
        run_to_memory(stream, name, output_mode="update")
    final = _final_state(spark.table(name), "day", "n_events")
    return final.select(
        "day", F.round("avg_value", 6).alias("avg_value"), "n_events"
    )


@register(
    "streaming_dedup_daily_counts",
    oracle="""
    SELECT strftime(ts, '%Y-%m-%d') AS day,
           ROUND(ROUND(sum(value), 2) / count(*), 6) AS avg_value,
           CAST(count(*) AS BIGINT) AS n_events
    FROM events GROUP BY 1
    """,
)
def streaming_dedup_daily_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exactly-once-per-event dedup: every input record is
    delivered TWICE across micro-batches (the at-least-once source
    shape); dropDuplicatesWithinWatermark absorbs the replays before
    the windowed daily aggregate, so the converged state equals the
    batch aggregate over the ORIGINAL (unduplicated) events — which is
    what the oracle checks."""
    from dataengineeringproject_spark.streaming.daily import (
        dedup_daily_counts_stream,
    )

    d = _staged_events(spark, sf_dir, dups=True)
    name = f"dedup_counts_q_{next(_RUN_ID)}"
    with _pinned_shuffle_partitions(spark, 8):
        stream = dedup_daily_counts_stream(
            read_events_stream(spark, d, max_files_per_trigger=1)
        )
        run_to_memory(stream, name, output_mode="update")
    final = _final_state(spark.table(name), "day", "n_events")
    return final.select(
        "day",
        F.round(F.round("sum_value", 2) / F.col("n_events"), 6).alias("avg_value"),
        "n_events",
    )


@register(
    "streaming_sliding_means",
    oracle="""
    WITH starts AS (
      SELECT value,
             UNNEST([date_trunc('day', ts) - INTERVAL 1 DAY,
                     date_trunc('day', ts)]) AS win_start
      FROM events
    )
    SELECT strftime(win_start, '%Y-%m-%d %H:%M:%S') AS win_start,
           ROUND(avg(value), 6) AS avg_value,
           CAST(count(*) AS BIGINT) AS n_events
    FROM starts GROUP BY 1
    """,
)
def streaming_sliding_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (2d/1d) under Structured Streaming, driven
    across chronological micro-batches; update-log reduced to final
    state per window and checked against the batch sliding-window
    oracle — completes the tumbling/sliding/session window family with
    a hash-checked streaming member."""
    from dataengineeringproject_spark.streaming.daily import sliding_means_stream

    d = _staged_events(spark, sf_dir)
    name = f"sliding_means_q_{next(_RUN_ID)}"
    with _pinned_shuffle_partitions(spark, 8):
        stream = sliding_means_stream(
            read_events_stream(spark, d, max_files_per_trigger=1)
        )
        run_to_memory(stream, name, output_mode="update")
    final = _final_state(spark.table(name), "win_start", "n_events")
    return final.select(
        "win_start", F.round("avg_value", 6).alias("avg_value"), "n_events"
    )


@register(
    "streaming_band_join",
    oracle="""
    SELECT p.event_id AS purchase_id, c.event_id AS click_id,
           CAST(date_diff('second', c.ts, p.ts) AS BIGINT) AS lag_s
    FROM events p JOIN events c
      ON p.user_id = c.user_id
     AND p.event_type = 'purchase' AND c.event_type = 'click'
     AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
    """,
)
def streaming_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STREAM inner join — the continuous twin of the batch
    `time_band_join`: purchases join every click by the same user in
    the hour before the purchase, both sides arriving as streams. The
    time-band predicate bounds join STATE on both sides: with the
    1-day watermarks, a buffered click can be dropped once the
    purchase-side watermark passes its hour window (Spark derives the
    state-eviction bound from the range condition — the mechanism that
    keeps state finite on an unbounded stream). Inner-join append
    output is final per match, so the completed run must equal the
    batch join exactly — full oracle hash check, no rows-only
    exemption."""
    d = _staged_events(spark, sf_dir)
    name = f"band_join_q_{next(_RUN_ID)}"
    with _pinned_shuffle_partitions(spark, 8):
        purchases = (
            read_events_stream(spark, d, max_files_per_trigger=1)
            .filter(F.col("event_type") == "purchase")
            .withWatermark("ts", "1 day")
            .select(
                F.col("event_id").alias("purchase_id"),
                F.col("user_id").alias("p_user"),
                F.col("ts").alias("p_ts"),
            )
        )
        clicks = (
            read_events_stream(spark, d, max_files_per_trigger=1)
            .filter(F.col("event_type") == "click")
            .withWatermark("ts", "1 day")
            .select(
                F.col("event_id").alias("click_id"),
                F.col("user_id").alias("c_user"),
                F.col("ts").alias("c_ts"),
            )
        )
        joined = purchases.join(
            clicks,
            (F.col("p_user") == F.col("c_user"))
            & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
            & (F.col("c_ts") <= F.col("p_ts")),
        )
        out = joined.select(
            "purchase_id",
            "click_id",
            (F.col("p_ts").cast("long") - F.col("c_ts").cast("long"))
            .cast("long")
            .alias("lag_s"),
        )
        run_to_memory(out, name, output_mode="append")
    return spark.table(name)


_TYPE_WEIGHTS = [
    ("click", 0.5),
    ("error", 0.0),
    ("purchase", 2.0),
    ("signup", 5.0),
    ("view", 0.1),
]


@register(
    "streaming_static_join_daily",
    oracle=f"""
    WITH w(event_type, weight) AS (
      VALUES {", ".join(f"('{t}', {x})" for t, x in _TYPE_WEIGHTS)}
    )
    SELECT strftime(e.ts, '%Y-%m-%d') AS day,
           ROUND(sum(e.value * w.weight), 6) AS weighted_value,
           CAST(count(*) AS BIGINT) AS n_events
    FROM events e JOIN w USING (event_type)
    GROUP BY 1
    """,
)
def streaming_static_join_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STATIC join: the events stream enriched against a static
    dimension (per-type weights) before a watermarked daily aggregate —
    the standard streaming-enrichment shape (dim broadcast into every
    micro-batch, no state for the join itself; only the window agg
    keeps state). Final emission per day equals the batch join+agg."""
    d = _staged_events(spark, sf_dir)
    name = f"static_join_q_{next(_RUN_ID)}"
    weights = local_df(spark, _TYPE_WEIGHTS, "event_type string, weight double")
    with _pinned_shuffle_partitions(spark, 8):
        ev = read_events_stream(spark, d, max_files_per_trigger=1)
        enriched = ev.join(F.broadcast(weights), "event_type")
        agg = (
            enriched.withWatermark("ts", "1 day")
            .groupBy(F.window("ts", "1 day").alias("win"))
            .agg(
                F.sum(F.col("value") * F.col("weight")).alias("wsum"),
                F.count(F.lit(1)).alias("n_events"),
            )
            .select(
                F.date_format(F.col("win.start"), "yyyy-MM-dd").alias("day"),
                "wsum",
                "n_events",
            )
        )
        run_to_memory(agg, name, output_mode="update")
    final = _final_state(spark.table(name), "day", "n_events")
    return final.select(
        "day", F.round("wsum", 6).alias("weighted_value"), "n_events"
    )


@register(
    "streaming_outer_join",
    oracle="""
    SELECT p.event_id AS purchase_id, c.event_id AS click_id,
           CAST(date_diff('second', c.ts, p.ts) AS BIGINT) AS lag_s
    FROM events p LEFT JOIN events c
      ON p.user_id = c.user_id
     AND c.event_type = 'click'
     AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
    WHERE p.event_type = 'purchase'
    """,
)
def streaming_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STREAM LEFT OUTER join — the correctness-subtle variant:
    a purchase with no same-user click in the preceding hour must still
    emit (with nulls), and the engine may only do so once the watermark
    proves no matching click can arrive. That makes end-of-stream the
    hard part: the last day of purchases would sit in state forever on
    a quiet source, so the staged landing zone appends two far-future
    IN-BAND punctuation slices (real event types, negative ids —
    in-band because an out-of-band marker type gets row-group-pruned by
    the pushed event-type filter at the parquet scan and never reaches
    the watermark operator; and two slices because a batch's watermark
    only takes effect in a later batch). The markers advance both
    sides' event time, flush every pending null-emission, and are
    excluded at the pipeline edge (purchase_id >= 0). State on both
    sides stays bounded by the range condition exactly as in the inner
    variant.
    With the flush guaranteed, the completed run equals the batch LEFT
    JOIN — full oracle hash check, no rows-only exemption."""
    d = _staged_events(spark, sf_dir, sentinel=True)
    name = f"outer_join_q_{next(_RUN_ID)}"
    with _pinned_shuffle_partitions(spark, 8):
        # ONE source, self-joined. Two independent readStream instances
        # over the same directory can disagree on per-batch file sets,
        # and the global watermark is the MIN across inputs — one lagging
        # source then pins the watermark and the outer join never flushes
        # its null-emissions. A self-join shares the source and the
        # watermark node, so event time is consistent by construction.
        src = read_events_stream(spark, d, max_files_per_trigger=1).withWatermark(
            "ts", "1 day"
        )
        purchases = src.filter(F.col("event_type") == "purchase").select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        clicks = src.filter(F.col("event_type") == "click").select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        joined = purchases.join(
            clicks,
            (F.col("p_user") == F.col("c_user"))
            & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
            & (F.col("c_ts") <= F.col("p_ts")),
            "leftOuter",
        )
        out = joined.filter(F.col("purchase_id") >= 0).select(
            "purchase_id",
            "click_id",
            (F.col("p_ts").cast("long") - F.col("c_ts").cast("long"))
            .cast("long")
            .alias("lag_s"),
        )
        run_to_memory(out, name, output_mode="append")
    return spark.table(name)


_SES_GAP_MIN = 30


@register(
    "streaming_session_window",
    oracle=f"""
    WITH t AS (
      SELECT user_id, ts, value,
             -- >= (not >): Spark's session_window is half-open
             -- [start, last_ts + gap), so an event landing EXACTLY gap
             -- after the previous one starts a NEW session; the oracle
             -- mirrors that exclusive boundary.
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       >= INTERVAL {_SES_GAP_MIN} MINUTE
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    ),
    s AS (
      SELECT *, sum(is_new) OVER (
        PARTITION BY user_id ORDER BY ts
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
      FROM t
    )
    SELECT user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           CAST(count(*) AS BIGINT) AS n_events,
           ROUND(sum(value), 2) AS sum_value
    FROM s GROUP BY user_id, session_no
    """,
)
def streaming_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SESSION windows under Structured Streaming — the variable-length
    window family's streaming member (batch twin: session_window_agg).
    Sessions can MERGE in state as new events extend them, so Spark
    forbids update-mode output here; append mode emits a session only
    once the watermark passes its end, which makes end-of-stream the
    hard part exactly as in streaming_outer_join: the staged landing
    zone's two far-future in-band punctuation slices push the watermark
    past every real session's end so the final sessions flush. Sentinel
    rows (user_id < 0) form their own sessions and are excluded at the
    pipeline edge. State per key is one (start, end, agg) triple,
    bounded by the watermark horizon; the emitted log IS final (append
    semantics), so the completed run equals the batch lag/cumsum-island
    oracle row-for-row — full hash check, no rows-only exemption."""
    d = _staged_events(spark, sf_dir, sentinel=True)
    name = f"session_win_q_{next(_RUN_ID)}"
    with _pinned_shuffle_partitions(spark, 8):
        src = read_events_stream(spark, d, max_files_per_trigger=1)
        agg = (
            src.withWatermark("ts", "1 day")
            .groupBy(
                F.session_window("ts", f"{_SES_GAP_MIN} minutes").alias("win"),
                "user_id",
            )
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.round(F.sum("value"), 2).alias("sum_value"),
            )
            .select(
                "user_id",
                F.date_format("win.start", "yyyy-MM-dd HH:mm:ss").alias(
                    "session_start"
                ),
                "n_events",
                "sum_value",
            )
        )
        run_to_memory(agg, name, output_mode="append")
    # Sentinel exclusion happens HERE, on the batch read of the memory
    # sink — NOT inside the streaming plan: user_id is a grouping key,
    # so a streaming-side filter(user_id >= 0) would be pushed through
    # the aggregation to the file scan, dropping the punctuation rows
    # before the watermark operator and stalling the final flush (the
    # last day's sessions would never emit; found by batch-progress
    # trace: sentinel batches read 0 rows with the filter in-plan).
    return spark.table(name).filter(F.col("user_id") >= 0)


@register(
    "streaming_hll_daily_distinct",
    oracle="""
    WITH h AS (
      SELECT strftime(ts, '%Y-%m-%d') AS day,
             CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
                  AS BIGINT) AS hash
      FROM events
    ),
    reg AS (
      SELECT day, hash % 256 AS bucket,
             max(CASE WHEN hash // 256 = 0 THEN 53
                      ELSE 53 - length(bin(hash // 256)) END) AS m_rank
      FROM h GROUP BY 1, 2
    ),
    est AS (
      SELECT day,
             CASE WHEN 47072.71267120224 / (s_present + (256 - c_present) * 1e0)
                       <= 2.5e0 * 256 AND 256 - c_present > 0
                  THEN 256 * ln(256 * 1e0 / (256 - c_present))
                  ELSE 47072.71267120224 / (s_present + (256 - c_present) * 1e0)
             END AS estimate
      FROM (
        SELECT day, sum(pow(2e0, -m_rank)) AS s_present,
               count(*) AS c_present
        FROM reg GROUP BY day
      )
    ),
    ex AS (
      SELECT strftime(ts, '%Y-%m-%d') AS day,
             count(DISTINCT user_id) AS n_exact
      FROM events GROUP BY 1
    )
    SELECT est.day, CAST(ex.n_exact AS BIGINT) AS n_exact,
           ROUND(est.estimate, 2) AS hll_estimate,
           ROUND(abs(est.estimate - ex.n_exact) / ex.n_exact, 4) AS rel_err
    FROM est JOIN ex USING (day)
    """,
)
def streaming_hll_daily_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketches composed with Structured Streaming — the telemetry
    shape the sketch family exists for: per-day distinct-user
    estimation where the streaming aggregation STATE IS the HLL
    register table. The stream projects each event to its (bucket,
    rank) observation (deterministic md5 codegen, no Python), then a
    watermarked tumbling-window groupBy keeps max(rank) per (day,
    bucket): bounded state of <= days x 256 tiny rows regardless of
    event volume — this is why approx-distinct works as a streaming
    aggregate while exact count(DISTINCT) cannot (distinct state grows
    with cardinality and distinct does not merge). Update-mode
    emissions re-emit registers as they grow; because a register is
    MONOTONE under max, the final state is recovered from the emission
    log by one more max — no counter column needed. The estimate is
    finished batch-side on the converged register table (shared
    _hll_finish), and the DuckDB oracle regenerates the identical
    registers from the raw table: the whole streaming sketch is
    value-hash-checked, no rows-only exemption. Constants are the
    hll_distinct_users family's (256 registers, repr-round-tripped
    bias constant)."""
    from dataengineeringproject_spark.queries.advanced import (
        _hll_bucket_rank,
        _hll_finish,
    )

    d = _staged_events(spark, sf_dir)
    name = f"hll_daily_q_{next(_RUN_ID)}"
    with _pinned_shuffle_partitions(spark, 8):
        src = read_events_stream(spark, d, max_files_per_trigger=1)
        obs = _hll_bucket_rank(src.select("ts", "user_id"), ["ts"], "user_id")
        agg = (
            obs.withWatermark("ts", "1 day")
            .groupBy(F.window("ts", "1 day").alias("win"), "bucket")
            .agg(F.max("rk").alias("m_rank"))
            .select(
                F.date_format("win.start", "yyyy-MM-dd").alias("day"),
                "bucket",
                "m_rank",
            )
        )
        run_to_memory(agg, name, output_mode="update")
    registers = (
        spark.table(name)
        .groupBy("day", "bucket")
        .agg(F.max("m_rank").alias("m_rank"))
    )
    est = _hll_finish(registers, ["day"])
    ev = load_table(spark, sf_dir, "events")
    ex = ev.groupBy(
        F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day")
    ).agg(F.countDistinct("user_id").alias("n_exact"))
    return est.join(ex, "day").select(
        "day",
        F.col("n_exact").cast("long").alias("n_exact"),
        F.round("estimate", 2).alias("hll_estimate"),
        F.round(
            F.abs(F.col("estimate") - F.col("n_exact")) / F.col("n_exact"), 4
        ).alias("rel_err"),
    )


from dataengineeringproject_spark.queries.advanced import (  # noqa: E402
    CMS_HEAVY_HITTERS_ORACLE as _CMS_SHARED_ORACLE,
)


@register(
    "streaming_cms_heavy_hitters",
    # shares the BATCH cms_heavy_hitters oracle verbatim (the streaming
    # sketch must reduce to the identical state; see docstring)
    oracle=_CMS_SHARED_ORACLE,
)
def streaming_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch maintained AS STREAMING STATE — the add-merge
    companion to streaming_hll_daily_distinct's max-merge: the stream
    explodes each event into its 4 (row, bucket) cells and a running
    groupBy counts per cell. State is the FIXED 4x256 counter grid at
    any event volume and any key cardinality (no watermark needed:
    the key space is the sketch's, not the data's — this is the
    property that lets telemetry pipelines keep per-key frequency
    queries over unbounded id spaces in kilobytes of state).
    Update-mode cell counts grow monotonically, so the emission log
    reduces to converged state by max per cell; the read-back (exact
    top-10 heavy hitters probed with min-over-rows) then matches the
    BATCH cms_heavy_hitters bit-for-bit, so this query shares its
    oracle verbatim — the streaming path is held to the identical
    hash check."""
    from dataengineeringproject_spark.queries.advanced import (
        _CMS_D,
        _CMS_TOPK,
        _CMS_W,
    )
    from dataengineeringproject_spark.functions.text import token_hash

    def bucket(j: int, col: F.Column) -> F.Column:
        return token_hash(col.cast("string"), seed=f"cms{j}") % _CMS_W

    d = _staged_events(spark, sf_dir)
    name = f"cms_hh_q_{next(_RUN_ID)}"
    with _pinned_shuffle_partitions(spark, 8):
        src = read_events_stream(spark, d, max_files_per_trigger=1)
        cells = src.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(j).alias("j"),
                            bucket(j, F.col("user_id")).alias("bucket"),
                        )
                        for j in range(_CMS_D)
                    ]
                )
            ).alias("s")
        ).select("s.j", "s.bucket")
        agg = cells.groupBy("j", "bucket").agg(F.count(F.lit(1)).alias("c"))
        run_to_memory(agg, name, output_mode="update")
    sketch = (
        spark.table(name).groupBy("j", "bucket").agg(F.max("c").alias("c"))
    )
    ev = load_table(spark, sf_dir, "events")
    top = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_exact"))
        .orderBy(F.desc("n_exact"), F.asc("user_id"))
        .limit(_CMS_TOPK)
        .withColumn(
            "rnk",
            F.row_number().over(
                Window.orderBy(F.desc("n_exact"), F.asc("user_id"))
            ),
        )
    )
    probes = top.select(
        "user_id",
        "n_exact",
        "rnk",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        bucket(j, F.col("user_id")).alias("bucket"),
                    )
                    for j in range(_CMS_D)
                ]
            )
        ).alias("p"),
    ).select("user_id", "n_exact", "rnk", "p.j", "p.bucket")
    est = (
        probes.join(F.broadcast(sketch), ["j", "bucket"])
        .groupBy("user_id", "n_exact", "rnk")
        .agg(F.min("c").alias("cms_estimate"))
    )
    return est.select(
        "user_id",
        F.col("rnk").cast("long").alias("rnk"),
        F.col("n_exact").cast("long").alias("n_exact"),
        F.col("cms_estimate").cast("long").alias("cms_estimate"),
        (F.col("cms_estimate") - F.col("n_exact")).cast("long").alias(
            "overestimate"
        ),
    )



from dataengineeringproject_spark.queries.advanced import (  # noqa: E402
    BLOOM_PREFILTER_ORACLE as _BLOOM_SHARED_ORACLE,
)


@register(
    "streaming_bloom_dedup",
    # shares the BATCH bloom_prefilter_join oracle verbatim: the
    # streaming filter's bit set must converge to the identical batch
    # filter (bit-or is order-independent), so the full scorecard —
    # including the measured false-drop rate — is held to the same
    # value hash.
    oracle=_BLOOM_SHARED_ORACLE,
)
def streaming_bloom_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom filter maintained AS STREAMING STATE — the third streaming
    sketch merge class, completing the trio: HLL merges by MAX,
    CMS by ADD, Bloom by bit-OR (all commutative+associative+
    idempotent-or-monotone, which is exactly why each works as a
    streaming aggregation). The build stream (pre-cutoff purchase
    users) explodes each key into its _BLOOM_K bit positions and a running
    groupBy keeps bit=1 per position: state is AT MOST the filter's
    _BLOOM_M one-row bits regardless of event volume or key cardinality —
    the bounded-memory property that lets a 100 TB ingest keep
    approximate seen-before dedup state in kilobytes where an exact
    seen-set grows without bound. Update-mode bit emissions are
    monotone, so the converged filter is the distinct position set of
    the emission log. The read-back (shared bloom_readback) then
    probes the click stream through the streaming-built filter:
    fp_rate IS the measured false-drop rate — the fraction of
    never-purchased click users the filter would wrongly drop as
    'already seen' — the number an approximate dedup deployment
    budgets (expected ~(1 - e^(-kn/m))^k; filter sizing is the knob).

    Cites reference scope: the reference has no streaming surface
    (SURVEY §2.6); this extends the engine's streaming-sketch family
    (§8.8.3) with the Bloom merge class."""
    from dataengineeringproject_spark.queries.advanced import (
        _BLOOM_CUTOFF,
        _BLOOM_K,
        _bloom_pos,
        bloom_readback,
    )

    d = _staged_events(spark, sf_dir)
    name = f"bloom_dedup_q_{next(_RUN_ID)}"
    with _pinned_shuffle_partitions(spark, 8):
        src = read_events_stream(spark, d, max_files_per_trigger=1)
        build = src.filter(
            (F.col("event_type") == "purchase")
            & (F.col("ts") < F.lit(_BLOOM_CUTOFF).cast("timestamp"))
        ).select("user_id")
        obs = build.select(
            F.explode(
                F.array(*[_bloom_pos(j) for j in range(_BLOOM_K)])
            ).alias("pos")
        )
        # non-windowed streaming groupBy: no watermark on purpose — the
        # key space is the filter's bit positions (bounded), not the
        # data's, so state cannot grow past the filter size.
        agg = obs.groupBy("pos").agg(F.max(F.lit(1)).alias("bit"))
        run_to_memory(agg, name, output_mode="update")
    bits = (
        spark.table(name)
        .select("pos")
        .distinct()
        .agg(F.collect_set("pos").alias("bits"))
    )
    return bloom_readback(spark, sf_dir, bits)


from dataengineeringproject_spark.queries.advanced import (  # noqa: E402
    DRIFT_PSI_ORACLE as _PSI_SHARED_ORACLE,
)


@register(
    "streaming_drift_psi",
    # shares the BATCH drift_psi_value oracle verbatim: the streaming
    # bin-count state must converge to the identical (type, bin)
    # counts, so the whole PSI scorecard is held to the same hash.
    oracle=_PSI_SHARED_ORACLE,
)
def streaming_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drift monitoring AS A STREAMING JOB — what PSI actually is in
    production: the monitoring grid (vmin/vmax) is frozen from the
    reference table at deploy time (psi_observations), each arriving
    event projects to its (event_type, bin, side) observation through
    the broadcast grid, and a non-windowed update-mode groupBy keeps
    the running per-(type, bin, side) counts: state is AT MOST
    |types| x 10 bins x 2 counters regardless of volume — the grid's
    key space, not the data's, so no watermark is needed (same
    bounded-state argument as the CMS and Bloom streaming sketches;
    bin counts are the add-merge class, like CMS cells). Counts are
    monotone, so the converged state is the emission log's max per
    key; the read-back densifies and finishes through the SHARED
    psi_finish, and the result hash-matches the batch drift_psi_value
    exactly."""
    from dataengineeringproject_spark.queries.advanced import (
        psi_finish,
        psi_observations,
    )

    d = _staged_events(spark, sf_dir)
    name = f"psi_q_{next(_RUN_ID)}"
    _, project = psi_observations(spark, sf_dir)
    with _pinned_shuffle_partitions(spark, 8):
        src = read_events_stream(spark, d, max_files_per_trigger=1)
        obs = project(src)
        agg = obs.groupBy("event_type", "bin").agg(
            F.sum("in_a").alias("a_cnt"),
            F.sum(1 - F.col("in_a")).alias("b_cnt"),
        )
        run_to_memory(agg, name, output_mode="update")
    g0 = (
        spark.table(name)
        .groupBy("event_type", "bin")
        .agg(F.max("a_cnt").alias("a_cnt"), F.max("b_cnt").alias("b_cnt"))
    )
    return psi_finish(spark, g0)


from dataengineeringproject_spark.queries.windows_q import (  # noqa: E402
    TREND_SLOPE_ORACLE as _TREND_SHARED_ORACLE,
)


def _converged_daily_xu(spark: SparkSession, name: str) -> DataFrame:
    """Recover the converged per-(event_type, day) daily mean in exact
    integer micro-units from an update-mode (sum, count) emission log.

    Selection is the `_final_state` pattern: the row with the max
    MONOTONE counter ``n`` per (window, event_type) is the final
    emission, and ``sv`` is read from THAT row — NOT ``max(sv)``,
    which is only correct while values are non-negative (the events
    schema permits negative DOUBLEs, under which the running sum is
    not monotone and max(sv) would pick a mid-stream emission;
    ADVICE r5)."""
    w = Window.partitionBy("w", "event_type").orderBy(F.desc("n"))
    conv = (
        spark.table(name)
        .distinct()
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(F.col("w.start").cast("date").alias("day"), "event_type", "sv", "n")
    )
    return conv.select(
        "event_type",
        "day",
        F.round(F.round("sv", 2) / F.col("n") * F.lit(1e6))
        .cast("long")
        .alias("xu"),
    )


@register(
    "streaming_trend_slope",
    # shares the BATCH trend_slope_daily oracle verbatim: the streaming
    # per-(type, day) sums must converge to the identical daily frame,
    # so the whole OLS scorecard is held to the same value hash.
    oracle=_TREND_SHARED_ORACLE,
)
def streaming_trend_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The OLS trend monitor AS A STREAMING JOB — regression over a
    stream works because its sufficient statistics are ADD-MERGEABLE
    aggregates (the same merge class as CMS cells and PSI bin counts):
    the stream keeps per-(event_type, 1-day window) running
    (sum(value), count) under a 1-day watermark — state bounded by
    |types| x |watermarked days|, not event volume — and the batch
    read-back quantizes the converged daily means to exact integer
    micro-units and runs the SHARED trend_finish closed form. Both
    count is monotone per key, so the converged state is the max-count
    emission per key (sum read from that row — see
    _converged_daily_xu). A production deploy
    emits the refreshed slope per window close — the 'is the metric
    drifting' number next to the PSI distribution monitor."""
    from dataengineeringproject_spark.queries.windows_q import trend_finish

    d = _staged_events(spark, sf_dir)
    name = f"trend_q_{next(_RUN_ID)}"
    with _pinned_shuffle_partitions(spark, 8):
        src = read_events_stream(spark, d, max_files_per_trigger=1)
        agg = (
            src.withWatermark("ts", "1 day")
            .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
            .agg(F.sum("value").alias("sv"), F.count(F.lit(1)).alias("n"))
        )
        run_to_memory(agg, name, output_mode="update")
    return trend_finish(_converged_daily_xu(spark, name))


from dataengineeringproject_spark.queries.windows_q import (  # noqa: E402
    SEASONAL_DOW_ORACLE as _SEASONAL_SHARED_ORACLE,
)


@register(
    "streaming_seasonal_dow",
    # shares the BATCH seasonal_dow_anomaly oracle verbatim — and the
    # SAME streaming state as streaming_trend_slope: one converged
    # per-(type, day) sum/count table feeds both monitors.
    oracle=_SEASONAL_SHARED_ORACLE,
)
def streaming_seasonal_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The weekday-seasonal anomaly monitor fed from the SAME streaming
    state as the trend monitor — the operational point of mergeable
    sufficient statistics: one watermarked per-(type, 1-day window)
    (sum, count) aggregation serves every monitor whose math reduces
    to the daily frame (trend slope, seasonal z-scores, and any future
    one), so adding a monitor adds a read-back finisher, NOT a second
    stream or a second state store. The read-back quantizes converged
    daily means to exact micro-units and runs the SHARED
    seasonal_finish; the result hash-matches batch
    seasonal_dow_anomaly verbatim."""
    from dataengineeringproject_spark.queries.windows_q import seasonal_finish

    d = _staged_events(spark, sf_dir)
    name = f"seas_q_{next(_RUN_ID)}"
    with _pinned_shuffle_partitions(spark, 8):
        src = read_events_stream(spark, d, max_files_per_trigger=1)
        agg = (
            src.withWatermark("ts", "1 day")
            .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
            .agg(F.sum("value").alias("sv"), F.count(F.lit(1)).alias("n"))
        )
        run_to_memory(agg, name, output_mode="update")
    return seasonal_finish(_converged_daily_xu(spark, name))


from dataengineeringproject_spark.queries.windows_q import (  # noqa: E402
    CUSUM_ORACLE as _CUSUM_SHARED_ORACLE,
)


@register(
    "streaming_cusum_level_shift",
    # shares the BATCH cusum_level_shift oracle verbatim — the THIRD
    # consumer of the same per-(type, day) streaming state after the
    # trend and seasonal monitors.
    oracle=_CUSUM_SHARED_ORACLE,
)
def streaming_cusum_level_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM from the SAME streaming state as the trend and seasonal
    monitors — three monitors, one watermarked per-(type, 1-day
    window) (sum, count) aggregation: the concrete payoff of keeping
    monitors as READ-BACK FINISHERS over shared mergeable state
    instead of separate streams (state store cost and ingest pressure
    are paid once; a fourth monitor is a fourth finisher). Converged
    daily means quantize to exact micro-units and run the SHARED
    cusum_finish; hash-held to the batch oracle verbatim."""
    from dataengineeringproject_spark.queries.windows_q import cusum_finish

    d = _staged_events(spark, sf_dir)
    name = f"cusum_q_{next(_RUN_ID)}"
    with _pinned_shuffle_partitions(spark, 8):
        src = read_events_stream(spark, d, max_files_per_trigger=1)
        agg = (
            src.withWatermark("ts", "1 day")
            .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
            .agg(F.sum("value").alias("sv"), F.count(F.lit(1)).alias("n"))
        )
        run_to_memory(agg, name, output_mode="update")
    return cusum_finish(_converged_daily_xu(spark, name))
