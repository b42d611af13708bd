"""Corpus-curation operators a production training-data pipeline needs
beyond dedup/similarity (north star: BASELINE.json; SURVEY.md §7.2.10):
deterministic sampling and split assignment, cross-source contamination
detection, within-document repetition scoring, and the filter-funnel
report. All engine-independent: randomness is replaced by md5-derived
hashing (functions/text.py) so the DuckDB oracle reproduces every row.

100 TB posture: sampling/splitting/repetition are pure projections
(fuse into the scan, no shuffle); contamination is one shuffle on the
16-byte fingerprint; the funnel is a single partial-aggregated pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dataengineeringproject_spark.functions import text as X
from dataengineeringproject_spark.registry import register, register_prestage
from dataengineeringproject_spark.schemas import load_table

# Per-source sampling rates (percent kept), default for unlisted sources.
SAMPLE_RATES = {"src0": 100, "src1": 50, "src2": 25}
SAMPLE_DEFAULT = 10
# Train/val/test boundaries over the 0-99 hash bucket.
SPLIT_TRAIN, SPLIT_VAL = 80, 90
_SEED = "curation-v1"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


def _bucket(id_col: str) -> Column:
    """Deterministic 0-99 bucket from the doc id — the engine's
    substitute for rand(): reproducible across runs, engines, and
    cluster sizes (a seeded rand() is NOT stable across partitionings;
    a hash of the key is)."""
    return X.token_hash(F.col(id_col).cast("string"), seed=_SEED) % 100


def _bucket_sql(id_col: str) -> str:
    return f"{X.token_hash_sql(f'CAST({id_col} AS VARCHAR)', seed=_SEED)} % 100"


# --- deterministic stratified sampling --------------------------------------

_RATE_CASE = (
    "CASE source "
    + " ".join(f"WHEN '{s}' THEN {r}" for s, r in sorted(SAMPLE_RATES.items()))
    + f" ELSE {SAMPLE_DEFAULT} END"
)


@register(
    "sample_stratified_hash",
    oracle=f"""
    SELECT doc_id, source, CAST({_bucket_sql('doc_id')} AS BIGINT) AS bucket
    FROM documents
    WHERE {_bucket_sql('doc_id')} < {_RATE_CASE}
    """,
)
def sample_stratified_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified downsampling at per-source rates (the rebalancing step
    of corpus curation — e.g. keep all of a scarce high-quality source,
    10% of a crawl). Hash-bucket membership, not rand(): the same doc
    is kept or dropped on every run of every cluster. Pure filter —
    pushes to the scan, no shuffle."""
    d = _docs(spark, sf_dir)
    rate = F.lit(SAMPLE_DEFAULT)
    for s, r in sorted(SAMPLE_RATES.items(), reverse=True):
        rate = F.when(F.col("source") == s, F.lit(r)).otherwise(rate)
    b = _bucket("doc_id")
    return d.select("doc_id", "source", b.cast("long").alias("bucket")).filter(
        F.col("bucket") < rate
    )


# --- train/val/test split ----------------------------------------------------

@register(
    "split_train_val_test",
    oracle=f"""
    SELECT source,
           CASE WHEN {_bucket_sql('doc_id')} < {SPLIT_TRAIN} THEN 'train'
                WHEN {_bucket_sql('doc_id')} < {SPLIT_VAL} THEN 'val'
                ELSE 'test' END AS split,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS n_chars_total
    FROM documents
    GROUP BY 1, 2
    """,
)
def split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 split assignment by id-hash bucket, reported per source.
    Assignment is a projection (each doc's split is a pure function of
    its id — stable under re-partitioning and incremental appends); the
    report is one aggregate pass."""
    d = _docs(spark, sf_dir)
    b = _bucket("doc_id")
    split = (
        F.when(b < SPLIT_TRAIN, F.lit("train"))
        .when(b < SPLIT_VAL, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        d.select("source", split.alias("split"), "n_chars")
        .groupBy("source", "split")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("n_chars_total"),
        )
    )


# --- cross-source contamination ---------------------------------------------

_PREFIX_N = 20
_PREFIX_SQL = (
    f"md5(concat_ws(' ', list_slice({X.tokens_sql('lower(text)')}, 1, {_PREFIX_N})))"
)


def _prefix_fp(text_col: str, n: int = _PREFIX_N) -> Column:
    """md5 of the first n lowercased tokens — the prefix fingerprint
    used for eval-set leak detection (whole-doc equality is too strict:
    a leaked eval item usually reappears with trailing boilerplate, so
    contamination checks key on leading-n-gram overlap)."""
    c = F.lower(F.col(text_col))
    return F.md5(F.concat_ws(" ", F.slice(X.tokens(c), 1, n)))


@register(
    "contamination_pairs",
    oracle=f"""
    WITH fp AS (
      SELECT doc_id, source, {_PREFIX_SQL} AS f FROM documents
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           a.source AS source_a, b.source AS source_b
    FROM fp a JOIN fp b ON a.f = b.f
    WHERE a.source < b.source
    """,
)
def contamination_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval contamination detection: documents sharing their
    first-{n}-token prefix across two DIFFERENT sources (the leak check
    run before any benchmark split ships). Self-equi-join on the md5
    prefix fingerprint — one shuffle on a uniformly distributed 16-byte
    key, skew-free by construction; `source_a < source_b` keeps each
    cross-source pair once and drops within-source dups (those are
    `dedup_exact`'s job)."""
    d = _docs(spark, sf_dir)
    fp = d.select("doc_id", "source", _prefix_fp("text").alias("f"))
    a = fp.select(
        F.col("doc_id").alias("doc_a"), F.col("source").alias("source_a"), "f"
    )
    b = fp.select(
        F.col("doc_id").alias("doc_b"), F.col("source").alias("source_b"), "f"
    )
    return (
        a.join(b, "f")
        .filter(F.col("source_a") < F.col("source_b"))
        .select("doc_a", "doc_b", "source_a", "source_b")
    )


# --- within-document repetition (Gopher-style quality rule) ------------------

def _all_ngrams(text_col: str, k: int) -> Column:
    """All k-word shingles WITH multiplicity (operators/dedup.shingles
    minus the distinct — repetition needs the duplicates)."""
    toks = X.tokens(text_col)
    n = F.size(toks)
    m = n - (k - 1)
    parts = F.slice(toks, 1, m)
    for j in range(1, k):
        parts = F.zip_with(
            parts, F.slice(toks, 1 + j, m), lambda x, y: F.concat(x, F.lit(" "), y)
        )
    return F.when(n >= k, parts).otherwise(F.array(F.concat_ws(" ", toks)))


def _all_ngrams_sql(toks_sql: str, k: int) -> str:
    t = toks_sql
    parts = ", ".join(f"{t}[i + {j}]" for j in range(k))
    return (
        f"CASE WHEN len({t}) >= {k} "
        f"THEN list_transform(generate_series(1, len({t}) - {k - 1}), "
        f"i -> concat_ws(' ', {parts})) "
        f"ELSE [concat_ws(' ', {t})] END"
    )


_REP_K = 3
_NG = _all_ngrams_sql(X.tokens_sql("text"), _REP_K)


@register(
    "repetition_ngram_ratio",
    oracle=f"""
    WITH g AS (
      SELECT doc_id, len({_NG}) AS n_grams, len(list_distinct({_NG})) AS n_distinct
      FROM documents
    )
    SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
           ROUND(CASE WHEN n_grams = 0 THEN 0.0
                      ELSE 1.0 - n_distinct * 1.0 / n_grams END, 6) AS rep_ratio
    FROM g
    """,
)
def repetition_ngram_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition: 1 − |distinct 3-grams| / |3-grams|
    (the duplicate-n-gram family of quality rules from the Gopher/
    MassiveText filtering recipe — high ratio ⇒ boilerplate or
    degenerate text). Array ops per row, no shuffle; the n-gram list
    never leaves the row, so memory is O(doc length) not O(corpus)."""
    d = _docs(spark, sf_dir)
    ng = _all_ngrams("text", _REP_K)
    n = F.size(ng)
    nd = F.size(F.array_distinct(ng))
    return d.select(
        "doc_id",
        n.cast("long").alias("n_grams"),
        F.round(
            F.when(n == 0, F.lit(0.0)).otherwise(1.0 - nd / n), 6
        ).alias("rep_ratio"),
    )


# --- quality filter funnel ---------------------------------------------------

# FIRST failing rule wins, so order is part of the contract. Thresholds
# are config (module constants); these values are tuned so every branch
# is non-vacuous on the synthetic corpus (token counts 10-99, zero
# punctuation) while keeping the standard rule family — production
# values would be e.g. <50 tokens / >100k tokens / rep > 0.3.
_MIN_TOK, _MAX_TOK, _MAX_PUNCT, _MIN_STOP, _MAX_REP = 20, 80, 0.2, 0.05, 0.05

_FUNNEL_SQL = f"""
    CASE WHEN len({X.tokens_sql('text')}) < {_MIN_TOK} THEN 'too_short'
         WHEN len({X.tokens_sql('text')}) > {_MAX_TOK} THEN 'too_long'
         WHEN {X.punct_ratio_sql('text')} >= {_MAX_PUNCT} THEN 'high_punct'
         WHEN {X.stopword_ratio_sql('text')} < {_MIN_STOP} THEN 'low_stopword'
         WHEN 1.0 - len(list_distinct({_NG})) * 1.0 / len({_NG}) > {_MAX_REP}
           THEN 'too_repetitive'
         ELSE 'pass' END
"""


@register(
    "quality_filter_funnel",
    oracle=f"""
    SELECT {_FUNNEL_SQL} AS reject_reason,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS n_chars_total
    FROM documents
    GROUP BY 1
    """,
)
def quality_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation funnel report: every document attributed to its
    FIRST failing quality rule (length → punctuation → stopword →
    repetition), 'pass' otherwise — the observability artifact that
    tells you which rule is eating your corpus before you commit to a
    filtered build. One aggregate pass; the when-chain short-circuits
    identically in Spark and the oracle because rule order is shared.
    The reason expression is shared with streaming_quality_gate
    (_funnel_reason) — the batch and streaming funnels can't drift."""
    d = _docs(spark, sf_dir)
    return (
        d.select(_funnel_reason().alias("reject_reason"), "n_chars")
        .groupBy("reject_reason")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("n_chars_total"),
        )
    )


def _funnel_reason() -> Column:
    """First-failing-rule attribution for a `text` column — ONE
    definition used by the batch funnel and its streaming twin."""
    n_tok = F.size(X.tokens("text"))
    ng = _all_ngrams("text", _REP_K)
    rep = 1.0 - F.size(F.array_distinct(ng)) / F.size(ng)
    return (
        F.when(n_tok < _MIN_TOK, F.lit("too_short"))
        .when(n_tok > _MAX_TOK, F.lit("too_long"))
        .when(X.punct_ratio("text") >= _MAX_PUNCT, F.lit("high_punct"))
        .when(X.stopword_ratio("text") < _MIN_STOP, F.lit("low_stopword"))
        .when(rep > _MAX_REP, F.lit("too_repetitive"))
        .otherwise(F.lit("pass"))
    )


# --- STREAMING quality gate (quality family batch/streaming symmetry) --------

_QGATE_SLICES = 3
_QGATE_LAND: dict[str, str] = {}


def _staged_docs_land(spark: SparkSession, sf_dir: str) -> str:
    """Stage the FULL corpus as a file-drop landing zone the quality
    gate watches ({_QGATE_SLICES} deterministic doc_id-mod slices,
    written oldest-first so FileStreamSource fixes micro-batch order).
    Prestage hook: file ARRIVAL is not part of the gate's cost."""
    if sf_dir in _QGATE_LAND:
        return _QGATE_LAND[sf_dir]
    import atexit
    import shutil
    import tempfile

    d = _docs(spark, sf_dir)
    land = tempfile.mkdtemp(prefix="deps_qgate_land_")
    atexit.register(shutil.rmtree, land, ignore_errors=True)
    for i in range(_QGATE_SLICES):
        d.filter(F.col("doc_id") % _QGATE_SLICES == i).coalesce(
            1
        ).write.mode("append").parquet(land)
    _QGATE_LAND[sf_dir] = land
    return land


register_prestage(_staged_docs_land)


@register(
    "streaming_quality_gate",
    oracle=f"""
    SELECT {_FUNNEL_SQL} AS reject_reason,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS n_chars_total
    FROM documents
    GROUP BY 1
    """,
)
def streaming_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of quality_filter_funnel — fourth family with
    batch/streaming symmetry (after monitor, dedup+CDC, ANN): documents
    arrive as a file-drop stream ({_QGATE_SLICES} parquet slices,
    maxFilesPerTrigger=1 + availableNow = {_QGATE_SLICES} genuine
    micro-batches) and the funnel runs as a NATIVE unwindowed streaming
    aggregation — stateless when-chain projection (the SAME
    _funnel_reason expression as the batch funnel, so the two can never
    drift) feeding an incremental groupBy(reject_reason) in complete
    mode. No foreachBatch: the quality rules are per-document, so this
    is the one family whose streaming form is pure built-in operators —
    state is |reasons| rows (≤ 6) of partial sums regardless of corpus
    size, the bounded-state shape that lets a 100 TB ingest keep a
    live funnel dashboard forever. Converged complete-mode emission
    equals the batch aggregate over the whole corpus — the same full
    value-hash oracle as the batch twin."""
    from dataengineeringproject_spark.queries.streaming_q import (
        _pinned_shuffle_partitions,
        _RUN_ID,
    )
    from dataengineeringproject_spark.streaming.daily import run_to_memory

    d = _docs(spark, sf_dir)
    land = _staged_docs_land(spark, sf_dir)
    name = f"qgate_q_{next(_RUN_ID)}"
    with _pinned_shuffle_partitions(spark, 8):
        src = (
            spark.readStream.schema(d.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(land)
        )
        agg = (
            src.select(_funnel_reason().alias("reject_reason"), "n_chars")
            .groupBy("reject_reason")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_docs"),
                F.sum("n_chars").cast("long").alias("n_chars_total"),
            )
        )
        run_to_memory(agg, name, output_mode="complete")
    return spark.table(name).select(
        "reject_reason", "n_docs", "n_chars_total"
    )


# --- sequence packing (concat-and-chunk into context windows) ----------------

_CTX_TOKENS = 512


@register(
    "sequence_packing",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source, CAST(len({X.tokens_sql('text')}) AS BIGINT) AS n_tokens
      FROM documents
    ),
    placed AS (
      SELECT doc_id, source, n_tokens,
             COALESCE(sum(n_tokens) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_tok
      FROM t
    )
    SELECT doc_id, source, n_tokens,
           CAST(floor(start_tok / {_CTX_TOKENS}) AS BIGINT) AS pack_id,
           (floor(start_tok / {_CTX_TOKENS})
              <> floor((start_tok + n_tokens - 1) / {_CTX_TOKENS}))
             AS crosses_boundary
    FROM placed
    """,
)
def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for LLM pretraining (concat-and-chunk): within
    each source, documents are concatenated in doc_id order and sliced
    into {_CTX_TOKENS}-token context windows; each doc learns its
    pack_id (the window its first token lands in) and whether it
    straddles a window boundary (the fraction a loss-masking packer
    would split). One running-sum window per source — a single shuffle
    on the partition key. At 100 TB partition by a hash bucket of
    bounded size instead of raw source so no single packing stream
    serializes; the window itself is O(partition) streaming state."""
    docs = _docs(spark, sf_dir)
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    t = docs.select(
        "doc_id",
        "source",
        F.size(X.tokens("text")).cast("long").alias("n_tokens"),
    )
    placed = t.withColumn(
        "start_tok", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    )
    pack = F.floor(F.col("start_tok") / _CTX_TOKENS)
    end_pack = F.floor((F.col("start_tok") + F.col("n_tokens") - 1) / _CTX_TOKENS)
    return placed.select(
        "doc_id",
        "source",
        "n_tokens",
        pack.cast("long").alias("pack_id"),
        (pack != end_pack).alias("crosses_boundary"),
    )


# --- balanced fixed-N per-source sample ---------------------------------------

_BALANCED_N = 40


@register(
    "sample_balanced_per_source",
    oracle=f"""
    WITH r AS (
      SELECT doc_id, source,
             row_number() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      FROM documents
    )
    SELECT doc_id, source, CAST(rk AS BIGINT) AS rk
    FROM r WHERE rk <= {_BALANCED_N}
    """,
)
def sample_balanced_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced domain mixture: exactly {_BALANCED_N} docs per source,
    chosen by md5(doc_id) order — a deterministic 'shuffle' that is
    reproducible across engines and runs, unlike rand()-based
    sampleBy. Physically a per-group top-k on the hash order, so
    WindowGroupLimit prunes each partition to N rows before the
    shuffle — the full corpus never sorts. The degenerate-but-common
    curation need this serves: equal-sized per-domain eval/calibration
    slices."""
    d = _docs(spark, sf_dir)
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        d.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _BALANCED_N)
        .select("doc_id", "source", F.col("rk").cast("long").alias("rk"))
    )


# --- DSIR-style importance scoring --------------------------------------------
# Data Selection via Importance Resampling (Xie et al. 2023): score every
# document by the log-likelihood ratio of a target vs. raw unigram model
# over HASHED n-gram features — the standard trick that keeps the feature
# space a fixed B buckets regardless of vocabulary size.

_DSIR_B = 1024  # hashed feature buckets
_DSIR_TARGET_LANG = "en"  # the "target distribution" slice
_DSIR_SEED = "dsir-v1"

_DSIR_BUCKET = f"{X.token_hash_sql('term', seed=_DSIR_SEED)} % {_DSIR_B}"


@register(
    "dsir_importance_score",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, lang, unnest({X.tokens_sql('text')}) AS term
      FROM documents
    ),
    b AS (SELECT doc_id, lang, {_DSIR_BUCKET} AS bucket FROM tok),
    raw AS (SELECT bucket, count(*) AS c_raw FROM b GROUP BY 1),
    tgt AS (SELECT bucket, count(*) AS c_tgt FROM b
            WHERE lang = '{_DSIR_TARGET_LANG}' GROUP BY 1),
    w AS (
      SELECT raw.bucket,
             ln((COALESCE(tgt.c_tgt, 0) + 1.0)
                / (sum(COALESCE(tgt.c_tgt, 0)) OVER () + {_DSIR_B}))
             - ln((raw.c_raw + 1.0)
                  / (sum(raw.c_raw) OVER () + {_DSIR_B})) AS weight
      FROM raw LEFT JOIN tgt USING (bucket)
    )
    SELECT b.doc_id, any_value(b.lang) AS lang,
           CAST(count(*) AS BIGINT) AS n_tokens,
           ROUND(sum(w.weight), 6) AS dsir_score
    FROM b JOIN w USING (bucket)
    GROUP BY b.doc_id
    """,
)
def dsir_importance_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance score per document: sum over tokens of
    ln(p_target(bucket)/p_raw(bucket)) with add-1 smoothing, where the
    bucket is a {_DSIR_B}-way md5 feature hash (engine-reproducible, no
    murmur divergence) and the target slice is lang='{_DSIR_TARGET_LANG}'.

    Scale shape: the raw/target bucket counts are ONE pass over the
    exploded tokens (two map-side-combining aggregates off a shared
    scan), collapsing 100 TB of text into a ≤{_DSIR_B}-row weight table;
    the totals for smoothing come from an unpartitioned window over that
    tiny table — never a driver collect. The weight table then broadcasts
    into the per-doc scoring join, so the second corpus pass shuffles
    only on doc_id for the final sum. Hot buckets (stopword-grade terms)
    are just big counters, not reducer hot spots."""
    d = _docs(spark, sf_dir)
    tok = d.select(
        "doc_id", "lang", F.explode(X.tokens("text")).alias("term")
    )
    b = tok.select(
        "doc_id",
        "lang",
        (X.token_hash(F.col("term"), seed=_DSIR_SEED) % _DSIR_B).alias("bucket"),
    )
    raw = b.groupBy("bucket").agg(F.count(F.lit(1)).alias("c_raw"))
    tgt = (
        b.filter(F.col("lang") == _DSIR_TARGET_LANG)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("c_tgt"))
    )
    all_w = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    weights = (
        raw.join(tgt, "bucket", "left")
        .withColumn("c_tgt", F.coalesce("c_tgt", F.lit(0)))
        .select(
            "bucket",
            (
                F.log(
                    (F.col("c_tgt") + 1.0)
                    / (F.sum("c_tgt").over(all_w) + _DSIR_B)
                )
                - F.log(
                    (F.col("c_raw") + 1.0)
                    / (F.sum("c_raw").over(all_w) + _DSIR_B)
                )
            ).alias("weight"),
        )
    )
    return (
        b.join(F.broadcast(weights), "bucket")
        .groupBy("doc_id")
        .agg(
            F.any_value("lang").alias("lang"),
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.sum("weight"), 6).alias("dsir_score"),
        )
    )


# --- model-based quality scoring ----------------------------------------------
# The fastText-classifier stage of production curation pipelines
# (CCNet/FineWeb style), expressed as what it computationally is: a
# linear model over engineered features. Weights are fixed literals, so
# the whole scorer is a codegen'd projection — zero shuffle, zero Python.

_QLR = {  # (intercept, w_log_tokens, w_stopword, w_punct, w_chars_per_tok)
    "b0": -2.0,
    "w_logtok": 0.8,
    "w_stop": 3.0,
    "w_punct": -4.0,
    "w_cpt": -0.05,
}


@register(
    "quality_logistic_score",
    oracle=f"""
    WITH f AS (
      SELECT doc_id, source,
             len({X.tokens_sql('text')}) AS n_tokens,
             {X.stopword_ratio_sql('text')} AS stop_r,
             {X.punct_ratio_sql('text')} AS punct_r,
             length(text) AS n_chars
      FROM documents
    ),
    z AS (
      SELECT doc_id, source,
             {_QLR['b0']} + {_QLR['w_logtok']} * ln(1 + n_tokens)
               + {_QLR['w_stop']} * stop_r
               + {_QLR['w_punct']} * punct_r
               + {_QLR['w_cpt']} * (n_chars * 1.0 / greatest(n_tokens, 1)) AS z
      FROM f
    )
    SELECT doc_id, source,
           ROUND(1.0 / (1.0 + exp(-z)), 6) AS quality_prob,
           (1.0 / (1.0 + exp(-z)) >= 0.5) AS keep
    FROM z
    """,
)
def quality_logistic_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality score: logistic regression over engineered
    text features (log token count, stopword ratio, punctuation ratio,
    chars-per-token), the computational skeleton of the fastText /
    CCNet quality-classifier stage. With weights as literals the entire
    scorer is ONE codegen'd projection fused into the parquet scan —
    the 100 TB cost is exactly one streaming pass, no shuffle, no UDF.
    Swapping in real trained weights changes constants, not the plan."""
    d = _docs(spark, sf_dir)
    n_tok = X.token_count("text")
    z = (
        F.lit(_QLR["b0"])
        + _QLR["w_logtok"] * F.log(1 + n_tok)
        + _QLR["w_stop"] * X.stopword_ratio("text")
        + _QLR["w_punct"] * X.punct_ratio("text")
        + _QLR["w_cpt"] * (F.length("text") / F.greatest(n_tok, F.lit(1)))
    )
    prob = 1.0 / (1.0 + F.exp(-z))
    return d.select(
        "doc_id",
        "source",
        F.round(prob, 6).alias("quality_prob"),
        (prob >= 0.5).alias("keep"),
    )


# --- weighted sampling (Efraimidis–Spirakis) ----------------------------------

_WS_K = 40
_WS_SEED = "wsample-v1"
_WS_U = (
    f"(({X.token_hash_sql('CAST(doc_id AS VARCHAR)', seed=_WS_SEED)} + 1) "
    f"/ 1152921504606846977.0)"
)  # 60-bit hash -> uniform (0, 1]; denominator = 2^60 + 1


@register(
    "sample_weighted_priority",
    oracle=f"""
    WITH pr AS (
      SELECT doc_id, source, n_chars,
             exp(ln({_WS_U}) / n_chars) AS priority
      FROM documents
    ),
    r AS (
      SELECT doc_id, source, n_chars, priority,
             row_number() OVER (ORDER BY priority DESC, doc_id) AS rk
      FROM pr
    )
    SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars,
           ROUND(priority, 6) AS priority, CAST(rk AS BIGINT) AS rk
    FROM r WHERE rk <= {_WS_K}
    """,
)
def sample_weighted_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement, Efraimidis–Spirakis
    A-ES: key each item with u^(1/w) (u uniform, w = n_chars — longer
    documents proportionally likelier) and keep the global top-{_WS_K}.
    The uniform comes from the id hash, not rand(), so the draw is
    reproducible across engines, runs, and partitionings — the property
    that makes a sample auditable. Physically a global top-k: per-
    partition TakeOrdered keeps {_WS_K} rows, so the full corpus never
    sorts and the shuffle moves k×partitions rows — the same shape a
    100 TB weighted draw needs. (Adjacent order-statistic gaps are
    ~1/n, so the 1-ulp libm differences between engines cannot flip
    membership at any realistic corpus size.)"""
    d = _docs(spark, sf_dir)
    u = (X.token_hash(F.col("doc_id").cast("string"), seed=_WS_SEED) + 1) / F.lit(
        1152921504606846977.0
    )
    pr = d.select(
        "doc_id",
        "source",
        "n_chars",
        F.exp(F.log(u) / F.col("n_chars")).alias("priority"),
    )
    w = Window.orderBy(F.desc("priority"), F.asc("doc_id"))
    return (
        pr.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _WS_K)
        .select(
            "doc_id",
            "source",
            F.col("n_chars").cast("long").alias("n_chars"),
            F.round("priority", 6).alias("priority"),
            F.col("rk").cast("long").alias("rk"),
        )
    )


# --- Gopher-style quality rules (r3) -----------------------------------------
# Token-grain subset of the Gopher/MassiveText repetition+quality rules
# (Rae et al. 2021 §A1.1): word count bounds, mean word length bounds,
# unique-token fraction, and most-frequent-2-gram fraction. Thresholds
# are tuned so every rule is non-vacuous on the synthetic corpus (token
# counts 10-99, mean word length 3.7-5.3, top-2-gram 0.01-0.17);
# production values would be e.g. 50..100k tokens / 3..10 chars.
_GQ_MIN_TOK, _GQ_MAX_TOK = 20, 80
_GQ_MIN_MWL, _GQ_MAX_MWL = 4.0, 10.0
_GQ_MIN_UNIQ = 0.35
_GQ_MAX_TOP2 = 0.10

_GQ_TOKS = X.tokens_sql("text")


@register(
    "quality_gopher_rules",
    oracle=f"""
    WITH b AS (SELECT doc_id, {_GQ_TOKS} AS toks FROM documents),
    m AS (
      SELECT doc_id, len(toks) AS n,
             list_sum(list_transform(toks, t -> length(t))) AS chars,
             len(list_distinct(toks)) AS nd
      FROM b
    ),
    g AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, len(toks) - 1),
                                   i -> concat_ws(' ', toks[i], toks[i + 1])))
               AS gram
      FROM b WHERE len(toks) >= 2
    ),
    c AS (SELECT doc_id, gram, count(*) AS cnt FROM g GROUP BY 1, 2),
    t2 AS (SELECT doc_id, max(cnt) AS top_cnt FROM c GROUP BY 1),
    r AS (
      SELECT m.doc_id, n,
             ROUND(chars * 1.0 / n, 6) AS mean_word_len,
             ROUND(nd * 1.0 / n, 6) AS frac_unique_tokens,
             ROUND(COALESCE(top_cnt, 1) * 1.0 / greatest(n - 1, 1), 6)
               AS top_2gram_frac
      FROM m LEFT JOIN t2 ON m.doc_id = t2.doc_id
    )
    SELECT doc_id, CAST(n AS BIGINT) AS n_tokens, mean_word_len,
           frac_unique_tokens, top_2gram_frac,
           (n BETWEEN {_GQ_MIN_TOK} AND {_GQ_MAX_TOK}
            AND mean_word_len BETWEEN {_GQ_MIN_MWL} AND {_GQ_MAX_MWL}
            AND frac_unique_tokens > {_GQ_MIN_UNIQ}
            AND top_2gram_frac < {_GQ_MAX_TOP2}) AS keep
    FROM r
    """,
)
def quality_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style quality rules per document: token count, mean word
    length, unique-token fraction (all per-row array expressions, fused
    into the scan), plus most-frequent-2-gram fraction. The top-2-gram
    is computed RELATIONALLY — explode → count per (doc, gram) → max
    per doc — not by an O(n²) per-row HOF scan: one shuffle keyed on
    (doc_id, gram) with map-side combine, then a collapse to doc grain,
    which is the shape that survives 10k-token documents at 100 TB.
    The keep flag is derived from the ROUNDED metrics so no float-ulp
    difference between engines can flip a threshold comparison."""
    d = _docs(spark, sf_dir)
    toks = X.tokens("text")
    n = F.size(toks)
    mwl = F.aggregate(
        toks, F.lit(0), lambda acc, x: acc + F.length(x)
    ) / n
    met = d.select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        F.round(mwl, 6).alias("mean_word_len"),
        F.round(F.size(F.array_distinct(toks)) / n, 6).alias("frac_unique_tokens"),
    )
    grams = d.filter(F.size(X.tokens("text")) >= 2).select(
        "doc_id", F.explode(_all_ngrams("text", 2)).alias("gram")
    )
    top = (
        grams.groupBy("doc_id", "gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("doc_id")
        .agg(F.max("cnt").alias("top_cnt"))
    )
    out = met.join(top, "doc_id", "left").withColumn(
        "top_2gram_frac",
        F.round(
            F.coalesce(F.col("top_cnt"), F.lit(1))
            / F.greatest(F.col("n_tokens") - 1, F.lit(1)),
            6,
        ),
    )
    keep = (
        F.col("n_tokens").between(_GQ_MIN_TOK, _GQ_MAX_TOK)
        & F.col("mean_word_len").between(_GQ_MIN_MWL, _GQ_MAX_MWL)
        & (F.col("frac_unique_tokens") > _GQ_MIN_UNIQ)
        & (F.col("top_2gram_frac") < _GQ_MAX_TOP2)
    )
    return out.select(
        "doc_id",
        "n_tokens",
        "mean_word_len",
        "frac_unique_tokens",
        "top_2gram_frac",
        keep.alias("keep"),
    )


# --- sliding-window RAG chunking (r3) ----------------------------------------

_CH_SIZE, _CH_STRIDE = 64, 48  # 16-token overlap


@register(
    "chunk_sliding_rag",
    oracle=f"""
    WITH b AS (
      SELECT doc_id, {_GQ_TOKS} AS toks FROM documents
    ),
    n AS (
      SELECT doc_id, toks, len(toks) AS n,
             1 + (greatest(len(toks) - {_CH_SIZE}, 0) + {_CH_STRIDE} - 1)
                 // {_CH_STRIDE} AS nc
      FROM b WHERE len(toks) > 0
    ),
    e AS (
      SELECT doc_id, toks,
             unnest(generate_series(0, nc - 1)) AS chunk_id
      FROM n
    )
    SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
           CAST(len(list_slice(toks, chunk_id * {_CH_STRIDE} + 1,
                               chunk_id * {_CH_STRIDE} + {_CH_SIZE}))
                AS BIGINT) AS n_chunk_tokens,
           md5(array_to_string(
                 list_slice(toks, chunk_id * {_CH_STRIDE} + 1,
                            chunk_id * {_CH_STRIDE} + {_CH_SIZE}), ' '))
             AS chunk_fp
    FROM e
    """,
)
def chunk_sliding_rag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking for retrieval corpora:
    {_CH_SIZE}-token chunks at a {_CH_STRIDE}-token stride (16-token
    overlap so no sentence is split away from its context), last chunk
    ragged. Chunk count = 1 + ceil(max(n - size, 0) / stride) — covers
    every token, no chunk fully contained in its neighbor. The chunk
    list never leaves the row until posexplode, so memory is O(doc);
    the op is a pure flatMap projection — NO shuffle at any scale, and
    chunk ids are a function of (doc, position) so re-chunking an
    appended corpus never renumbers old chunks."""
    d = _docs(spark, sf_dir)
    toks = X.tokens("text")
    nc = 1 + F.floor(
        (F.greatest(F.size(toks) - _CH_SIZE, F.lit(0)) + _CH_STRIDE - 1)
        / _CH_STRIDE
    )
    base = d.select("doc_id", toks.alias("toks"), nc.alias("nc")).filter(
        F.size("toks") > 0
    )
    chunks = F.transform(
        F.sequence(F.lit(0), F.col("nc") - 1),
        lambda i: F.slice(F.col("toks"), i * _CH_STRIDE + 1, _CH_SIZE),
    )
    e = base.select(
        "doc_id", F.posexplode(chunks).alias("chunk_id", "chunk")
    )
    return e.select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.size("chunk").cast("long").alias("n_chunk_tokens"),
        F.md5(F.concat_ws(" ", F.col("chunk"))).alias("chunk_fp"),
    )


# --- temperature-scaled source mixture (r3) ----------------------------------

_MIX_ALPHA = 0.7          # temperature exponent (multilingual-sampling style)
_MIX_BUDGET = 1_000_000   # token budget the mixture is scaled to


@register(
    "mixture_temperature_weights",
    oracle=f"""
    WITH s AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(len({_GQ_TOKS})) AS BIGINT) AS n_tokens
      FROM documents GROUP BY 1
    )
    SELECT source, n_docs, n_tokens,
           ROUND(pow(n_tokens, {_MIX_ALPHA})
                 / sum(pow(n_tokens, {_MIX_ALPHA})) OVER (), 6) AS weight,
           ROUND({_MIX_BUDGET} * pow(n_tokens, {_MIX_ALPHA})
                 / sum(pow(n_tokens, {_MIX_ALPHA})) OVER () / n_tokens, 6)
             AS epochs_at_budget
    FROM s
    """,
)
def mixture_temperature_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source mixture: sampling weight ∝ n_tokens^α
    (α = {_MIX_ALPHA}) normalized across sources — the standard recipe
    for up-weighting scarce high-quality sources without letting any
    one source dominate; epochs_at_budget says how many passes over
    each source a {_MIX_BUDGET}-token budget implies (>1 ⇒ the source
    repeats). One map-side-combined aggregate collapses the corpus to
    |sources| rows; the unpartitioned normalization window runs on that
    tiny frame, never on raw data."""
    d = _docs(spark, sf_dir)
    s = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.size(X.tokens("text"))).cast("long").alias("n_tokens"),
    )
    w_raw = F.pow(F.col("n_tokens"), F.lit(_MIX_ALPHA))
    total = F.sum(w_raw).over(Window.partitionBy())
    return s.select(
        "source",
        "n_docs",
        "n_tokens",
        F.round(w_raw / total, 6).alias("weight"),
        F.round(
            F.lit(_MIX_BUDGET) * w_raw / total / F.col("n_tokens"), 6
        ).alias("epochs_at_budget"),
    )


# --- budget-constrained mixture SAMPLE (r8) ----------------------------------

_MIXS_SEED = "mixsample"
_MIXS_PPM = 1_000_000
_MIXS_FRACTION = 0.25  # global budget = this fraction of corpus tokens


@register(
    "mixture_budget_sample",
    oracle=f"""
    WITH s AS (
      SELECT source,
             CAST(sum(len({_GQ_TOKS})) AS BIGINT) AS n_tokens
      FROM documents GROUP BY 1
    ),
    r AS (
      SELECT source, n_tokens,
             CAST(least({_MIXS_PPM}, floor(
               {_MIXS_PPM} * ({_MIXS_FRACTION} * sum(n_tokens) OVER ())
               * pow(n_tokens, {_MIX_ALPHA})
               / sum(pow(n_tokens, {_MIX_ALPHA})) OVER ()
               / n_tokens)) AS BIGINT) AS rate_ppm
      FROM s
    ),
    kept AS (
      SELECT d.source,
             CAST(count(*) AS BIGINT) AS n_docs_kept,
             CAST(sum(len({_GQ_TOKS})) AS BIGINT) AS tokens_kept
      FROM documents d JOIN r USING (source)
      WHERE {X.token_hash_sql("CAST(d.doc_id AS VARCHAR)", seed=_MIXS_SEED)}
            % {_MIXS_PPM} < r.rate_ppm
      GROUP BY 1
    )
    SELECT r.source, r.rate_ppm,
           COALESCE(k.n_docs_kept, 0) AS n_docs_kept,
           COALESCE(k.tokens_kept, 0) AS tokens_kept,
           ROUND(COALESCE(k.tokens_kept, 0) * 1e0 / r.n_tokens, 6)
             AS realized_rate
    FROM r LEFT JOIN kept k USING (source)
    """,
)
def mixture_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mixture made CONCRETE: `mixture_temperature_weights` says
    how a token budget SHOULD split across sources; this query draws
    the actual document sample that realizes it. Per-source sampling
    rate (integer ppm) = temperature-weighted share of a global budget
    ({_MIXS_FRACTION} of corpus tokens) over the source's own tokens,
    capped at 1; a document is kept iff its seeded 60-bit hash lands
    under the rate — the same deterministic Bernoulli draw the
    stratified-sampling family uses, so the sample is reproducible
    across engines, runs, and cluster sizes (no RNG state). Output is
    the per-source realization audit (rate, kept docs/tokens, realized
    rate vs target); every source appears even when its draw kept
    nothing. Two map-side-combined passes over the corpus (stats,
    then filtered sample agg) with the |sources|-row rate frame
    broadcast into the second — no shuffle of raw documents at any
    scale."""
    d = _docs(spark, sf_dir)
    s = d.groupBy("source").agg(
        F.sum(F.size(X.tokens("text"))).cast("long").alias("n_tokens")
    )
    w_raw = F.pow(F.col("n_tokens"), F.lit(_MIX_ALPHA))
    w_tot = F.sum(w_raw).over(Window.partitionBy())
    budget = F.lit(_MIXS_FRACTION) * F.sum("n_tokens").over(Window.partitionBy())
    rates = s.select(
        "source",
        "n_tokens",
        F.least(
            F.lit(_MIXS_PPM).cast("long"),
            F.floor(F.lit(_MIXS_PPM) * budget * w_raw / w_tot / F.col("n_tokens")),
        ).alias("rate_ppm"),
    )
    kept = (
        d.join(F.broadcast(rates), "source")
        .filter(
            X.token_hash(F.col("doc_id").cast("string"), seed=_MIXS_SEED)
            % _MIXS_PPM
            < F.col("rate_ppm")
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs_kept"),
            F.sum(F.size(X.tokens("text"))).cast("long").alias("tokens_kept"),
        )
    )
    return (
        rates.join(kept, "source", "left")
        .select(
            "source",
            "rate_ppm",
            F.coalesce("n_docs_kept", F.lit(0).cast("long")).alias("n_docs_kept"),
            F.coalesce("tokens_kept", F.lit(0).cast("long")).alias("tokens_kept"),
            F.round(
                F.coalesce("tokens_kept", F.lit(0).cast("long"))
                * F.lit(1.0)
                / F.col("n_tokens"),
                6,
            ).alias("realized_rate"),
        )
    )


# --- Levenshtein fuzzy matching (r3) -----------------------------------------

_LEV_PREFIX = 40   # chars of normalized prefix compared
# Max edit distance reported. r3 shipped 22 — but 22-of-40 chars is not
# a near-dup test, it is "half the prefix may differ", and on a
# low-entropy corpus that makes nearly every in-block pair a match:
# candidate verification then dominates bench (19 s at sf0.1, r4
# measurement) with an output too loose to act on. 8-of-40 is the
# production fuzzy-match regime (k << len) the bounded-DP kernel is
# built for: the band DP early-terminates most pairs, and surviving
# pairs are actual near-duplicates.
_LEV_MAX = 8


@register(
    "fuzzy_pairs_levenshtein",
    scale_class="diagnostic",
    oracle=f"""
    WITH p AS (
      SELECT doc_id, source,
             substr(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')),
                    1, {_LEV_PREFIX}) AS pfx
      FROM documents
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(levenshtein(a.pfx, b.pfx) AS BIGINT) AS edit_dist
    FROM p a JOIN p b
      ON a.source = b.source AND a.doc_id < b.doc_id
    WHERE levenshtein(a.pfx, b.pfx) <= {_LEV_MAX}
    """,
)
def fuzzy_pairs_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance fuzzy matching (entity-resolution / OCR-noise
    dedup family): document pairs whose normalized {_LEV_PREFIX}-char
    prefixes are within {_LEV_MAX} edits. Levenshtein is O(len²) per
    pair and pair counts are O(block²), so the physical shape is
    everything: pairs are generated ONLY within source blocks (the
    blocked-comparison discipline of ngram_jaccard_blocked — never
    all-pairs), the prefix is cut before the join so each side carries
    {_LEV_PREFIX} chars instead of full documents through the shuffle,
    and the distance runs JVM-side (codegen levenshtein, no Python).
    At 100 TB the block key would be an LSH/phonetic bucket; the shape
    is identical."""
    d = _docs(spark, sf_dir)
    pfx = F.substring(
        F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " ")),
        1,
        _LEV_PREFIX,
    )
    p = d.select("doc_id", "source", pfx.alias("pfx"))
    a = p.select(
        F.col("doc_id").alias("id_a"), "source", F.col("pfx").alias("pfx_a")
    )
    b = p.select(
        F.col("doc_id").alias("id_b"),
        F.col("source").alias("source_b"),
        F.col("pfx").alias("pfx_b"),
    )
    # bounded levenshtein: the threshold arg bounds the DP band and
    # early-terminates past it, returning -1 — identical surviving
    # rows (the oracle computes the full distance and filters; values
    # ≤ the bound are exact in both). At this loose bound (22 of 40
    # chars) the band saves little — the win appears when k ≪ len,
    # the production fuzzy-match regime (e.g. 3 edits over 100 chars)
    dist = F.levenshtein("pfx_a", "pfx_b", _LEV_MAX)
    return (
        a.join(
            b,
            (F.col("source") == F.col("source_b"))
            & (F.col("id_a") < F.col("id_b")),
        )
        .select("id_a", "id_b", dist.cast("long").alias("edit_dist"))
        .filter(F.col("edit_dist") >= 0)
    )


_FUZ_BANDS = 2  # minhash bands; a pair is a candidate if ANY band key matches
_FUZ_ROWS = 2   # minhashes concatenated per band key: P(collide) = J^_FUZ_ROWS
# Per-(band, band-key) bucket cap at the REP level (r12, measured at
# the third decade): band-bucket occupancy grows linearly with the
# corpus when a prefix family is popular (boilerplate headers, the
# 100x fixture's salted copy families), so the band join's candidate
# count — Σ occupancy² — grows QUADRATICALLY: measured 3.7e7 rep-pair
# candidates at 10x (max occupancy 2,282) and ~3.7e9 / 3,458 s at
# 100x. The cap keeps, per (band, bkey), the _FUZ_BUCKCAP reps with
# the smallest rep doc_id (deterministic, the _AA_MIDCAP/_OVL_BUCKCAP
# convention); a pair is a candidate iff BOTH members rank within the
# cap in a shared bucket, so candidates are bounded by
# buckets x cap² — linear in corpus size. SEMANTIC (recall trade at
# scale, mirrored row-for-row in the oracle). On provided testdata
# the cap trims CANDIDATES but not OUTPUT: sf0.1's hottest bucket
# holds 529 reps (3 buckets over cap, 4.8% of rep-band rows dropped —
# probe_scale100_battery_r12.json) yet the 257 output pairs are
# row-identical to the uncapped run, hash-matched against the
# mirrored oracle at sf0.001/0.01/0.1 in fresh sessions. Dropped-rep
# mass at scale is recorded by tools/probe_scale100.py as this
# query's honesty metric.
_FUZ_BUCKCAP = 256


def _fuz_band_min_sql(band: int, row: int) -> str:
    """min over the prefix's 3-gram set of md5 seeded per (band, row)."""
    return (
        f"list_min(list_transform("
        f"generate_series(1, greatest(length(pfx) - 2, 1)), "
        f"i -> md5('{band}r{row}|' || substr(pfx, i, 3))))"
    )


_FUZ_KEYS_STAGED: dict[tuple, str] = {}


def _staged_fuz_keys(spark: SparkSession, sf_dir: str) -> str:
    """Materialize the PRE-CAP rep-level band-key frame — (doc_id,
    pfx, band, bkey), one row per (distinct-prefix representative,
    band) — ONCE per sf_dir (r13, VERDICT r12 item 4: the per-rep
    band-key HOF — ~{_LEV_PREFIX - 2} md5 calls per band-row per rep —
    dominated fuzzy_pairs_blocked's 1x time and was recomputed on
    every call, twice per fuzzy_recall_blocked run), returning a
    catalog TABLE NAME. r14: the table is external parquet BUCKETED
    (32) by (band, bkey) and sorted by (band, bkey, doc_id) — the
    _FUZ_BUCKCAP window and the candidate self-join are BOTH keyed on
    (band, bkey), so the bucketed scan serves them shuffle-free.
    Measured verdict (tools/exp_fuzzy_bkbucket.py, cold interleaved
    subprocesses, output hash-identical across all 12 runs): sf0.1
    won EVERY pair — 8.75->3.67, 5.18->2.95, 4.98->3.73 s; 100x
    medians 30.3->24.6 s (the output-sized member expansion dilutes
    the win there). The _FUZ_BUCKCAP rank/cap stays IN the query (it
    is semantics, and tests monkeypatch it), so the staged artifact
    is cap-independent, exactly like _staged_sig_index's band index.
    At 100 TB this is the persisted LSH key table maintained next to
    the corpus, bucketed by (band, bkey) — now literally. Cache keyed
    on the source parquet's content fingerprint, not path alone
    (ADVICE r13); spark.table() requires staging session == query
    session (one session per process — the driver's and bench's
    shape, same note as _staged_tokset_wb)."""
    from dataengineeringproject_spark.registry import source_fingerprint

    ck = source_fingerprint(sf_dir, "documents")
    if ck in _FUZ_KEYS_STAGED:
        return _FUZ_KEYS_STAGED[ck]
    import atexit
    import shutil
    import tempfile

    from dataengineeringproject_spark.operators.similarity import (
        ensure_min_parallelism,
    )

    d = ensure_min_parallelism(_docs(spark, sf_dir), "doc_id")
    pfx = F.substring(
        F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " ")),
        1,
        _LEV_PREFIX,
    )
    reps = (
        d.select("doc_id", pfx.alias("pfx"))
        .groupBy("pfx")
        .agg(F.min("doc_id").alias("doc_id"))
    )

    def _band_min(b: int, r: int) -> str:
        return (
            f"array_min(transform(sequence(1, greatest(length(pfx) - 2, 1)), "
            f"i -> md5(concat('{b}r{r}|', substring(pfx, i, 3)))))"
        )

    band_keys = [
        F.expr(
            "concat("
            + ", ".join(_band_min(b, r) for r in range(_FUZ_ROWS))
            + ")"
        ).alias(f"bkey_{b}")
        for b in range(_FUZ_BANDS)
    ]
    k = reps.select("doc_id", "pfx", *band_keys).select(
        "doc_id",
        "pfx",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.col(f"bkey_{b}").alias("bkey"),
                    )
                    for b in range(_FUZ_BANDS)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "pfx", "bk.band", "bk.bkey")
    path = tempfile.mkdtemp(prefix="deps_fuzkeys_")
    atexit.register(shutil.rmtree, path, ignore_errors=True)
    # content-addressed name (ADVICE r14): unique per source
    # generation AND per process — see registry.fingerprint_token
    from dataengineeringproject_spark.registry import fingerprint_token

    name = f"deps_fuz_keys_bk_{fingerprint_token(ck)}"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    (
        k.write.bucketBy(32, "band", "bkey")
        .sortBy("band", "bkey", "doc_id")
        .option("path", path)
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(name)
    )
    _FUZ_KEYS_STAGED[ck] = name
    return name


register_prestage(_staged_fuz_keys)


@register(
    "fuzzy_pairs_blocked",
    oracle=f"""
    WITH p AS (
      SELECT doc_id,
             substr(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')),
                    1, {_LEV_PREFIX}) AS pfx
      FROM documents
    ),
    g AS (SELECT pfx, min(doc_id) AS doc_id FROM p GROUP BY pfx),
    k AS (
      SELECT doc_id, pfx, band,
             {" || ".join(
                 "CASE band " + " ".join(
                     f"WHEN {b} THEN {_fuz_band_min_sql(b, r)}"
                     for b in range(_FUZ_BANDS)
                 ) + " END"
                 for r in range(_FUZ_ROWS)
             )} AS bkey
      FROM g, (SELECT unnest([{", ".join(str(b) for b in range(_FUZ_BANDS))}])
               AS band) bands
    ),
    kk AS (
      SELECT doc_id, pfx, band, bkey FROM (
        SELECT *, row_number() OVER (PARTITION BY band, bkey
                                     ORDER BY doc_id ASC) AS rn
        FROM k) WHERE rn <= {_FUZ_BUCKCAP}
    ),
    rp AS (
      SELECT DISTINCT a.pfx AS pfx_a, b.pfx AS pfx_b,
             CAST(levenshtein(a.pfx, b.pfx) AS BIGINT) AS edit_dist
      FROM kk a JOIN kk b
        ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
      WHERE levenshtein(a.pfx, b.pfx) <= {_LEV_MAX}
    ),
    rps AS (
      SELECT pfx_a, pfx_b, edit_dist FROM rp
      UNION ALL SELECT pfx_b AS pfx_a, pfx_a AS pfx_b, edit_dist FROM rp
      UNION ALL SELECT pfx AS pfx_a, pfx AS pfx_b,
                       CAST(0 AS BIGINT) AS edit_dist FROM g
    )
    SELECT ma.doc_id AS id_a, mb.doc_id AS id_b, rps.edit_dist
    FROM rps
    JOIN p ma ON ma.pfx = rps.pfx_a
    JOIN p mb ON mb.pfx = rps.pfx_b
    WHERE ma.doc_id < mb.doc_id
    """,
)
def fuzzy_pairs_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy matching for an UNBOUNDED corpus — the block key the
    fuzzy_pairs_levenshtein docstring promised: instead of trusting a
    metadata blocking column (source), each normalized prefix derives
    {_FUZ_BANDS} MinHash band keys over its character 3-gram set
    (per-band min of md5(band|gram) — md5 is bit-identical in both
    engines, so the blocking itself is oracle-checked). Pairs sharing
    ANY band key become candidates via the band equi-join — the same
    never-all-pairs discipline as dedup_minhash_lsh, but content-
    derived, so it works when no clean blocking attribute exists and
    survives corpora where one 'source' holds half the data. Key
    computation is a zero-shuffle higher-order-function projection
    (no explode of the gram set); verification is JVM codegen
    levenshtein, applied BEFORE the distinct so the dedup shuffle
    moves only surviving (id, id, dist) triples. Approximate by
    design: a near-pair with no colliding band is missed (raise
    bands for recall — the standard LSH dial), but both engines
    compute the identical candidate set, so the check is exact.

    Physical shape (r12, output-identical where the cap doesn't
    bind): everything about a pair — band keys, levenshtein, the
    _LEV_MAX filter — depends ONLY on the two normalized prefixes, so
    the band join runs over ONE REPRESENTATIVE per DISTINCT prefix
    and the result expands back to member pairs afterwards (plus the
    all-pairs-at-distance-0 expansion within each identical-prefix
    group, which is what the raw join produced for them). Rep
    collapse alone was NOT enough at the third decade: the 100x
    fixture's salted copy families are distinct-prefix NEAR-dups, so
    band-bucket occupancy grows linearly with the corpus and the
    rep-level band join still ran ~3.7e9 candidates in 3,458 s. Each
    (band, bkey) bucket therefore keeps only its _FUZ_BUCKCAP
    smallest-id reps (see _FUZ_BUCKCAP — semantic, oracle-mirrored,
    no bite on provided testdata), bounding candidates at
    buckets x cap². The oracle mirrors the rep + cap construction
    row-for-row; member-pair expansion is output-sized."""
    from dataengineeringproject_spark.operators.similarity import (
        ensure_min_parallelism,
    )

    d = ensure_min_parallelism(_docs(spark, sf_dir), "doc_id")
    pfx = F.substring(
        F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " ")),
        1,
        _LEV_PREFIX,
    )
    mem = d.select("doc_id", pfx.alias("pfx"))
    # r13 (VERDICT r12 item 4): the pre-cap rep band-key frame comes
    # from the staged table (_staged_fuz_keys — built once per sf_dir,
    # shared with fuzzy_recall_blocked's second pass), not re-derived
    # via the band-key HOF on every call. reps is recovered from the
    # staged frame's band-0 rows (one row per rep per band, so band 0
    # is exactly the rep set) instead of re-aggregating the member
    # frame. r14: the table is bucketed by (band, bkey), so the cap
    # window and the candidate self-join below run shuffle-free on the
    # bucketed scan (measured verdict in _staged_fuz_keys).
    k = spark.table(_staged_fuz_keys(spark, sf_dir))
    reps = k.filter(F.col("band") == 0).select("pfx", "doc_id")
    # r12: per-bucket concurrency cap (see _FUZ_BUCKCAP) — rank reps
    # within each (band, bkey) by doc_id and keep the cap smallest;
    # candidates fall from Σ occupancy² (quadratic in corpus) to
    # buckets x cap² (linear). Mirrored row-for-row in the oracle.
    from pyspark.sql import Window

    wbk = Window.partitionBy("band", "bkey").orderBy(F.asc("doc_id"))
    k = (
        k.withColumn("rn", F.row_number().over(wbk))
        .filter(F.col("rn") <= _FUZ_BUCKCAP)
        .drop("rn")
    )
    a = k.select(
        F.col("doc_id").alias("id_a"), F.col("pfx").alias("pfx_a"), "band", "bkey"
    )
    b = k.select(
        F.col("doc_id").alias("id_b"),
        F.col("pfx").alias("pfx_b"),
        F.col("band").alias("band_b"),
        F.col("bkey").alias("bkey_b"),
    )
    dist = F.levenshtein("pfx_a", "pfx_b", _LEV_MAX)
    # rep-level pairs, keyed by prefix (rep <-> prefix is a bijection,
    # so the distinct matches the raw formulation's pair distinct)
    rp = (
        a.join(
            b,
            (F.col("band") == F.col("band_b"))
            & (F.col("bkey") == F.col("bkey_b"))
            & (F.col("id_a") < F.col("id_b")),
        )
        .select("pfx_a", "pfx_b", dist.cast("long").alias("edit_dist"))
        .filter(F.col("edit_dist") >= 0)
        .distinct()
    )
    # both orientations for cross-group expansion (exactly one
    # orientation survives id_a < id_b per member pair), plus the
    # within-group diagonal: identical prefixes pair at distance 0.
    rp_sym = (
        rp.unionAll(
            rp.select(
                F.col("pfx_b").alias("pfx_a"),
                F.col("pfx_a").alias("pfx_b"),
                "edit_dist",
            )
        ).unionAll(
            reps.select(
                F.col("pfx").alias("pfx_a"),
                F.col("pfx").alias("pfx_b"),
                F.lit(0).cast("long").alias("edit_dist"),
            )
        )
    )
    return (
        rp_sym.join(
            mem.select(F.col("pfx").alias("pfx_a"), F.col("doc_id").alias("id_a")),
            "pfx_a",
        )
        .join(
            mem.select(F.col("pfx").alias("pfx_b"), F.col("doc_id").alias("id_b")),
            "pfx_b",
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "edit_dist")
    )


# --- cross-split n-gram leakage (r4) ----------------------------------------

_LEAK_HIGH = 0.5  # a doc with > this fraction of train-seen shingles


@register(
    "split_leakage_ngram",
    oracle=rf"""
    WITH d AS (
      SELECT doc_id,
             CASE WHEN {_bucket_sql('doc_id')} < {SPLIT_TRAIN} THEN 'train'
                  WHEN {_bucket_sql('doc_id')} < {SPLIT_VAL} THEN 'val'
                  ELSE 'test' END AS split,
             text
      FROM documents
    ),
    shg AS (
      SELECT DISTINCT doc_id, split,
             unnest(list_distinct(CASE WHEN len(CASE WHEN length(trim(text)) = 0 THEN [] ELSE regexp_split_to_array(trim(text), '\s+') END) >= 3 THEN list_transform(generate_series(1, len(CASE WHEN length(trim(text)) = 0 THEN [] ELSE regexp_split_to_array(trim(text), '\s+') END) - 2), i -> concat_ws(' ', CASE WHEN length(trim(text)) = 0 THEN [] ELSE regexp_split_to_array(trim(text), '\s+') END[i + 0], CASE WHEN length(trim(text)) = 0 THEN [] ELSE regexp_split_to_array(trim(text), '\s+') END[i + 1], CASE WHEN length(trim(text)) = 0 THEN [] ELSE regexp_split_to_array(trim(text), '\s+') END[i + 2])) ELSE [concat_ws(' ', CASE WHEN length(trim(text)) = 0 THEN [] ELSE regexp_split_to_array(trim(text), '\s+') END)] END)) AS sh
      FROM d
    ),
    train_sh AS (SELECT DISTINCT sh FROM shg WHERE split = 'train'),
    ev AS (
      SELECT s.doc_id, s.split,
             count(*) AS n_sh,
             sum(CASE WHEN t.sh IS NOT NULL THEN 1 ELSE 0 END) AS n_leaked
      FROM shg s LEFT JOIN train_sh t USING (sh)
      WHERE s.split <> 'train'
      GROUP BY 1, 2
    )
    SELECT split,
           CAST(count(*) AS BIGINT) AS n_docs,
           ROUND(avg(n_leaked * 1e0 / n_sh), 6) AS avg_leak_frac,
           CAST(sum(CASE WHEN n_leaked * 1e0 / n_sh > {_LEAK_HIGH}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_high_leak
    FROM ev GROUP BY 1
    """,
)
def split_leakage_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train→eval n-gram leakage report: for every val/test document
    (same stable id-hash split rule as split_train_val_test), the
    fraction of its distinct 3-token shingles that also occur anywhere
    in the train split — the shingle-grain decontamination audit that
    catches paraphrase-level leakage contamination_pairs' whole-prefix
    fingerprints cannot (a reworded eval item shares most shingles but
    no 20-token prefix). Physical shape: one exploded shingle
    projection; the train shingle VOCABULARY (distinct, Zipf-bounded)
    is the join's build side on the shingle key the probe side is
    already partitioned by; per-doc then per-split collapse. Reports
    per eval split: doc count, mean leak fraction, and docs past the
    {_LEAK_HIGH} high-leak threshold (integer ratio arithmetic,
    engine-exact)."""
    from dataengineeringproject_spark.operators import dedup as D

    d = _docs(spark, sf_dir)
    b = _bucket("doc_id")
    split = (
        F.when(b < SPLIT_TRAIN, F.lit("train"))
        .when(b < SPLIT_VAL, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    shg = d.select(
        "doc_id",
        split.alias("split"),
        F.explode(D.shingles(F.col("text"), k=3)).alias("sh"),
    ).distinct()
    train_sh = shg.filter(F.col("split") == "train").select("sh").distinct()
    marked = (
        shg.filter(F.col("split") != "train")
        # merge hint (r13): the train shingle vocabulary scales with
        # the corpus — broadcasting it is the dedup_substring_exact /
        # jaccard r12 failure mode (AQE underestimates the
        # post-distinct frame, the real build blows the driver)
        .join(train_sh.withColumn("__hit", F.lit(1)).hint("merge"), "sh", "left")
    )
    ev = marked.groupBy("doc_id", "split").agg(
        F.count(F.lit(1)).alias("n_sh"),
        F.sum(F.when(F.col("__hit").isNotNull(), 1).otherwise(0)).alias(
            "n_leaked"
        ),
    )
    frac = F.col("n_leaked") * F.lit(1.0) / F.col("n_sh")
    return ev.groupBy("split").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.round(F.avg(frac), 6).alias("avg_leak_frac"),
        F.sum(F.when(frac > _LEAK_HIGH, 1).otherwise(0))
        .cast("long")
        .alias("n_high_leak"),
    )


_FUZ_SAMPLE_MOD = 10  # recall truth anchors: doc_id % this == 0


@register(
    "fuzzy_recall_blocked",
    # diagnostic: the TRUTH side is an anchored all-pairs non-equi join
    # (sampled anchors vs the FULL corpus, a BroadcastNestedLoopJoin
    # that is O(n²/mod) in corpus size) — inherently a recall
    # measurement, never a production path; the production query is
    # fuzzy_pairs_blocked (VERDICT r5 item 3).
    scale_class="diagnostic",
    oracle=f"""
    WITH p AS (
      SELECT doc_id,
             substr(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')),
                    1, {_LEV_PREFIX}) AS pfx
      FROM documents
    ),
    truth AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM p a JOIN p b ON a.doc_id < b.doc_id
      WHERE a.doc_id % {_FUZ_SAMPLE_MOD} = 0
        AND levenshtein(a.pfx, b.pfx) <= {_LEV_MAX}
    ),
    k AS (
      SELECT doc_id, pfx, band,
             {" || ".join(
                 "CASE band " + " ".join(
                     f"WHEN {b} THEN {_fuz_band_min_sql(b, r)}"
                     for b in range(_FUZ_BANDS)
                 ) + " END"
                 for r in range(_FUZ_ROWS)
             )} AS bkey
      FROM p, (SELECT unnest([{", ".join(str(b) for b in range(_FUZ_BANDS))}])
               AS band) bands
    ),
    found AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM k a JOIN k b
        ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
      WHERE a.doc_id % {_FUZ_SAMPLE_MOD} = 0
    ),
    hit AS (
      SELECT count(*) AS n_hit
      FROM truth t JOIN found f ON t.id_a = f.id_a AND t.id_b = f.id_b
    )
    SELECT CAST((SELECT count(*) FROM truth) AS BIGINT) AS n_true,
           CAST(hit.n_hit AS BIGINT) AS n_hit,
           ROUND(hit.n_hit * 1e0
                 / nullif((SELECT count(*) FROM truth), 0), 6) AS recall
    FROM hit
    """,
)
def fuzzy_recall_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured recall of the LSH blocking (fuzzy_pairs_blocked's
    candidate generator) against exact edit-distance ground truth —
    the same honesty metric the ANN family carries
    (ann_recall_trained_ivf): an approximate blocker without a
    measured recall is a hope, not an operator. Ground truth is exact
    bounded-DP levenshtein over ALL pairs anchored at a deterministic
    1/{_FUZ_SAMPLE_MOD} doc sample (id % {_FUZ_SAMPLE_MOD} == 0) —
    the anchor-sampling discipline that keeps truth computation
    bounded at corpus scale while estimating the same recall; the
    candidate side applies the identical anchor filter. Reports
    truth-pair count, candidates hitting truth, and recall. Raising
    _FUZ_BANDS is the recall dial; this query is what makes turning
    it evidence-based."""
    d = _docs(spark, sf_dir)
    pfx = F.substring(
        F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " ")),
        1,
        _LEV_PREFIX,
    )
    p = d.select("doc_id", pfx.alias("pfx"))
    a = p.filter(F.col("doc_id") % _FUZ_SAMPLE_MOD == 0).select(
        F.col("doc_id").alias("id_a"), F.col("pfx").alias("pfx_a")
    )
    b = p.select(F.col("doc_id").alias("id_b"), F.col("pfx").alias("pfx_b"))
    truth = (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .filter(F.levenshtein("pfx_a", "pfx_b", _LEV_MAX) >= 0)
        .select("id_a", "id_b")
    )
    found = (
        fuzzy_pairs_blocked(spark, sf_dir)
        .filter(F.col("id_a") % _FUZ_SAMPLE_MOD == 0)
        .select("id_a", "id_b")
        .distinct()
    )
    hit = truth.join(found, ["id_a", "id_b"]).agg(
        F.count(F.lit(1)).alias("n_hit")
    )
    nt = truth.agg(F.count(F.lit(1)).alias("n_true"))
    return nt.crossJoin(hit).select(
        F.col("n_true").cast("long").alias("n_true"),
        F.col("n_hit").cast("long").alias("n_hit"),
        F.round(
            F.col("n_hit") * F.lit(1.0) / F.nullif(F.col("n_true"), F.lit(0)), 6
        ).alias("recall"),
    )


# --- model-eval lift table: logistic score vs rule label (r5 continuation) ---


@register(
    "score_decile_lift",
    oracle=f"""
    WITH f AS (
      SELECT doc_id,
             len({X.tokens_sql('text')}) AS n_tokens,
             {X.stopword_ratio_sql('text')} AS stop_r,
             {X.punct_ratio_sql('text')} AS punct_r,
             length(text) AS n_chars
      FROM documents
    ),
    z AS (
      SELECT doc_id,
             ROUND(1.0 / (1.0 + exp(-({_QLR['b0']}
               + {_QLR['w_logtok']} * ln(1 + n_tokens)
               + {_QLR['w_stop']} * stop_r
               + {_QLR['w_punct']} * punct_r
               + {_QLR['w_cpt']} * (n_chars * 1.0 / greatest(n_tokens, 1))))),
               6) AS prob
      FROM f
    ),
    b AS (SELECT doc_id, {_GQ_TOKS} AS toks FROM documents),
    m AS (
      SELECT doc_id, len(toks) AS n,
             list_sum(list_transform(toks, t -> length(t))) AS chars,
             len(list_distinct(toks)) AS nd
      FROM b
    ),
    g AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, len(toks) - 1),
                                   i -> concat_ws(' ', toks[i], toks[i + 1])))
               AS gram
      FROM b WHERE len(toks) >= 2
    ),
    c AS (SELECT doc_id, gram, count(*) AS cnt FROM g GROUP BY 1, 2),
    t2 AS (SELECT doc_id, max(cnt) AS top_cnt FROM c GROUP BY 1),
    lbl AS (
      SELECT m.doc_id,
             (n BETWEEN {_GQ_MIN_TOK} AND {_GQ_MAX_TOK}
              AND ROUND(chars * 1.0 / n, 6)
                  BETWEEN {_GQ_MIN_MWL} AND {_GQ_MAX_MWL}
              AND ROUND(nd * 1.0 / n, 6) > {_GQ_MIN_UNIQ}
              AND ROUND(COALESCE(top_cnt, 1) * 1.0 / greatest(n - 1, 1), 6)
                  < {_GQ_MAX_TOP2}) AS pos
      FROM m LEFT JOIN t2 ON m.doc_id = t2.doc_id
    ),
    rk AS (
      SELECT z.doc_id, z.prob, lbl.pos,
             row_number() OVER (ORDER BY z.prob DESC, z.doc_id) AS rn,
             count(*) OVER () AS nn
      FROM z JOIN lbl USING (doc_id)
    ),
    dec AS (
      SELECT least(10, (rn - 1) * 10 // nn + 1) AS decile,
             CAST(round(prob * 1e6) AS BIGINT) AS pu,
             CASE WHEN pos THEN 1 ELSE 0 END AS y
      FROM rk
    ),
    base AS (SELECT sum(y) * 1e0 / count(*) AS rate FROM dec)
    SELECT CAST(decile AS BIGINT) AS decile,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(CAST(sum(pu) AS DOUBLE) / count(*) / 1e6, 6) AS avg_score,
           round(sum(y) * 1e0 / count(*), 6) AS positive_rate,
           round(sum(y) * 1e0 / count(*) / base.rate, 6) AS lift
    FROM dec CROSS JOIN base
    GROUP BY decile, base.rate
    """,
)
def score_decile_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile lift table — the model-evaluation report for the
    logistic quality scorer against the INDEPENDENT Gopher rule label
    (the two quality signals share no thresholds, so lift here is a
    genuine agreement measure): documents ranked by score, cut into
    10 equal-count deciles with integer rank arithmetic, and each
    decile's positive rate compared to the base rate. A healthy
    scorer is monotone in the table; lift@1 is the 'what do I gain
    screening by model' number. Scores enter the per-decile mean as
    exact micro-units; the base rate is a 1-row broadcast. Decile
    edges never depend on float percentile conventions (same
    (rn−1)·10 div n rule as RFM)."""
    from pyspark.sql import Window

    scored = quality_logistic_score(spark, sf_dir).select(
        "doc_id", F.col("quality_prob").alias("prob")
    )
    label = quality_gopher_rules(spark, sf_dir).select(
        "doc_id", F.col("keep").alias("pos")
    )
    one = Window.partitionBy(F.lit(1) * F.lit(1))
    rk = (
        scored.join(label, "doc_id")
        .select(
            "prob", "pos",
            F.row_number()
            .over(one.orderBy(F.desc("prob"), F.asc("doc_id")))
            .alias("rn"),
            F.count(F.lit(1)).over(one).alias("nn"),
        )
    )
    dec = rk.select(
        F.least(F.lit(10), F.expr("(rn - 1) * 10 div nn + 1")).alias("decile"),
        F.round(F.col("prob") * F.lit(1e6)).cast("long").alias("pu"),
        F.when(F.col("pos"), 1).otherwise(0).alias("y"),
    )
    base = dec.agg(
        (F.sum("y") * F.lit(1.0) / F.count(F.lit(1))).alias("rate")
    )
    return (
        dec.groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("pu").alias("spu"),
            F.sum("y").alias("sy"),
        )
        .crossJoin(F.broadcast(base))
        .select(
            F.col("decile").cast("long").alias("decile"),
            F.col("n_docs").cast("long").alias("n_docs"),
            F.round(
                F.col("spu").cast("double") / F.col("n_docs") / F.lit(1e6), 6
            ).alias("avg_score"),
            F.round(F.col("sy") * F.lit(1.0) / F.col("n_docs"), 6).alias(
                "positive_rate"
            ),
            F.round(
                F.col("sy") * F.lit(1.0) / F.col("n_docs") / F.col("rate"), 6
            ).alias("lift"),
        )
    )


@register(
    "score_calibration_bins",
    oracle=f"""
    WITH f AS (
      SELECT doc_id,
             len({X.tokens_sql('text')}) AS n_tokens,
             {X.stopword_ratio_sql('text')} AS stop_r,
             {X.punct_ratio_sql('text')} AS punct_r,
             length(text) AS n_chars
      FROM documents
    ),
    z AS (
      SELECT doc_id,
             ROUND(1.0 / (1.0 + exp(-({_QLR['b0']}
               + {_QLR['w_logtok']} * ln(1 + n_tokens)
               + {_QLR['w_stop']} * stop_r
               + {_QLR['w_punct']} * punct_r
               + {_QLR['w_cpt']} * (n_chars * 1.0 / greatest(n_tokens, 1))))),
               6) AS prob
      FROM f
    ),
    b AS (SELECT doc_id, {_GQ_TOKS} AS toks FROM documents),
    m AS (
      SELECT doc_id, len(toks) AS n,
             list_sum(list_transform(toks, t -> length(t))) AS chars,
             len(list_distinct(toks)) AS nd
      FROM b
    ),
    g AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, len(toks) - 1),
                                   i -> concat_ws(' ', toks[i], toks[i + 1])))
               AS gram
      FROM b WHERE len(toks) >= 2
    ),
    c AS (SELECT doc_id, gram, count(*) AS cnt FROM g GROUP BY 1, 2),
    t2 AS (SELECT doc_id, max(cnt) AS top_cnt FROM c GROUP BY 1),
    lbl AS (
      SELECT m.doc_id,
             (n BETWEEN {_GQ_MIN_TOK} AND {_GQ_MAX_TOK}
              AND ROUND(chars * 1.0 / n, 6)
                  BETWEEN {_GQ_MIN_MWL} AND {_GQ_MAX_MWL}
              AND ROUND(nd * 1.0 / n, 6) > {_GQ_MIN_UNIQ}
              AND ROUND(COALESCE(top_cnt, 1) * 1.0 / greatest(n - 1, 1), 6)
                  < {_GQ_MAX_TOP2}) AS pos
      FROM m LEFT JOIN t2 ON m.doc_id = t2.doc_id
    ),
    d AS (
      SELECT least(9, CAST(floor(z.prob * 10) AS BIGINT)) AS bin,
             CAST(round(z.prob * 1e6) AS BIGINT) AS pu,
             CASE WHEN lbl.pos THEN 1 ELSE 0 END AS y
      FROM z JOIN lbl USING (doc_id)
    )
    SELECT bin, CAST(count(*) AS BIGINT) AS n_docs,
           round(CAST(sum(pu) AS DOUBLE) / count(*) / 1e6, 6) AS mean_pred,
           round(sum(y) * 1e0 / count(*), 6) AS observed_rate
    FROM d GROUP BY 1
    """,
)
def score_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram for the quality scorer: equal-WIDTH 0.1
    probability bins (floor(p·10), top bin closed), mean predicted
    probability vs the observed Gopher-label rate per bin — the
    calibration view the decile LIFT table doesn't give (lift says the
    ranking works; calibration says whether 0.8 MEANS 80%, which is
    what a probability-thresholded keep/drop pipeline actually relies
    on). Bin ids are exact integer floors of the 6dp-rounded score,
    predicted means ride micro-units — one keyed aggregate, output
    ≤ 10 rows."""
    scored = quality_logistic_score(spark, sf_dir).select(
        "doc_id", F.col("quality_prob").alias("prob")
    )
    label = quality_gopher_rules(spark, sf_dir).select(
        "doc_id", F.col("keep").alias("pos")
    )
    d = scored.join(label, "doc_id").select(
        F.least(
            F.lit(9), F.floor(F.col("prob") * 10).cast("long")
        ).alias("bin"),
        F.round(F.col("prob") * F.lit(1e6)).cast("long").alias("pu"),
        F.when(F.col("pos"), 1).otherwise(0).alias("y"),
    )
    return d.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.round(
            F.sum("pu").cast("double") / F.count(F.lit(1)) / F.lit(1e6), 6
        ).alias("mean_pred"),
        F.round(F.sum("y") * F.lit(1.0) / F.count(F.lit(1)), 6).alias(
            "observed_rate"
        ),
    )


# --- Neyman-allocation stratified sampling (r5 continuation) -----------------

_NEY_K = 500  # total sample budget


@register(
    "sample_neyman_allocation",
    oracle=f"""
    WITH st AS (
      SELECT event_type, count(*) AS n_pop,
             sqrt(CAST(sum(vu * vu) AS DOUBLE) / count(*)
                  - (CAST(sum(vu) AS DOUBLE) / count(*))
                    * (CAST(sum(vu) AS DOUBLE) / count(*))) / 1e3 AS sigma,
             CAST(sum(vu) AS DOUBLE) / count(*) / 1e3 AS pop_mean
      FROM (SELECT event_type,
                   CAST(round(value * 1e3) AS BIGINT) AS vu FROM events)
      GROUP BY 1
    ),
    tot AS (SELECT sum(n_pop * sigma) AS w FROM st),
    alloc AS (
      SELECT st.*, CAST(round({_NEY_K} * st.n_pop * st.sigma / tot.w)
                        AS BIGINT) AS k_alloc
      FROM st CROSS JOIN tot
    ),
    h AS (
      SELECT event_type,
             CAST(round(value * 1e3) AS BIGINT) AS vu,
             row_number() OVER (
               PARTITION BY event_type
               ORDER BY CAST(concat('0x', substr(md5(CAST(event_id AS VARCHAR)),
                                                 1, 15)) AS BIGINT),
                        event_id) AS rn
      FROM events
    ),
    smp AS (
      SELECT h.event_type, count(*) AS n_sampled,
             CAST(sum(h.vu) AS DOUBLE) / count(*) / 1e3 AS sample_mean
      FROM h JOIN alloc USING (event_type)
      WHERE h.rn <= alloc.k_alloc
      GROUP BY 1
    )
    SELECT alloc.event_type, CAST(alloc.n_pop AS BIGINT) AS n_pop,
           round(alloc.sigma, 6) AS sigma, alloc.k_alloc,
           CAST(smp.n_sampled AS BIGINT) AS n_sampled,
           round(alloc.pop_mean, 6) AS pop_mean,
           round(smp.sample_mean, 6) AS sample_mean
    FROM alloc JOIN smp USING (event_type)
    """,
)
def sample_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-allocation stratified sampling: the {_NEY_K}-row budget
    split across strata proportionally to N_h·σ_h — the allocation
    that minimizes the stratified estimator's variance (equal or
    proportional allocation wastes budget on low-variance strata; this
    is the 'optimal' textbook rule). Stratum σ comes from exact
    integer MILLI-unit sums (micro-units overflow int64 in the
    squared sums past a few thousand rows per stratum — measured at
    sf0.01; milli holds to ~3e7 rows/stratum, past which the binned
    variance machinery takes over); the per-stratum draw is the repo's
    standard deterministic hash order (md5-prefix integer of event_id,
    rank ≤ k_h via WindowGroupLimit — both engines pick the identical
    sample, making the sample mean itself hash-checkable). Output per
    stratum: population size, σ, allocated k, realized sample size and
    the sample-vs-population mean. Rounding the allocations
    independently means Σk can differ from {_NEY_K} by a row or two —
    deterministic on both engines, noted rather than papered over
    (largest-remainder apportionment is the refinement)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "event_id",
        F.round(F.col("value") * F.lit(1e3)).cast("long").alias("vu"),
    )
    st = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_pop"),
        (
            F.sqrt(
                F.sum(F.col("vu") * F.col("vu")).cast("double")
                / F.count(F.lit(1))
                - (F.sum("vu").cast("double") / F.count(F.lit(1)))
                * (F.sum("vu").cast("double") / F.count(F.lit(1)))
            )
            / F.lit(1e3)
        ).alias("sigma"),
        (F.sum("vu").cast("double") / F.count(F.lit(1)) / F.lit(1e3)).alias(
            "pop_mean"
        ),
    )
    tot = st.agg(F.sum(F.col("n_pop") * F.col("sigma")).alias("w"))
    alloc = st.crossJoin(F.broadcast(tot)).select(
        "event_type", "n_pop", "sigma", "pop_mean",
        F.round(
            F.lit(_NEY_K) * F.col("n_pop") * F.col("sigma") / F.col("w")
        )
        .cast("long")
        .alias("k_alloc"),
    )
    hsh = F.conv(
        F.substring(F.md5(F.col("event_id").cast("string")), 1, 15), 16, 10
    ).cast("long")
    w = Window.partitionBy("event_type").orderBy(hsh, F.col("event_id"))
    h = ev.withColumn("rn", F.row_number().over(w))
    smp = (
        h.join(
            F.broadcast(
                alloc.select(
                    F.col("event_type").alias("a_et"), "k_alloc"
                )
            ),
            F.col("event_type") == F.col("a_et"),
        )
        .filter(F.col("rn") <= F.col("k_alloc"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            (
                F.sum("vu").cast("double") / F.count(F.lit(1)) / F.lit(1e3)
            ).alias("sample_mean"),
        )
    )
    return alloc.join(smp, "event_type").select(
        "event_type",
        F.col("n_pop").cast("long").alias("n_pop"),
        F.round("sigma", 6).alias("sigma"),
        "k_alloc",
        F.col("n_sampled").cast("long").alias("n_sampled"),
        F.round("pop_mean", 6).alias("pop_mean"),
        F.round("sample_mean", 6).alias("sample_mean"),
    )


@register(
    "corr_chars_quality_by_source",
    oracle=f"""
    WITH f AS (
      SELECT doc_id, source, n_chars,
             CAST(round(
               1.0 / (1.0 + exp(-({_QLR['b0']}
                 + {_QLR['w_logtok']} * ln(1 + len({X.tokens_sql('text')}))
                 + {_QLR['w_stop']} * {X.stopword_ratio_sql('text')}
                 + {_QLR['w_punct']} * {X.punct_ratio_sql('text')}
                 + {_QLR['w_cpt']} * (length(text) * 1.0
                     / greatest(len({X.tokens_sql('text')}), 1)))))
               * 1e6) AS BIGINT) AS qu
      FROM documents
    ),
    s AS (
      SELECT source, count(*) AS n,
             sum(n_chars) AS sx, sum(qu) AS sy,
             sum(n_chars * qu) AS sxy,
             sum(n_chars * n_chars) AS sxx, sum(qu * qu) AS syy
      FROM f GROUP BY 1
    )
    SELECT source, CAST(n AS BIGINT) AS n_docs,
           round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / NULLIF(sqrt((CAST(n AS DOUBLE) * sxx
                                - CAST(sx AS DOUBLE) * sx)
                               * (CAST(n AS DOUBLE) * syy
                                  - CAST(sy AS DOUBLE) * sy)), 0), 6)
             AS pearson_r
    FROM s
    """,
)
def corr_chars_quality_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation between document length and the model
    quality score, per source — the standardized sibling of the trend
    family's OLS slope, and the audit that catches a DEGENERATE
    quality model (|r| near 1 against raw length means the 'model' is
    just a length filter — exactly the failure mode of naive quality
    classifiers). Five exact integer sufficient statistics per source
    (scores quantized to micro-units, lengths already integer), the
    closed form on their deterministic double casts, NULL on
    zero-variance slices. One map-side-combined aggregate over the
    fused scan projection — the scorer itself never leaves codegen."""
    d = _docs(spark, sf_dir)
    n_tok = X.token_count("text")
    z = (
        F.lit(_QLR["b0"])
        + _QLR["w_logtok"] * F.log(1 + n_tok)
        + _QLR["w_stop"] * X.stopword_ratio("text")
        + _QLR["w_punct"] * X.punct_ratio("text")
        + _QLR["w_cpt"] * (F.length("text") / F.greatest(n_tok, F.lit(1)))
    )
    qu = F.round((1.0 / (1.0 + F.exp(-z))) * F.lit(1e6)).cast("long")
    f = d.select("source", F.col("n_chars"), qu.alias("qu"))
    s = f.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_chars").alias("sx"),
        F.sum("qu").alias("sy"),
        F.sum(F.col("n_chars") * F.col("qu")).alias("sxy"),
        F.sum(F.col("n_chars") * F.col("n_chars")).alias("sxx"),
        F.sum(F.col("qu") * F.col("qu")).alias("syy"),
    )
    num = (
        F.col("n").cast("double") * F.col("sxy")
        - F.col("sx").cast("double") * F.col("sy")
    )
    den = F.sqrt(
        (
            F.col("n").cast("double") * F.col("sxx")
            - F.col("sx").cast("double") * F.col("sx")
        )
        * (
            F.col("n").cast("double") * F.col("syy")
            - F.col("sy").cast("double") * F.col("sy")
        )
    )
    return s.select(
        "source",
        F.col("n").cast("long").alias("n_docs"),
        F.round(F.try_divide(num, den), 6).alias("pearson_r"),
    )


# --- epoch shuffle manifest (sharded training-order permutation) -------------

_EPOCH_SEED = "epoch0"
_N_SHARDS = 8


@register(
    "epoch_shuffle_manifest",
    oracle=f"""
    WITH h AS (
      SELECT doc_id,
             {X.token_hash_sql("CAST(doc_id AS VARCHAR)", seed=_EPOCH_SEED + "-shard")} AS hs,
             {X.token_hash_sql("CAST(doc_id AS VARCHAR)", seed=_EPOCH_SEED + "-order")} AS ho
      FROM documents
    )
    SELECT doc_id,
           CAST(hs % {_N_SHARDS} AS BIGINT) AS shard,
           CAST(row_number() OVER (
                  PARTITION BY hs % {_N_SHARDS} ORDER BY ho, doc_id
                ) AS BIGINT) AS pos
    FROM h
    """,
)
def epoch_shuffle_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The training-epoch shuffle done the way 100 TB actually allows:
    a GLOBAL random permutation is a full-corpus sort (one total order
    = one reducer chain owns the tail), so instead each doc is hashed
    to a shard ({_N_SHARDS} here; thousands in production) and ordered
    WITHIN its shard by an independent seeded hash — readers consume
    shards in any interleave and the result is a reproducible
    pseudo-random epoch order. One shuffle on the shard key + a
    per-shard sort (exactly the cost of writing the shuffled epoch —
    each shard sorts corpus/{_N_SHARDS} rows in parallel, no global
    order ever materializes); a NEW EPOCH is just a new seed — zero
    data movement to re-plan. Both hashes are the engine-independent
    seeded md5 (functions/text.token_hash), so the oracle reproduces
    the full (doc_id, shard, pos) manifest byte-for-byte — and the
    manifest is what downstream loaders join on, so it gets the full
    value-hash gate."""
    d = _docs(spark, sf_dir)
    hs = X.token_hash(
        F.col("doc_id").cast("string"), seed=_EPOCH_SEED + "-shard"
    )
    ho = X.token_hash(
        F.col("doc_id").cast("string"), seed=_EPOCH_SEED + "-order"
    )
    h = d.select(
        "doc_id", (hs % _N_SHARDS).alias("shard"), ho.alias("ho")
    )
    w = Window.partitionBy("shard").orderBy(F.col("ho").asc(), F.col("doc_id").asc())
    return h.select(
        "doc_id",
        F.col("shard").cast("long").alias("shard"),
        F.row_number().over(w).cast("long").alias("pos"),
    )


# --- per-source token-budget sampling (mixture downsample in shuffle order) --

_MIX_SEED = "mix0"


@register(
    "training_mix_budget_sample",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source, len({X.tokens_sql('text')}) AS tok,
             {X.token_hash_sql("CAST(doc_id AS VARCHAR)", seed=_MIX_SEED + "-order")} AS ho
      FROM documents
    ),
    c AS (
      SELECT source, doc_id, tok,
             coalesce(sum(tok) OVER (
               PARTITION BY source ORDER BY ho, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_before,
             sum(tok) OVER (PARTITION BY source) AS total_toks
      FROM t
    ),
    a AS (
      SELECT source, total_toks // 2 AS budget, tok,
             CASE WHEN cum_before < total_toks // 2 THEN 1 ELSE 0 END
               AS admitted
      FROM c
    )
    SELECT source,
           CAST(max(budget) AS BIGINT) AS budget_tokens,
           CAST(sum(admitted) AS BIGINT) AS n_docs_admitted,
           CAST(sum(admitted * tok) AS BIGINT) AS n_tokens_admitted
    FROM a GROUP BY 1
    """,
)
def training_mix_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget mixture downsampling — the step between the release
    gate and the epoch manifest in a training-data build: each source
    gets a token budget (half its corpus here; production plugs in the
    target-mixture weights) and docs are admitted in the
    `epoch_shuffle_manifest`-style seeded-hash order until the RUNNING
    token total before a doc reaches the budget — deterministic,
    resumable (the admission set is a pure function of the seed), and
    the boundary doc may overshoot (the standard packing rule, so a
    budget is never starved by one long doc).

    Scale shape: ONE shuffle on source; the per-source cumulative sum,
    the per-source total (hence the budget), and the admission flag
    all come from windows over that one partitioning — no second
    shuffle, no driver-side totals; the per-source report is tiny. At
    100 TB per-source order is per-shard order within source exactly
    like the epoch manifest. Both engines draw the identical order
    from the seeded md5, so the report value-hashes."""
    d = _docs(spark, sf_dir)
    ho = X.token_hash(
        F.col("doc_id").cast("string"), seed=_MIX_SEED + "-order"
    )
    t = d.select(
        "doc_id",
        "source",
        F.size(X.tokens("text")).cast("long").alias("tok"),
        ho.alias("ho"),
    )
    w = Window.partitionBy("source").orderBy(
        F.col("ho").asc(), F.col("doc_id").asc()
    )
    c = t.select(
        "source",
        "tok",
        F.coalesce(
            F.sum("tok").over(w.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).alias("cum_before"),
        F.sum("tok").over(Window.partitionBy("source")).alias("total_toks"),
    )
    a = c.select(
        "source",
        "tok",
        F.expr("total_toks div 2").alias("budget"),
        F.when(
            F.col("cum_before") < F.expr("total_toks div 2"), 1
        ).otherwise(0).alias("admitted"),
    )
    return a.groupBy("source").agg(
        F.max("budget").cast("long").alias("budget_tokens"),
        F.sum("admitted").cast("long").alias("n_docs_admitted"),
        F.sum(F.col("admitted") * F.col("tok"))
        .cast("long")
        .alias("n_tokens_admitted"),
    )


# --- differentially-private count release ------------------------------------

_DP_EPS = 0.5
_DP_SEED = "dp-v1"
_DP_TRUNC = 20


def _dp_cdf() -> list[tuple[float, int]]:
    """Inverse-CDF table of the TRUNCATED two-sided geometric (discrete
    Laplace) mechanism, P(k) ∝ exp(-eps·|k|), k ∈ [-T, T] — the integer
    noise production DP systems add to counts (the US-Census-style
    discrete mechanism; truncation at T=±{T} clips a ~exp(-10) tail).
    Thresholds are computed ONCE here in Python and embedded via repr()
    into BOTH engines' expressions, so the noise draw is a pure
    (uniform-hash < constant) comparison chain — no ln/exp evaluated
    per-engine, hence bit-identical across Spark, DuckDB, and any
    partitioning.""".replace("{T}", str(_DP_TRUNC))
    import math

    p = math.exp(-_DP_EPS)
    weights = [(k, p ** abs(k)) for k in range(-_DP_TRUNC, _DP_TRUNC + 1)]
    total = sum(w for _, w in weights)
    acc = 0.0
    out = []
    for k, w in weights:
        acc += w / total
        out.append((min(acc, 1.0), k))
    out[-1] = (1.0, _DP_TRUNC)
    return out


def _dp_u_sql() -> str:
    return f"(CAST({X.token_hash_sql('source', seed=_DP_SEED)} AS DOUBLE) / {float(2**60)!r})"


def _dp_noise_sql() -> str:
    u = _dp_u_sql()
    branches = " ".join(
        f"WHEN {u} < {thr!r} THEN {k}" for thr, k in _dp_cdf()[:-1]
    )
    return f"CASE {branches} ELSE {_DP_TRUNC} END"


@register(
    "dp_noisy_counts_by_source",
    oracle=f"""
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_true,
           CAST({_dp_noise_sql()} AS BIGINT) AS noise,
           CAST(count(*) + {_dp_noise_sql()} AS BIGINT) AS n_noisy
    FROM documents
    GROUP BY source
    """,
)
def dp_noisy_counts_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private count release — the mechanism a
    training-data pipeline needs the day its per-source/per-cohort
    statistics leave the trust boundary (external data cards, partner
    reports): per-source counts plus TRUNCATED DISCRETE-LAPLACE integer
    noise, P(k) ∝ exp(-{_DP_EPS}·|k|). The draw is deterministic
    (seeded hash of the released key → uniform in [0,1) → inverse-CDF
    threshold chain) so release jobs are reproducible and re-runs
    can't burn extra privacy budget by re-sampling; the CDF thresholds
    are Python-precomputed constants embedded in both engines
    (repr round-trip), making the noise engine- and
    partitioning-exact — which is exactly what the value-hash oracle
    checks. n_true stays in the output here because the harness IS the
    trusted side; the released view is (source, n_noisy). Cost: the
    same one-pass map-side-combined count as any grouped aggregate —
    the mechanism is a projection on the aggregate, free at 100 TB."""
    d = _docs(spark, sf_dir)
    u = X.token_hash(F.col("source"), seed=_DP_SEED).cast("double") / F.lit(
        float(2**60)
    )
    noise = F.lit(_DP_TRUNC)
    for thr, k in reversed(_dp_cdf()[:-1]):
        noise = F.when(u < F.lit(thr), F.lit(k)).otherwise(noise)
    return d.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_true"),
        noise.cast("long").alias("noise"),
        (F.count(F.lit(1)) + noise).cast("long").alias("n_noisy"),
    )


# --- k-anonymity audit (privacy release gate) --------------------------------

_KANON_K = 5                      # privacy threshold: classes below are unsafe
_KANON_WIDTHS = (500, 2000)       # acctbal generalization ladder (fine→coarse)


def _kanon_level_sql(width: int) -> str:
    return f"""
      SELECT CAST({width} AS BIGINT) AS band_width,
             CAST(count(*) AS BIGINT) AS n_classes,
             CAST(min(k) AS BIGINT) AS k_min,
             CAST(sum(CASE WHEN k < {_KANON_K} THEN 1 ELSE 0 END) AS BIGINT)
               AS classes_below_k,
             CAST(sum(CASE WHEN k < {_KANON_K} THEN k ELSE 0 END) AS BIGINT)
               AS rows_suppressed,
             round(sum(CASE WHEN k < {_KANON_K} THEN k ELSE 0 END) * 1e0
                   / sum(k), 6) AS suppression_rate
      FROM (
        SELECT count(*) AS k FROM customer
        GROUP BY c_nationkey, c_mktsegment, floor(c_acctbal / {width}e0)
      )"""


@register(
    "k_anonymity_audit",
    oracle=f"""
    {_kanon_level_sql(_KANON_WIDTHS[0])}
    UNION ALL
    {_kanon_level_sql(_KANON_WIDTHS[1])}
    """,
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity release audit over the quasi-identifier
    (nation, market segment, account-balance band), reported at two
    rungs of the generalization ladder (band width {_KANON_WIDTHS[0]}
    vs {_KANON_WIDTHS[1]}): per rung, the equivalence-class count, the
    smallest class (k_min — the re-identification risk headline), and
    how many classes/rows a suppress-below-k={_KANON_K} policy would
    drop. The privacy twin of `dp_noisy_counts_by_source`: DP protects
    aggregate releases, k-anonymity audits row-level releases, and a
    training-data pipeline shipping user-derived text needs both
    gates.

    Scale shape: each rung is one map-side-combinable groupBy on the
    QI key followed by a single-row summary aggregate — two corpus
    passes total (one per rung), no joins, no windows; the union of
    two 1-row frames is free."""
    cust = load_table(spark, sf_dir, "customer")

    def _level(width: int) -> DataFrame:
        cls = cust.groupBy(
            "c_nationkey",
            "c_mktsegment",
            F.floor(F.col("c_acctbal") / F.lit(float(width))).alias("band"),
        ).agg(F.count(F.lit(1)).alias("k"))
        below = F.col("k") < _KANON_K
        return cls.agg(
            F.lit(width).cast("long").alias("band_width"),
            F.count(F.lit(1)).cast("long").alias("n_classes"),
            F.min("k").cast("long").alias("k_min"),
            F.sum(F.when(below, 1).otherwise(0))
            .cast("long")
            .alias("classes_below_k"),
            F.sum(F.when(below, F.col("k")).otherwise(0))
            .cast("long")
            .alias("rows_suppressed"),
            F.round(
                F.sum(F.when(below, F.col("k")).otherwise(0))
                * F.lit(1.0)
                / F.sum("k"),
                6,
            ).alias("suppression_rate"),
        )

    return _level(_KANON_WIDTHS[0]).unionAll(_level(_KANON_WIDTHS[1]))


# --- l-diversity audit (sensitive-attribute companion of k-anonymity) --------

_LDIV_L = 3                       # diversity threshold: classes below leak


def _ldiv_level_sql(width: int) -> str:
    return f"""
      SELECT CAST({width} AS BIGINT) AS band_width,
             CAST(count(*) AS BIGINT) AS n_classes,
             CAST(min(l) AS BIGINT) AS l_min,
             CAST(sum(CASE WHEN l < {_LDIV_L} THEN 1 ELSE 0 END) AS BIGINT)
               AS classes_below_l,
             CAST(sum(CASE WHEN l < {_LDIV_L} THEN k ELSE 0 END) AS BIGINT)
               AS rows_exposed,
             round(sum(CASE WHEN l < {_LDIV_L} THEN k ELSE 0 END) * 1e0
                   / sum(k), 6) AS exposure_rate
      FROM (
        SELECT count(*) AS k, count(DISTINCT c_mktsegment) AS l
        FROM customer
        GROUP BY c_nationkey, floor(c_acctbal / {width}e0)
      )"""


@register(
    "l_diversity_audit",
    oracle=f"""
    {_ldiv_level_sql(_KANON_WIDTHS[0])}
    UNION ALL
    {_ldiv_level_sql(_KANON_WIDTHS[1])}
    """,
)
def l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-l-diversity audit — the attribute-disclosure companion
    of `k_anonymity_audit`: k-anonymity bounds RE-IDENTIFICATION, but a
    class where every member shares one sensitive value leaks that
    value without any re-identification at all (the homogeneity
    attack). Quasi-identifier here is (nation, acctbal band) and the
    SENSITIVE attribute is the market segment; per generalization rung
    ({_KANON_WIDTHS[0]} vs {_KANON_WIDTHS[1]}): class count, the least
    diverse class (l_min), and how many classes/rows fall below
    l={_LDIV_L} distinct sensitive values. Completes the release-gate
    trio: DP for aggregates, k-anonymity for identity, l-diversity for
    attributes.

    Scale shape: per rung one map-side-combinable groupBy on the QI key
    (count + exact distinct of a LOW-cardinality sensitive column —
    partial aggregation keeps at most |segments| values per partition
    per class) then a single-row summary. No joins, no windows."""
    cust = load_table(spark, sf_dir, "customer")

    def _level(width: int) -> DataFrame:
        cls = cust.groupBy(
            "c_nationkey",
            F.floor(F.col("c_acctbal") / F.lit(float(width))).alias("band"),
        ).agg(
            F.count(F.lit(1)).alias("k"),
            F.countDistinct("c_mktsegment").alias("l"),
        )
        below = F.col("l") < _LDIV_L
        return cls.agg(
            F.lit(width).cast("long").alias("band_width"),
            F.count(F.lit(1)).cast("long").alias("n_classes"),
            F.min("l").cast("long").alias("l_min"),
            F.sum(F.when(below, 1).otherwise(0))
            .cast("long")
            .alias("classes_below_l"),
            F.sum(F.when(below, F.col("k")).otherwise(0))
            .cast("long")
            .alias("rows_exposed"),
            F.round(
                F.sum(F.when(below, F.col("k")).otherwise(0))
                * F.lit(1.0)
                / F.sum("k"),
                6,
            ).alias("exposure_rate"),
        )

    return _level(_KANON_WIDTHS[0]).unionAll(_level(_KANON_WIDTHS[1]))


# --- Pareto frontier: quality vs length (skyline operator) --------------------
# Quality scores quantized to 4dp: the frontier computation then runs on
# a <= 10^4-row per-score summary regardless of corpus size.

_PARETO_Z = (
    f"{_QLR['b0']} + {_QLR['w_logtok']} * ln(1 + len({X.tokens_sql('text')}))"
    f" + {_QLR['w_stop']} * {X.stopword_ratio_sql('text')}"
    f" + {_QLR['w_punct']} * {X.punct_ratio_sql('text')}"
    f" + {_QLR['w_cpt']} * (length(text) * 1e0"
    f"   / greatest(len({X.tokens_sql('text')}), 1))"
)


@register(
    "pareto_front_quality_length",
    oracle=f"""
    WITH f AS (
      SELECT doc_id,
             round(1e0 / (1e0 + exp(-({_PARETO_Z}))), 4) AS q,
             n_chars AS len
      FROM documents
    ),
    g AS (SELECT q, max(len) AS m FROM f GROUP BY 1),
    w AS (
      SELECT q, m,
             max(m) OVER (ORDER BY q DESC
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING) AS r
      FROM g
    )
    SELECT f.doc_id, f.q AS quality_prob, CAST(f.len AS BIGINT) AS n_chars
    FROM f JOIN w ON f.q = w.q AND f.len = w.m
    WHERE w.r IS NULL OR w.m > w.r
    """,
)
def pareto_front_quality_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto frontier) of the corpus on (quality score,
    length): the documents no other document beats on BOTH axes — the
    shortlist a budgeted curation pass actually chooses from, and the
    engine's skyline operator exhibit. A doc is dominated iff some doc
    has >= on both axes and > on one; ties on both axes dominate
    neither, so exact duplicates of a frontier point all surface.

    Scale shape: scores are quantized to 4dp, so after one
    map-side-combined groupBy(score).max(length) the frontier logic
    (one running-max window + an anti-domination filter) runs on a
    <= 10^4-row frame regardless of corpus size; the join back to
    recover doc ids broadcasts that frame. The corpus is scanned twice
    and shuffled never (the score groupBy's 4-byte keys combine to the
    grid size map-side)."""
    d = _docs(spark, sf_dir)
    n_tok = X.token_count("text")
    z = (
        F.lit(_QLR["b0"])
        + _QLR["w_logtok"] * F.log(1 + n_tok)
        + _QLR["w_stop"] * X.stopword_ratio("text")
        + _QLR["w_punct"] * X.punct_ratio("text")
        + _QLR["w_cpt"] * (F.length("text") / F.greatest(n_tok, F.lit(1)))
    )
    f = d.select(
        "doc_id",
        F.round(1.0 / (1.0 + F.exp(-z)), 4).alias("q"),
        F.col("n_chars").alias("len"),
    )
    g = f.groupBy("q").agg(F.max("len").alias("m"))
    w = Window.orderBy(F.desc("q")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    front = (
        g.select("q", "m", F.max("m").over(w).alias("r"))
        .filter(F.col("r").isNull() | (F.col("m") > F.col("r")))
        .select(F.col("q").alias("fq"), F.col("m").alias("fm"))
    )
    return f.join(
        F.broadcast(front),
        (F.col("q") == F.col("fq")) & (F.col("len") == F.col("fm")),
    ).select(
        "doc_id",
        F.col("q").alias("quality_prob"),
        F.col("len").cast("long").alias("n_chars"),
    )


# --- AUC of the quality score against embedding labels ------------------------

_AUC_POS_MIN = 5  # positive class: embedding label >= 5


@register(
    "quality_score_auc",
    oracle=f"""
    WITH f AS (
      SELECT d.doc_id,
             round(1e0 / (1e0 + exp(-({_PARETO_Z}))), 4) AS s,
             CASE WHEN e.label >= {_AUC_POS_MIN} THEN 1 ELSE 0 END AS pos
      FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
    ),
    g AS (
      SELECT s, count(*) AS cnt, sum(pos) AS pc FROM f GROUP BY 1
    ),
    w AS (
      SELECT s, cnt, pc,
             coalesce(sum(cnt) OVER (ORDER BY s
                      ROWS BETWEEN UNBOUNDED PRECEDING
                      AND 1 PRECEDING), 0) AS cum
      FROM g
    ),
    t AS (
      SELECT sum(pc * (2 * cum + cnt + 1)) AS spr2,
             sum(pc) AS p, sum(cnt) - sum(pc) AS n
      FROM w
    )
    SELECT CAST(p AS BIGINT) AS n_pos, CAST(n AS BIGINT) AS n_neg,
           round((CAST(spr2 AS DOUBLE) - CAST(p AS DOUBLE) * (p + 1))
                 / (2e0 * p * n), 6) AS auc
    FROM t
    """,
)
def quality_score_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC AUC of the logistic quality score against a binary label
    (embedding label >= {_AUC_POS_MIN}) via the Mann-Whitney rank-sum
    identity AUC = (R_pos - P(P+1)/2) / (P*N) with midranks for ties —
    the standard classifier-eval operator, and exactly how AUC is
    computed at scale (no curve materialized). Kept fully exact: scores
    quantize to a 4dp grid, per-score counts are integers, midranks are
    carried DOUBLED (2*cum + cnt + 1) so the rank sum stays integer
    until one final division.

    Scale shape: one fact join, one map-side-combined groupBy on the
    bounded score grid, one running-sum window over the <= 10^4-row
    grid frame, one single-row reduce. Nothing after the first
    aggregate scales with the corpus."""
    d = _docs(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id"),
        F.when(F.col("label") >= _AUC_POS_MIN, 1).otherwise(0).alias("pos"),
    )
    n_tok = X.token_count("text")
    z = (
        F.lit(_QLR["b0"])
        + _QLR["w_logtok"] * F.log(1 + n_tok)
        + _QLR["w_stop"] * X.stopword_ratio("text")
        + _QLR["w_punct"] * X.punct_ratio("text")
        + _QLR["w_cpt"] * (F.length("text") / F.greatest(n_tok, F.lit(1)))
    )
    f = d.select(
        F.round(1.0 / (1.0 + F.exp(-z)), 4).alias("s"), F.col("doc_id")
    ).join(emb, F.col("vec_id") == F.col("doc_id"))
    g = f.groupBy("s").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("pos").alias("pc")
    )
    w = Window.orderBy(F.asc("s")).rowsBetween(Window.unboundedPreceding, -1)
    wf = g.select(
        "s", "cnt", "pc",
        F.coalesce(F.sum("cnt").over(w), F.lit(0)).alias("cum"),
    )
    t = wf.agg(
        F.sum(F.col("pc") * (2 * F.col("cum") + F.col("cnt") + 1)).alias(
            "spr2"
        ),
        F.sum("pc").alias("p"),
        (F.sum("cnt") - F.sum("pc")).alias("n"),
    )
    return t.select(
        F.col("p").cast("long").alias("n_pos"),
        F.col("n").cast("long").alias("n_neg"),
        F.round(
            (F.col("spr2").cast("double")
             - F.col("p").cast("double") * (F.col("p") + 1))
            / (F.lit(2.0) * F.col("p") * F.col("n")),
            6,
        ).alias("auc"),
    )


# --- token-budget selection curve over quality rank ----------------------------


@register(
    "quality_token_budget_curve",
    oracle=f"""
    WITH f AS (
      SELECT round(1e0 / (1e0 + exp(-({_PARETO_Z}))), 4) AS q,
             len({X.tokens_sql('text')}) AS toks
      FROM documents
    ),
    g AS (SELECT q, count(*) AS docs, sum(toks) AS tk FROM f GROUP BY 1),
    c AS (
      SELECT q,
             sum(docs) OVER (ORDER BY q DESC) AS cum_docs,
             sum(tk) OVER (ORDER BY q DESC) AS cum_toks
      FROM g
    ),
    t AS (SELECT sum(docs) AS n, sum(tk) AS tt FROM g),
    b AS (
      SELECT d.d AS decile, min(c.cum_docs) AS cd
      FROM (SELECT unnest(range(1, 11)) AS d) d
      CROSS JOIN t
      JOIN c ON c.cum_docs >= (d.d * t.n + 9) // 10
      GROUP BY 1
    )
    SELECT CAST(b.decile AS BIGINT) AS decile,
           CAST(b.cd AS BIGINT) AS cum_docs,
           CAST(c.cum_toks AS BIGINT) AS cum_tokens,
           c.q AS min_quality,
           round(c.cum_toks * 1e0 / t.tt, 6) AS token_share
    FROM b JOIN c ON c.cum_docs = b.cd CROSS JOIN t
    """,
)
def quality_token_budget_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The quality-vs-token-budget selection curve: walk the corpus
    from the highest-quality document down and report, at each decile
    of documents admitted, the cumulative token count and share plus
    the quality score at the boundary — the curve a curation pass
    reads to convert "we can afford N tokens" into a quality
    threshold. Cumulation runs on the 4dp score GRID (counts and token
    sums per distinct score), so the running sums are integer-exact
    and the windowed frame is bounded by the grid, not the corpus;
    decile boundaries use integer ceil arithmetic.

    Scale shape: one map-side-combined groupBy on the score grid, one
    running-sum window over the <= 10^4-row grid, a 10-row decile
    cross join. The corpus is scanned once."""
    d = _docs(spark, sf_dir)
    n_tok = X.token_count("text")
    z = (
        F.lit(_QLR["b0"])
        + _QLR["w_logtok"] * F.log(1 + n_tok)
        + _QLR["w_stop"] * X.stopword_ratio("text")
        + _QLR["w_punct"] * X.punct_ratio("text")
        + _QLR["w_cpt"] * (F.length("text") / F.greatest(n_tok, F.lit(1)))
    )
    f = d.select(
        F.round(1.0 / (1.0 + F.exp(-z)), 4).alias("q"),
        F.size(X.tokens("text")).alias("toks"),
    )
    g = f.groupBy("q").agg(
        F.count(F.lit(1)).alias("docs"), F.sum("toks").alias("tk")
    )
    w = Window.orderBy(F.desc("q")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = g.select(
        "q",
        F.sum("docs").over(w).alias("cum_docs"),
        F.sum("tk").over(w).alias("cum_toks"),
    )
    t = g.agg(F.sum("docs").alias("n"), F.sum("tk").alias("tt"))
    deciles = spark.range(1, 11).select(F.col("id").alias("decile"))
    b = (
        deciles.crossJoin(F.broadcast(t))
        .join(
            c,
            F.col("cum_docs")
            >= F.expr("(decile * n + 9) div 10"),
        )
        .groupBy("decile")
        .agg(F.min("cum_docs").alias("cd"))
    )
    return (
        b.join(c, F.col("cum_docs") == F.col("cd"))
        .crossJoin(F.broadcast(t))
        .select(
            F.col("decile").cast("long").alias("decile"),
            F.col("cd").cast("long").alias("cum_docs"),
            F.col("cum_toks").cast("long").alias("cum_tokens"),
            F.col("q").alias("min_quality"),
            F.round(F.col("cum_toks") * F.lit(1.0) / F.col("tt"), 6).alias(
                "token_share"
            ),
        )
    )


# --- split composition audit (stratification sanity) ---------------------------


@register(
    "split_balance_audit",
    oracle=f"""
    WITH f AS (
      SELECT CASE WHEN {_bucket_sql('doc_id')} < {SPLIT_TRAIN} THEN 'train'
                  WHEN {_bucket_sql('doc_id')} < {SPLIT_VAL} THEN 'val'
                  ELSE 'test' END AS split,
             source,
             CAST(round(1e6 / (1e0 + exp(-({_PARETO_Z})))) AS BIGINT) AS qu
      FROM documents
    ),
    t AS (SELECT count(*) AS n FROM f),
    sc AS (
      SELECT split, source, count(*) AS ns FROM f GROUP BY 1, 2
    ),
    m AS (SELECT split, max(ns) AS mx FROM sc GROUP BY 1)
    SELECT f.split,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(count(*) * 1e0 / t.n, 6) AS doc_share,
           round(sum(qu) * 1e0 / count(*) / 1e6, 6) AS mean_quality,
           CAST(count(DISTINCT f.source) AS BIGINT) AS n_sources,
           round(m.mx * 1e0 / count(*), 6) AS top_source_share
    FROM f CROSS JOIN t JOIN m ON m.split = f.split
    GROUP BY f.split, t.n, m.mx
    """,
)
def split_balance_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composition audit of the train/val/test splits: per split the
    document share (should track the 80/10/10 design), the mean
    quality score, the source count, and the largest source's share —
    the stratification sanity check run before trusting an eval split
    (a val set whose quality or source mix drifts from train measures
    the drift, not the model). Uses the SAME id-hash split rule as
    `split_train_val_test`, so it audits the split actually shipped;
    quality re-quantizes to micro-unit integers before the per-split
    mean.

    Scale shape: one projection pass, one map-side-combined
    (split, source) aggregate and a 3-row summary — free at 100 TB."""
    d = _docs(spark, sf_dir)
    b = _bucket("doc_id")
    n_tok = X.token_count("text")
    z = (
        F.lit(_QLR["b0"])
        + _QLR["w_logtok"] * F.log(1 + n_tok)
        + _QLR["w_stop"] * X.stopword_ratio("text")
        + _QLR["w_punct"] * X.punct_ratio("text")
        + _QLR["w_cpt"] * (F.length("text") / F.greatest(n_tok, F.lit(1)))
    )
    f = d.select(
        F.when(b < SPLIT_TRAIN, "train")
        .when(b < SPLIT_VAL, "val")
        .otherwise("test")
        .alias("split"),
        "source",
        F.round(F.lit(1e6) / (F.lit(1.0) + F.exp(-z)))
        .cast("long")
        .alias("qu"),
    )
    t = f.agg(F.count(F.lit(1)).alias("n"))
    sc = f.groupBy("split", "source").agg(F.count(F.lit(1)).alias("ns"))
    m = sc.groupBy("split").agg(F.max("ns").alias("mx"))
    g = f.groupBy("split").agg(
        F.count(F.lit(1)).alias("nd"),
        F.sum("qu").alias("sq"),
        F.countDistinct("source").alias("n_sources"),
    )
    return (
        g.join(F.broadcast(m), "split")
        .crossJoin(F.broadcast(t))
        .select(
            "split",
            F.col("nd").cast("long").alias("n_docs"),
            F.round(F.col("nd") * F.lit(1.0) / F.col("n"), 6).alias(
                "doc_share"
            ),
            F.round(
                F.col("sq") * F.lit(1.0) / F.col("nd") / F.lit(1e6), 6
            ).alias("mean_quality"),
            F.col("n_sources").cast("long").alias("n_sources"),
            F.round(F.col("mx") * F.lit(1.0) / F.col("nd"), 6).alias(
                "top_source_share"
            ),
        )
    )


# --- group-aware split: all of a user's events share one split ------------------

_GSPLIT_SEED = "usplit-v1"


@register(
    "split_by_user_audit",
    oracle=f"""
    WITH e AS (
      SELECT user_id, event_id,
             CASE WHEN {X.token_hash_sql('CAST(user_id AS VARCHAR)', seed=_GSPLIT_SEED)} % 100
                    < {SPLIT_TRAIN} THEN 'train'
                  WHEN {X.token_hash_sql('CAST(user_id AS VARCHAR)', seed=_GSPLIT_SEED)} % 100
                    < {SPLIT_VAL} THEN 'val'
                  ELSE 'test' END AS split
      FROM events
    ),
    u AS (
      SELECT user_id, count(DISTINCT split) AS nsp, any_value(split) AS split,
             count(*) AS ne
      FROM e GROUP BY 1
    ),
    t AS (SELECT count(*) AS n FROM e)
    SELECT u.split,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(u.ne) AS BIGINT) AS n_events,
           round(sum(u.ne) * 1e0 / t.n, 6) AS event_share,
           CAST(max(u.nsp) AS BIGINT) AS max_splits_per_user
    FROM u CROSS JOIN t
    GROUP BY u.split, t.n
    """,
)
def split_by_user_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP-AWARE train/val/test split over events: the split key is
    the USER's id hash, not the row's, so every event of a user lands
    in exactly one split — the GroupKFold discipline that prevents the
    quietest leakage there is (the same user's behavior in both train
    and eval). The audit reports per-split user/event counts and
    shares AND verifies the grouping property in-band:
    max_splits_per_user must be 1 (computed from the data, not assumed
    from the rule). Note event shares may drift from 80/10/10 because
    heavy users move whole — that visible drift is the honest cost of
    group integrity, and the reason row-level shares should never be
    the acceptance test for a grouped split.

    Scale shape: a projection (hash when-chain), one map-side-combined
    per-user aggregate (the only shuffle, on the natural user key),
    then a 3-row summary."""
    ev = load_table(spark, sf_dir, "events")
    b = X.token_hash(F.col("user_id").cast("string"), seed=_GSPLIT_SEED) % 100
    e = ev.select(
        "user_id",
        F.when(b < SPLIT_TRAIN, "train")
        .when(b < SPLIT_VAL, "val")
        .otherwise("test")
        .alias("split"),
    )
    u = e.groupBy("user_id").agg(
        F.countDistinct("split").alias("nsp"),
        F.any_value("split").alias("split"),
        F.count(F.lit(1)).alias("ne"),
    )
    t = e.agg(F.count(F.lit(1)).alias("n"))
    return (
        u.groupBy("split")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.sum("ne").cast("long").alias("n_events"),
            F.max("nsp").cast("long").alias("max_splits_per_user"),
        )
        .crossJoin(F.broadcast(t))
        .select(
            "split",
            "n_users",
            "n_events",
            F.round(F.col("n_events") * F.lit(1.0) / F.col("n"), 6).alias(
                "event_share"
            ),
            "max_splits_per_user",
        )
    )


# --- temporal split audit (backtesting discipline) -------------------------------

_TSPLIT_CUT = "2024-01-24"  # train strictly before; eval on/after


@register(
    "split_temporal_audit",
    oracle=f"""
    WITH e AS (
      SELECT user_id, event_id,
             CASE WHEN CAST(ts AS DATE) < DATE '{_TSPLIT_CUT}'
                  THEN 'train' ELSE 'eval' END AS split
      FROM events
    ),
    s AS (
      SELECT split, count(*) AS ne, count(DISTINCT user_id) AS nu
      FROM e GROUP BY 1
    ),
    o AS (
      SELECT count(*) AS n_overlap FROM (
        SELECT user_id FROM e GROUP BY 1
        HAVING count(DISTINCT split) = 2)
    ),
    t AS (SELECT count(*) AS n FROM e)
    SELECT s.split, CAST(s.ne AS BIGINT) AS n_events,
           round(s.ne * 1e0 / t.n, 6) AS event_share,
           CAST(s.nu AS BIGINT) AS n_users,
           CAST(o.n_overlap AS BIGINT) AS users_in_both,
           round(o.n_overlap * 1e0 / s.nu, 6) AS overlap_vs_split_users
    FROM s CROSS JOIN o CROSS JOIN t
    """,
)
def split_temporal_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal train/eval split audit — the backtesting discipline:
    train strictly BEFORE {_TSPLIT_CUT}, evaluate on what comes after
    (the only split that measures forecasting rather than
    interpolation). Reports per-side event/user counts and — the
    number this split is judged by — how many users appear on BOTH
    sides of the boundary: expected and fine for behavior models,
    disqualifying for anything claiming user-level generalization
    (then you compose this with `split_by_user_audit`'s group rule).
    Three split disciplines now ship side by side: row-hash
    (split_train_val_test), group-hash (split_by_user_audit), and
    temporal.

    Scale shape: a date-comparison projection, one map-side-combined
    per-split aggregate, one per-user two-split check on the user key
    shuffle, 2-row output."""
    from dataengineeringproject_spark.functions.datetime_fns import ts_to_date

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.when(
            ts_to_date("ts") < F.lit(_TSPLIT_CUT).cast("date"), "train"
        )
        .otherwise("eval")
        .alias("split"),
    )
    s = ev.groupBy("split").agg(
        F.count(F.lit(1)).alias("ne"), F.countDistinct("user_id").alias("nu")
    )
    o = (
        ev.groupBy("user_id")
        .agg(F.countDistinct("split").alias("nsp"))
        .filter(F.col("nsp") == 2)
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    t = ev.agg(F.count(F.lit(1)).alias("n"))
    return (
        s.crossJoin(F.broadcast(o))
        .crossJoin(F.broadcast(t))
        .select(
            "split",
            F.col("ne").cast("long").alias("n_events"),
            F.round(F.col("ne") * F.lit(1.0) / F.col("n"), 6).alias(
                "event_share"
            ),
            F.col("nu").cast("long").alias("n_users"),
            F.col("n_overlap").cast("long").alias("users_in_both"),
            F.round(
                F.col("n_overlap") * F.lit(1.0) / F.col("nu"), 6
            ).alias("overlap_vs_split_users"),
        )
    )


# --- end-to-end training-data build ----------------------------------------------


@register(
    "training_data_build_e2e",
    oracle=f"""
    WITH q AS (
      SELECT doc_id, source, len({X.tokens_sql('text')}) AS n_tokens,
             {X.md5_fingerprint_sql('text')} AS fp
      FROM documents
      WHERE 1e0 / (1e0 + exp(-({_PARETO_Z}))) >= 0.5e0
    ),
    keep AS (SELECT fp, min(doc_id) AS rep FROM q GROUP BY 1),
    surv AS (
      SELECT q.doc_id, q.source, q.n_tokens,
             CASE WHEN {_bucket_sql('q.doc_id')} < {SPLIT_TRAIN} THEN 'train'
                  WHEN {_bucket_sql('q.doc_id')} < {SPLIT_VAL} THEN 'val'
                  ELSE 'test' END AS split
      FROM q JOIN keep ON keep.fp = q.fp AND keep.rep = q.doc_id
    )
    SELECT doc_id, source, split, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(CASE WHEN split = 'train'
                THEN {X.token_hash_sql("CAST(doc_id AS VARCHAR)", seed=_EPOCH_SEED + "-shard")} % {_N_SHARDS}
                END AS BIGINT) AS shard,
           CAST(CASE WHEN split = 'train' THEN
             row_number() OVER (
               PARTITION BY (CASE WHEN split = 'train'
                 THEN {X.token_hash_sql("CAST(doc_id AS VARCHAR)", seed=_EPOCH_SEED + "-shard")} % {_N_SHARDS}
                 ELSE -1 END)
               ORDER BY {X.token_hash_sql("CAST(doc_id AS VARCHAR)", seed=_EPOCH_SEED + "-order")}, doc_id)
             END AS BIGINT) AS pos
    FROM surv
    """,
)
def training_data_build_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The training-data build END TO END in one lazy plan — the
    composition that is this engine's reason to exist: quality gate
    (logistic score >= 0.5) -> exact dedup (md5 fingerprint, min-id
    representative survives) -> reproducible train/val/test split
    (id-hash buckets) -> epoch-0 shard + position for the train shard
    (the seeded two-hash shuffle of `epoch_shuffle_manifest`). The
    output IS the manifest a training loader consumes: one row per
    surviving document with its split, shard, and in-shard position
    (NULL outside train). Every stage reuses the exact constants and
    hash rules of its standalone query, so this composition can never
    drift from the audited parts.

    Scale shape: the quality gate fuses into the scan; dedup is one
    fingerprint-keyed aggregate + join; split is a projection; the
    epoch shuffle is one shard-key shuffle with per-shard sorts. No
    stage sees more than the surviving corpus, and nothing global
    ever sorts."""
    d = _docs(spark, sf_dir)
    n_tok = X.token_count("text")
    z = (
        F.lit(_QLR["b0"])
        + _QLR["w_logtok"] * F.log(1 + n_tok)
        + _QLR["w_stop"] * X.stopword_ratio("text")
        + _QLR["w_punct"] * X.punct_ratio("text")
        + _QLR["w_cpt"] * (F.length("text") / F.greatest(n_tok, F.lit(1)))
    )
    q = d.filter(1.0 / (1.0 + F.exp(-z)) >= 0.5).select(
        "doc_id",
        "source",
        F.size(X.tokens("text")).alias("n_tokens"),
        X.md5_fingerprint("text").alias("fp"),
    )
    keep = q.groupBy("fp").agg(F.min("doc_id").alias("rep")).select(
        F.col("fp").alias("kfp"), "rep"
    )
    b = _bucket("doc_id")
    surv = q.join(
        keep,
        (F.col("fp") == F.col("kfp")) & (F.col("doc_id") == F.col("rep")),
    ).select(
        "doc_id",
        "source",
        "n_tokens",
        F.when(b < SPLIT_TRAIN, "train")
        .when(b < SPLIT_VAL, "val")
        .otherwise("test")
        .alias("split"),
    )
    hs = X.token_hash(
        F.col("doc_id").cast("string"), seed=_EPOCH_SEED + "-shard"
    )
    ho = X.token_hash(
        F.col("doc_id").cast("string"), seed=_EPOCH_SEED + "-order"
    )
    m = surv.select(
        "doc_id",
        "source",
        "split",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.when(F.col("split") == "train", hs % _N_SHARDS).alias("shard"),
        F.when(F.col("split") == "train", ho).otherwise(F.lit(-1)).alias(
            "ho"
        ),
    )
    w = Window.partitionBy(
        F.coalesce(F.col("shard"), F.lit(-1))
    ).orderBy(F.asc("ho"), F.asc("doc_id"))
    return m.select(
        "doc_id",
        "source",
        "split",
        "n_tokens",
        F.col("shard").cast("long").alias("shard"),
        F.when(
            F.col("split") == "train", F.row_number().over(w)
        )
        .cast("long")
        .alias("pos"),
    )


# --- threshold metrics: logistic scorer vs Gopher label --------------------------

_QCM_CTES = f"""
    WITH f AS (
      SELECT doc_id,
             len({X.tokens_sql('text')}) AS n_tokens,
             {X.stopword_ratio_sql('text')} AS stop_r,
             {X.punct_ratio_sql('text')} AS punct_r,
             length(text) AS n_chars
      FROM documents
    ),
    z AS (
      SELECT doc_id,
             (1.0 / (1.0 + exp(-({_QLR['b0']}
               + {_QLR['w_logtok']} * ln(1 + n_tokens)
               + {_QLR['w_stop']} * stop_r
               + {_QLR['w_punct']} * punct_r
               + {_QLR['w_cpt']} * (n_chars * 1.0 / greatest(n_tokens, 1))))
             )) >= 0.5 AS pred
      FROM f
    ),
    b AS (SELECT doc_id, {_GQ_TOKS} AS toks FROM documents),
    m AS (
      SELECT doc_id, len(toks) AS n,
             list_sum(list_transform(toks, t -> length(t))) AS chars,
             len(list_distinct(toks)) AS nd
      FROM b
    ),
    g AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, len(toks) - 1),
                                   i -> concat_ws(' ', toks[i], toks[i + 1])))
               AS gram
      FROM b WHERE len(toks) >= 2
    ),
    c AS (SELECT doc_id, gram, count(*) AS cnt FROM g GROUP BY 1, 2),
    t2 AS (SELECT doc_id, max(cnt) AS top_cnt FROM c GROUP BY 1),
    lbl AS (
      SELECT m.doc_id,
             (n BETWEEN {_GQ_MIN_TOK} AND {_GQ_MAX_TOK}
              AND ROUND(chars * 1.0 / n, 6)
                  BETWEEN {_GQ_MIN_MWL} AND {_GQ_MAX_MWL}
              AND ROUND(nd * 1.0 / n, 6) > {_GQ_MIN_UNIQ}
              AND ROUND(COALESCE(top_cnt, 1) * 1.0 / greatest(n - 1, 1), 6)
                  < {_GQ_MAX_TOP2}) AS pos
      FROM m LEFT JOIN t2 ON m.doc_id = t2.doc_id
    )"""


@register(
    "quality_confusion_matrix",
    oracle=f"""
    {_QCM_CTES},
    cm AS (
      SELECT sum(CASE WHEN pred AND pos THEN 1 ELSE 0 END) AS tp,
             sum(CASE WHEN pred AND NOT pos THEN 1 ELSE 0 END) AS fp,
             sum(CASE WHEN NOT pred AND pos THEN 1 ELSE 0 END) AS fn,
             sum(CASE WHEN NOT pred AND NOT pos THEN 1 ELSE 0 END) AS tn
      FROM z JOIN lbl USING (doc_id)
    )
    SELECT CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
           CAST(fn AS BIGINT) AS fn, CAST(tn AS BIGINT) AS tn,
           round(tp * 1e0 / NULLIF(tp + fp, 0), 6) AS "precision",
           round(tp * 1e0 / NULLIF(tp + fn, 0), 6) AS "recall",
           round(2e0 * tp / NULLIF(2 * tp + fp + fn, 0), 6) AS "f1",
           round((tp * 1e0 * tn - fp * 1e0 * fn)
                 / NULLIF(sqrt((tp + fp) * 1e0 * (tp + fn))
                          * sqrt((tn + fp) * 1e0 * (tn + fn)), 0), 6)
             AS "mcc",
           round(((tp + tn) * 1e0 * (tp + fp + fn + tn)
                  - ((tp + fp) * 1e0 * (tp + fn)
                     + (tn + fp) * 1e0 * (tn + fn)))
                 / NULLIF((tp + fp + fn + tn) * 1e0 * (tp + fp + fn + tn)
                          - ((tp + fp) * 1e0 * (tp + fn)
                             + (tn + fp) * 1e0 * (tn + fn)), 0), 6)
             AS cohen_kappa
    FROM cm
    """,
)
def quality_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold-level agreement between the two INDEPENDENT quality
    signals — the logistic scorer's keep decision (prob >= 0.5) vs the
    Gopher rule label: the full confusion matrix with precision /
    recall / F1 / Matthews correlation / Cohen's kappa. Completes the
    classifier-eval suite (AUC for ranking, calibration bins for
    probabilities, decile lift for screening yield, and now the
    threshold metrics a deployed keep/drop filter is actually judged
    by — kappa correcting for chance agreement between two raters).
    All cells are exact integers; every metric is closed-form
    arithmetic on the one-row matrix (chance-corrected terms
    cross-multiplied so nothing divides before the final step).

    Scale shape: both signals are projections (the 2-gram rule's
    per-doc aggregate is corpus-linear); one join on doc_id, one
    map-side-combined 4-cell reduce."""
    scored = quality_logistic_score(spark, sf_dir).select(
        "doc_id", F.col("keep").alias("pred")
    )
    label = quality_gopher_rules(spark, sf_dir).select(
        "doc_id", F.col("keep").alias("pos")
    )
    j = scored.join(label, "doc_id")
    cm = j.agg(
        F.sum(F.when(F.col("pred") & F.col("pos"), 1).otherwise(0)).alias(
            "tp"
        ),
        F.sum(F.when(F.col("pred") & ~F.col("pos"), 1).otherwise(0)).alias(
            "fp"
        ),
        F.sum(F.when(~F.col("pred") & F.col("pos"), 1).otherwise(0)).alias(
            "fn"
        ),
        F.sum(F.when(~F.col("pred") & ~F.col("pos"), 1).otherwise(0)).alias(
            "tn"
        ),
    )
    tp, fp = F.col("tp"), F.col("fp")
    fn, tn = F.col("fn"), F.col("tn")
    n = tp + fp + fn + tn
    pe_num = (tp + fp) * F.lit(1.0) * (tp + fn) + (tn + fp) * F.lit(
        1.0
    ) * (tn + fn)
    return cm.select(
        tp.cast("long").alias("tp"),
        fp.cast("long").alias("fp"),
        fn.cast("long").alias("fn"),
        tn.cast("long").alias("tn"),
        F.round(
            tp * F.lit(1.0) / F.nullif((tp + fp).cast("double"), F.lit(0.0)),
            6,
        ).alias("precision"),
        F.round(
            tp * F.lit(1.0) / F.nullif((tp + fn).cast("double"), F.lit(0.0)),
            6,
        ).alias("recall"),
        F.round(
            F.lit(2.0)
            * tp
            / F.nullif((2 * tp + fp + fn).cast("double"), F.lit(0.0)),
            6,
        ).alias("f1"),
        F.round(
            (tp * F.lit(1.0) * tn - fp * F.lit(1.0) * fn)
            / F.nullif(
                F.sqrt((tp + fp) * F.lit(1.0) * (tp + fn))
                * F.sqrt((tn + fp) * F.lit(1.0) * (tn + fn)),
                F.lit(0.0),
            ),
            6,
        ).alias("mcc"),
        F.round(
            ((tp + tn) * F.lit(1.0) * n - pe_num)
            / F.nullif(n * F.lit(1.0) * n - pe_num, F.lit(0.0)),
            6,
        ).alias("cohen_kappa"),
    )


# --- proper scoring rules for the quality probability -------------------------------


@register(
    "quality_scoring_rules",
    oracle=f"""
    {_QCM_CTES.replace(') >= 0.5 AS pred', ') AS prob').replace('>= 0.5 AS pred', 'AS prob')},
    t AS (
      SELECT CAST(round(z.prob * 1e6) AS BIGINT) AS pu,
             CASE WHEN lbl.pos THEN 1 ELSE 0 END AS y
      FROM z JOIN lbl USING (doc_id)
    ),
    u AS (
      SELECT count(*) AS n,
             sum(CAST(round(pow(pu / 1e6 - y, 2) * 1e9) AS BIGINT))
               AS brieru,
             sum(CAST(round(-ln(CASE WHEN y = 1 THEN greatest(pu / 1e6, 1e-6)
                                     ELSE greatest(1e0 - pu / 1e6, 1e-6) END)
                            * 1e9) AS BIGINT)) AS llu,
             sum(y) AS ny
      FROM t
    )
    SELECT CAST(n AS BIGINT) AS n_docs, CAST(ny AS BIGINT) AS n_pos,
           round(brieru * 1e0 / n / 1e9, 6) AS brier_score,
           round(llu * 1e0 / n / 1e9, 6) AS log_loss
    FROM u
    """,
)
def quality_scoring_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Proper scoring rules for the quality PROBABILITY against the
    Gopher label: the Brier score (mean squared probability error) and
    log loss (clamped at 1e-6 — the standard guard for confident-wrong
    predictions), the two numbers that judge the probability itself
    rather than its ranking (AUC) or a threshold (F1). Probabilities
    quantize to micro-units and each per-doc term re-quantizes to
    nano-units before the mean, so both scores are order-exact.

    Scale shape: two projections, one doc_id join, one 1-row
    map-side-combined reduce."""
    scored = quality_logistic_score(spark, sf_dir).select(
        "doc_id", F.round(F.col("quality_prob") * 1e6).cast("long").alias("pu")
    )
    label = quality_gopher_rules(spark, sf_dir).select(
        "doc_id", F.when(F.col("keep"), 1).otherwise(0).alias("y")
    )
    t = scored.join(label, "doc_id")
    p = F.col("pu") / F.lit(1e6)
    brier_t = F.round(F.pow(p - F.col("y"), 2) * F.lit(1e9)).cast("long")
    ll_t = F.round(
        -F.log(
            F.when(F.col("y") == 1, F.greatest(p, F.lit(1e-6))).otherwise(
                F.greatest(F.lit(1.0) - p, F.lit(1e-6))
            )
        )
        * F.lit(1e9)
    ).cast("long")
    u = t.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(brier_t).alias("brieru"),
        F.sum(ll_t).alias("llu"),
        F.sum("y").alias("ny"),
    )
    return u.select(
        F.col("n").cast("long").alias("n_docs"),
        F.col("ny").cast("long").alias("n_pos"),
        F.round(F.col("brieru") * F.lit(1.0) / F.col("n") / 1e9, 6).alias(
            "brier_score"
        ),
        F.round(F.col("llu") * F.lit(1.0) / F.col("n") / 1e9, 6).alias(
            "log_loss"
        ),
    )


# --- hash-uniformity audit (the foundation every split/sample rests on) -------------

_HU_CHI2_99 = "134.6415889216373"  # chi-square 0.99 quantile, 99 df (repr)


@register(
    "hash_uniformity_audit",
    oracle=f"""
    WITH b AS (
      SELECT {_bucket_sql('doc_id')} AS bucket FROM documents
    ),
    g AS (
      SELECT bucket, count(*) AS o FROM b GROUP BY 1
    ),
    lat AS (
      SELECT i.i AS bucket, coalesce(g.o, 0) AS o
      FROM (SELECT unnest(range(0, 100)) AS i) i
      LEFT JOIN g ON g.bucket = i.i
    ),
    t AS (SELECT sum(o) AS n FROM lat)
    SELECT CAST(t.n AS BIGINT) AS n_docs,
           CAST(max(lat.o) AS BIGINT) AS max_bucket,
           CAST(min(lat.o) AS BIGINT) AS min_bucket,
           round(sum((lat.o - t.n / 100e0) * (lat.o - t.n / 100e0))
                 / (t.n / 100e0), 6) AS chi2,
           (sum((lat.o - t.n / 100e0) * (lat.o - t.n / 100e0))
            / (t.n / 100e0)) < {_HU_CHI2_99} AS uniform_at_99
    FROM lat CROSS JOIN t
    GROUP BY t.n
    """,
)
def hash_uniformity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square uniformity audit of THE hash the engine builds on:
    the seeded doc-id bucket (functions/text.token_hash mod 100) that
    drives every deterministic sample, split, and sweep. All 100
    buckets are materialized (an empty bucket is evidence, not a
    missing row), the goodness-of-fit statistic is compared against
    the precomputed chi-square 99% quantile for 99 df (repr-embedded
    constant — no per-engine distribution function), and the verdict
    ships IN the output. If this flag ever flips, every
    hash-stratified result upstream inherits the bias — which is why
    the audit exists as a first-class query rather than a code
    comment.

    Scale shape: one map-side-combined bucket count, a 100-row
    lattice join, a 1-row reduce."""
    d = _docs(spark, sf_dir)
    b = d.select(_bucket("doc_id").alias("bucket"))
    g = b.groupBy("bucket").agg(F.count(F.lit(1)).alias("o"))
    lat = (
        spark.range(100)
        .select(F.col("id").alias("bucket"))
        .join(F.broadcast(g), "bucket", "left")
        .select(
            "bucket", F.coalesce(F.col("o"), F.lit(0)).alias("o")
        )
    )
    t = lat.agg(F.sum("o").alias("n"))
    e = F.col("n") / F.lit(100.0)
    chi2 = F.sum((F.col("o") - e) * (F.col("o") - e)) / e
    return (
        lat.crossJoin(F.broadcast(t))
        .groupBy("n")
        .agg(
            F.max("o").cast("long").alias("max_bucket"),
            F.min("o").cast("long").alias("min_bucket"),
            F.round(chi2, 6).alias("chi2"),
            (chi2 < float(_HU_CHI2_99)).alias("uniform_at_99"),
        )
        .select(
            F.col("n").cast("long").alias("n_docs"),
            "max_bucket",
            "min_bucket",
            "chi2",
            "uniform_at_99",
        )
    )


# --- null calibration of the AUC machinery ----------------------------------------

_AUCNULL_SEED = "aucnull-v1"


@register(
    "quality_auc_null_calibration",
    oracle=f"""
    WITH f AS (
      SELECT round(1e0 / (1e0 + exp(-({_PARETO_Z}))), 4) AS s,
             {X.token_hash_sql('CAST(doc_id AS VARCHAR)', seed=_AUCNULL_SEED)} % 2
               AS pos
      FROM documents
    ),
    g AS (SELECT s, count(*) AS cnt, sum(pos) AS pc FROM f GROUP BY 1),
    w AS (
      SELECT s, cnt, pc,
             coalesce(sum(cnt) OVER (ORDER BY s
                      ROWS BETWEEN UNBOUNDED PRECEDING
                      AND 1 PRECEDING), 0) AS cum
      FROM g
    ),
    t AS (
      SELECT sum(pc * (2 * cum + cnt + 1)) AS spr2,
             sum(pc) AS p, sum(cnt) - sum(pc) AS n
      FROM w
    )
    SELECT CAST(p AS BIGINT) AS n_pos, CAST(n AS BIGINT) AS n_neg,
           round((CAST(spr2 AS DOUBLE) - CAST(p AS DOUBLE) * (p + 1))
                 / (2e0 * p * n), 6) AS null_auc
    FROM t
    """,
)
def quality_auc_null_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null calibration of the AUC machinery: the SAME midrank
    rank-sum computation as `quality_score_auc`, but against a label
    that is pure seeded hash noise (doc-id parity under a fresh seed)
    — by construction independent of the score, so the result must sit
    near 0.5, and its deviation is the finite-sample noise floor any
    real AUC on this corpus should be read against. The negative
    control the statistics family was missing (Moran's I already
    ships its own via uniform coordinates).

    Scale shape: identical to the real AUC — one grid-bounded
    aggregate, one tiny window, a 1-row reduce."""
    d = _docs(spark, sf_dir)
    n_tok = X.token_count("text")
    z = (
        F.lit(_QLR["b0"])
        + _QLR["w_logtok"] * F.log(1 + n_tok)
        + _QLR["w_stop"] * X.stopword_ratio("text")
        + _QLR["w_punct"] * X.punct_ratio("text")
        + _QLR["w_cpt"] * (F.length("text") / F.greatest(n_tok, F.lit(1)))
    )
    f = d.select(
        F.round(1.0 / (1.0 + F.exp(-z)), 4).alias("s"),
        (
            X.token_hash(F.col("doc_id").cast("string"), seed=_AUCNULL_SEED)
            % 2
        ).alias("pos"),
    )
    g = f.groupBy("s").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("pos").alias("pc")
    )
    w = Window.orderBy(F.asc("s")).rowsBetween(Window.unboundedPreceding, -1)
    wf = g.select(
        "s", "cnt", "pc",
        F.coalesce(F.sum("cnt").over(w), F.lit(0)).alias("cum"),
    )
    t = wf.agg(
        F.sum(F.col("pc") * (2 * F.col("cum") + F.col("cnt") + 1)).alias(
            "spr2"
        ),
        F.sum("pc").alias("p"),
        (F.sum("cnt") - F.sum("pc")).alias("n"),
    )
    return t.select(
        F.col("p").cast("long").alias("n_pos"),
        F.col("n").cast("long").alias("n_neg"),
        F.round(
            (F.col("spr2").cast("double")
             - F.col("p").cast("double") * (F.col("p") + 1))
            / (F.lit(2.0) * F.col("p") * F.col("n")),
            6,
        ).alias("null_auc"),
    )


# --- decision stump: best Gini split of the quality score ---------------------------


@register(
    "decision_stump_quality",
    oracle=f"""
    {_QCM_CTES.replace(') >= 0.5 AS pred', ') AS prob').replace('>= 0.5 AS pred', 'AS prob')},
    f2 AS (
      SELECT round(z.prob, 4) AS s,
             CASE WHEN lbl.pos THEN 1 ELSE 0 END AS y
      FROM z JOIN lbl USING (doc_id)
    ),
    sg AS (SELECT s, count(*) AS c, sum(y) AS p FROM f2 GROUP BY 1),
    cum AS (
      SELECT s,
             sum(c) OVER (ORDER BY s) AS cl, sum(p) OVER (ORDER BY s) AS pl,
             sum(c) OVER () AS n, sum(p) OVER () AS np
      FROM sg
    ),
    cand AS (
      SELECT s, cl, pl, n, np,
             CAST(round((
               cl * (1e0 - (pl * 1e0 / cl) * (pl * 1e0 / cl)
                     - ((cl - pl) * 1e0 / cl) * ((cl - pl) * 1e0 / cl))
               + (n - cl) * (1e0
                   - ((np - pl) * 1e0 / (n - cl)) * ((np - pl) * 1e0 / (n - cl))
                   - ((n - cl - np + pl) * 1e0 / (n - cl))
                     * ((n - cl - np + pl) * 1e0 / (n - cl)))
             ) / n * 1e9) AS BIGINT) AS giniu
      FROM cum WHERE cl > 0 AND cl < n
    ),
    best AS (
      SELECT s, giniu FROM cand ORDER BY giniu ASC, s ASC LIMIT 1
    ),
    base AS (
      SELECT CAST(round((1e0 - (np * 1e0 / n) * (np * 1e0 / n)
                   - ((n - np) * 1e0 / n) * ((n - np) * 1e0 / n)) * 1e9)
                  AS BIGINT) AS g0
      FROM (SELECT max(n) AS n, max(np) AS np FROM cum)
    )
    SELECT best.s AS split_threshold,
           round(base.g0 / 1e9, 6) AS gini_root,
           round(best.giniu / 1e9, 6) AS gini_split,
           round((base.g0 - best.giniu) / 1e9, 6) AS gini_gain
    FROM best CROSS JOIN base
    """,
)
def decision_stump_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decision stump — the CART split-finding primitive, run once:
    the quality-score threshold that minimizes weighted Gini impurity
    against the Gopher label, with the root impurity and the gain.
    This is the inner loop of every tree ensemble, expressed as the
    engine expresses it at scale: candidate thresholds are the 4dp
    score GRID (bounded), left/right class counts come from one
    running-sum window over the grid, and each candidate's weighted
    impurity re-quantizes to nano-units so the argmin compares exact
    integers with a smallest-threshold tie-break.

    Scale shape: one grid-bounded aggregate over the corpus, windows
    and argmin on the <= 10^4-row grid. A full tree level is this
    plan per (node, feature) — embarrassingly parallel."""
    scored = quality_logistic_score(spark, sf_dir).select(
        "doc_id", F.round(F.col("quality_prob"), 4).alias("s")
    )
    label = quality_gopher_rules(spark, sf_dir).select(
        "doc_id", F.when(F.col("keep"), 1).otherwise(0).alias("y")
    )
    f2 = scored.join(label, "doc_id")
    g = f2.groupBy("s").agg(
        F.count(F.lit(1)).alias("c"), F.sum("y").alias("p")
    )
    wc = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, 0)
    wt = Window.orderBy("s").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = g.select(
        "s",
        F.sum("c").over(wc).alias("cl"),
        F.sum("p").over(wc).alias("pl"),
        F.sum("c").over(wt).alias("n"),
        F.sum("p").over(wt).alias("np"),
    )
    cl, pl = F.col("cl").cast("double"), F.col("pl").cast("double")
    n, np_ = F.col("n").cast("double"), F.col("np").cast("double")
    gl = cl * (
        F.lit(1.0) - (pl / cl) * (pl / cl)
        - ((cl - pl) / cl) * ((cl - pl) / cl)
    )
    gr = (n - cl) * (
        F.lit(1.0)
        - ((np_ - pl) / (n - cl)) * ((np_ - pl) / (n - cl))
        - ((n - cl - np_ + pl) / (n - cl))
        * ((n - cl - np_ + pl) / (n - cl))
    )
    cand = cum.filter((F.col("cl") > 0) & (F.col("cl") < F.col("n"))).select(
        "s",
        F.round((gl + gr) / n * F.lit(1e9)).cast("long").alias("giniu"),
        "n",
        "np",
    )
    best = cand.orderBy(F.asc("giniu"), F.asc("s")).limit(1)
    base = cum.agg(F.max("n").alias("n"), F.max("np").alias("np")).select(
        F.round(
            (
                F.lit(1.0)
                - (F.col("np") / F.col("n")) * (F.col("np") / F.col("n"))
                - ((F.col("n") - F.col("np")) / F.col("n"))
                * ((F.col("n") - F.col("np")) / F.col("n"))
            )
            * F.lit(1e9)
        )
        .cast("long")
        .alias("g0")
    )
    return best.crossJoin(F.broadcast(base)).select(
        F.col("s").alias("split_threshold"),
        F.round(F.col("g0") / F.lit(1e9), 6).alias("gini_root"),
        F.round(F.col("giniu") / F.lit(1e9), 6).alias("gini_split"),
        F.round((F.col("g0") - F.col("giniu")) / F.lit(1e9), 6).alias(
            "gini_gain"
        ),
    )


# --- two-feature ridge regression via the normal equations ---------------------------

_RIDGE_LAMBDA = 1000  # ridge penalty on the n-scaled centered Gram


@register(
    "ridge_two_feature",
    oracle=f"""
    WITH b AS (SELECT doc_id, {_GQ_TOKS} AS toks, n_chars FROM documents),
    m AS (
      SELECT doc_id, len(toks) AS n_tok,
             len(list_distinct(toks)) AS nd, n_chars
      FROM b
    ),
    f AS (
      SELECT n_chars AS x1,
             CAST(round(nd * 1e4 / greatest(n_tok, 1)) AS BIGINT) AS x2,
             CASE WHEN n_tok BETWEEN {_GQ_MIN_TOK} AND {_GQ_MAX_TOK}
                  THEN 1 ELSE 0 END AS y
      FROM m
    ),
    s AS (
      SELECT count(*) AS n, sum(x1) AS s1, sum(x2) AS s2, sum(y) AS sy,
             sum(x1 * x1) AS s11, sum(x2 * x2) AS s22,
             sum(x1 * x2) AS s12, sum(x1 * y) AS s1y, sum(x2 * y) AS s2y
      FROM f
    ),
    g AS (
      SELECT n,
             CAST(n AS DOUBLE) * s11 - CAST(s1 AS DOUBLE) * s1
               + {_RIDGE_LAMBDA}e0 AS a11,
             CAST(n AS DOUBLE) * s22 - CAST(s2 AS DOUBLE) * s2
               + {_RIDGE_LAMBDA}e0 AS a22,
             CAST(n AS DOUBLE) * s12 - CAST(s1 AS DOUBLE) * s2 AS a12,
             CAST(n AS DOUBLE) * s1y - CAST(s1 AS DOUBLE) * sy AS c1,
             CAST(n AS DOUBLE) * s2y - CAST(s2 AS DOUBLE) * sy AS c2,
             s1, s2, sy
      FROM s
    )
    SELECT CAST(n AS BIGINT) AS n_docs,
           round((a22 * c1 - a12 * c2) / (a11 * a22 - a12 * a12), 9)
             AS beta_chars,
           round((a11 * c2 - a12 * c1) / (a11 * a22 - a12 * a12), 9)
             AS beta_uniq,
           round(sy * 1e0 / n
                 - (a22 * c1 - a12 * c2) / (a11 * a22 - a12 * a12)
                   * (s1 * 1e0 / n)
                 - (a11 * c2 - a12 * c1) / (a11 * a22 - a12 * a12)
                   * (s2 * 1e0 / n), 6) AS intercept
    FROM g
    """,
)
def ridge_two_feature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-feature ridge regression SOLVED IN CLOSED FORM inside the
    engine: predict the Gopher length-rule label from document length
    and unique-token ratio via the normal equations on the CENTERED
    Gram matrix — every entry of which is a cross-multiplied exact
    integer (n*Sxx - Sx^2, the trend family's trick lifted to 2
    dimensions), so both engines invert the identical 2x2 system. The
    ridge penalty keeps the inverse conditioned. This extends the ML
    family from 1-feature OLS (trend_slope_daily) to multivariate
    regression — the same sufficient-statistics reduction scales to p
    features as a p^2-entry aggregate, and THAT is why linear models
    train in one pass at 100 TB.

    Scale shape: ONE map-side-combined aggregate producing all nine
    sufficient statistics; the solve is constant-time arithmetic on
    one row."""
    d = _docs(spark, sf_dir)
    toks = X.tokens(F.col("text"))
    m = d.select(
        F.col("n_chars").alias("x1"),
        F.round(
            F.size(F.array_distinct(toks))
            * 1e4
            / F.greatest(F.size(toks), F.lit(1))
        )
        .cast("long")
        .alias("x2"),
        F.when(
            F.size(toks).between(_GQ_MIN_TOK, _GQ_MAX_TOK), 1
        )
        .otherwise(0)
        .alias("y"),
    )
    s = m.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x1").alias("s1"),
        F.sum("x2").alias("s2"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x1") * F.col("x1")).alias("s11"),
        F.sum(F.col("x2") * F.col("x2")).alias("s22"),
        F.sum(F.col("x1") * F.col("x2")).alias("s12"),
        F.sum(F.col("x1") * F.col("y")).alias("s1y"),
        F.sum(F.col("x2") * F.col("y")).alias("s2y"),
    )
    n = F.col("n").cast("double")
    a11 = n * F.col("s11") - F.col("s1").cast("double") * F.col("s1") + F.lit(
        float(_RIDGE_LAMBDA)
    )
    a22 = n * F.col("s22") - F.col("s2").cast("double") * F.col("s2") + F.lit(
        float(_RIDGE_LAMBDA)
    )
    a12 = n * F.col("s12") - F.col("s1").cast("double") * F.col("s2")
    c1 = n * F.col("s1y") - F.col("s1").cast("double") * F.col("sy")
    c2 = n * F.col("s2y") - F.col("s2").cast("double") * F.col("sy")
    det = a11 * a22 - a12 * a12
    b1 = (a22 * c1 - a12 * c2) / det
    b2 = (a11 * c2 - a12 * c1) / det
    return s.select(
        F.col("n").cast("long").alias("n_docs"),
        F.round(b1, 9).alias("beta_chars"),
        F.round(b2, 9).alias("beta_uniq"),
        F.round(
            F.col("sy") * F.lit(1.0) / F.col("n")
            - b1 * (F.col("s1") * F.lit(1.0) / F.col("n"))
            - b2 * (F.col("s2") * F.lit(1.0) / F.col("n")),
            6,
        ).alias("intercept"),
    )


# --- McNemar test between the two quality classifiers --------------------------------


@register(
    "mcnemar_quality_signals",
    oracle=f"""
    {_QCM_CTES},
    cm AS (
      SELECT sum(CASE WHEN pred AND NOT pos THEN 1 ELSE 0 END) AS b,
             sum(CASE WHEN NOT pred AND pos THEN 1 ELSE 0 END) AS c,
             count(*) AS n
      FROM z JOIN lbl USING (doc_id)
    )
    SELECT CAST(n AS BIGINT) AS n_docs,
           CAST(b AS BIGINT) AS only_logistic_keeps,
           CAST(c AS BIGINT) AS only_gopher_keeps,
           round(pow(abs(b - c) - 1e0, 2) / NULLIF(b + c, 0), 6)
             AS mcnemar_chi2
    FROM cm
    """,
)
def mcnemar_quality_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's test (continuity-corrected) between the two quality
    keep-decisions on the SAME documents: only the DISCORDANT cells
    matter — documents one signal keeps and the other rejects — which
    is exactly the right question for paired classifiers ("do they
    disagree more in one direction than chance allows"), where the
    unpaired chi-square would wrongly count the agreements as
    evidence. The cells are the confusion matrix's fp/fn, so this
    completes `quality_confusion_matrix` with the significance test
    for its asymmetry.

    Scale shape: the same two projections + doc_id join, a 3-integer
    1-row reduce."""
    scored = quality_logistic_score(spark, sf_dir).select(
        "doc_id", F.col("keep").alias("pred")
    )
    label = quality_gopher_rules(spark, sf_dir).select(
        "doc_id", F.col("keep").alias("pos")
    )
    cm = scored.join(label, "doc_id").agg(
        F.sum(F.when(F.col("pred") & ~F.col("pos"), 1).otherwise(0)).alias(
            "b"
        ),
        F.sum(F.when(~F.col("pred") & F.col("pos"), 1).otherwise(0)).alias(
            "c"
        ),
        F.count(F.lit(1)).alias("n"),
    )
    return cm.select(
        F.col("n").cast("long").alias("n_docs"),
        F.col("b").cast("long").alias("only_logistic_keeps"),
        F.col("c").cast("long").alias("only_gopher_keeps"),
        F.round(
            F.pow(F.abs(F.col("b") - F.col("c")) - F.lit(1.0), 2)
            / F.nullif((F.col("b") + F.col("c")).cast("double"), F.lit(0.0)),
            6,
        ).alias("mcnemar_chi2"),
    )
