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
from dataengineeringproject_spark.registry import register
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
    identically in Spark and the oracle because rule order is shared."""
    d = _docs(spark, sf_dir)
    n_tok = F.size(X.tokens("text"))
    ng = _all_ngrams("text", _REP_K)
    rep = 1.0 - F.size(F.array_distinct(ng)) / F.size(ng)
    reason = (
        F.when(n_tok < _MIN_TOK, F.lit("too_short"))
        .when(n_tok > _MAX_TOK, F.lit("too_long"))
        .when(X.punct_ratio("text") >= _MAX_PUNCT, F.lit("high_punct"))
        .when(X.stopword_ratio("text") < _MIN_STOP, F.lit("low_stopword"))
        .when(rep > _MAX_REP, F.lit("too_repetitive"))
        .otherwise(F.lit("pass"))
    )
    return (
        d.select(reason.alias("reject_reason"), "n_chars")
        .groupBy("reject_reason")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("n_chars_total"),
        )
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
