"""Text-analysis expression layer (north star: LLM-data pipeline ops —
BASELINE.json; SURVEY.md §7.2.10). All native Column expressions —
tokenization, stats, language-ID and fingerprints stay JVM-side; no
Python UDFs in the hot path.

Every helper has a `*_sql` twin producing the equivalent DuckDB SQL so
the oracle can't drift from the Spark semantics.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny embedded stopword/marker lists (public, language-frequency
# common words). Deterministic, engine-independent.
STOPWORDS = ["the", "a", "an", "and", "of", "to", "in", "is", "on", "for", "with", "as"]

LANG_MARKERS: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein"],
    "en": ["the", "and", "of", "is", "to", "in", "that"],
    "es": ["el", "la", "de", "que", "y", "los", "las"],
    "fr": ["le", "les", "et", "est", "des", "une", "dans"],
}

PUNCT_CLASS = r"[^.,!?;:]"  # regexp_replace keeps only punctuation


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization of trimmed text; empty text → empty array."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(F.length(F.trim(c)) == 0, F.array().cast("array<string>")).otherwise(
        F.split(F.trim(c), r"\s+")
    )


def tokens_sql(col: str) -> str:
    return (
        f"CASE WHEN length(trim({col})) = 0 THEN [] "
        f"ELSE regexp_split_to_array(trim({col}), '\\s+') END"
    )


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def punct_ratio(col: Column | str) -> Column:
    """# punctuation chars / # chars (0 for empty text)."""
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c)
    p = F.length(F.regexp_replace(c, PUNCT_CLASS, ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(p / n)


def punct_ratio_sql(col: str) -> str:
    return (
        f"CASE WHEN length({col}) = 0 THEN 0.0 "
        f"ELSE length(regexp_replace({col}, '{PUNCT_CLASS}', '', 'g')) * 1.0 / length({col}) END"
    )


def _in_list(x: Column, words: list[str]) -> Column:
    return x.isin(*words)


def stopword_ratio(col: Column | str) -> Column:
    """# stopword tokens / # tokens (0 for empty)."""
    toks = tokens(col)
    n = F.size(toks)
    s = F.size(F.filter(toks, lambda x: _in_list(x, STOPWORDS)))
    return F.when(n == 0, F.lit(0.0)).otherwise(s / n)


def stopword_ratio_sql(col: str) -> str:
    toks = tokens_sql(col)
    in_list = ", ".join(f"'{w}'" for w in STOPWORDS)
    return (
        f"CASE WHEN len({toks}) = 0 THEN 0.0 "
        f"ELSE len(list_filter({toks}, x -> x IN ({in_list}))) * 1.0 / len({toks}) END"
    )


def _isin_filter(words: list[str]):
    # NB: a single-arg closure, NOT `lambda x, w=words: ...` — PySpark
    # treats a two-parameter lambda as (element, index).
    return lambda x: _in_list(x, words)


def lang_scores(col: Column | str) -> dict[str, Column]:
    """Marker-word hit count per language over the token list."""
    toks = tokens(col)
    return {
        lang: F.size(F.filter(toks, _isin_filter(words)))
        for lang, words in LANG_MARKERS.items()
    }


def predict_lang(col: Column | str) -> Column:
    """Argmax language with alphabetical tie-break ('unknown' when all
    scores are 0) — same n-gram-heuristic family as public langid
    tools, reduced to marker unigrams so it stays a pure expression."""
    scores = lang_scores(col)
    best = F.greatest(*scores.values())
    expr = F.when(best == 0, F.lit("unknown"))
    for lang in sorted(scores):  # alphabetical = deterministic tie-break
        expr = expr.when(scores[lang] == best, F.lit(lang))
    return expr


def predict_lang_sql(col: str) -> str:
    toks = tokens_sql(col)
    score = {
        lang: f"len(list_filter({toks}, x -> x IN ({', '.join(repr(w) for w in words)})))"
        for lang, words in LANG_MARKERS.items()
    }
    best = "greatest(" + ", ".join(score.values()) + ")"
    branches = [f"WHEN {best} = 0 THEN 'unknown'"]
    for lang in sorted(score):
        branches.append(f"WHEN {score[lang]} = {best} THEN '{lang}'")
    return "CASE " + " ".join(branches) + " END"


def md5_fingerprint(col: Column | str) -> Column:
    """Whole-document fingerprint: md5 of whitespace-normalized,
    lowercased text (document fingerprinting for exact dedup)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.lower(F.regexp_replace(F.trim(c), r"\s+", " ")))


def md5_fingerprint_sql(col: str) -> str:
    return f"md5(lower(regexp_replace(trim({col}), '\\s+', ' ', 'g')))"


def hex15_to_long(hexcol: Column) -> Column:
    """First 15 hex chars → BIGINT (60 bits, always positive). The
    engine-independent integer hash used for minhash/simhash: DuckDB
    computes the identical value via CAST(concat('0x', substr(md5(x),1,15)) AS BIGINT)."""
    return F.conv(F.substring(hexcol, 1, 15), 16, 10).cast("long")


def token_hash(x: Column, seed: str = "") -> Column:
    """Deterministic 60-bit integer hash of a token (+seed)."""
    return hex15_to_long(F.md5(F.concat(x, F.lit("#" + seed))) if seed else F.md5(x))


def token_hash_sql(x: str, seed: str = "") -> str:
    inner = f"concat({x}, '#{seed}')" if seed else x
    return f"CAST(concat('0x', substr(md5({inner}), 1, 15)) AS BIGINT)"

# --- PII redaction -----------------------------------------------------------
# Patterns are written in the syntax subset Java regex (Spark) and RE2
# (DuckDB) interpret identically. Applied in list order: emails first
# (their local parts contain dots/digits), then dotted IPv4, then
# digit/dash phone runs — so an earlier replacement can't leave a
# fragment a later pattern half-matches differently per engine.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "[IP]"),
    ("phone", r"\+?[0-9][0-9\-]{6,}[0-9]", "[PHONE]"),
]


def pii_counts(col: Column | str) -> dict[str, Column]:
    """Per-category PII match counts (before redaction)."""
    c = F.col(col) if isinstance(col, str) else col
    return {
        name: F.regexp_count(c, F.lit(pat)).cast("long")
        for name, pat, _ in PII_PATTERNS
    }


def pii_counts_sql(col: str) -> dict[str, str]:
    return {
        name: f"CAST(len(regexp_extract_all({col}, '{pat}')) AS BIGINT)"
        for name, pat, _ in PII_PATTERNS
    }


def redact_pii(col: Column | str) -> Column:
    """Replace every PII match with its category token — a chained
    regexp_replace, fully codegen'd (the scrubbing pass an LLM training
    corpus gets before tokenization)."""
    c = F.col(col) if isinstance(col, str) else col
    for _, pat, token in PII_PATTERNS:
        c = F.regexp_replace(c, pat, token)
    return c


def redact_pii_sql(col: str) -> str:
    expr = col
    for _, pat, token in PII_PATTERNS:
        expr = f"regexp_replace({expr}, '{pat}', '{token}', 'g')"
    return expr
