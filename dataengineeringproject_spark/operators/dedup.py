"""Deduplication operators for LLM-data pipelines (north star:
BASELINE.json; SURVEY.md §7.2.10): exact, MinHash+LSH, SimHash, and
n-gram Jaccard.

Scale posture (the whole point of these at 100 TB):
- exact dedup: one hash-groupBy shuffle on a 128-bit fingerprint;
  cluster representative via min(id) — no window needed.
- MinHash+LSH: explode docs→shingles (map-side), aggregate per-doc
  minhash signature (one shuffle on doc id), explode signature→bands
  (map-side), self-join on (band_id, band_key) — candidate pairs are
  produced by an equi-join on the band bucket, NEVER an all-pairs
  cross join. Verification (exact Jaccard) touches only candidates.
- SimHash: per-doc aggregate of token-hash bit votes — one shuffle.
- n-gram Jaccard: blocked all-pairs *within a small blocking key* —
  only for bounded blocks; the unbounded path is MinHash+LSH.

All hashing is md5-derived (`token_hash`) so the DuckDB oracle can
reproduce results bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dataengineeringproject_spark.functions.text import (
    md5_fingerprint,
    token_hash,
    tokens,
)


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact duplicate clustering: rows sharing a normalized-text md5
    fingerprint; representative = min id. Output: id, rep_id,
    cluster_size (a user filters rep_id == id to materialize the
    deduplicated corpus)."""
    fp = df.select(F.col(id_col), md5_fingerprint(text_col).alias("__fp"))
    clusters = fp.groupBy("__fp").agg(
        F.min(id_col).alias("rep_id"), F.count(F.lit(1)).alias("cluster_size")
    )
    return (
        fp.join(clusters, "__fp")
        .select(id_col, "rep_id", "cluster_size")
    )


def shingles(text_col: Column | str, k: int = 3) -> Column:
    """k-word shingles of the token list (distinct). Documents shorter
    than k tokens get their full token string as a single shingle so
    they still participate.

    Construction is k-1 zip_with passes over shifted slices of the
    token array (whole-array ops) rather than transform(sequence) with
    a per-index slice() — same output, ~5x faster: per-index slice is
    O(k) allocations per shingle under non-codegen higher-order
    functions, the dominant cost of the whole MinHash pipeline."""
    toks = tokens(text_col)
    n = F.size(toks)
    m = n - (k - 1)
    parts = F.slice(toks, 1, m)
    for j in range(1, k):
        parts = F.zip_with(
            parts, F.slice(toks, 1 + j, m), lambda x, y: F.concat(x, F.lit(" "), y)
        )
    return F.array_distinct(
        F.when(n >= k, parts).otherwise(F.array(F.concat_ws(" ", toks)))
    )


def shingles_sql(text_col_tokens_sql: str, k: int = 3) -> str:
    """DuckDB twin of `shingles` (takes the tokens-array SQL)."""
    t = text_col_tokens_sql
    parts = ", ".join(f"{t}[i + {j}]" for j in range(k))
    return (
        f"list_distinct(CASE WHEN len({t}) >= {k} "
        f"THEN list_transform(generate_series(1, len({t}) - {k - 1}), "
        f"i -> concat_ws(' ', {parts})) "
        f"ELSE [concat_ws(' ', {t})] END)"
    )


# MinHash permutation family: one md5 per shingle, then n affine
# permutations  perm_j(h) = (a_j * (h mod P) + b_j) mod P  over a
# Mersenne prime. a_j < 2^20 keeps products < 2^51 — exact in both
# Spark longs and DuckDB BIGINTs (DuckDB errors on int64 overflow, so
# staying well inside the range is a correctness requirement, not
# just hygiene). Constants derive from md5 in pure Python so the
# oracle embeds the same values.
MINHASH_P = 2_147_483_647  # 2^31 - 1


def minhash_coeffs(j: int) -> tuple[int, int]:
    import hashlib as _hl

    a = int(_hl.md5(f"mh_a:{j}".encode()).hexdigest()[:5], 16) | 1  # odd, < 2^20
    b = int(_hl.md5(f"mh_b:{j}".encode()).hexdigest()[:7], 16) % MINHASH_P
    return a, b


def shingle_table(
    df: DataFrame, id_col: str, text_col: str, k: int = 3
) -> DataFrame:
    """(id, sh: array<string>) — the tokenize+shingle projection, split
    out so a composed pipeline (signatures + later exact-Jaccard
    verify) can compute it ONCE and `.cache()` it: shingling is the
    dominant per-row cost of the whole MinHash path, and the two
    consumers need different downstream shapes (exploded vs array), so
    plan-level reuse can't kick in on its own.

    Carries the r11 min-parallelism guard: shingling is exactly the
    heavy pre-shuffle map work that a one-row-group corpus serializes
    to a single task (see similarity.ensure_min_parallelism — no-op
    whenever the scan already yields >= core-count splits), and every
    MinHash-family consumer funnels through here."""
    from dataengineeringproject_spark.operators.similarity import (
        ensure_min_parallelism,
    )

    return ensure_min_parallelism(df, id_col).select(
        F.col(id_col), shingles(text_col, k).alias("sh")
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 8,
    k: int = 3,
    shingles_df: DataFrame | None = None,
) -> DataFrame:
    """Per-document MinHash signature: ONE md5 per shingle, n affine
    permutations of it, min per permutation. Output: id, mh_0..mh_{n-1}.

    Physical shape: explode to (id, shingle) then ONE hash aggregation
    computing all n minima — shingle fan-out happens map-side, the only
    shuffle is the per-doc combine (partial min → final min).
    Pass `shingles_df` (from `shingle_table`, ideally cached) when the
    pipeline also verifies pairs, so shingling isn't recomputed."""
    src = (
        shingles_df
        if shingles_df is not None
        else shingle_table(df, id_col, text_col, k)
    )
    ex = src.select(F.col(id_col), F.explode("sh").alias("sh"))
    h = (token_hash(F.col("sh")) % MINHASH_P).alias("h")
    hashed = ex.select(F.col(id_col), h)
    aggs = []
    for j in range(n_hashes):
        a, b = minhash_coeffs(j)
        aggs.append(F.min((F.col("h") * a + b) % MINHASH_P).alias(f"mh_{j}"))
    return hashed.groupBy(id_col).agg(*aggs)


def band_table(
    sigs: DataFrame, id_col: str, n_hashes: int = 8, bands: int = 4
) -> DataFrame:
    """(id, band_id, band_key) — the LSH posting index: the signature
    split into `bands` band keys, one row per (doc, band). This is the
    shape a PERSISTED corpus signature index stores (bucketed by
    band_key at scale), so an incremental batch can band-join against
    the corpus without recomputing corpus signatures
    (dedup_incremental_minhash)."""
    rows_per_band = n_hashes // bands
    band_cols = []
    for b in range(bands):
        key = F.concat_ws(
            "_", *[F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)]
        )
        band_cols.append(F.struct(F.lit(b).alias("band_id"), key.alias("band_key")))
    return sigs.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("band")
    ).select(id_col, "band.band_id", "band.band_key")


def lsh_candidate_pairs(
    sigs: DataFrame, id_col: str, n_hashes: int = 8, bands: int = 4
) -> DataFrame:
    """LSH banding: split the signature into `bands` bands of
    n_hashes/bands rows; docs sharing any band key become a candidate
    pair (id_a < id_b, distinct).

    The self-join is an equi-join on (band_id, band_key) — at scale a
    plain shuffle join whose cost is bucket-sized, not corpus-sized."""
    banded = band_table(sigs, id_col, n_hashes=n_hashes, bands=bands)
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col(f"a.band_id") == F.col(f"b.band_id"))
            & (F.col(f"a.band_key") == F.col(f"b.band_key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


def jaccard_on_pairs(
    pairs: DataFrame,
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    threshold: float = 0.5,
    shingles_df: DataFrame | None = None,
) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs; keep ≥ threshold.
    Joins the (small) candidate set back to per-doc shingle arrays.

    The shingle table is needed for BOTH endpoints of each pair; the
    repartition pins one exchange whose subtree is identical for the
    a- and b-branches, so Spark computes the (expensive) tokenize +
    shingle projection ONCE and reuses the exchange, instead of
    re-deriving it per branch. The candidate side is broadcast — the
    shingle table never shuffles on its account. Pass a cached
    `shingles_df` (shingle_table) to also share the projection with the
    signature stage."""
    src = (
        shingles_df
        if shingles_df is not None
        else shingle_table(df, id_col, text_col, k)
    )
    sh = src.repartition(F.col(id_col))
    a = sh.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"))
    pairs = F.broadcast(pairs)
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("jaccard", inter / union)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = 16) -> DataFrame:
    """Per-document SimHash over distinct tokens: bit b is 1 when at
    least half the token hashes have bit b set (majority vote with the
    tie going to 1, expressed as 2*ones >= n). Pure array expressions —
    no explode, no shuffle.

    Physical shape (r10 bench finding): the token-hash array is
    projected in its OWN select stage so the md5 tokenize+hash subtree
    is evaluated once per row — referenced from `bits` downstream
    terms, CollapseProject correctly refuses to inline the non-cheap
    producer, whereas the old single-select form re-derived it once
    PER BIT (56x: measured 11.9 s -> 3.6 s at sf0.1). Per-bit majority
    counts come from ONE aggregate pass over the array (a running
    `bits`-wide bit-count vector via zip_with) instead of `bits`
    separate filter scans. Bit-for-bit identical to the old form
    (arithmetic vs logical shift agree on bit b for b < 63)."""
    toks = F.array_distinct(tokens(text_col))
    hashed = df.select(
        F.col(id_col), F.transform(toks, lambda t: token_hash(t)).alias("__h")
    )
    ones = F.expr(
        f"aggregate(__h, array_repeat(0, {bits}), (acc, x) -> "
        f"zip_with(acc, transform(sequence(0, {bits - 1}), b -> "
        f"CAST(shiftright(x, CAST(b AS INT)) & 1 AS INT)), (a, c) -> a + c))"
    )
    counted = hashed.select(
        F.col(id_col), F.size("__h").alias("__n"), ones.alias("__ones")
    )
    n = F.col("__n")
    bit_terms = [
        F.when((n > 0) & (F.col("__ones")[b] * 2 >= n), F.lit(int(2**b)))
        .otherwise(F.lit(0))
        for b in range(bits)
    ]
    sig = bit_terms[0]
    for t in bit_terms[1:]:
        sig = sig + t
    return counted.select(F.col(id_col), sig.cast("long").alias("simhash"))


def simhash_neardup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bits: int = 56,
    chunks: int = 4,
    max_hamming: int = 3,
) -> DataFrame:
    """SimHash near-duplicate pairs: docs whose `bits`-wide SimHash
    signatures differ in ≤ max_hamming bits. Output: id_a, id_b, hamming.

    Physical shape (the scale path): split each signature into `chunks`
    equal-width chunks; by pigeonhole, any pair within max_hamming <
    chunks must agree on ≥1 whole chunk, so an equi-join on
    (chunk_id, chunk_key) produces a COMPLETE candidate set — never an
    all-pairs cross join. Candidates then verify with one
    bit_count(xor) each. Requires max_hamming < chunks for
    completeness (asserted)."""
    sig = simhash(df, id_col, text_col, bits=bits)
    return signature_neardup(
        sig, id_col, "simhash", bits=bits, chunks=chunks, max_hamming=max_hamming
    )


def signature_neardup(
    sig: DataFrame,
    id_col: str,
    sig_col: str,
    bits: int,
    chunks: int = 4,
    max_hamming: int = 3,
) -> DataFrame:
    """Pigeonhole-banded near-dup pairs over ANY precomputed bitwise
    signature column (SimHash, image aHash/pHash, audio chromaprint
    bucket, …): pairs differing in ≤ max_hamming bits. The banding
    join (see simhash_neardup) is signature-agnostic — this is the
    shared scale path for every Hamming-space near-dup family."""
    assert max_hamming < chunks, "banding completeness needs max_hamming < chunks"
    assert bits % chunks == 0
    # Explicit two-column projection (not withColumnRenamed): if the
    # caller's frame already carries a column literally named "simhash"
    # next to sig_col, a rename would create duplicate names and the
    # F.col("simhash") references below would be ambiguous.
    #
    # Eager localCheckpoint, load-bearing for COST (r10 bench finding):
    # both self-join sides consume the signature subtree, and the
    # repartition barrier below does NOT reliably canonicalize into one
    # reused exchange (same ReuseExchange failure family as
    # operators/relational.global_row_number) — without a
    # materialization the full signature expression (56 popcount terms
    # over the token-hash array for SimHash; the decode path for
    # pHash) re-derives once per side per chunk: measured 13-19 s vs
    # ~1 s at sf0.1. The frame is two columns per doc — at 100 TB this
    # is the standard tiny persisted signature table, the same
    # materialize-then-band shape incr_dedup_accept uses.
    sig = sig.select(F.col(id_col), F.col(sig_col).alias("simhash")).localCheckpoint()
    w = bits // chunks
    mask = (1 << w) - 1
    chunk_structs = [
        F.struct(
            F.lit(c).alias("chunk_id"),
            F.shiftright(F.col("simhash"), c * w).bitwiseAND(F.lit(mask)).alias(
                "chunk_key"
            ),
        )
        for c in range(chunks)
    ]
    chunked = (
        sig.select(
            F.col(id_col),
            F.col("simhash"),
            F.explode(F.array(*chunk_structs)).alias("c"),
        )
        .select(id_col, "simhash", "c.chunk_id", "c.chunk_key")
        # Materialization barrier, load-bearing: without it Catalyst
        # collapses projections and re-derives the 56-term simhash
        # expression per JOINED row (millions of evals) instead of per
        # doc. The exchange pins signatures as concrete columns, and
        # hash-partitioning both join sides on the bucket key lets the
        # self-join reuse ONE exchange with no further shuffle.
        .repartition(F.col("chunk_id"), F.col("chunk_key"))
    )
    a = chunked.select(
        F.col(id_col).alias("id_a"),
        F.col("simhash").alias("sig_a"),
        "chunk_id",
        "chunk_key",
    )
    b = chunked.select(
        F.col(id_col).alias("id_b"),
        F.col("simhash").alias("sig_b"),
        F.col("chunk_id").alias("chunk_id_b"),
        F.col("chunk_key").alias("chunk_key_b"),
    )
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    # verify-then-dedup: the hamming check is one xor per joined row,
    # so apply it BEFORE the distinct — the dedup shuffle then moves
    # only surviving (id_a, id_b, hamming) triples, not every
    # chunk-collision copy with both signatures attached (order of
    # magnitude fewer, narrower rows).
    return (
        # merge hint: broadcasting would re-derive the signature subtree
        # on the build side; SMJ reuses the single bucket-partitioned
        # exchange for both sides (and is the only shape that survives
        # when the banded table outgrows broadcast at corpus scale).
        a.join(
            b.hint("merge"),
            (F.col("chunk_id") == F.col("chunk_id_b"))
            & (F.col("chunk_key") == F.col("chunk_key_b"))
            & (F.col("id_a") < F.col("id_b")),
        )
        .filter(hamming <= max_hamming)
        .select("id_a", "id_b", hamming.cast("long").alias("hamming"))
        .distinct()
    )


def ngram_jaccard_blocked(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_col: str,
    k: int = 2,
    threshold: float = 0.3,
) -> DataFrame:
    """n-gram Jaccard similarity for pairs WITHIN a blocking key (e.g.
    source) — bounded blocks only; the unbounded path is MinHash+LSH.

    Physical shape: explode to (block, shingle, id) and self-equi-join
    on (block, shingle) to COUNT intersections — pairs sharing zero
    shingles never materialize, versus the naive all-pairs
    array_intersect which is block² array scans. Then join per-doc
    sizes and filter on the Jaccard threshold. Pairs below threshold
    with ≥1 common shingle are pruned after one integer count, not an
    array comparison."""
    sh = df.select(
        F.col(block_col).alias("blk"), F.col(id_col), shingles(text_col, k).alias("sh")
    )
    sizes = sh.select("blk", F.col(id_col), F.size("sh").alias("n"))
    ex = sh.select("blk", F.col(id_col), F.explode("sh").alias("s"))
    a = ex.select(F.col("blk"), F.col(id_col).alias("id_a"), "s")
    b = ex.select(
        F.col("blk").alias("blk_b"), F.col(id_col).alias("id_b"), F.col("s").alias("s_b")
    )
    inter = (
        a.join(
            b,
            (F.col("blk") == F.col("blk_b"))
            & (F.col("s") == F.col("s_b"))
            & (F.col("id_a") < F.col("id_b")),
        )
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    na = sizes.select(F.col(id_col).alias("id_a"), F.col("n").alias("n_a"))
    nb = sizes.select(F.col(id_col).alias("id_b"), F.col("n").alias("n_b"))
    return (
        inter.join(na, "id_a")
        .join(nb, "id_b")
        .withColumn(
            "jaccard", F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter"))
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def ngram_containment_blocked(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_col: str,
    k: int = 2,
    threshold: float = 0.6,
) -> DataFrame:
    """DIRECTIONAL n-gram containment within a blocking key:
    containment(sub → super) = |sh(sub) ∩ sh(super)| / |sh(sub)| — the
    asymmetric companion to ngram_jaccard_blocked that catches
    SUBSET/SUPERSET near-dups Jaccard structurally under-scores (a doc
    embedded verbatim in a 10× longer one has Jaccard ≤ 0.1 but
    containment 1.0 — the quote-plus-commentary and boilerplate-wrap
    shapes a dedup pass actually meets). Same physical shape as the
    Jaccard operator: explode + equi-join on (block, shingle) counts
    intersections so zero-overlap pairs never materialize; each
    unordered pair then fans out to its two directions and filters on
    the smaller side's size. Output: id_sub, id_super, n_sub,
    containment."""
    sh = df.select(
        F.col(block_col).alias("blk"), F.col(id_col), shingles(text_col, k).alias("sh")
    )
    sizes = sh.select(F.col(id_col), F.size("sh").alias("n"))
    ex = sh.select("blk", F.col(id_col), F.explode("sh").alias("s"))
    a = ex.select(F.col("blk"), F.col(id_col).alias("id_a"), "s")
    b = ex.select(
        F.col("blk").alias("blk_b"), F.col(id_col).alias("id_b"), F.col("s").alias("s_b")
    )
    inter = (
        a.join(
            b,
            (F.col("blk") == F.col("blk_b"))
            & (F.col("s") == F.col("s_b"))
            & (F.col("id_a") < F.col("id_b")),
        )
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    both = inter.select("id_a", "id_b", "inter").unionByName(
        inter.select(
            F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b"), "inter"
        )
    )
    nsub = sizes.select(
        F.col(id_col).alias("id_sub"), F.col("n").alias("n_sub")
    )
    cont = (
        both.select(
            F.col("id_a").alias("id_sub"), F.col("id_b").alias("id_super"), "inter"
        )
        .join(nsub, "id_sub")
        .select(
            "id_sub",
            "id_super",
            F.col("n_sub").cast("long").alias("n_sub"),
            F.round(F.col("inter") * F.lit(1.0) / F.col("n_sub"), 6).alias(
                "containment"
            ),
        )
        .filter(F.col("containment") >= threshold)
    )
    return cont
