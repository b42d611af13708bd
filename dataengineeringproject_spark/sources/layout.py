"""Physical data layout for scale (SURVEY.md §4; north-star 100 TB
posture). Correct layout is the difference between a join that
shuffles 100 TB and one that shuffles nothing:

- **Bucketing** (`write_bucketed`): pre-hash-partition a table on its
  join/agg key into N buckets at WRITE time. Two tables bucketed on
  the same key with the same N join with ZERO exchanges — the shuffle
  happened once, at ingest, instead of once per query. This is the
  steady-state shape for fact-to-fact joins too big to broadcast
  (lineitem ⋈ orders at 100 TB).
- **Partitioned layout** (`write_partitioned`): directory-level
  partition columns; predicates on them prune entire directories at
  planning time (the scan never lists, opens, or reads a pruned
  partition's files).
- **Clustered files** (`write_clustered`): sort rows within files by a
  filter column so parquet row-group min/max statistics skip
  non-matching row groups — partition pruning's intra-file analog,
  for high-cardinality columns where directory partitioning would
  create a small-files problem.

All three are write-side investments that every later query amortizes;
they compose (partition by low-cardinality time/category, bucket by
join key, cluster by range-filter column).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    path: str | None = None,
    sort: bool = True,
) -> None:
    """Persist `df` as a bucketed (and bucket-sorted) parquet table.

    `sort=True` additionally sorts within each bucket file on the
    bucket columns, letting a downstream sort-merge join skip its sort
    as well as its shuffle — but Spark only trusts bucket-sortedness
    when each bucket holds exactly ONE file, so the frame is
    pre-repartitioned on the bucket columns (same murmur3 hash family
    as the bucket assignment) to get one writer task per bucket. At
    ingest scale that repartition also prevents the
    files-per-bucket = write-tasks × buckets small-files explosion.
    `path` makes it an external table (data at `path`, metadata in the
    session catalog)."""
    if sort:
        df = df.repartition(n_buckets, *[df[c] for c in bucket_cols])
    w = df.write.format("parquet").mode("overwrite").bucketBy(
        n_buckets, *bucket_cols
    )
    if sort:
        w = w.sortBy(*bucket_cols)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> str:
    """Directory-partitioned parquet layout: one subdirectory per
    distinct partition-column tuple. Keep partition columns
    low-cardinality (day, category, region) — each tuple is a
    directory, and millions of tiny directories are their own
    scale problem."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)
    return path


def write_clustered(
    df: DataFrame, path: str, cluster_cols: list[str], mode: str = "overwrite"
) -> str:
    """Sort within partitions by `cluster_cols` before writing, so each
    parquet file's row groups carry tight min/max statistics on those
    columns and range predicates skip whole row groups at scan time."""
    df.sortWithinPartitions(*cluster_cols).write.mode(mode).parquet(path)
    return path


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def morton2(a, b, bits: int = 16):
    """Z-order (Morton) interleave of two non-negative int columns
    (`bits` low bits each → one 2·bits-bit key). Sorting by this key
    clusters rows so that BOTH dimensions' parquet row-group min/max
    ranges stay tight — a single-column sort gives perfect stats on one
    dimension and useless stats on every other; Morton order trades a
    little of each for locality on all. This is the OPTIMIZE ZORDER
    primitive of lakehouse table formats, as a plain column expression:
    pure bit arithmetic, codegen'd, no shuffle beyond the final sort.
    """
    from pyspark.sql import functions as F

    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    key = F.lit(0).cast("long")
    for i in range(bits):
        abit = F.shiftright(a.cast("long"), i).bitwiseAND(F.lit(1))
        bbit = F.shiftright(b.cast("long"), i).bitwiseAND(F.lit(1))
        key = (
            key.bitwiseOR(F.shiftleft(abit, 2 * i))
            .bitwiseOR(F.shiftleft(bbit, 2 * i + 1))
        )
    return key


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    bits: int = 16,
    mode: str = "overwrite",
) -> str:
    """Cluster files by the 2-D Morton key of (col_a, col_b) before
    writing — multi-dimensional row-group skipping for workloads that
    range-filter on either (or both) of two columns. Columns must be
    non-negative ints fitting in `bits` bits (pre-bucket them with
    `width_bucket`/`%` otherwise)."""
    z = morton2(col_a, col_b, bits)
    df.sortWithinPartitions(z).write.mode(mode).parquet(path)
    return path


def vacuum_versions(
    root: str, keep: int = 2, current: str | None = None
) -> list[str]:
    """Retention for copy-on-write versioned tables (the v<N> snapshot
    directories the streaming CDC upsert commits): delete all but the
    newest `keep` versions under `root`, ALWAYS retaining `current`
    (the committed pointer) regardless of its position — vacuuming the
    live version is the one unrecoverable mistake, so it is
    structurally impossible here.

    Without retention a copy-on-write table's storage grows by one
    full snapshot per commit forever; with it, storage is bounded at
    `keep` snapshots (current + grace copies for in-flight readers —
    the same contract as Delta VACUUM / Iceberg expire_snapshots,
    reduced to its filesystem core). Versions are ordered by their
    integer suffix (commit order), never by mtime — clock skew on a
    distributed filesystem must not reorder retention. Returns the
    removed directory paths (the audit trail a table-maintenance job
    logs)."""
    import os
    import re
    import shutil

    if keep < 1:
        raise ValueError(f"keep must be >= 1, got {keep}")
    vers = []
    for name in os.listdir(root):
        m = re.fullmatch(r"v(\d+)", name)
        if m and os.path.isdir(os.path.join(root, name)):
            vers.append((int(m.group(1)), os.path.join(root, name)))
    vers.sort()
    survivors = {p for _, p in vers[-keep:]}
    if current is not None:
        survivors.add(os.path.normpath(current))
    removed = []
    for _, p in vers:
        if os.path.normpath(p) not in survivors:
            shutil.rmtree(p)
            removed.append(p)
    return removed
