"""Iterative graph operators: connected components over near-duplicate
pair edges — the step that turns pairwise dedup output (MinHash/LSH,
SimHash, embedding-cosine) into dedup CLUSTERS with one representative
per group (north star: LLM-data dedup at corpus scale).

Algorithm: distributed min-label propagation. Every node starts
labeled with itself; each round every node takes the min label in its
neighborhood (including itself); stop when no label changes. Rounds =
graph diameter (near-dup clusters are dense and shallow, so typically
2-4). Each round is one broadcast-or-shuffle join + one aggregation —
no driver-side graph, no collect; localCheckpoint truncates lineage so
plans don't grow with iterations (the standard Spark iterative-algo
hygiene; on a cluster use checkpoint() with an HDFS dir for fault
tolerance instead).
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class NonConvergenceError(RuntimeError):
    """Raised (strict mode) when label propagation exhausts max_iter
    with labels still changing — returned components would be split."""


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 25,
    strict: bool = False,
) -> DataFrame:
    """(id) nodes + undirected (id_a, id_b) edges → (id, component)
    where component = min node id reachable. Deterministic.

    Per round: component(n) = min(component(n), min over neighbors m of
    component(m)). Convergence checked with a 1-row count action. If
    labels are still changing after max_iter rounds (graph diameter >
    max_iter — e.g. a long chain of templated near-dup documents), the
    result is truncated: strict=True raises NonConvergenceError,
    strict=False emits a RuntimeWarning so callers can distinguish
    converged from truncated output (ADVICE r1)."""
    both = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).union(edges.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst")))
    both = both.distinct().localCheckpoint(eager=True)

    labels = nodes.select(
        F.col(id_col).alias("id"), F.col(id_col).alias("component")
    ).localCheckpoint(eager=True)

    for _ in range(max_iter):
        # label each edge endpoint with the source's current component,
        # then take min over incoming neighbor labels per node
        neighbor_min = (
            both.join(labels, both.src == labels.id)
            .groupBy(F.col("dst").alias("id2"))
            .agg(F.min("component").alias("nbr_component"))
        )
        updated = (
            labels.join(neighbor_min, labels.id == F.col("id2"), "left")
            .select(
                "id",
                F.least(
                    "component", F.coalesce("nbr_component", "component")
                ).alias("component"),
                (F.col("nbr_component") < F.col("component")).alias("__changed"),
            )
        ).localCheckpoint(eager=True)
        n_changed = updated.filter(F.col("__changed")).limit(1).count()
        labels = updated.drop("__changed")
        if n_changed == 0:
            break
    else:
        msg = (
            f"connected_components did not converge after {max_iter} "
            "iterations; component labels are truncated (long chains "
            "split into multiple clusters). Raise max_iter."
        )
        if strict:
            raise NonConvergenceError(msg)
        warnings.warn(msg, RuntimeWarning, stacklevel=2)
    return labels
