#!/usr/bin/env python
"""Measured verdict on pointer-jumping (label compression) in
operators/graph.connected_components (r16; guide §1.2 "the distributed
algorithm").

Measured precondition (probe_cc_rounds_r16.json): dbscan_clusters'
cell-adjacency graph has diameter ~17 — min-label propagation runs 17
rounds, 7.3 s of the query's 12.6 s cold wall, 2 Spark jobs per round
(eager checkpoint + convergence count) on tiny frames: the loop is
round-count-bound, not data-bound. Every other CC consumer (dedup LSH
clusters, release gate, multimodal phash) converges in 2 rounds.

Candidate: after each neighbor-min step, apply one label-compression
step comp2(n) = comp1(comp1(n)) (Shiloach-Vishkin shortcutting, the
star-contraction move of Kiveris et al.'s MapReduce CC) in the SAME
lazy plan before the round's checkpoint — label distance to the
component minimum roughly halves per round, so rounds drop from
O(diameter) to O(log diameter). Fixpoint unchanged (labels only
decrease, stay within the component, and the unique fixpoint of both
operators is the per-component min id — pinned by
tests/test_r16_opt.py on a 64-node chain).

Cost: one extra |V|-row self-join per round — at the 2-round consumers
this must stay inside noise for adoption.

Usage: python tools/exp_cc_shortcut.py [sf_dir] [out_json] [reps]
       python tools/exp_cc_shortcut.py --child {base|shortcut} SF_DIR QUERY
"""

from __future__ import annotations

import hashlib
import json
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

QUERIES = ["dbscan_clusters", "dedup_clusters_minhash"]
VARIANTS_TO_RUN = ("base", "committed")


def _base_cc():
    """The r15-committed operator (plain min-label propagation, no
    compression, no stats reset) — verbatim copy kept so the A/B stays
    reproducible after operators/graph.py adopts the winner."""
    import warnings

    from pyspark.sql import functions as F

    def connected_components(
        nodes,
        edges,
        id_col="id",
        src_col="id_a",
        dst_col="id_b",
        max_iter=25,
        strict=False,
    ):
        both = edges.select(
            F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
        ).union(
            edges.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst"))
        )
        both = both.distinct().localCheckpoint(eager=True)
        labels = nodes.select(
            F.col(id_col).alias("id"), F.col(id_col).alias("component")
        ).localCheckpoint(eager=True)
        for _ in range(max_iter):
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
            msg = "connected_components did not converge"
            if strict:
                raise RuntimeError(msg)
            warnings.warn(msg, RuntimeWarning, stacklevel=2)
        return labels

    return connected_components


def _shortcut_cc():
    """connected_components with one label-compression step per round;
    same signature/semantics as operators/graph.connected_components."""
    import warnings

    from pyspark.sql import functions as F

    def connected_components(
        nodes,
        edges,
        id_col="id",
        src_col="id_a",
        dst_col="id_b",
        max_iter=25,
        strict=False,
    ):
        both = edges.select(
            F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
        ).union(
            edges.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst"))
        )
        both = both.distinct().localCheckpoint(eager=True)
        labels = nodes.select(
            F.col(id_col).alias("id"), F.col(id_col).alias("component")
        ).localCheckpoint(eager=True)
        for _ in range(max_iter):
            neighbor_min = (
                both.join(labels, both.src == labels.id)
                .groupBy(F.col("dst").alias("id2"))
                .agg(F.min("component").alias("nbr_component"))
            )
            stepped = labels.join(
                neighbor_min, labels.id == F.col("id2"), "left"
            ).select(
                "id",
                F.least(
                    "component", F.coalesce("nbr_component", "component")
                ).alias("comp1"),
                F.col("component").alias("orig"),
            )
            lut = stepped.select(
                F.col("id").alias("cid"), F.col("comp1").alias("cc")
            )
            updated = (
                stepped.join(lut, stepped.comp1 == lut.cid, "left")
                .select(
                    "id",
                    F.coalesce("cc", "comp1").alias("component"),
                    (F.coalesce("cc", "comp1") < F.col("orig")).alias(
                        "__changed"
                    ),
                )
                .localCheckpoint(eager=True)
            )
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
                raise RuntimeError(msg)
            warnings.warn(msg, RuntimeWarning, stacklevel=2)
        return labels

    return connected_components


def _stale_shortcut_cc(trace: dict, jumps: int = 1):
    """Label compression THROUGH THE CHECKPOINTED PREVIOUS labels
    (comp2(n) = min(comp1(n), labels_prev[comp1(n)])), gated to round
    >= 2: no un-checkpointed subtree is referenced twice (the self-join
    variant recomputes the neighbor-min join once per reference), the
    lookup side is a materialized RDD, and diameter-2 consumers pay
    nothing in their first round. Stale jumps still contract distance
    geometrically (asynchronous pointer jumping)."""
    import warnings

    from pyspark.sql import functions as F

    def connected_components(
        nodes,
        edges,
        id_col="id",
        src_col="id_a",
        dst_col="id_b",
        max_iter=25,
        strict=False,
    ):
        both = edges.select(
            F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
        ).union(
            edges.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst"))
        )
        both = both.distinct().localCheckpoint(eager=True)
        labels = nodes.select(
            F.col(id_col).alias("id"), F.col(id_col).alias("component")
        ).localCheckpoint(eager=True)
        n_rounds = 0
        for i in range(max_iter):
            neighbor_min = (
                both.join(labels, both.src == labels.id)
                .groupBy(F.col("dst").alias("id2"))
                .agg(F.min("component").alias("nbr_component"))
            )
            stepped = labels.join(
                neighbor_min, labels.id == F.col("id2"), "left"
            ).select(
                "id",
                F.least(
                    "component", F.coalesce("nbr_component", "component")
                ).alias("comp1"),
                F.col("component").alias("orig"),
            )
            if i >= 1:
                for _j in range(jumps):
                    lut = labels.select(
                        F.col("id").alias("cid"), F.col("component").alias("cc")
                    )
                    stepped = stepped.join(
                        lut, stepped.comp1 == lut.cid, "left"
                    ).select(
                        "id",
                        F.least("comp1", F.coalesce("cc", "comp1")).alias(
                            "comp1"
                        ),
                        "orig",
                    )
            updated = stepped.select(
                "id",
                F.col("comp1").alias("component"),
                (F.col("comp1") < F.col("orig")).alias("__changed"),
            ).localCheckpoint(eager=True)
            n_changed = updated.filter(F.col("__changed")).limit(1).count()
            labels = updated.drop("__changed")
            n_rounds = i + 1
            if n_changed == 0:
                break
        else:
            msg = (
                f"connected_components did not converge after {max_iter} "
                "iterations"
            )
            if strict:
                raise RuntimeError(msg)
            warnings.warn(msg, RuntimeWarning, stacklevel=2)
        trace["n_rounds"] = n_rounds
        return labels

    return connected_components


def child(variant: str, sf_dir: str, name: str) -> None:
    from dataengineeringproject_spark import registry
    from dataengineeringproject_spark.operators import graph as G
    from dataengineeringproject_spark.session import get_spark

    trace: dict = {}
    if variant == "base":
        G.connected_components = _base_cc()
    elif variant == "shortcut":
        G.connected_components = _shortcut_cc()
    elif variant == "sc_stale":
        G.connected_components = _stale_shortcut_cc(trace)
    elif variant == "sc_stale3":
        G.connected_components = _stale_shortcut_cc(trace, jumps=3)
    # variant "committed": production operator as-is
    spark = get_spark("exp_cc_shortcut")
    registry.prestage(spark, sf_dir)
    t0 = time.perf_counter()
    rows = registry.queries()[name](spark, sf_dir).collect()
    sec = time.perf_counter() - t0
    payload = "\n".join(
        "|".join(str(v) for v in r) for r in sorted(tuple(r) for r in rows)
    )
    print(
        "RESULT "
        + json.dumps(
            {
                "variant": variant,
                "query": name,
                "sec": round(sec, 2),
                "n_rows": len(rows),
                "hash": hashlib.md5(payload.encode()).hexdigest(),
                **trace,
            }
        )
    )


def main() -> None:
    if "--child" in sys.argv:
        i = sys.argv.index("--child")
        child(sys.argv[i + 1], sys.argv[i + 2], sys.argv[i + 3])
        return
    args = [a for a in sys.argv[1:]]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    out = args[1] if len(args) > 1 else "/tmp/exp_cc_shortcut.json"
    reps = int(args[2]) if len(args) > 2 else 3
    runs = []
    for name in QUERIES:
        for rep in range(reps):
            for variant in VARIANTS_TO_RUN:
                proc = subprocess.run(
                    [sys.executable, __file__, "--child", variant, sf_dir, name],
                    capture_output=True,
                    text=True,
                    cwd=str(Path(__file__).resolve().parent.parent),
                )
                line = next(
                    (
                        ln[len("RESULT "):]
                        for ln in proc.stdout.splitlines()
                        if ln.startswith("RESULT ")
                    ),
                    None,
                )
                if proc.returncode != 0 or line is None:
                    print(f"{name} rep{rep} {variant}: CHILD FAILED")
                    print((proc.stderr or proc.stdout)[-3000:])
                    return
                rec = json.loads(line)
                rec["rep"] = rep
                runs.append(rec)
                print(
                    f"{name} rep{rep} {variant}: {rec['sec']} s "
                    f"hash={rec['hash'][:10]}",
                    flush=True,
                )
    by_q = {}
    for r in runs:
        by_q.setdefault(r["query"], set()).add(r["hash"])
    art = {
        "method": "cold subprocess per measurement, interleaved variants",
        "sf_dir": sf_dir,
        "output_identical_per_query": {q: len(h) == 1 for q, h in by_q.items()},
        "runs": runs,
    }
    Path(out).write_text(json.dumps(art, indent=1) + "\n")
    print("wrote", out)


if __name__ == "__main__":
    main()
