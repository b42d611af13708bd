#!/usr/bin/env python
"""Round-count + per-round wall breakdown for every query built on
operators/graph.connected_components (VERDICT r15 "Next round" items 4
and the dbscan_clusters row): before touching the operator, measure
how many min-label-propagation rounds each consumer actually runs and
where the wall goes (per-round checkpoint job vs convergence count vs
everything outside the loop). High round counts (graph diameter) are
the precondition for a shortcutting/pointer-jumping variant to pay;
2-3 rounds means the loop is already diameter-bound and the cost is
the surrounding pipeline.

Usage:
  python tools/probe_cc_rounds.py [sf_dir] [out_json] [--queries a,b]
  python tools/probe_cc_rounds.py --child SF_DIR QUERY   (internal)

One cold subprocess per query (fresh JVM), instrumented operator
monkeypatched over dataengineeringproject_spark.operators.graph.
"""

from __future__ import annotations

import json
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

QUERIES = [
    "dbscan_clusters",
    "dedup_clusters_minhash",
    "dedup_keep_best_quality",
    "corpus_release_gate_neardup",
    "multimodal_phash_clusters",
]


def _instrumented(trace: dict):
    """connected_components copy with per-round timings appended to
    trace; algorithm byte-identical to operators/graph.py."""
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
        t0 = time.perf_counter()
        both = edges.select(
            F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
        ).union(
            edges.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst"))
        )
        both = both.distinct().localCheckpoint(eager=True)
        trace.setdefault("edge_ckpt_sec", []).append(
            round(time.perf_counter() - t0, 3)
        )
        t0 = time.perf_counter()
        labels = nodes.select(
            F.col(id_col).alias("id"), F.col(id_col).alias("component")
        ).localCheckpoint(eager=True)
        trace.setdefault("label_ckpt_sec", []).append(
            round(time.perf_counter() - t0, 3)
        )
        rounds = []
        for _ in range(max_iter):
            t0 = time.perf_counter()
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
                    (F.col("nbr_component") < F.col("component")).alias(
                        "__changed"
                    ),
                )
            ).localCheckpoint(eager=True)
            t1 = time.perf_counter()
            n_changed = updated.filter(F.col("__changed")).limit(1).count()
            t2 = time.perf_counter()
            labels = updated.drop("__changed")
            rounds.append(
                {
                    "ckpt_sec": round(t1 - t0, 3),
                    "changed_count_sec": round(t2 - t1, 3),
                }
            )
            if n_changed == 0:
                break
        else:
            warnings.warn("did not converge", RuntimeWarning, stacklevel=2)
        trace.setdefault("rounds", []).append(rounds)
        return labels

    return connected_components


def child(sf_dir: str, name: str) -> None:
    from dataengineeringproject_spark import registry
    from dataengineeringproject_spark.operators import graph as G
    from dataengineeringproject_spark.session import get_spark

    trace: dict = {}
    G.connected_components = _instrumented(trace)
    spark = get_spark("probe_cc_rounds")
    registry.prestage(spark, sf_dir)
    qs = registry.queries()
    t0 = time.perf_counter()
    rows = qs[name](spark, sf_dir).collect()
    wall = time.perf_counter() - t0
    loop_sec = sum(
        r["ckpt_sec"] + r["changed_count_sec"]
        for rs in trace.get("rounds", [])
        for r in rs
    )
    print(
        "RESULT "
        + json.dumps(
            {
                "query": name,
                "wall_sec": round(wall, 2),
                "n_rows": len(rows),
                "n_cc_calls": len(trace.get("rounds", [])),
                "n_rounds": [len(rs) for rs in trace.get("rounds", [])],
                "cc_loop_sec": round(loop_sec, 2),
                "edge_ckpt_sec": trace.get("edge_ckpt_sec"),
                "label_ckpt_sec": trace.get("label_ckpt_sec"),
                "rounds": trace.get("rounds"),
            }
        )
    )


def main() -> None:
    if "--child" in sys.argv:
        i = sys.argv.index("--child")
        child(sys.argv[i + 1], sys.argv[i + 2])
        return
    args = sys.argv[1:]
    queries = list(QUERIES)
    if "--queries" in args:
        i = args.index("--queries")
        queries = args[i + 1].split(",")
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    out = args[1] if len(args) > 1 else "/tmp/probe_cc_rounds.json"
    rows = {}
    for name in queries:
        proc = subprocess.run(
            [sys.executable, __file__, "--child", sf_dir, name],
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
            rows[name] = {"error": (proc.stderr or proc.stdout)[-2000:]}
        else:
            rows[name] = json.loads(line)
        print(name, "->", json.dumps(rows[name])[:200], flush=True)
    art = {
        "method": "one cold subprocess per query; instrumented CC operator",
        "sf_dir": sf_dir,
        "per_query": rows,
    }
    Path(out).write_text(json.dumps(art, indent=1) + "\n")
    print("wrote", out)


if __name__ == "__main__":
    main()
