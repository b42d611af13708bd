#!/usr/bin/env python
"""Prove (or retract) heaps_law_vocab_growth's claimed AQE runtime
exchange reuse (VERDICT r15 "What's wrong" item 2 / "Next round"
item 5).

The r15 change hung occ_b and voc_b off ONE shared (b, tok)
pre-aggregate; the static formatted plan still shows the subtree
duplicated (pre-AQE Exchange count went UP 32 -> 40), and r15 shipped
no runtime artifact showing the dedup actually lands. This probe
executes the query and dumps the POST-EXECUTION adaptive plan
(isFinalPlan=true), where runtime stage reuse is visible as
ReusedExchange / reused ShuffleQueryStage nodes — the evidence the
docstring's "corpus touched ONCE" claim rides on.

Usage: python tools/probe_heaps_aqe.py [sf_dir] [out_txt] [out_json]
"""

from __future__ import annotations

import json
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_txt = (
        sys.argv[2]
        if len(sys.argv) > 2
        else str(
            Path(__file__).resolve().parent.parent
            / "plans"
            / "r16"
            / "heaps_law_vocab_growth_final_aqe.txt"
        )
    )
    out_json = (
        sys.argv[3]
        if len(sys.argv) > 3
        else str(
            Path(__file__).resolve().parent.parent
            / "probe_heaps_aqe_r16.json"
        )
    )
    from dataengineeringproject_spark import registry
    from dataengineeringproject_spark.session import get_spark

    spark = get_spark("probe_heaps_aqe")
    registry.prestage(spark, sf_dir)
    df = registry.queries()["heaps_law_vocab_growth"](spark, sf_dir)
    t0 = time.perf_counter()
    n = len(df.collect())
    sec = time.perf_counter() - t0
    final = df._jdf.queryExecution().executedPlan().toString()
    Path(out_txt).write_text(final)
    # evidence extraction: every materialized shuffle stage appears as
    # "ShuffleQueryStage <id>"; a reused one as "ShuffleQueryStage
    # <id>" under a ReusedExchange (or the same stage id appearing
    # twice). Count distinct vs total.
    stage_ids = re.findall(r"ShuffleQueryStage (\d+)", final)
    reused = final.count("ReusedExchange")
    # corpus-scan count in the FINAL plan: how many times documents
    # parquet is actually scanned at runtime
    n_doc_scans = len(
        re.findall(r"Scan parquet[^\n]*documents", final)
    )
    art = {
        "sf_dir": sf_dir,
        "collect_sec": round(sec, 2),
        "n_rows": n,
        "is_final_plan": "isFinalPlan=true" in final,
        "n_shuffle_stage_refs": len(stage_ids),
        "n_distinct_shuffle_stages": len(set(stage_ids)),
        "n_reused_exchange_nodes": reused,
        "n_documents_scans_in_final_plan": n_doc_scans,
        "plan_file": out_txt,
    }
    Path(out_json).write_text(json.dumps(art, indent=1) + "\n")
    print(json.dumps(art, indent=1))


if __name__ == "__main__":
    main()
