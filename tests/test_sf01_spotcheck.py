"""sf0.1 oracle spot-checks (VERDICT r3 item 6): the full differential
harness runs at sf0.001 (pytest) / sf0.01 (driver), but bench runs at
sf0.1 where AQE has 10x more rows to re-plan with — coalesced shuffle
partitions, demoted/promoted broadcasts, skew splits. These hash-check
a representative slice at sf0.1 so a plan that only materializes at
bench scale can't silently diverge: one broadcast-dim join chain, one
range-frame window, one LSH dedup (candidate-join heavy), and the two
r4 binned scale variants (their tiny-frame windows sit right where AQE
coalesces hardest).

Marked `sf01` (registered in conftest): deselect with -m "not sf01"
for a fast loop.
"""

from __future__ import annotations

import pytest

from tests._harness import compare

SF_BENCH = "/root/testdata/sf0.1"

SPOT = [
    "q5_region_revenue",
    "dedup_minhash_lsh",
    # (r12 rotation: window_range_rolling_7d and profile_table — green
    # here since r4/r5, plain shapes re-checked every sweep — rotate
    # out for the two r12-changed paths at the bottom)
    # r5 slice: the iterative trainer (per-round cache + TakeOrdered-1
    # selection meets AQE re-planning), the IVF-PQ composition (two
    # cached frames + broadcast chain), and the prefix-filter join
    # (candidate-join heavy like LSH)
    "bpe_train_k_merges",
    "ann_ivfpq_topk",
    "jaccard_prefix_filter_join",
    # r9 slice: the capped wedge enumeration (the per-middle fan-in
    # cap only bites at bench scale — sf0.001 never hits it), the LSH
    # kNN twin (bucket join + two windows under AQE), the composed
    # release gate (keeper join must reuse the dupkey partitioning),
    # the distributed global rank (range-partition boundaries move
    # with data), and the gram-keyed substring dedup (explode-heavy).
    "link_prediction_adamic_adar",
    "knn_classifier_eval_lsh",
    "corpus_release_gate_e2e",
    "zorder_file_skipping",
    "dedup_substring_exact",
    # r10 slice: the streaming admission loop (keeper-index state
    # crosses micro-batches; arrival-order keeper rule), the near-dup
    # gate (LSH pairs -> both-pass filter -> iterative CC, all under
    # AQE re-planning), the rewritten one-pass 56-bit SimHash, and the
    # budget sampler (two window families over one partitioning).
    "streaming_corpus_release_gate",
    "corpus_release_gate_neardup",
    "dedup_simhash",
    "training_mix_budget_sample",
    # r11 slice: the offset-proof TakeOrderedAndProject centroid init
    # under AQE (kmeans trainer is the shared producer for the whole
    # trained-ANN family), and the r10 hour-bucket session-overlap
    # rewrite whose blocking only fans out at bench scale.
    "kmeans_cluster_stats",
    "session_overlap_top_pairs",
    # r12 slice: the exact-kNN array-dot with the ragged-pair guard
    # (unhinted all-pairs join — AQE picks the broadcast side at bench
    # scale), and a NaN-sentinel assign_nearest consumer whose argmin
    # feeds a semantic join (centroid assignment under AQE).
    "knn_classifier_eval",
    "dedup_semantic",
]


@pytest.mark.sf01
@pytest.mark.parametrize("name", SPOT)
def test_query_matches_oracle_at_sf01(spark, name):
    ok, msg = compare(spark, name, SF_BENCH)
    assert ok, f"{name} at sf0.1: {msg}"
