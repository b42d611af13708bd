"""Plan-shape assertions for the scale-safe *_approx / *_binned query
variants (VERDICT r3 item 1): the whole point of those queries is that
NO sort ever runs over the raw events table — the only full-data pass
is a map-side-combined hash aggregate, and every Sort/Window node's
input is the tiny aggregated bin frame. These tests pin that property
in the physical plan so a refactor can't silently reintroduce the
single-partition (or skewed-per-key) global sort the exact variants
pay.

Method: with AQE off the physical plan prints as one indented DFS
tree, so for every `Sort` line, each deeper `Scan parquet` line that
follows before indentation pops back must have an aggregate line
between them — the path Sort -> ... -> Scan passes through an
aggregate, i.e. the sort input is post-aggregation.
"""

from __future__ import annotations

import contextlib
import re

import pytest

from dataengineeringproject_spark import registry

from conftest import SF_SMOKE

_AGG_RE = re.compile(r"HashAggregate|SortAggregate|ObjectHashAggregate")
# A GLOBAL aggregate (empty grouping keys → single-row output). Only
# this shape shields a scan inside a BroadcastNestedLoopJoin child: a
# grouped aggregate still emits many rows, so raw x grouped-agg BNLJ is
# a genuine pair blowup (ADVICE r12 item 2).
_GLOBAL_AGG_RE = re.compile(
    r"(?:HashAggregate|SortAggregate|ObjectHashAggregate)\(keys=\[\]"
)


@contextlib.contextmanager
def _no_aqe(spark):
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)


def _depth(line: str) -> int:
    """Tree depth of a physical-plan line from its ASCII-art prefix.
    Nodes print as `<indent>+- Name` / `<indent>:- Name` (or bare root);
    two spaces of prefix per level."""
    m = re.match(r"^[\s:+|-]*", line)
    return len(m.group(0)) // 3


def _sorts_only_over_aggregates(plan: str) -> list[str]:
    """Return violations: Sort nodes that reach a parquet Scan without
    an aggregate on the path (DFS-order check, see module docstring)."""
    lines = [ln for ln in plan.splitlines() if ln.strip()]
    violations = []
    for i, ln in enumerate(lines):
        if "Sort " not in ln and not ln.strip().startswith("Sort"):
            continue
        d = _depth(ln)
        agg_seen = False
        for nxt in lines[i + 1 :]:
            nd = _depth(nxt)
            if nd <= d:
                break  # left the Sort's subtree
            if _AGG_RE.search(nxt):
                agg_seen = True
            if "Scan parquet" in nxt and not agg_seen:
                violations.append(ln.strip())
                break
    return violations


def _physical_plan(spark, name: str) -> str:
    q = registry.queries()[name]
    with _no_aqe(spark):
        df = q(spark, SF_SMOKE)
        return df._jdf.queryExecution().executedPlan().toString()


def test_histogram_equidepth_approx_no_raw_sort(spark):
    plan = _physical_plan(spark, "histogram_equidepth_approx")
    assert "ntile" not in plan, plan
    bad = _sorts_only_over_aggregates(plan)
    assert not bad, f"sort over un-aggregated scan: {bad}\n{plan}"


def test_drift_ks_binned_no_raw_sort(spark):
    plan = _physical_plan(spark, "drift_ks_binned")
    bad = _sorts_only_over_aggregates(plan)
    assert not bad, f"sort over un-aggregated scan: {bad}\n{plan}"


def test_exact_variants_do_sort_raw(spark):
    """Sanity check that the detector actually detects: the exact
    (test-scale oracle twin) variants DO sort the raw table, so they
    must trip the same predicate — otherwise the two tests above pass
    vacuously."""
    for name in ("histogram_equidepth_value", "drift_ks_value"):
        plan = _physical_plan(spark, name)
        assert _sorts_only_over_aggregates(plan), (
            f"{name} expected to sort the raw scan but detector saw none:\n{plan}"
        )


@pytest.mark.parametrize(
    "name",
    ["bm25_topk", "bpe_pair_counts", "cms_heavy_hitters", "event_path_top3"],
)
def test_topk_uses_take_ordered(spark, name):
    """These queries' docstrings claim top-k via orderBy+limit —
    TakeOrderedAndProject (per-partition heap + driver merge), never a
    global sort of the scored frame. Pin it."""
    plan = _physical_plan(spark, name)
    assert "TakeOrderedAndProject" in plan, plan


def test_diagnostic_scale_class_metadata():
    """The deliberately-super-linear variants carry machine-readable
    scale_class="diagnostic" registry metadata (VERDICT r4 item 2;
    fuzzy_recall_blocked added per VERDICT r5 item 3 — its truth side
    is an anchored all-pairs non-equi join); everything else defaults
    to "scalable". bench.py surfaces the diagnostic set in its JSON
    output. The ann_recall_* family is NOT here by design: its truth
    side is anchor-bounded O(|Q|·n) (see their docstrings).
    knn_classifier_eval joined in round 9 (VERDICT r8 item 2: its
    test x train dimension-keyed join is all-pairs; the scalable
    LSH-bucket twin is knn_classifier_eval_lsh).
    asof_join_cogroup joined in round 10 (first full-fleet bench: 11 s
    at sf0.1 — it is the deliberate cogrouped-applyInPandas exhibit of
    the Pandas-UDF family and crosses the JVM/Arrow boundary per user
    group; the scalable native twin is asof_join_purchase_click, same
    oracle)."""
    classes = registry.scale_classes()
    diagnostic = {n for n, c in classes.items() if c == "diagnostic"}
    assert diagnostic == {
        "histogram_equidepth_value",
        "drift_ks_value",
        "fuzzy_pairs_levenshtein",
        "fuzzy_recall_blocked",
        "knn_classifier_eval",
        "asof_join_cogroup",
    }
    assert set(classes) == set(registry.queries())
    assert set(classes.values()) <= {"scalable", "diagnostic"}


def test_sample_weighted_priority_takeordered_prune(spark):
    """sample_weighted_priority's docstring claims the rank<=k filter
    prunes the corpus to k rows BEFORE the single-partition rank
    window runs — the full corpus never sorts. Catalyst realizes this
    as LimitPushDownThroughWindow: the unpartitioned row_number window
    sits on top of TakeOrderedAndProject(limit=k) (per-partition heap
    + driver merge of k rows), so the only windowed frame is ≤k rows.
    Pin it: the prune node exists, and every Window/Sort subtree
    passes through it before reaching the parquet scan."""
    plan = _physical_plan(spark, "sample_weighted_priority")
    assert "TakeOrderedAndProject" in plan, plan
    lines = [ln for ln in plan.splitlines() if ln.strip()]
    for i, ln in enumerate(lines):
        s = ln.strip()
        is_node = ("Sort " in ln or s.startswith("Sort")
                   or s.startswith("Window") or "+- Window" in ln)
        if not is_node:
            continue
        d = _depth(ln)
        pruned = False
        for nxt in lines[i + 1 :]:
            if _depth(nxt) <= d:
                break
            if "TakeOrderedAndProject" in nxt or "WindowGroupLimit" in nxt:
                pruned = True
            if "Scan parquet" in nxt and not pruned:
                pytest.fail(f"Window/Sort reaches scan unpruned:\n{plan}")


@pytest.mark.parametrize(
    "name",
    [
        "drift_psi_value",
        "window_rank_family",
        "hll_distinct_users",
        "hll_daily_to_monthly_rollup",
        "hll_rolling_7d_distinct",
        "cms_heavy_hitters",
        "quality_unigram_nll",
        "ngram_novelty",
        "gap_fill_daily_interp",
        "split_leakage_ngram",
        "value_quantiles_binned",
    ],
)
def test_r4_sorts_only_over_aggregates(spark, name):
    """Every r4 query that windows or sorts does so over an aggregated
    (or spine-sized) frame — no Sort whose subtree reaches a parquet
    scan without an aggregate on the path. (event_path_top3 is exempt:
    its per-user lead() window legitimately sorts raw events on the
    fine-grained user key, the documented safe shape.)"""
    plan = _physical_plan(spark, name)
    bad = _sorts_only_over_aggregates(plan)
    assert not bad, f"{name}: sort over un-aggregated scan: {bad}\n{plan}"


@pytest.mark.parametrize(
    "name",
    [
        "quantiles_binned_rollup",
        "drift_js_binned",
        "hll_intersection_estimate",
        "topic_terms_ctfidf",
        "profile_table",
    ],
)
def test_r5_sorts_only_over_aggregates(spark, name):
    """r5 queries with windows/sorts keep them over aggregated frames —
    same contract as the r4 set."""
    plan = _physical_plan(spark, name)
    bad = _sorts_only_over_aggregates(plan)
    assert not bad, f"{name}: sort over un-aggregated scan: {bad}\n{plan}"


@pytest.mark.parametrize("name", ["tfidf_cosine_pairs"])
def test_r5_topk_uses_take_ordered(spark, name):
    """Global top-k via orderBy+limit must be TakeOrderedAndProject
    (per-partition heap + driver merge), never a full sort."""
    plan = _physical_plan(spark, name)
    assert "TakeOrderedAndProject" in plan, plan


@pytest.mark.parametrize("name", ["bpe_train_k_merges", "bpe_train_apply_e2e"])
def test_bpe_train_selection_stays_in_plan(spark, name):
    """The BPE trainer's per-round top-1 merge selection is claimed to
    stay IN the plan (TakeOrdered limit-1 + broadcast back, no driver
    collect): every training round contributes a TakeOrderedAndProject
    node, and the per-round cache() materializes (InMemoryTableScan)
    so lineage doesn't re-run 2^k times."""
    from dataengineeringproject_spark.queries.llm_text import (
        _BPE_TRAIN_ROUNDS,
    )

    plan = _physical_plan(spark, name)
    assert plan.count("TakeOrderedAndProject") >= _BPE_TRAIN_ROUNDS, plan
    assert "InMemoryTableScan" in plan, plan


def test_profile_table_single_scan(spark):
    """profile_table claims ONE corpus pass for the whole per-column
    scorecard (the naive profile costs |cols| scans). Catalyst does
    not share subtrees, so the single pass is realized by caching the
    |cols|x257 per-(col, bucket) aggregate: BOTH downstream consumers
    (scorecard re-aggregate and HLL finish) must read it through
    InMemoryTableScan — then the parquet scan executes once at
    runtime, whichever consumer materializes it first. (The printed
    plan still shows the cached child under each InMemoryTableScan,
    so counting 'Scan parquet' lines cannot pin this.)"""
    plan = _physical_plan(spark, "profile_table")
    assert plan.count("InMemoryTableScan") == 2, plan


@pytest.mark.parametrize(
    "name", ["copurchase_lift_pairs", "triangle_count_suppliers"]
)
def test_graph_topk_uses_take_ordered(spark, name):
    """The graph queries' edge/pair budgets are claimed as top-K heaps
    (TakeOrderedAndProject), never a global sort of the pair frame."""
    plan = _physical_plan(spark, name)
    assert "TakeOrderedAndProject" in plan, plan


def test_lateral_decorrelates_to_group_limit(spark):
    """sql_lateral_topk_orders' docstring claims Catalyst decorrelates
    the correlated LATERAL ORDER BY/LIMIT into the same WindowGroupLimit
    shape as the explicit window top-k — i.e. no per-row subquery node
    survives in the physical plan."""
    plan = _physical_plan(spark, "sql_lateral_topk_orders")
    assert "WindowGroupLimit" in plan, plan


@pytest.mark.parametrize(
    "name", ["trend_slope_daily", "seasonal_dow_anomaly", "trend_theil_sen"]
)
def test_trend_family_no_raw_sort(spark, name):
    """The regression/seasonal family runs entirely on the daily
    pre-aggregate: any Sort/Window in the plan must sit above an
    aggregate, never directly over the raw events scan."""
    plan = _physical_plan(spark, name)
    bad = _sorts_only_over_aggregates(plan)
    assert not bad, f"sort over un-aggregated scan: {bad}\n{plan}"


@pytest.mark.parametrize(
    "name",
    [
        "session_overlap_top_pairs",
        "user_behavior_outliers",
        "token_pmi_pairs",
        "copurchase_lift_pairs",
    ],
)
def test_continuation_topk_uses_take_ordered(spark, name):
    """The continuation queries' top-K heads are claimed as
    TakeOrderedAndProject heaps — pin it."""
    plan = _physical_plan(spark, name)
    assert "TakeOrderedAndProject" in plan, plan


def test_incremental_minhash_reads_staged_index(spark):
    """dedup_incremental_minhash's corpus side must be a parquet scan
    of the PERSISTED signature index (deps_sig_index_*), never a
    recomputation of corpus signatures from documents (VERDICT r5
    item 4): exactly the documents-scan count of the batch+verify
    stages plus one scan of the staged index dir."""
    plan = _physical_plan(spark, "dedup_incremental_minhash")
    assert "deps_sig_index_" in plan, plan


def test_jaccard_prefix_filter_posting_join(spark):
    """jaccard_prefix_filter_join is claimed AllPairs/PPJoin-style:
    candidates come from an equi-join of per-doc PREFIX posting lists
    — the physical plan must contain no nested-loop / cartesian
    product anywhere (the all-pairs shapes) (VERDICT r5 item 6)."""
    plan = _physical_plan(spark, "jaccard_prefix_filter_join")
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_jaccard_bucket_local_w_joins(spark):
    """r14: the rep-level posting table is bucketed by `w`
    (_staged_tokset_wb) precisely so the document-frequency aggregate
    and the prefix-filter self-join run bucket-local — the plan must
    show bucketed scans and ZERO exchanges keyed on bare `w` (a
    checkpoint or layout regression silently reintroduces the posting
    shuffle the 100x measurement paid 225 s for)."""
    plan = _physical_plan(spark, "jaccard_prefix_filter_join")
    assert "Bucketed: true" in plan, plan
    assert not re.search(r"Exchange hashpartitioning\(w#\d+,", plan), plan


def test_fuzzy_bucket_local_bandkey_window_and_join(spark):
    """r14: the staged band-key table is bucketed by (band, bkey)
    (_staged_fuz_keys) so the _FUZ_BUCKCAP window and the candidate
    self-join run on the bucketed scan — the plan must show bucketed
    scans and ZERO exchanges keyed on (band, bkey) in either order."""
    plan = _physical_plan(spark, "fuzzy_pairs_blocked")
    assert "Bucketed: true" in plan, plan
    assert not re.search(
        r"Exchange hashpartitioning\((?:band#\d+, bkey#\d+|bkey#\d+, band#\d+),",
        plan,
    ), plan


def test_ann_ivfpq_no_all_pairs(spark):
    """ann_ivfpq_topk prunes the corpus to probed IVF lists before the
    PQ/ADC ranking — the plan must stay equi-join only: no
    nested-loop/cartesian shape that would mean query x full-corpus
    scoring (VERDICT r5 item 6)."""
    plan = _physical_plan(spark, "ann_ivfpq_topk")
    assert "CartesianProduct" not in plan, plan


def test_mann_kendall_arrow_batched_over_daily_agg(spark):
    """trend_mann_kendall is the registered exemplar of the ONE
    Python-exec shape the fleet audit permits: Arrow-batched grouped
    applyInPandas (FlatMapGroupsInPandas), never row-at-a-time
    BatchEvalPython — and the grouped frame is the calendar-bounded
    daily pre-aggregate, so an aggregate sits between the Python node
    and the raw events scan."""
    plan = _physical_plan(spark, "trend_mann_kendall")
    assert "FlatMapGroupsInPandas" in plan, plan
    assert "BatchEvalPython" not in plan, plan
    lines = [ln for ln in plan.splitlines() if ln.strip()]
    for i, ln in enumerate(lines):
        if "FlatMapGroupsInPandas" not in ln:
            continue
        d = _depth(ln)
        agg_seen = False
        for nxt in lines[i + 1 :]:
            if _depth(nxt) <= d:
                break
            if _AGG_RE.search(nxt):
                agg_seen = True
            if "Scan parquet" in nxt:
                assert agg_seen, f"Python node fed by raw scan:\n{plan}"


def test_cdc_compaction_windows_delta_slice_only(spark):
    """cdc_merge_on_read_compaction reads the compacted base from the
    STAGED parquet snapshot (deps_cdc_base_) and runs its
    latest-per-key window over the delta slice only — the only events
    scans in the plan are the two delta-side reads (window + delta-key
    anti-join), never a window over full history."""
    plan = _physical_plan(spark, "cdc_merge_on_read_compaction")
    assert "deps_cdc_base_" in plan, plan
    n_event_scans = len(
        [ln for ln in plan.splitlines()
         if "Scan parquet" in ln and "events.parquet" in ln]
    )
    assert n_event_scans == 2, plan  # delta window + delta-keys anti-join


def test_bucketed_join_readback_no_scan_exchange(spark):
    """bucketed_join_readback's join must be the bucketed sort-merge
    join: both scans read the staged bucketed tables (deps_buck_) and
    NO Exchange sits between a scan and the SortMergeJoin — the only
    Exchange in the plan is the one the priority-level aggregate
    needs. The write-time shuffle is the one the query reuses."""
    plan = _physical_plan(spark, "bucketed_join_readback")
    assert "deps_buck_ol_" in plan, plan
    assert "SortMergeJoin" in plan, plan
    lines = [ln for ln in plan.splitlines() if ln.strip()]
    for i, ln in enumerate(lines):
        if "SortMergeJoin" not in ln:
            continue
        d = _depth(ln)
        for nxt in lines[i + 1 :]:
            if _depth(nxt) <= d:
                break
            assert "Exchange" not in nxt, f"bucketed join shuffles:\n{plan}"
    assert plan.count("Exchange") == 1, plan  # the groupBy only


def test_salted_skew_join_salts_fact_and_replicates_dim(spark):
    """salted_skew_join must exhibit the salted plan: the join keys
    include __salt (fact rows spread across 16 reducers per key), the
    dim side carries the replicate-explode (Generate), and the top-k
    is TakeOrderedAndProject — never a full sort of the joined fact."""
    plan = _physical_plan(spark, "salted_skew_join")
    assert "__salt" in plan, plan
    assert "SortMergeJoin" in plan, plan
    join_line = next(
        ln for ln in plan.splitlines() if "SortMergeJoin" in ln
    )
    assert "__salt" in join_line, join_line
    assert "Generate explode" in plan, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_frequent_itemsets_prunes_before_wedges(spark):
    """frequent_itemsets_triples must exhibit Apriori downward closure
    in the plan: the incidence scan is filtered through the frequent-
    singleton join BEFORE any pair/wedge join (at least three joins in
    the tree: f1 semi-filter, f2 candidate check, f2 closing-edge
    check), counts collapse in HashAggregates, and the final top-K is
    TakeOrderedAndProject — never a global sort of the triple frame."""
    plan = _physical_plan(spark, "frequent_itemsets_triples")
    assert "TakeOrderedAndProject" in plan, plan
    joins = len(re.findall(r"Join", plan))
    assert joins >= 3, f"expected Apriori's pruning joins, got {joins}\n{plan}"
    assert _AGG_RE.search(plan), plan


def test_pareto_front_grid_bounded_window(spark):
    """pareto_front_quality_length's running-max window must run over
    the aggregated score grid, never the raw documents scan, and the
    doc-id recovery join must broadcast the frontier."""
    plan = _physical_plan(spark, "pareto_front_quality_length")
    bad = _sorts_only_over_aggregates(plan)
    assert not bad, f"sort over un-aggregated scan: {bad}\n{plan}"
    assert "BroadcastHashJoin" in plan, plan


def test_inverted_index_broadcasts_dictionary(spark):
    """inverted_index_postings: the dictionary head is a
    TakeOrderedAndProject heap broadcast onto the token stream; the
    posting aggregate is a hash aggregate on (term, doc)."""
    plan = _physical_plan(spark, "inverted_index_postings")
    assert "TakeOrderedAndProject" in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert _AGG_RE.search(plan), plan


def test_label_separation_broadcasts_centroids(spark):
    """embedding_label_separation: the centroid and centroid-norm
    frames broadcast back onto the exploded corpus stream — the
    corpus-sized side must never shuffle into a SortMergeJoin."""
    plan = _physical_plan(spark, "embedding_label_separation")
    assert "BroadcastHashJoin" in plan, plan


def test_budget_curve_windows_grid_only(spark):
    """quality_token_budget_curve: the cumulative window runs on the
    score-grid aggregate, never the raw corpus scan."""
    plan = _physical_plan(spark, "quality_token_budget_curve")
    bad = _sorts_only_over_aggregates(plan)
    assert not bad, f"sort over un-aggregated scan: {bad}\n{plan}"


def test_dpp_join_prune_injects_dynamic_pruning(spark):
    """dpp_join_prune: the partitioned fact scan must carry a
    dynamicpruning PartitionFilter fed by the broadcast dim subquery —
    the runtime sibling of partition_prune_readback's static prune. If
    this disappears, the join silently reads every partition."""
    plan = _physical_plan(spark, "dpp_join_prune")
    assert "dynamicpruning" in plan, plan


def test_knn_lsh_twin_no_all_pairs(spark):
    """knn_classifier_eval_lsh is the scalable twin of the
    (diagnostic-tagged) exact kNN eval: candidates come from the LSH
    bucket equi-join, so the plan must contain no nested-loop /
    cartesian shape over RAW data — the all-pairs test x train
    scoring is exactly what the twin exists to avoid (VERDICT r8
    item 2). Nested-loop shapes are allowed ONLY as broadcast-scalar
    combines: for every BroadcastNestedLoopJoin, at most one child
    subtree may contain a parquet scan not shielded by a GLOBAL
    aggregate (`keys=[]`, single-row output) — a grouped aggregate
    emits many rows, so raw x grouped-agg would still be a pair
    blowup (ADVICE r12 item 2). That admits the n_test x stats scalar
    combine AND the r12 log-scaled cap (a 1-row count frame
    broadcast-cross-joined onto the ranked train frame: O(N)
    map-side, no pair blowup) while rejecting raw x raw AND
    raw x multi-row-grouped all-pairs scoring."""
    plan = _physical_plan(spark, "knn_classifier_eval_lsh")
    assert "CartesianProduct" not in plan, plan
    lines = [ln for ln in plan.splitlines() if ln.strip()]
    for i, ln in enumerate(lines):
        if "BroadcastNestedLoopJoin" not in ln:
            continue
        d = _depth(ln)
        # Split the BNLJ's subtree into immediate-child subtrees and
        # count how many contain a scan not covered by an aggregate on
        # its path from the child root.
        child_root_depth: int | None = None
        raw_children = 0
        agg_depths: list[int] = []
        in_child_has_raw = False
        for nxt in lines[i + 1:]:
            nd = _depth(nxt)
            if nd <= d:
                break
            if child_root_depth is None:
                child_root_depth = nd
            if nd == child_root_depth:
                raw_children += 1 if in_child_has_raw else 0
                in_child_has_raw = False
                agg_depths = []
            agg_depths = [a for a in agg_depths if a < nd]
            if _GLOBAL_AGG_RE.search(nxt):
                agg_depths.append(nd)
            if "Scan parquet" in nxt and not agg_depths:
                in_child_has_raw = True
        raw_children += 1 if in_child_has_raw else 0
        if raw_children > 1:
            raise AssertionError(
                f"nested-loop join with {raw_children} un-aggregated"
                f" sides (raw x raw all-pairs):\n{ln}\n{plan}"
            )


def test_zorder_no_unpartitioned_raw_window(spark):
    """zorder_file_skipping's file assignment runs through the
    distributed global_row_number (repartitionByRange + per-range
    row_number + broadcast prefix offsets — ADVICE r8): every Window
    in the plan must be partitioned (`windowspartitionspec` wouldn't
    print, but a single-partition window prints `Window [...], [...
    ASC NULLS FIRST]` with NO partition spec and, decisively, is fed
    by a global `Sort [... ] true` + single-partition Exchange over
    the raw scan). We pin the structural property: no
    `Exchange SinglePartition` feeding a Window over the raw table —
    the only SinglePartition exchanges allowed are over aggregated
    (post-HashAggregate) frames."""
    plan = _physical_plan(spark, "zorder_file_skipping")
    lines = [ln for ln in plan.splitlines() if ln.strip()]
    for i, ln in enumerate(lines):
        if "Exchange SinglePartition" not in ln:
            continue
        d = _depth(ln)
        agg_seen = False
        for nxt in lines[i + 1:]:
            nd = _depth(nxt)
            if nd <= d:
                break
            if _AGG_RE.search(nxt):
                agg_seen = True
            if "Scan parquet" in nxt and not agg_seen:
                raise AssertionError(
                    f"SinglePartition exchange over raw scan:\n{ln}\n{plan}"
                )


def test_release_gate_keeper_join_reuses_agg_partitioning(spark):
    """corpus_release_gate_e2e: PII counts + funnel reason are
    projections (no shuffle), the dup-keeper aggregate and its join
    share the dupkey partitioning, and nothing in the plan goes
    nested-loop / cartesian."""
    plan = _physical_plan(spark, "corpus_release_gate_e2e")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
