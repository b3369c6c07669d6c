"""Physical-plan quality gates.

Correctness tests say the answer is right; these say the PLAN is the
one that survives a 100x scale-up: filters and projections reach the
parquet scan, small dimensions broadcast, aggregations combine
map-side before shuffling, and top-k never globally sorts.
"""

import pytest

import __spark_entry__ as entry

from tests.conftest import SF_DIR


def plan_of(spark, name: str, execute: bool = False) -> str:
    df = entry.queries()[name](spark, SF_DIR)
    if execute:
        # AQE reports isFinalPlan=false (no codegen annotations) until
        # THIS query execution runs (count() would spawn a fresh one)
        df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_and_projection_pushdown(spark):
    plan = plan_of(spark, "q02_filter_pushdown")
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan
    # pruned scan: only the 4 projected + 2 filter columns are read
    scan = next(l for l in plan.splitlines() if "FileScan parquet" in l)
    assert "l_orderkey" in scan and "l_comment" not in scan and "l_tax" not in scan


def test_dimension_joins_broadcast(spark):
    plan = plan_of(spark, "q05_local_supplier_volume")
    # every join in the 6-table tree is hash-based; none degrade to
    # nested-loop, and nation/region ride broadcasts
    assert plan.count("BroadcastHashJoin") >= 4
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_aggregate_is_partial_then_final(spark):
    plan = plan_of(spark, "q01_pricing_summary")
    assert "partial_sum" in plan  # map-side combine before the shuffle
    assert plan.count("HashAggregate") >= 2


def test_topk_plans_as_take_ordered(spark):
    plan = plan_of(spark, "q03_shipping_priority")
    assert "TakeOrderedAndProject" in plan  # no global Sort for LIMIT k
    assert "\nSort " not in plan


def test_semi_join_for_exists(spark):
    plan = plan_of(spark, "q04_order_priority")
    assert "LeftSemi" in plan


def test_anti_join_for_not_exists(spark):
    plan = plan_of(spark, "q07_customers_without_orders")
    assert "LeftAnti" in plan


def test_interval_join_is_hash_not_nested_loop(spark):
    # equi key keeps the range predicate inside a hash join
    plan = plan_of(spark, "q27_interval_join")
    assert "Join" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_asof_join_single_shuffle_no_join_node(spark):
    # the as-of is union+window: no join operator, exactly one exchange
    # over the key columns
    plan = plan_of(spark, "q26_asof_join")
    assert "Join" not in plan.replace("RunningWindowFunction", "")
    assert "WindowExec" in plan or "Window" in plan


@pytest.mark.parametrize(
    "name",
    ["q01_pricing_summary", "q05_local_supplier_volume", "q30_token_stats"],
)
def test_whole_stage_codegen_active(spark, name):
    plan = plan_of(spark, name, execute=True)
    # codegen'd operators carry the "*(stageId)" marker in the final plan
    assert "WholeStageCodegen" in plan or "*(1)" in plan


def test_q87_decorrelates_to_semi_and_anti(spark):
    plan = plan_of(spark, "q87_waiting_suppliers")
    assert "LeftSemi" in plan and "LeftAnti" in plan
    assert "TakeOrderedAndProject" in plan  # LIMIT 20 never global-sorts
    assert "CartesianProduct" not in plan


def test_q88_dims_broadcast_filter_pushed(spark):
    plan = plan_of(spark, "q88_nation_year_revenue")
    assert plan.count("BroadcastHashJoin") >= 3
    # the p_name LIKE filter reaches the part scan, not post-join
    assert "PushedFilters" in plan and "StringContains(p_name,red)" in plan


def test_q48_sample_is_scan_plus_filter_only(spark):
    plan = plan_of(spark, "q48_stratified_sample")
    assert "Exchange" not in plan  # hash-gate sampling must not shuffle
    assert "FileScan parquet" in plan


def test_q57_compaction_is_single_aggregate(spark):
    plan = plan_of(spark, "q57_latest_per_key")
    # arg-max compaction: partial + final agg, no window operator
    assert plan.count("HashAggregate") >= 2 or "SortAggregate" in plan
    assert "Window" not in plan


def test_q78_scalar_count_broadcast(spark):
    plan = plan_of(spark, "q78_term_rarity")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_q91_fuzzy_pairs_broadcast_with_length_prune(spark):
    plan = plan_of(spark, "q91_fuzzy_name_pairs")
    # distinct-names side broadcasts; in the join condition the cheap
    # ordering + length prunes precede the expensive edit distance, so
    # conjunct short-circuiting skips levenshtein for most pairs
    assert "BroadcastNestedLoopJoin" in plan
    join_line = next(
        l for l in plan.splitlines() if "BroadcastNestedLoopJoin" in l
    )
    assert join_line.index("length") < join_line.index("levenshtein")


def test_q92_scd2_windows_share_one_exchange(spark):
    plan = plan_of(spark, "q92_scd2_intervals")
    # lag (change detect) and lead (interval close) partition the same
    # way: one shuffle, the second window reuses the distribution
    assert plan.count("Exchange hashpartitioning(user_id") == 1
    assert plan.count("Window") >= 2


def test_q94_rollup_merges_sketches_not_rows(spark):
    plan = plan_of(spark, "q94_hll_union_rollup")
    # stage-2 aggregates union sketch BUFFERS; customer is scanned for
    # the sketch build + the exact-side check, never a third time
    assert "hll_union_agg" in plan
    assert plan.count("FileScan parquet") == 2


def test_q96_chunking_is_shuffle_free(spark):
    plan = plan_of(spark, "q96_doc_chunking")
    # per-row explode: the only exchange is the fan-out round-robin;
    # no hash shuffle anywhere
    assert plan.count("Exchange hashpartitioning") == 0


def test_q97_packing_agg_reuses_window_partitioning(spark):
    plan = plan_of(spark, "q97_sequence_packing")
    # the cumsum window partitions by source; the (source, seq_id)
    # aggregate is satisfied by that distribution — exactly one shuffle
    assert plan.count("Exchange hashpartitioning") == 1


def test_q103_bloom_probe_filters_before_join(spark):
    plan = plan_of(spark, "q103_bloom_prune_join")
    # the probe (xxhash64 bit tests) must run as a Filter on the fact
    # scan side, and the final dim join must broadcast
    assert "__bf_probe" not in plan  # no leaked helper columns
    assert "xxhash64" in plan
    assert "BroadcastHashJoin" in plan
    # orders scan reads only the three needed columns
    scan = next(l for l in plan.splitlines()
                if "FileScan parquet" in l and "orders" in l)
    assert "o_orderstatus" not in scan and "o_orderdate" not in scan


def test_q104_range_join_is_hash_join(spark):
    plan = plan_of(spark, "q104_pure_range_join")
    assert "CartesianProduct" not in plan
    # the bin equi-key gives Catalyst a hash-joinable shape; with the
    # interval side tiny it broadcasts — never a nested loop over rows
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan


def test_q105_ids_never_use_global_window(spark):
    plan = plan_of(spark, "q105_sequential_ids")
    # the whole point: no Window node anywhere (a global-ORDER-BY
    # row_number would single-partition); ids ride range partitioning
    # + an Arrow-batched map
    assert "Window" not in plan
    assert "MapInPandas" in plan


def test_q106_zorder_key_is_pure_projection(spark):
    plan = plan_of(spark, "q106_zorder_key")
    # bit interleave = scan + project, nothing else
    assert "Exchange" not in plan
    assert plan.count("FileScan parquet") == 1


def test_q107_checksum_single_agg_pass(spark):
    plan = plan_of(spark, "q107_table_checksum")
    # partial + final hash aggregate over one scan; one shuffle total
    assert plan.count("FileScan parquet") == 1
    assert plan.count("Exchange hashpartitioning") == 1


def test_q111_decontamination_broadcasts_benchmark(spark):
    plan = plan_of(spark, "q111_decontamination")
    # the benchmark n-gram side must broadcast (eval sets are tiny next
    # to a training corpus) and only 64-bit hash prefixes ever shuffle
    assert "BroadcastHashJoin" in plan
    # documents scan never reads the unused columns
    scan = next(l for l in plan.splitlines()
                if "FileScan parquet" in l and "documents" in l)
    assert "lang" not in scan and "source" not in scan


def test_q112_bm25_single_pass_stats_broadcast(spark):
    plan = plan_of(spark, "q112_bm25_topk")
    # corpus stats (one row) must broadcast back over the per-doc side,
    # and top-k must be TakeOrderedAndProject, not a global Sort
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "TakeOrderedAndProject" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_q113_corr_is_one_partial_agg_pass(spark):
    plan = plan_of(spark, "q113_corr_stats")
    # single aggregation over lineitem: map-side partial + final, one
    # shuffle keyed on l_returnflag, no joins, no second scan
    assert plan.count("FileScan parquet") == 1
    assert "partial" in plan  # HashAggregate(..., functions=[partial_...])
    assert "Join" not in plan


def test_q117_ohlc_single_sort(spark):
    plan = plan_of(spark, "q117_ohlc_bars")
    # rank + partition count share one window sort; close-pick via
    # rn = cnt instead of a second opposite-order sort
    assert plan.count("Sort ") == 1
    assert "partial_max" in plan  # final agg still combines map-side


def test_q121_recursion_plans_as_union_loop(spark):
    plan = plan_of(spark, "q121_recursive_hierarchy")
    assert "UnionLoop" in plan
    assert "partial_max" in plan or "partial_sum" in plan


def test_q122_lateral_decorrelates_to_hash_join(spark):
    plan = plan_of(spark, "q122_lateral_topn")
    # correlated LATERAL LIMIT must become a ranked hash join, never a
    # per-customer nested loop
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan


def _unique_exchanges(plan: str, key: str) -> int:
    # AQE's toString prints the Final Plan followed by the Initial
    # Plan; count exchanges in the final section only
    final = plan.split("== Initial Plan ==")[0]
    return sum(
        1
        for line in final.splitlines()
        if "Exchange hashpartitioning(" + key in line and "Reused" not in line
    )


def test_q124_funnel_single_user_exchange(spark):
    # three stacked step-window mins + the per-user reduction must all
    # ride ONE user_id exchange — the single-shuffle funnel shape
    plan = plan_of(spark, "q124_funnel_conversion", execute=True)
    assert _unique_exchanges(plan, "user_id") == 1
    assert plan.count("Window") >= 3


def test_q125_retention_partial_aggs(spark):
    plan = plan_of(spark, "q125_retention_cohorts", execute=True)
    # first-event agg and the cohort-cell rollup both combine map-side
    assert "partial_min" in plan
    assert "CartesianProduct" not in plan


def test_q126_repetition_no_python(spark):
    plan = plan_of(spark, "q126_repetition_signals", execute=True)
    # pure built-in pipeline: no Python evaluation anywhere
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # per-doc repetition is computed IN-ROW (sorted-gram run lengths):
    # the old (doc_id, gram) groupBy pair — and with it every
    # hash-partitioned exchange — is gone; the only allowed exchange is
    # fan_out's round-robin spread of the document scan
    assert "Exchange hashpartitioning" not in plan


def test_q127_semantic_dedup_single_cluster_exchange(spark):
    plan = plan_of(spark, "q127_semantic_dedup", execute=True)
    # r10: assignment is ONE Arrow stage (no centroid crossJoin, no
    # per-id aggregate); r11: the pair verdict STREAMS each cluster in
    # id order through a second Arrow stage (bounded memory — no
    # grouped pandas pass materializing whole clusters). The only hash
    # exchange left is the (id, unit vec) spread by cluster id; no
    # join of any kind survives in the plan.
    # (an executed AQE plan prints "== Final Plan ==" AND
    # "== Initial Plan ==" — count exchanges in the final section only)
    final = plan.split("== Initial Plan ==")[0]
    assert "CartesianProduct" not in plan
    assert "Join" not in plan
    assert plan.count("MapInArrow") >= 2  # assignment + verdict stream
    assert "FlatMapGroupsInPandas" not in plan
    assert final.count("Exchange hashpartitioning") == 1


def test_q128_state_merge_two_codegen_agg_levels(spark):
    plan = plan_of(spark, "q128_state_merge_rollup", execute=True)
    # both levels are hash aggregates with map-side combine; decimal
    # sums keep the merge exact
    assert "partial_sum" in plan
    assert plan.count("HashAggregate") >= 4


def test_q131_cap_single_exchange_pruned_scan(spark):
    # the domain cap is ONE shuffle on the group key, and the scan must
    # not drag the text column along (3-column projection pushed down)
    plan = plan_of(spark, "q131_source_cap", execute=True)
    assert _unique_exchanges(plan, "source") == 1
    scan = next(l for l in plan.splitlines() if "FileScan parquet" in l)
    assert "text" not in scan and "n_chars" in scan


def test_q132_compaction_agg_reuses_window_exchange(spark):
    # HashPartitioning(source) satisfies the (source, bin) grouping's
    # clustered distribution, so the cumulative-size window and the bin
    # rollup share one exchange
    plan = plan_of(spark, "q132_compaction_plan", execute=True)
    assert _unique_exchanges(plan, "source") == 1
    assert "partial_count" in plan or "partial_sum" in plan


def test_q133_split_is_projection_plus_agg(spark):
    # hash-bucket split: no Python, no join, map-side combine
    plan = plan_of(spark, "q133_dataset_split", execute=True)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Join" not in plan
    assert "partial_count" in plan


def test_q134_pagerank_no_cartesian_dims_broadcast(spark):
    # the trade-graph build broadcasts customer/supplier; no iteration
    # may degrade to a nested loop
    plan = plan_of(spark, "q134_pagerank", execute=True)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_q135_skew_profile_topk_is_take_ordered(spark):
    # the heavy-hitter cut is per-partition heaps + k-row merge; the
    # ranking window then only ever sees top_k rows
    plan = plan_of(spark, "q135_key_skew_profile", execute=True)
    assert "TakeOrderedAndProject" in plan


def test_q136_triangles_no_cartesian(spark):
    # wedge + closure joins must stay hash/merge equi-joins
    plan = plan_of(spark, "q136_triangle_count", execute=True)
    assert "CartesianProduct" not in plan
    # the closure probe is a LEFT join against the UNIQUE oriented
    # edge set (row-preserving; wedge + triangle counts fused into one
    # aggregate over it) — never a row-multiplying inner join
    assert "LeftOuter" in plan
    # broadcast-gated: at this size the oriented list broadcasts, so
    # the wedge set is never shuffled
    assert "BroadcastHashJoin" in plan


def test_q137_tfidf_broadcasts_query_postings(spark):
    # query-side postings and norms ride broadcasts; candidate gen is
    # the posting-list equi-join on term, never corpus x queries
    plan = plan_of(spark, "q137_tfidf_cosine_topk", execute=True)
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_q138_attribution_single_user_exchange(spark):
    # carry-forward window + rollup: one exchange on user_id
    plan = plan_of(spark, "q138_last_touch_attribution", execute=True)
    assert _unique_exchanges(plan, "user_id") == 1


def test_regression_is_single_pass_partial_agg(spark):
    plan = plan_of(spark, "q139_group_regression")
    # five sufficient statistics in ONE map-side-combined aggregate;
    # no join anywhere in the plan
    assert "partial_sum" in plan
    assert "Join" not in plan
    assert plan.count("Exchange") <= 2  # stats shuffle (+AQE read)


def test_zscore_stats_join_broadcasts(spark):
    plan = plan_of(spark, "q142_zscore_outliers", execute=True)
    # the |groups|-row moments table must broadcast back over orders,
    # never sort-merge (which would shuffle the fact table twice)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_histogram_is_two_level_aggregate(spark):
    plan = plan_of(spark, "q140_price_histogram")
    assert "partial_count" in plan  # map-side combine into <=24 rows
    assert "Join" not in plan
