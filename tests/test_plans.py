"""Physical-plan regression tests: pin the plan SHAPES that make the
engine scale, so a refactor that silently degrades them fails CI.

These are the plan properties the 100 TB design depends on (SURVEY §4):
- predicate pushdown of the reconcile time-window BELOW the full-outer
  join (a strict improvement over the reference, which filters post-shuffle
  inside mapPartitions — MvSync.java:325-347);
- top-k as ``TakeOrderedAndProject`` (parallel partial top-k), never a
  global-window row_number funnel;
- small dimensions broadcast, not shuffled;
- the whole reconcile compare staying inside WholeStageCodegen (no Python
  UDF in the hot path);
- parquet scans pruning columns to what the query needs.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


@pytest.fixture(scope="module")
def mv_pair(spark, sf_dir):
    from mvrepair.plans import mv_pair as P

    return P.base_df(spark, sf_dir), P.mv_df(spark, sf_dir), P.spec(), P.WINDOW


def test_window_filter_pushed_below_join(spark, mv_pair):
    """The in-window flag is computed per side BEFORE the join (so Catalyst
    evaluates it map-side, pre-shuffle); no Filter sits above the Join in
    the optimized plan of classify()."""
    from mvrepair.operators.reconcile import classify

    base, mv, spec, window = mv_pair
    plan = _optimized(classify(base, mv, spec, window=window))
    join_pos = plan.find("Join FullOuter")
    assert join_pos != -1
    # the window arithmetic (µs → sec division) appears only below the join
    head = plan[:join_pos]
    assert "1000000" not in head, (
        "window-bound arithmetic floated above the join:\n" + plan
    )


def test_classify_has_no_python_udf(spark, mv_pair):
    """The whole compare is JVM-side column algebra (SURVEY §4:
    'vectorization/codegen built-in as long as we avoid Python UDFs')."""
    from mvrepair.operators.reconcile import classify

    base, mv, spec, window = mv_pair
    df = classify(base, mv, spec, window=window)
    # collect() executes the DataFrame's OWN QueryExecution, finalizing its
    # AdaptiveSparkPlan so codegen spans become visible (a write wraps the
    # plan in a separate command execution and leaves this one unfinalized)
    df.collect()
    plan = _plan(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # codegen'd operators carry the `*(stageId)` prefix in the final plan
    assert "*(" in plan, "no WholeStageCodegen stage in:\n" + plan


def test_top_revenue_orders_uses_take_ordered(spark, sf_dir):
    """Top-k must plan as TakeOrderedAndProject (per-partition partial
    top-k, k rows to the driver) — not a single-partition global sort or a
    global-window row_number."""
    import __spark_entry__ as e

    plan = _plan(e.q_top_revenue_orders(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


def test_regional_revenue_broadcasts_small_dims(spark, sf_dir):
    """nation/region are tiny dimensions: they must broadcast, never
    shuffle (SURVEY §4 join-strategy row)."""
    import __spark_entry__ as e

    plan = _plan(e.q_regional_revenue(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 2


def test_scan_prunes_columns(spark, sf_dir):
    """A 2-column projection must reach the parquet scan as a 2-column
    ReadSchema — scanning all 9 lineitem columns for it is wrong."""
    from mvrepair.sources import load_table

    df = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    scan_line = next(
        ln for ln in _plan(df).splitlines() if "FileScan parquet" in ln
    )
    assert "l_orderkey" in scan_line and "l_quantity" in scan_line
    assert "l_shipdate" not in scan_line and "l_extendedprice" not in scan_line


def test_filter_pushed_to_parquet(spark, sf_dir):
    """An equality filter must reach the scan as a PushedFilters entry."""
    from mvrepair.sources import load_table

    df = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    plan = _plan(df)
    assert "PushedFilters" in plan
    assert "EqualTo(c_mktsegment,BUILDING)" in plan.replace(" ", "")


def test_exact_dedup_has_partial_aggregation(spark, sf_dir):
    """The digest groupBy must map-side combine (partial_ aggregate before
    the exchange), so the shuffle carries ~one row per distinct digest."""
    from mvrepair.operators.dedup import exact_dedup
    from mvrepair.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    plan = _plan(exact_dedup(docs))
    ex_pos = plan.find("Exchange hashpartitioning")
    assert ex_pos != -1
    assert "partial_min" in plan[ex_pos:] or "partial_first" in plan[ex_pos:], (
        "no map-side partial aggregation below the shuffle:\n" + plan
    )


def test_heavy_hitters_uses_take_ordered(spark, sf_dir):
    """Corpus top-k tokens plans as TakeOrderedAndProject (parallel
    partial top-k), never a global sort + limit."""
    import __spark_entry__ as e

    plan = _plan(e.q_heavy_hitters(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "Sort [n" not in plan  # no global Sort feeding the limit


def test_purchase_context_range_join_is_equi_not_nested_loop(spark, sf_dir):
    """The binned range join plans as a hash/SMJ equi-join on
    (key, bin) — BroadcastNestedLoopJoin (the theta-join fallback that
    goes quadratic at scale) must not appear."""
    import __spark_entry__ as e

    plan = _plan(e.q_purchase_context(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan
    assert ("SortMergeJoin" in plan) or ("BroadcastHashJoin" in plan) or (
        "ShuffledHashJoin" in plan
    )


def test_tfidf_partial_aggregation_before_shuffle(spark, sf_dir):
    """Per-(doc, term) counts partial-aggregate map-side: the shuffle
    carries term-count partials, not the exploded token stream."""
    import __spark_entry__ as e

    plan = _plan(e.q_tfidf_topterms(spark, sf_dir))
    assert "partial_count" in plan or "HashAggregate(keys=" in plan
    assert "PythonUDF" not in plan


def test_kmv_bottom_k_uses_take_ordered(spark, sf_dir):
    """The sketch's bottom-k is TakeOrderedAndProject over the distinct
    hashes — O(k) driver state, no global sort."""
    import __spark_entry__ as e

    plan = _plan(e.q_distinct_docs_kmv(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


def test_repetition_stats_no_window_two_aggs(spark, sf_dir):
    """repetition_stats is two hash aggregations (both map-side
    combinable, keys doc-scoped) — no Window node, no join, no UDF."""
    from mvrepair.operators.text import repetition_stats
    from mvrepair.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    plan = _plan(repetition_stats(docs))
    assert "Window" not in plan and "Join" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "partial_count" in plan or "partial_max" in plan, (
        "no map-side partial aggregation:\n" + plan
    )


def test_substring_dup_stats_single_hash_exchange_reused(spark, sf_dir):
    """The gram-frequency groupBy and the instances⋈frequency join key on
    the SAME hash column, so the plan needs exactly one exchange of the
    exploded instance stream on __h (the frequency side adds its own agg
    exchange, and the doc rollup its own on doc_id) — crucially the
    instance stream is NOT shuffled twice on __h."""
    from mvrepair.operators.dedup import substring_dup_stats
    from mvrepair.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    plan = _plan(substring_dup_stats(docs))
    import re

    h_exchanges = re.findall(r"Exchange hashpartitioning\(__h", plan)
    assert len(h_exchanges) <= 2, (
        f"instance stream shuffled {len(h_exchanges)}x on __h:\n" + plan
    )
    # fixture-scale AQE may broadcast the (tiny) frequency side; any hash
    # join is fine — what must never appear is a nested-loop shape
    assert "Join" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_semantic_dedup_assignment_is_map_side(spark):
    """Cluster assignment must stay a broadcast-centroid projection — the
    only join in the plan is the within-cluster self-join plus the final
    flag join; no join/shuffle exists between the scan and assignment."""
    from mvrepair.operators.similarity import semantic_dedup

    df = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(8)],
        "vec_id long, embedding array<float>",
    )
    cents = [[1_000_000, 0], [0, 1_000_000]]
    plan = _plan(semantic_dedup(df, cents))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # assignment feeds the self-join from both sides; a per-side shuffle on
    # cluster is expected, but no CartesianProduct / nested loop may appear
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_chunk_documents_is_shuffle_free(spark, sf_dir):
    """Chunking is a per-row explode: no Exchange anywhere in the plan."""
    from mvrepair.operators.packing import chunk_documents
    from mvrepair.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    plan = _plan(chunk_documents(docs))
    assert "Exchange" not in plan, "chunking must not shuffle:\n" + plan
    assert "Generate explode" in plan


def test_pack_sequences_single_exchange(spark, sf_dir):
    """Packing is ONE hash exchange (on the stream id) feeding the
    per-stream window cumsum — no second shuffle, no join."""
    from mvrepair.operators.packing import pack_sequences
    from mvrepair.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    plan = _plan(pack_sequences(docs))
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Join" not in plan
    assert "Window" in plan


# ---------------------------------------------------------------------------
# Twin plan fingerprints: entries past position 50 in queries() are PLAN
# TWINS of driver-checked queries (registry ordering contract,
# __spark_entry__.queries docstring).  Their correctness coverage is
# claimed THROUGH the named twin's driver hash-check plus the local
# oracle gate — so each one's physical-plan SHAPE is frozen here as a
# node-kind multiset (literals/partition counts excluded).  Cross-twin
# multisets are not literally equal (the twin relation is family-level:
# "same groupBy-agg family", not byte-identical plans), so the pin is a
# SNAPSHOT: a refactor that adds a shuffle, drops a broadcast, or swaps
# an aggregate for a window fails this test and must update the
# fingerprint consciously, with the diff visible in review.
# ---------------------------------------------------------------------------

TWIN_PLAN_FINGERPRINTS: dict[str, dict[str, int]] = {
    # round-10 wave 5 twins
    # one Expand-family Generate under one map-combinable grid agg,
    # probed via a broadcast of the <= d*w grid; TakeOrdered top-40 cut
    "cms_audit": {"AdaptiveSparkPlan": 1, "Sort": 1, "Project": 3,
                  "HashAggregate": 6, "BroadcastHashJoin": 1,
                  "Generate": 4, "TakeOrderedAndProject": 1,
                  "Exchange": 4, "FileScan": 2, "BroadcastExchange": 1,
                  "Filter": 1},
    # one corpus distinct+WindowGroupLimit pass into a checkpointed
    # sketch-sized bottom-k frame (the 5 in-memory Scans); the 2
    # FileScans are the exact-audit join's own reads
    "user_overlap_kmv": {"AdaptiveSparkPlan": 1, "Sort": 4, "Exchange": 11,
                         "Project": 14, "SortMergeJoin": 2, "Generate": 2,
                         "Filter": 9, "ObjectHashAggregate": 2,
                         "HashAggregate": 14, "Scan": 5,
                         "BroadcastHashJoin": 4, "BroadcastExchange": 4,
                         "FileScan": 2},
    # per-candidate two-level groupBy fold + single-row combine,
    # unioned: aggs and scans only, no joins/windows anywhere
    "orders_fd_profile": {"AdaptiveSparkPlan": 1, "Union": 1, "Project": 6,
                          "HashAggregate": 30, "Exchange": 15,
                          "FileScan": 5},
    # the returned frame is the broadcast-literal projection: ONE scan,
    # zero exchanges (the suff-stats pass + driver iteration ran at
    # construction time, the train_kmeans artifact doctrine)
    "embedding_pca": {"Project": 1, "ColumnarToRow": 1, "FileScan": 1},
    # demoted r10 wave 5 (view_purchase_stream promoted): the
    # count-model family's hashed-token aggs + broadcast global frame
    "source_divergence": {"AdaptiveSparkPlan": 4, "HashAggregate": 12,
                          "Exchange": 10, "Project": 5,
                          "BroadcastHashJoin": 2, "Filter": 3,
                          "InMemoryTableScan": 3, "InMemoryRelation": 3,
                          "Generate": 3, "FileScan": 3,
                          "BroadcastExchange": 2, "Window": 1},
    # two d x w grid builds + the broadcast grid zip + the exact join,
    # combined by union + single-row re-agg (no BNLJ, no cartesian)
    "cms_joinsize": {"AdaptiveSparkPlan": 1, "HashAggregate": 12,
                     "Union": 1, "Exchange": 5, "Project": 4,
                     "BroadcastHashJoin": 2, "Filter": 4, "Generate": 2,
                     "FileScan": 4, "BroadcastExchange": 2},
    # drained JVM-state grid (LocalTableScan) + the batch probe
    # composition over it — cms_audit's shape with the grid swapped
    # Project 2->3 in round 11: the grid aliases r/col/c to reserved
    # __cms_* names before the broadcast join (ADVICE collision fix) —
    # one extra map-side rename Project under the BroadcastExchange
    "cms_stream": {"AdaptiveSparkPlan": 1, "Sort": 1, "Project": 3,
                   "HashAggregate": 4, "BroadcastHashJoin": 1,
                   "Generate": 2, "TakeOrderedAndProject": 1,
                   "Exchange": 2, "FileScan": 1, "BroadcastExchange": 1,
                   "Filter": 1, "LocalTableScan": 1},
    # the fixed-round integer rank loop localCheckpoints per round
    # (the part_pagerank machinery verbatim): the returned frame is the
    # TakeOrdered cut over the checkpointed final ranks
    "textrank_keywords": {"TakeOrderedAndProject": 1, "Project": 1,
                          "Scan": 1},
    # round-11: mi_report is now EAGER (the per-pair joint-count ->
    # margin-join -> micro_log2 pipeline runs at call time, each
    # pair's one-row summary is collected and its joint frame released
    # immediately — the cache-ownership fix for the round-10 ADVICE
    # unreachable-persist finding), so the RETURNED frame is a literal
    # rebuild of the <= pairs x 6 bounded values
    "orders_mi_profile": {"Scan": 1},
    # streaming PCA: the returned frame is the same broadcast-literal
    # projection as embedding_pca (the drained stats fed the driver
    # iteration at construction time)
    "pca_stream": {"Project": 1, "ColumnarToRow": 1, "FileScan": 1},
    # per-type register sketch checkpointed (5 in-memory Scans), pair
    # unions + folds all sketch-sized; the 2 FileScans and the SMJ
    # belong to the exact-audit join
    "user_overlap_hll": {"AdaptiveSparkPlan": 1, "Sort": 3,
                         "Exchange": 12, "Project": 14,
                         "SortMergeJoin": 1, "BroadcastHashJoin": 4,
                         "BroadcastExchange": 4, "Filter": 11,
                         "Generate": 6, "ObjectHashAggregate": 6,
                         "HashAggregate": 16, "Scan": 5, "Union": 1,
                         "FileScan": 2},
    # two group-keyed rank windows (values, deviations) + two
    # broadcast joins of the group-sized median/MAD frames
    "events_mad_anomaly": {"AdaptiveSparkPlan": 1, "Sort": 4,
                           "Exchange": 4, "Project": 13,
                           "BroadcastHashJoin": 3, "Filter": 7,
                           "FileScan": 4, "BroadcastExchange": 3,
                           "Window": 6},
    # grouped PCA: one scan broadcast-joined with the per-label axis
    # model frame (the grouped stats pass + per-label driver
    # iterations ran at construction time)
    "label_pca": {"AdaptiveSparkPlan": 1, "Project": 2,
                  "BroadcastHashJoin": 1, "Filter": 2, "FileScan": 1,
                  "BroadcastExchange": 1, "Scan": 1},
    # round-10 wave 4 twins
    # demoted for event_trend's promotion: one key-keyed Exchange+Sort
    # window over the types x hours frame (the gapfill shape)
    "events_anomaly": {"AdaptiveSparkPlan": 1, "Project": 3, "Window": 1,
                       "Sort": 1, "Exchange": 2, "HashAggregate": 2,
                       "FileScan": 1},
    # one map-combinable sufficient-statistics agg, no window/sort
    "value_correlation": {"AdaptiveSparkPlan": 1, "Project": 2,
                          "Filter": 1, "HashAggregate": 2, "Exchange": 1,
                          "FileScan": 1},
    # basket self-join prefix + direction Generate + two item-count
    # joins; the basket total is a ScalarSubquery (never a BNLJ)
    "basket_rules": {"AdaptiveSparkPlan": 2, "TakeOrderedAndProject": 1,
                     "Project": 10, "Subquery": 1, "HashAggregate": 18,
                     "Exchange": 9, "FileScan": 5, "BroadcastHashJoin": 3,
                     "Filter": 6, "Generate": 1, "BroadcastExchange": 3},
    # query-side probe Generate above the same bucket equi-join +
    # WindowGroupLimit rerank as the single-probe path
    "ann_multiprobe": {"AdaptiveSparkPlan": 1, "Project": 6, "Filter": 3,
                       "Window": 1, "WindowGroupLimit": 2, "Sort": 2,
                       "Exchange": 3, "BroadcastHashJoin": 1,
                       "Generate": 1, "FileScan": 2,
                       "BroadcastExchange": 1},
    # 64-row min-struct election (SortAggregate: struct min) + anchor
    # explode + broadcast join; the corpus never shuffles
    "contrastive_pairs": {"AdaptiveSparkPlan": 1, "Project": 4,
                          "BroadcastHashJoin": 1, "Filter": 4,
                          "Generate": 1, "Exchange": 3, "FileScan": 2,
                          "BroadcastExchange": 1, "SortAggregate": 2,
                          "Sort": 2},
    # round-10 wave 2 twins
    "corpus_diff": {"AdaptiveSparkPlan": 1, "Project": 4, "SortMergeJoin": 1,
                    "Sort": 2, "Exchange": 5, "FileScan": 3, "Union": 1,
                    "Filter": 2},
    "mv_merkle_diff": {"AdaptiveSparkPlan": 1, "Project": 7, "Filter": 3,
                       "SortMergeJoin": 1, "Sort": 2, "HashAggregate": 4,
                       "Exchange": 2, "FileScan": 3, "Union": 1},
    # demoted r11 (events_hll promoted): one corpus scan -> token
    # Generate -> term-keyed df/tf agg -> per-doc score rollup ->
    # TakeOrdered cut — the posting_lists term-stat shuffle family
    "bm25_rank": {"AdaptiveSparkPlan": 1, "TakeOrderedAndProject": 1,
                  "HashAggregate": 4, "Exchange": 3, "Project": 2,
                  "Filter": 1, "Generate": 1, "FileScan": 1},
    # r11 addition: grid fold (one hash agg) + tiny cum/total windows
    # over <= buckets rows + the exact rank-window audit (one
    # flag-keyed Exchange+Sort) joined on (flag, q)
    "price_hist_quantiles": {"AdaptiveSparkPlan": 1, "Sort": 4,
                             "Exchange": 4, "Project": 6,
                             "BroadcastHashJoin": 1, "HashAggregate": 6,
                             "Filter": 5, "Generate": 2, "Window": 4,
                             "FileScan": 2, "BroadcastExchange": 1},
    # streaming twin: the drained JVM-state grid is a LocalTableScan;
    # the quantile tail + exact audit are the batch plan verbatim
    "price_hist_stream": {"AdaptiveSparkPlan": 1, "Sort": 4,
                          "Exchange": 3, "Project": 5,
                          "BroadcastHashJoin": 1, "HashAggregate": 4,
                          "Filter": 5, "Generate": 2, "Window": 4,
                          "LocalTableScan": 1, "BroadcastExchange": 1,
                          "FileScan": 1},
    # r11 rotation: event_trend demoted (embed_kcenter promoted) — the
    # exact-integer OLS sufficient-statistics aggregate, a pure
    # partial-agg tree (no window, no sort)
    "event_trend": {"AdaptiveSparkPlan": 1, "Project": 3, "Filter": 1,
                    "HashAggregate": 4, "Exchange": 2, "FileScan": 1},
    # r11: bucketed co-located join — SortMergeJoin with ZERO Sort and
    # the plan's ONLY Exchange being the 5-row priority aggregate: the
    # bucket layout satisfies both distribution and order requirements
    "bucketed_join": {"AdaptiveSparkPlan": 1, "HashAggregate": 2,
                      "Exchange": 1, "Project": 1, "SortMergeJoin": 1,
                      "Filter": 2, "FileScan": 2},
    # r11: PSI/chi2 drift — ONE corpus scan (conditional-count pivot,
    # midpoint as a collected literal, the zorder normalization
    # precedent), then tiny-frame windows + ladders
    "events_drift_psi": {"AdaptiveSparkPlan": 1, "Window": 2,
                         "Project": 3, "Filter": 1, "Exchange": 2,
                         "HashAggregate": 2, "FileScan": 1},
    # r11: MMR — map-side rel/redundancy scoring over one corpus scan
    # + the k-row broadcast rank join (the Scan is the driver-local
    # pick frame); the greedy loop ran eagerly at plan construction
    "embed_mmr": {"AdaptiveSparkPlan": 1, "Project": 3,
                  "BroadcastHashJoin": 1, "Exchange": 1, "FileScan": 1,
                  "BroadcastExchange": 1, "Filter": 1, "Scan": 1},
    # r11: WOE/IV — sketch-derived bin boundaries as collected
    # literals (the grid pass ran eagerly), then ONE conditional-count
    # scan + tiny-frame windows, the events_drift_psi shape
    "orders_woe_iv": {"AdaptiveSparkPlan": 1, "Window": 2,
                      "Project": 4, "Filter": 1, "Exchange": 2,
                      "HashAggregate": 2, "FileScan": 1},
    # r11: hard-negative mining — the ann_lsh_topk bucket-join shape
    # with the label inequality riding the join condition; top-k is
    # WindowGroupLimit-capped (broadcast side at fixture scale)
    "hard_negatives": {"AdaptiveSparkPlan": 1, "Project": 6,
                       "Filter": 3, "Window": 1, "WindowGroupLimit": 2,
                       "Sort": 2, "Exchange": 3, "BroadcastHashJoin": 1,
                       "FileScan": 2, "BroadcastExchange": 1},
    # r11: streaming drift twin — the drained JVM-state pivot is a
    # LocalTableScan; the PSI/chi tail is the batch plan verbatim
    "events_drift_stream": {"AdaptiveSparkPlan": 1, "Window": 2,
                            "Project": 2, "Filter": 1, "Exchange": 1,
                            "LocalTableScan": 1},
    # r11: Benford — one digit-count scan + constants/windows over the
    # 9-row frame
    "orders_benford": {"AdaptiveSparkPlan": 1, "Project": 4,
                       "Window": 2, "Exchange": 2, "HashAggregate": 2,
                       "Filter": 1, "FileScan": 1},
    # r11: Hamilton apportionment — one token-count scan, then
    # rank/sum windows over the |sources|-row frame
    "crawl_budget": {"AdaptiveSparkPlan": 1, "Window": 4, "Project": 3,
                     "Sort": 1, "Exchange": 2, "HashAggregate": 2,
                     "FileScan": 1},
    # r11: linear attribution — user-keyed band join (broadcast at
    # fixture scale), conversion-keyed window pair, tiny rollup
    "touch_attribution": {"AdaptiveSparkPlan": 1, "Window": 3,
                          "Exchange": 3, "HashAggregate": 2,
                          "Project": 4, "Sort": 2,
                          "BroadcastHashJoin": 1, "BroadcastExchange": 1,
                          "Filter": 2, "FileScan": 2},
    # r11: exact KS — one conditional-count scan, cum/total windows
    # over the unit-domain frame, argmax as a rank-1 cut
    # r11: Holt — the EWMA fold shape (collect_list ObjectHashAggregate
    # + in-plan aggregate fold + explode) with a two-state recurrence
    "events_holt": {"AdaptiveSparkPlan": 1, "Project": 2, "Generate": 1,
                    "ObjectHashAggregate": 2, "Exchange": 2,
                    "HashAggregate": 2, "FileScan": 1},
    # r12: LTTB folded in-plan (the events_holt shape: one series
    # collect_list aggregate + one HOF fold + explode) — 45 jobs of
    # per-bucket checkpoints became 3; ObjectHashAggregate pair =
    # collect_list's partial/final, Exchange 2 = the corpus->series
    # rollup + the series gather, FileScan 1 = ONE corpus pass
    "events_lttb": {"AdaptiveSparkPlan": 1, "Project": 5, "Generate": 1,
                    "ObjectHashAggregate": 2, "Exchange": 2,
                    "HashAggregate": 2, "FileScan": 1},
    # r11: mutation sink — the returned frame is the manifested JSON
    # read-back (the write ran eagerly under the commit protocol)
    "mv_repair_sink": {"FileScan": 1},
    # r11: streaming ring walk — drained memory table (per-range
    # micro-batches ran inside the stream; the source test drives the
    # offset contract directly)
    "events_tokenrange_stream": {"LocalTableScan": 1},
    # r11: token-range Python DataSource — one BatchScan (Python) per
    # token range feeding the JVM distinct/count agg pair; the pushed
    # equality leaves only isnotnull in the post-scan Filter
    "events_tokenrange": {"AdaptiveSparkPlan": 1, "HashAggregate": 4,
                          "Exchange": 2, "Project": 1, "Filter": 1,
                          "BatchScan": 1},
    # r11: Theil-Sen — type-keyed pair self-join over the hours-domain
    # points (broadcast at fixture scale) + the median rank window
    "event_theilsen": {"AdaptiveSparkPlan": 1, "Project": 7,
                       "BroadcastHashJoin": 2, "Filter": 4, "Window": 2,
                       "Sort": 1, "Exchange": 5, "HashAggregate": 8,
                       "FileScan": 3, "BroadcastExchange": 2},
    # r11: compaction planner — the zorder bucket agg + one cumulative
    # window over the ≤64-row bucket frame + the per-group fold
    "zorder_compaction": {"AdaptiveSparkPlan": 1, "HashAggregate": 4,
                          "Project": 3, "Window": 1, "Sort": 1,
                          "Exchange": 2, "FileScan": 1},
    # r11: peak concurrency — the native MergingSessions frame feeding
    # the day-partitioned +1/−1 sweep (segment Generate, netted ties,
    # one per-day Window) and the per-day max fold
    "session_peaks": {"AdaptiveSparkPlan": 1, "HashAggregate": 8,
                      "Project": 7, "Window": 1, "Sort": 3,
                      "Exchange": 4, "Union": 1, "Generate": 2,
                      "MergingSessions": 2, "Filter": 2, "FileScan": 2},
    # r11: dynamic partition pruning — Hive-partitioned fact scan with
    # a SubqueryAdaptiveBroadcast feeding dynamicpruningexpression
    # (asserted verbatim by test_events_dpp_prunes_at_runtime)
    "events_dpp": {"AdaptiveSparkPlan": 2, "HashAggregate": 2,
                   "Exchange": 1, "Project": 3, "BroadcastHashJoin": 1,
                   "FileScan": 3, "SubqueryAdaptiveBroadcast": 1,
                   "Filter": 2, "BroadcastExchange": 1},
    # r11: quantile normalization — group-partitioned rank windows +
    # the domain-frame pooled cumulative (hist fan/filter/min) + one
    # 100-row broadcast join back to the corpus
    "quantile_normalize": {"AdaptiveSparkPlan": 1, "Project": 6,
                           "BroadcastHashJoin": 1, "Filter": 3,
                           "Window": 4, "Sort": 2, "Exchange": 3,
                           "FileScan": 2, "BroadcastExchange": 1,
                           "HashAggregate": 4, "Generate": 1},
    # r11: phrase search — positional posexplode stream pruned DURING
    # the broadcast spec join (map-side), one (phrase,doc,start) count
    # + one per-doc rollup; the spec is a local Scan
    "phrase_match": {"AdaptiveSparkPlan": 1, "HashAggregate": 4,
                     "Exchange": 3, "Project": 2, "Filter": 2,
                     "BroadcastHashJoin": 1, "Generate": 1,
                     "FileScan": 1, "BroadcastExchange": 1, "Scan": 1},
    # r11: reciprocal NN — the LSH bucket join + rank-1 WindowGroupLimit
    # retrieval composed with one swapped-key mutuality self-join
    "embed_mutual_nn": {"AdaptiveSparkPlan": 1, "Project": 13,
                        "SortMergeJoin": 1, "Sort": 6, "Exchange": 8,
                        "Filter": 6, "Window": 2, "WindowGroupLimit": 4,
                        "BroadcastHashJoin": 2, "FileScan": 4,
                        "BroadcastExchange": 2},
    # r11: sorted-neighborhood linkage — per-block rank windows (the
    # head/tail cuts become WindowGroupLimit), delta Generate + rank
    # equi-join, boundary-recovery broadcast joins, one union + verify
    "customer_snm": {"AdaptiveSparkPlan": 1, "Union": 1, "Project": 14,
                     "BroadcastHashJoin": 3, "BroadcastExchange": 3,
                     "Generate": 1, "Window": 5, "Sort": 7,
                     "Exchange": 6, "Filter": 7, "FileScan": 5,
                     "WindowGroupLimit": 4, "HashAggregate": 2},
    # r11 session-3 demotion: funnel — per-user ordered window scan
    # stack over one user-keyed Exchange+Sort (the gapfill family)
    "event_funnel": {"AdaptiveSparkPlan": 1, "Project": 8, "Window": 5,
                     "Sort": 2, "Generate": 1, "HashAggregate": 4,
                     "Exchange": 2, "FileScan": 1},
    # r11: label-propagation communities — the final frame is the
    # last round's localCheckpoint scan (the pagerank/kcore iterative
    # doctrine: per-round plans are truncated by design)
    "part_communities": {"Project": 1, "Scan": 1},
    # r11: Wasserstein-1 drift — the KS cumulative shape with a lead()
    # window sharing the same Sort and a final single-row fold instead
    # of TakeOrdered
    "events_drift_w1": {"AdaptiveSparkPlan": 1, "Project": 3,
                        "HashAggregate": 4, "Window": 2, "Sort": 1,
                        "Exchange": 2, "FileScan": 1},
    "events_drift_ks": {"AdaptiveSparkPlan": 1, "Project": 3,
                        "Filter": 1, "Window": 3,
                        "TakeOrderedAndProject": 1, "Sort": 1,
                        "Exchange": 2, "HashAggregate": 2,
                        "FileScan": 1},
    # r11: Kaplan-Meier — one user-keyed agg (the corpus pass), life-
    # table windows, the sequential product as ONE collect_list fold
    # (ObjectHashAggregate) + Generate explode
    "km_survival": {"AdaptiveSparkPlan": 1, "Project": 5, "Generate": 1,
                    "ObjectHashAggregate": 2, "Window": 2, "Sort": 1,
                    "Exchange": 3, "HashAggregate": 4, "FileScan": 1},
    # r11: Gini — one key agg, rank/count windows over the key-domain
    # frame, single-row DECIMAL fold
    "part_gini": {"AdaptiveSparkPlan": 1, "HashAggregate": 4,
                  "Window": 2, "Project": 2, "Sort": 1, "Exchange": 2,
                  "FileScan": 1},
    # r11: Zipf slope — key count + rank window + the micro_log2
    # ladder feeding one single-group OLS aggregate
    "part_zipf": {"AdaptiveSparkPlan": 1, "Project": 3, "Filter": 1,
                  "HashAggregate": 4, "Window": 1, "Sort": 1,
                  "Exchange": 2, "FileScan": 1},
    # r11: RBO audit — brute (the allowlisted BNLJ baseline) + LSH
    # pipelines joined once on (query, neighbor), weight-sum tail
    # r11: EWMA — one hourly count pass, per-key collect_list fold
    # (ObjectHashAggregate) + Generate explode, the km_survival shape
    # grouped
    "events_ewma": {"AdaptiveSparkPlan": 1, "Project": 2, "Generate": 1,
                    "ObjectHashAggregate": 2, "Exchange": 2,
                    "HashAggregate": 2, "FileScan": 1},
    # r11: the ORC source leg — identical rollup plan over a FileScan
    # orc (pushdown verified by test), write ran eagerly at build
    "pricing_orc": {"AdaptiveSparkPlan": 1, "HashAggregate": 2,
                    "Exchange": 1, "Project": 1, "Filter": 1,
                    "FileScan": 1},
    "ann_rbo": {"AdaptiveSparkPlan": 1, "Project": 15,
                "SortMergeJoin": 2, "Sort": 8, "Exchange": 11,
                "Filter": 7, "FileScan": 5, "HashAggregate": 2,
                "Window": 2, "WindowGroupLimit": 4,
                "BroadcastNestedLoopJoin": 1, "BroadcastExchange": 2,
                "BroadcastHashJoin": 1},
    # one FileScan + Expand (the multi-distinct), 2-level agg only
    "lineitem_dq": {"AdaptiveSparkPlan": 1, "Project": 1, "Generate": 1,
                    "HashAggregate": 4, "Exchange": 2, "FileScan": 1},
    # streaming twins fingerprint the drained results table
    "mv_merkle_stream": {"LocalTableScan": 1},
    # drained register table + the batch-side merge/fold
    "events_hll_stream": {"AdaptiveSparkPlan": 1, "Project": 3,
                          "HashAggregate": 4, "Exchange": 2, "Union": 1,
                          "LocalTableScan": 2},
    # agg -> union of partial states -> re-agg; no join anywhere
    "mv_agg_refresh": {"AdaptiveSparkPlan": 1, "HashAggregate": 6,
                       "Union": 1, "Exchange": 2, "Project": 2, "Filter": 2,
                       "FileScan": 2},
    # three broadcast anti-joins (one per FK check) over distinct dim
    # keys, counted and unioned into the verdict report
    "lineitem_fk_dq": {"AdaptiveSparkPlan": 1, "Union": 1, "Project": 9,
                       "HashAggregate": 12, "Exchange": 6,
                       "BroadcastHashJoin": 3, "FileScan": 6,
                       "BroadcastExchange": 3, "Filter": 3},
    # three digest aggs (stored/ins/del) under one union+re-agg — the
    # mergeable-state refresh shape, no join anywhere
    "mv_merkle_refresh": {"AdaptiveSparkPlan": 1, "Filter": 4,
                          "HashAggregate": 8, "Union": 1, "Exchange": 3,
                          "Project": 6, "FileScan": 3},
    # drill keys checkpointed, guard anti-join rides a broadcast of the
    # pruned base; 4 source FileScans + in-memory key Scans
    "mv_merkle_deletes": {"AdaptiveSparkPlan": 1, "BroadcastHashJoin": 5,
                          "Project": 12, "Filter": 9, "SortMergeJoin": 1,
                          "SortAggregate": 4, "Sort": 4, "Exchange": 2,
                          "FileScan": 4, "BroadcastExchange": 5, "Scan": 4,
                          "Union": 1},
    # each side scanned once into its count frame; the only join is
    # the distinct-key-sized full-outer count-frame merge
    "orders_lineitem_joinsize": {"AdaptiveSparkPlan": 1, "HashAggregate": 6,
                                 "Exchange": 3, "Project": 1,
                                 "SortMergeJoin": 1, "Sort": 2,
                                 "FileScan": 2},
    # drill keys checkpointed (3 in-memory Scans), semi-join prunes
    # broadcast, one SMJ for the pruned classify; 3 source FileScans
    "mv_merkle_upserts": {"AdaptiveSparkPlan": 1, "Project": 12,
                          "Generate": 1, "Filter": 7, "SortMergeJoin": 1,
                          "SortAggregate": 4, "Sort": 4, "Exchange": 2,
                          "BroadcastHashJoin": 3, "FileScan": 3,
                          "BroadcastExchange": 3, "Scan": 3, "Union": 1},
    # one key-keyed Exchange+Sort carries the lead window AND the agg
    "events_twa": {"AdaptiveSparkPlan": 1, "HashAggregate": 2, "Project": 3,
                   "Filter": 1, "Window": 1, "Sort": 1, "Exchange": 1,
                   "FileScan": 1},
    # scd2 run encoding (one user-keyed exchange, windows + sort-aggs
    # ride it) + the as-of union+window; 2 pushed-filter event scans
    "purchase_state_pit": {"AdaptiveSparkPlan": 1, "Project": 6,
                           "Filter": 3, "Window": 3, "Sort": 4,
                           "Exchange": 2, "Union": 1, "FileScan": 2,
                           "SortAggregate": 4},
    # post-prune working set checkpointed: 4 in-memory Scans, zero
    # source re-reads (uncut this planned 12 FileScans for 3 replicas)
    "mv_quorum_repair": {"AdaptiveSparkPlan": 1, "Project": 6,
                         "SortMergeJoin": 1, "Sort": 2,
                         "BroadcastHashJoin": 2, "Generate": 2,
                         "HashAggregate": 6, "Exchange": 2, "Filter": 4,
                         "Scan": 4, "BroadcastExchange": 2,
                         "SortAggregate": 2},
    "events_hourly": {"AdaptiveSparkPlan": 1, "Exchange": 1, "FileScan": 1,
                      "Filter": 1, "HashAggregate": 2, "Project": 2},
    "minhash_signatures": {"AdaptiveSparkPlan": 1, "Exchange": 2, "FileScan": 1,
                           "Generate": 1, "HashAggregate": 2, "Project": 2},
    "events_latest": {"AdaptiveSparkPlan": 1, "Exchange": 1, "FileScan": 1,
                      "Filter": 1, "Project": 2, "Sort": 2, "Window": 1,
                      "WindowGroupLimit": 2},
    "corpus_profile": {"AdaptiveSparkPlan": 1, "Exchange": 1, "FileScan": 1,
                       "HashAggregate": 2, "Project": 1},
    "simhash": {"AdaptiveSparkPlan": 1, "Exchange": 2, "FileScan": 1,
                "Generate": 1, "HashAggregate": 2, "Project": 2},
    "split_contamination": {"AdaptiveSparkPlan": 1, "BroadcastExchange": 2,
                            "BroadcastHashJoin": 2, "Exchange": 8,
                            "FileScan": 6, "Filter": 6, "HashAggregate": 4,
                            "Project": 13, "Union": 3},
    "orders_cube": {"AdaptiveSparkPlan": 1, "Exchange": 1, "Expand": 1,
                    "FileScan": 1, "HashAggregate": 2},
    "events_by_type_salted": {"AdaptiveSparkPlan": 1, "Exchange": 2,
                              "FileScan": 1, "HashAggregate": 4, "Project": 1},
    "next_touch": {"AdaptiveSparkPlan": 1, "Exchange": 1, "FileScan": 2,
                   "Filter": 3, "Project": 4, "Sort": 1, "Union": 1,
                   "Window": 1},
    "retained_customers": {"AdaptiveSparkPlan": 1, "BroadcastExchange": 1,
                           "BroadcastHashJoin": 1, "Exchange": 1,
                           "FileScan": 2, "Filter": 2, "HashAggregate": 2,
                           "Project": 2},
    "lang_scores": {"AdaptiveSparkPlan": 1, "Exchange": 1, "FileScan": 1,
                    "Project": 2},
    "text_scrub": {"AdaptiveSparkPlan": 1, "Exchange": 1, "FileScan": 1,
                   "Project": 2},
    "doc_fingerprint": {"AdaptiveSparkPlan": 1, "Exchange": 1, "FileScan": 1,
                        "Project": 1},
    "token_counts": {"AdaptiveSparkPlan": 1, "Exchange": 1, "FileScan": 1,
                     "Project": 1},
    "doc_sample": {"ColumnarToRow": 1, "FileScan": 1, "Filter": 1},
    "tfidf_topterms": {"AdaptiveSparkPlan": 1, "BroadcastExchange": 1,
                       "BroadcastHashJoin": 1, "Exchange": 6, "FileScan": 2,
                       "Filter": 1, "Generate": 2, "HashAggregate": 6,
                       "Project": 2, "Sort": 2, "Window": 1,
                       "WindowGroupLimit": 2},
    "token_quantiles": {"AdaptiveSparkPlan": 1, "Exchange": 2, "FileScan": 1,
                        "Filter": 1, "Generate": 1, "Project": 4, "Sort": 1,
                        "Window": 2},
    "pretrain_corpus": {"AdaptiveSparkPlan": 1, "Exchange": 3, "FileScan": 2,
                        "Filter": 2, "HashAggregate": 2, "Project": 3,
                        "Union": 1},
    "corpus_mix": {"ColumnarToRow": 1, "FileScan": 1, "Filter": 1,
                   "Generate": 1, "Project": 1},
    "dedup_keep_best": {"AdaptiveSparkPlan": 1, "BroadcastExchange": 1,
                        "BroadcastHashJoin": 1, "Exchange": 3, "FileScan": 2,
                        "Filter": 3, "Project": 8, "Scan": 1, "Sort": 2,
                        "SortAggregate": 2, "Union": 1},
    "quality_funnel": {"AdaptiveSparkPlan": 1, "Exchange": 4, "Expand": 1,
                       "FileScan": 2, "HashAggregate": 4, "Union": 1},
    "training_order": {"AdaptiveSparkPlan": 1, "Exchange": 3, "FileScan": 1,
                       "HashAggregate": 2, "Project": 2, "Sort": 2,
                       "Window": 1},
    # the corpus-scaled threshold is a true scalar subquery (r7 ADVICE
    # fix: no more eager count job at plan construction); the plan
    # string prints the subquery's own AdaptiveSparkPlan/scan/agg tree
    # inline under each reference, hence the higher node counts
    "rare_tokens": {"AdaptiveSparkPlan": 3, "BroadcastExchange": 2,
                    "BroadcastHashJoin": 2, "Exchange": 9, "FileScan": 5,
                    "Filter": 3, "Generate": 2, "HashAggregate": 8,
                    "Project": 4, "Subquery": 2},
    # scoring is a pure map-side projection (scan + projects, no join/
    # shuffle); the centroid build runs eagerly at plan-build time and
    # is not part of this frame's plan
    "label_outliers": {"ColumnarToRow": 1, "FileScan": 1, "Project": 3},
    # word-freq agg (corpus pass) -> pair explode over DISTINCT words
    # only -> pair agg -> TakeOrderedAndProject; one of the 3 exchanges
    # is the fixture _spread repartition
    "bpe_merges": {"AdaptiveSparkPlan": 1, "Exchange": 3, "FileScan": 1,
                   "Generate": 2, "HashAggregate": 4, "Project": 1,
                   "TakeOrderedAndProject": 1},
    # the 4 bare Scans are the eager localCheckpoints standing in for the
    # materialized index/diff a production run reads from storage; only
    # the delta is re-signed (one Generate per band explode)
    "index_upsert": {"AdaptiveSparkPlan": 1, "Exchange": 8, "FileScan": 2,
                     "Filter": 5, "Generate": 2, "HashAggregate": 2,
                     "Project": 9, "Scan": 4, "Sort": 6,
                     "SortMergeJoin": 3, "Union": 2},
    # foreachBatch streaming: the returned frame is the drained results
    # table (bare local Scan); the per-microbatch scoring plan is
    # nb_score — the algebra checked via nb_classify (now in-window)
    "nb_stream": {"Scan": 1},
    # composes both checked ANN pipelines (the single BNLJ is the labeled
    # brute-force baseline) + one id-keyed hit join; the query-id spine
    # comes from the cheap filter, so brute-force scoring runs ONCE
    "ann_recall": {"AdaptiveSparkPlan": 1, "BroadcastExchange": 2,
                   "BroadcastHashJoin": 1, "BroadcastNestedLoopJoin": 1,
                   "Exchange": 11, "FileScan": 5, "Filter": 7,
                   "Generate": 1, "HashAggregate": 2, "Project": 16,
                   "Sort": 8, "SortMergeJoin": 2, "Window": 2,
                   "WindowGroupLimit": 4},
    # ---- demoted in the round-7 rotation (driver-green through r6) ----
    # guarded anti-join delete probe + the upserts cell planner union;
    # the same probe runs as mv_repair_apply's first branch (in-window)
    "mv_repair_deletes": {"AdaptiveSparkPlan": 1, "BroadcastExchange": 1,
                          "BroadcastHashJoin": 1, "Exchange": 2,
                          "FileScan": 4, "Filter": 4, "Project": 11,
                          "Sort": 4, "SortAggregate": 4,
                          "SortMergeJoin": 1, "Union": 1},
    # range join: non-equi ts bounds under the user_id equi-join — same
    # physical strategy as sessions_in_maintenance (in-window)
    "purchase_context": {"AdaptiveSparkPlan": 1, "BroadcastExchange": 1,
                         "BroadcastHashJoin": 1, "Exchange": 2,
                         "FileScan": 3, "Filter": 3, "Generate": 1,
                         "HashAggregate": 2, "Project": 7, "Sort": 2,
                         "SortMergeJoin": 1},
    # identical pipeline to neardup_minhash (in-window) plus the bucket
    # size cap; constructs eagerly (cached bucket frame), so its plan is
    # the EXECUTED AQE plan.  AQE bookkeeping (query-stage nodes, stage
    # reuse, stat-driven Exchange/coalesce counts) shifts across Spark
    # patch versions and fixture sizes, so this entry pins only the
    # stable algebra: joins, aggregates, explodes, the two CollectMetrics
    # observers, the cached bucket frame, and the signature-union arms.
    # Listed in SUBSET_PINNED below — unlisted node kinds are free.
    "neardup_minhash_capped": {
        "BroadcastHashJoin": 4, "CollectMetrics": 2, "Generate": 6,
        "HashAggregate": 8, "InMemoryRelation": 7,
        "ObjectHashAggregate": 4, "Union": 12},
    # bucket-prune + in-bucket rerank, WindowGroupLimit top-k — same
    # shape family as ann_ivf_topk (in-window)
    "ann_lsh_topk": {"AdaptiveSparkPlan": 1, "BroadcastExchange": 1,
                     "BroadcastHashJoin": 1, "Exchange": 3, "FileScan": 2,
                     "Filter": 3, "Project": 6, "Sort": 2, "Window": 1,
                     "WindowGroupLimit": 2},
    # streaming queries return the drained results table; the stateful
    # keep-newest agg runs under the stream (twin: dedup_exact_stream,
    # in-window; batch twin events_latest under the local gate)
    "events_latest_stream": {"LocalTableScan": 1, "Project": 1},
    # session_window streaming formulation; shares event_sessions'
    # oracle SQL verbatim (in-window)
    "sessions_stream": {"LocalTableScan": 1},
    # same Arrow mapInPandas plumbing as multimodal_decode (in-window)
    "multimodal_features": {"AdaptiveSparkPlan": 1, "Exchange": 1,
                            "FileScan": 1, "MapInPandas": 1, "Project": 1},
    "multimodal_frames": {"AdaptiveSparkPlan": 1, "Exchange": 1,
                          "FileScan": 1, "MapInPandas": 1, "Project": 1},
    # SUBSET pin (composes part_pagerank + part_triangles, whose cached
    # lineage reprints dominate the node multiset): r9 — the query now
    # eagerly materializes the fused result so the shared co-purchase
    # edge cache can be released before returning (r8 ADVICE), which
    # makes the printed plan an executed-AQE string whose TakeOrdered/
    # Window/Union counts vary with reprints; the stable invariant is
    # the semantic_leakage precedent — never a cartesian/BNLJ node
    "part_rank_fusion": {"CartesianProduct": 0,
                         "BroadcastNestedLoopJoin": 0},
    # ---- demoted in the round-8 rotation wave 2 (driver-green r1-r7) ----
    # single-pass observe agg over the same prepared wide frame as
    # mv_classify (string accumulators force the SortAggregate pair)
    "mv_stats": {"AdaptiveSparkPlan": 1, "Exchange": 3, "FileScan": 3,
                 "Filter": 2, "HashAggregate": 2, "Project": 10,
                 "Sort": 4, "SortAggregate": 4, "SortMergeJoin": 1,
                 "Union": 1},
    # per-row gate projection — the text_stats shape
    "text_quality": {"AdaptiveSparkPlan": 1, "Exchange": 1, "FileScan": 1,
                     "Project": 2},
    # doc-scoped gram-hash two-agg shape, twin substring_dupes
    "doc_repetition": {"AdaptiveSparkPlan": 1, "Exchange": 4, "FileScan": 1,
                       "Generate": 1, "HashAggregate": 6, "Project": 2},
    # shuffle-free explode layout, twin pack_sequences
    "doc_chunks": {"AdaptiveSparkPlan": 1, "Exchange": 1, "FileScan": 1,
                   "Generate": 1, "Project": 1},
    # ---- demoted in the round-8 rotation wave 4 (driver-green r1-r7) ----
    # explode -> token-keyed agg + TakeOrdered cut, twin posting_lists
    "heavy_hitters": {"AdaptiveSparkPlan": 1, "Exchange": 3, "FileScan": 1,
                      "Generate": 1, "HashAggregate": 4,
                      "TakeOrderedAndProject": 1},
    # the upsert materialization pass over the same prepared repair
    # frame as mv_repair_upserts (string accumulators -> SortAggregate)
    "mv_repair_apply": {"AdaptiveSparkPlan": 1, "Exchange": 2,
                        "FileScan": 3, "Filter": 3, "Project": 11,
                        "Sort": 4, "SortAggregate": 4,
                        "SortMergeJoin": 1, "Union": 1},
    # streaming twins fingerprint the drained results table
    "mv_upserts_stream": {"LocalTableScan": 1},
    "dedup_exact_stream": {"LocalTableScan": 1},
    # ---- demoted in the round-8 rotation wave 5 (driver-green r1-r7) ----
    # SUBSET pin (long concat expressions wrap the plan text, so only
    # the stable algebra nodes are listed): the golden-format projection
    # over the same reconcile frame as mv_classify — one SMJ, the
    # string-accumulator SortAggregate quartet, never a nested loop
    "mv_report_text": {"Exchange": 2, "FileScan": 3, "Filter": 3,
                       "SortAggregate": 4, "SortMergeJoin": 1,
                       "Union": 1, "CartesianProduct": 0,
                       "BroadcastNestedLoopJoin": 0},
    # rank-window top-k per event type — the posting_lists
    # WindowGroupLimit shape (in-window)
    "top_users_per_event": {"AdaptiveSparkPlan": 1, "Exchange": 2,
                            "FileScan": 1, "Filter": 1,
                            "HashAggregate": 2, "Sort": 2, "Window": 1,
                            "WindowGroupLimit": 2},
    # ---- demoted in the round-8 rotation wave 6 (driver-green r1-r7) ----
    # broadcast-dim star join pruned above one fact agg — the
    # pricing_summary agg with top_revenue_orders' pinned join shape
    "regional_revenue": {"AdaptiveSparkPlan": 1, "BroadcastExchange": 5,
                         "BroadcastHashJoin": 5, "Exchange": 1,
                         "FileScan": 6, "Filter": 6, "HashAggregate": 2,
                         "Project": 6},
    # count-trained broadcast-model scoring, twin nb_classify: ONE
    # BroadcastHashJoin (the weight table), the model exchange
    # bucket-bounded, no corpus-sized shuffle of raw instances
    "doc_perplexity": {"AdaptiveSparkPlan": 1, "BroadcastExchange": 1,
                       "BroadcastHashJoin": 1, "Exchange": 5,
                       "FileScan": 2, "Filter": 3, "Generate": 2,
                       "HashAggregate": 4, "Project": 6, "Sort": 1,
                       "Window": 1},
    # fixed-round checkpointed peel, twin part_pagerank: the returned
    # plan is the final degree agg over the round-3 localCheckpoint
    # (Scan ExistingRDD x2) — the per-round joins live behind the
    # checkpoint, exactly like the components loop
    "part_kcore": {"AdaptiveSparkPlan": 1, "Exchange": 1,
                   "HashAggregate": 2, "Project": 2, "Scan": 2,
                   "Union": 1},
    # SUBSET pin (eager-materialized like its LSH siblings): the
    # composition claim — candidates come from the banded equi-join,
    # never a cartesian/BNLJ generator
    "minhash_calibration": {"CartesianProduct": 0,
                            "BroadcastNestedLoopJoin": 0},
    # one user-keyed Exchange+Sort lead stack + bounded path count +
    # TakeOrdered cut, twin event_transitions
    "event_paths": {"AdaptiveSparkPlan": 1, "Exchange": 2, "FileScan": 1,
                    "Filter": 1, "HashAggregate": 2, "Project": 2,
                    "Sort": 1, "TakeOrderedAndProject": 1, "Window": 1},
    # the one-shuffle run-length claim: ONE Exchange carries the lag
    # flag, the run-id running sum, the per-run aggregate (string
    # first() -> SortAggregate), and the runs-frame lead
    "scd2_history": {"AdaptiveSparkPlan": 1, "Exchange": 1, "FileScan": 1,
                     "Project": 4, "Sort": 2, "SortAggregate": 2,
                     "Window": 3},
    # SUBSET pin (eager-materialized like its prefix-join twin): the
    # same zero-loss candidate generator, never a cartesian/BNLJ
    "similar_parts": {"CartesianProduct": 0,
                      "BroadcastNestedLoopJoin": 0},
    # SUBSET pin: the composition claim — the cosine pair generator is
    # the bucket equi-join, the split joins are id-keyed equi-joins
    "semantic_leakage": {"CartesianProduct": 0,
                         "BroadcastNestedLoopJoin": 0},
    # demoted in the round-9 rotation for orders_pivot's promotion
    # (driver-green r1-r8): banded-signature -> band-bucket equi-join
    # -> exact-sign verify, the same shape as the in-window
    # neardup_minhash; the ObjectHashAggregate pair is the per-band
    # collect of candidate buckets
    "simhash_neardup": {"AdaptiveSparkPlan": 1, "Exchange": 5,
                        "FileScan": 2, "Filter": 2, "Generate": 3,
                        "HashAggregate": 4, "ObjectHashAggregate": 2,
                        "Project": 5, "Union": 1},
    # demoted in the round-9 rotation for zorder_layout's promotion
    # (driver-green r1-r8): one token pass -> bucket-count model frame
    # -> broadcast-join scoring + per-doc rollup, the same count-trained
    # broadcast-model shape as the in-window nb_classify (the
    # doc_perplexity twin doctrine)
    "dsir_scores": {"AdaptiveSparkPlan": 1, "BroadcastExchange": 1,
                    "BroadcastHashJoin": 1, "Exchange": 7,
                    "FileScan": 2, "Generate": 2, "HashAggregate": 8,
                    "Project": 5, "Window": 1},
    # demoted in the round-9 rotation for pq_topk's promotion
    # (driver-green r1-r8): EAGER operator (computes + caches its
    # result), so the printed plan is an executed-AQE string — SUBSET
    # pin on the no-cartesian invariant, the part_rank_fusion precedent;
    # its kmeans build is the in-window kmeans_clusters verbatim
    "semantic_dedup": {"CartesianProduct": 0,
                       "BroadcastNestedLoopJoin": 0},
    # round-9 addition: A-ES priority sampling — one map-side hash +
    # micro_log2-ladder projection and the top-n cut, nothing else
    # (the Exchange is the _spread round-robin below the scan)
    "weighted_sample": {"AdaptiveSparkPlan": 1, "Exchange": 1,
                        "FileScan": 1, "Filter": 1, "Project": 2,
                        "TakeOrderedAndProject": 1},
    # round-9 addition, hardened r10: the prepared base persists across
    # the per-table branches and candidates dedup BEFORE the exact
    # verify, so the operator is now EAGER (persist + count, the capped
    # cosine-path lifecycle) and its printed plan is an executed-AQE
    # string — SUBSET pin on the no-cartesian invariant (the
    # semantic_dedup precedent; nested cached-plan printing makes
    # Union/InMemoryRelation counts AQE bookkeeping, not algebra)
    "embedding_neardup_banded": {"CartesianProduct": 0,
                                 "BroadcastNestedLoopJoin": 0},
    # round-9 addition: streaming hopping window — like the other
    # streaming twins the returned frame is a drained memory sink
    # (batch twin events_sliding promoted r10)
    "events_sliding_stream": {"LocalTableScan": 1},
    # demoted in the round-10 rotation for events_sliding's promotion
    # (driver-green r1-r9): the coarse-probe equi-join (broadcast at
    # fixture scale) + exact rerank + _ranked WindowGroupLimit cut —
    # pq_topk's candidate generator verbatim
    "ann_ivf_topk": {"AdaptiveSparkPlan": 1, "BroadcastExchange": 1,
                     "BroadcastHashJoin": 1, "Exchange": 3,
                     "FileScan": 2, "Filter": 3, "Generate": 1,
                     "Project": 7, "Sort": 2, "Window": 1,
                     "WindowGroupLimit": 2},
    # round-10 addition: trained-coarse IVF-PQ — the identical pq
    # pipeline (one extra map-side Project for the trained-centroid
    # scoring literal), twin pq_topk
    "pq_topk_trained": {"AdaptiveSparkPlan": 1, "BroadcastExchange": 1,
                        "BroadcastHashJoin": 1, "Exchange": 3,
                        "FileScan": 2, "Filter": 3, "Generate": 1,
                        "Project": 8, "Sort": 2, "Window": 1,
                        "WindowGroupLimit": 2},
    # demoted in the round-10 rotation for orders_bloom_prune's
    # promotion (driver-green r1-r9): EAGER operator (the components
    # loop localCheckpoints), so the printed plan is an executed-AQE
    # string — SUBSET pin on the no-cartesian invariant, the
    # semantic_dedup precedent; its components loop is the in-window
    # dedup_clusters verbatim
    "dedup_apply": {"CartesianProduct": 0,
                    "BroadcastNestedLoopJoin": 0},
    # round-10 addition: the bitmap audit — the same map-side
    # membership projection as its twin, counted through one broadcast
    # left join + a single one-row aggregate (the bloom build's two
    # bounded jobs run before the returned plan, like train_kmeans)
    "bloom_prune_stats": {"AdaptiveSparkPlan": 1, "BroadcastExchange": 1,
                          "BroadcastHashJoin": 1, "Exchange": 1,
                          "FileScan": 2, "Filter": 1,
                          "HashAggregate": 2, "Project": 2},
    # round-10 addition: the A-ES projection under ONE source-keyed
    # rank window — WindowGroupLimit x2 is the pre-shuffle partial +
    # final top-n cut (the posting_lists shape)
    "weighted_sample_by_source": {"AdaptiveSparkPlan": 1, "Exchange": 2,
                                  "FileScan": 1, "Filter": 2,
                                  "Project": 2, "Sort": 2, "Window": 1,
                                  "WindowGroupLimit": 2},
    # round-10 addition: token explode -> distinct (group, hash) ->
    # the same group-keyed rank-window cut -> per-group estimator agg
    "source_vocab_kmv": {"AdaptiveSparkPlan": 1, "Exchange": 3,
                         "FileScan": 1, "Filter": 2, "Generate": 1,
                         "HashAggregate": 4, "Project": 3, "Sort": 2,
                         "Window": 1, "WindowGroupLimit": 2},
    # round-9 addition: brute top-k (the one LABELED BNLJ, BNLJ_ALLOWED)
    # + the pq rank pipeline + one id-keyed hit join — ann_recall's
    # composition shape over the pq path
    "pq_recall": {"AdaptiveSparkPlan": 1, "BroadcastExchange": 2,
                  "BroadcastHashJoin": 1, "BroadcastNestedLoopJoin": 1,
                  "Exchange": 11, "FileScan": 5, "Filter": 7,
                  "Generate": 1, "HashAggregate": 2, "Project": 17,
                  "Sort": 8, "SortMergeJoin": 2, "Window": 2,
                  "WindowGroupLimit": 4},
    # ---- demoted in the round-8 rotation (driver-green through r7) ----
    # join + agg + TakeOrdered top-k over the order/lineitem fact — the
    # regional_revenue shape (in-window)
    "top_revenue_orders": {"AdaptiveSparkPlan": 1, "BroadcastExchange": 2,
                           "BroadcastHashJoin": 2, "Exchange": 1,
                           "FileScan": 3, "Filter": 3, "HashAggregate": 2,
                           "Project": 6, "TakeOrderedAndProject": 1,
                           "Window": 1},
    # join-free per-row hash projection — the token_counts/text_scrub
    # shape, twin text_stats (in-window)
    "rolling_fingerprint": {"AdaptiveSparkPlan": 1, "Exchange": 1,
                            "FileScan": 1, "Project": 1},
    # the projection half of multimodal_decode's Arrow plumbing (in-window)
    "multimodal_meta": {"AdaptiveSparkPlan": 1, "Exchange": 1,
                        "FileScan": 1, "MapInPandas": 1, "Project": 1},
    # the LABELED brute-force ANN baseline (BNLJ_ALLOWED in the plan
    # audit): broadcast query side + top-k rerank, the same
    # WindowGroupLimit shape as ann_ivf_topk (in-window); ann_recall
    # (local gate) runs this exact pipeline as its first component
    "ann_cosine_topk": {"AdaptiveSparkPlan": 1, "BroadcastExchange": 1,
                        "BroadcastNestedLoopJoin": 1, "Exchange": 3,
                        "FileScan": 2, "Filter": 3, "Project": 6,
                        "Sort": 2, "Window": 1, "WindowGroupLimit": 2},
    # bottom-k sketch via TakeOrderedAndProject — the same ordered-prune
    # shape as heavy_hitters' top-k (in-window)
    "distinct_docs_kmv": {"AdaptiveSparkPlan": 1, "Exchange": 2,
                          "FileScan": 1, "Filter": 1, "HashAggregate": 4,
                          "Project": 1, "TakeOrderedAndProject": 1},
}


def _plan_node_multiset(df) -> dict[str, int]:
    """Leading node-kind per physical-plan line, counted — literals,
    partition counts, and expression ids all excluded by construction."""
    import re

    pat = re.compile(r"^[\s:+*()\d-]*([A-Za-z][A-Za-z0-9]*)")
    out: dict[str, int] = {}
    for line in _plan(df).splitlines():
        m = pat.match(line)
        if m:
            out[m.group(1)] = out.get(m.group(1), 0) + 1
    return out


def test_events_dpp_prunes_at_runtime(spark, sf_dir):
    """The fact scan must carry a dynamicpruningexpression in its
    PartitionFilters — the whole point of the Hive-partitioned layout
    leg: the dim's surviving day keys prune fact DIRECTORIES at
    runtime, without any literal date predicate in the query."""
    import __spark_entry__ as e

    spark.catalog.clearCache()
    plan = _plan(e.queries()["events_dpp"](spark, sf_dir))
    fact_lines = [
        ln for ln in plan.splitlines()
        if "mvrepair_dpp_events" in ln and "FileScan" in ln
    ]
    assert fact_lines, "fact scan not found in plan:\n" + plan
    assert any("dynamicpruningexpression" in ln for ln in fact_lines), (
        "fact scan lost dynamic partition pruning:\n" + plan
    )


def test_twin_fingerprint_table_covers_every_twin():
    import __spark_entry__ as e

    twins = list(e.queries())[50:]
    assert sorted(TWIN_PLAN_FINGERPRINTS) == sorted(twins), (
        "every position-51+ twin needs a frozen plan fingerprint; "
        f"unpinned: {sorted(set(twins) - set(TWIN_PLAN_FINGERPRINTS))}, "
        f"stale: {sorted(set(TWIN_PLAN_FINGERPRINTS) - set(twins))}"
    )


# Entries whose plan string is an EXECUTED AQE plan: compare only the
# node kinds the fingerprint lists (the stable algebra) and ignore AQE
# bookkeeping nodes that shift across patch versions / fixture sizes.
SUBSET_PINNED = {"neardup_minhash_capped", "part_triangles",
                 "part_rank_fusion", "mv_report_text",
                 "minhash_calibration", "similar_parts",
                 "semantic_leakage", "semantic_dedup",
                 "embedding_neardup_banded", "dedup_apply"}


@pytest.mark.parametrize("name", sorted(TWIN_PLAN_FINGERPRINTS))
def test_twin_plan_fingerprint(spark, sf_dir, name):
    import __spark_entry__ as e

    # drop cached frames left by earlier tests (plan-audit CONSTRUCTS
    # every registered query, and queries that persist() register their
    # frames eagerly): Spark's cache manager substitutes a cached
    # fragment into any later plan whose subtree matches, which would
    # make these pins order-dependent (bpe_merges once inherited
    # collocations' cached unigram frame this way)
    spark.catalog.clearCache()
    got = _plan_node_multiset(e.queries()[name](spark, sf_dir))
    if name in SUBSET_PINNED:
        got = {k: got.get(k, 0) for k in TWIN_PLAN_FINGERPRINTS[name]}
    assert got == TWIN_PLAN_FINGERPRINTS[name], (
        f"{name}: physical plan shape diverged from its pinned "
        f"fingerprint — if the change is intentional (and still scale-"
        f"sound), update TWIN_PLAN_FINGERPRINTS.\n"
        f"pinned: {TWIN_PLAN_FINGERPRINTS[name]}\ngot:    {got}"
    )
