"""Anti-pattern sweep over EVERY registered query's physical plan.

The per-query pinned fingerprints (test_plans.py) freeze known-good
shapes; this audit is the complementary blanket invariant — no query,
present or future, may plan a scale-breaking node:

- ``CartesianProduct``: an unkeyed all-pairs join is never acceptable.
- ``BatchEvalPython``: a row-at-a-time Python UDF in the hot path (the
  Arrow-batched forms — ArrowEvalPython / MapInPandas / FlatMapGroupsIn
  Pandas — are the sanctioned escape hatch and stay allowed).
- ``BroadcastNestedLoopJoin``: allowed only where a labeled design says
  so (the brute-force ANN baseline's broadcast crossJoin).

Batch queries are audited at plan-CONSTRUCTION time — usually no
execution, though some query fns legitimately run eager sub-steps while
building the frame (label_outliers' centroid collect; index_upsert /
dedup_apply localCheckpoints), so the audit itself may execute
substantial jobs for those.  The audited object is always the FINAL
frame's physical plan.  Streaming-backed queries execute a micro-batch
inside their query fn by construction, so the audit skips them here —
their plans are pinned family-wise in test_plans.py and their batch
twins are audited.
"""

from __future__ import annotations

import pytest

# queries whose DESIGN legitimately includes the node (each labeled as
# such in its docstring).  The allowlist is SELF-CHECKING: the audit
# asserts each member's plan actually CONTAINS a BNLJ, so entries can't
# rot into silent regression masks (round-9 verdict: a stale
# embedding_neardup entry sat here for rounds after the query moved to
# the LSH-bucketed path).
BNLJ_ALLOWED = {
    "ann_cosine_topk",   # labeled brute-force baseline: broadcast crossJoin
    "ann_recall",        # composes the brute-force baseline by definition
    "pq_recall",         # composes the brute-force baseline by definition
    "ann_rbo",           # composes the brute-force baseline by definition
}

# streaming-backed entries run a real micro-batch when the fn is called —
# exclude from the (otherwise plan-only) audit
STREAMING = {
    "events_hourly_stream", "dedup_exact_stream", "mv_classify_stream",
    "mv_upserts_stream", "events_latest_stream", "sessions_stream",
    "neardup_stream", "nb_stream", "events_sliding_stream",
    "view_purchase_stream", "cms_stream", "pca_stream",
    "price_hist_stream", "events_drift_stream",
}

NEVER = ("CartesianProduct", "BatchEvalPython")


def _audit_names():
    import __spark_entry__ as e

    return [n for n in e.queries() if n not in STREAMING]


@pytest.mark.parametrize("name", _audit_names())
def test_no_scale_breaking_plan_nodes(spark, sf_dir, name):
    import __spark_entry__ as e

    plan = (
        e.queries()[name](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for node in NEVER:
        assert node not in plan, f"{name}: {node} in physical plan\n{plan}"
    if name not in BNLJ_ALLOWED:
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name}: unlabeled BroadcastNestedLoopJoin — either key the "
            f"join or add the query to BNLJ_ALLOWED with a docstring "
            f"label\n{plan}"
        )
    else:
        # self-check: an allowlist entry must still NEED its excuse —
        # a member whose plan no longer contains a BNLJ would silently
        # mask a future regression that reintroduces one
        assert "BroadcastNestedLoopJoin" in plan, (
            f"{name}: listed in BNLJ_ALLOWED but its plan contains no "
            f"BroadcastNestedLoopJoin — remove the stale entry so the "
            f"blanket guard applies again"
        )
