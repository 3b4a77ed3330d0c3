"""Self-test of the local correctness gate's compare semantics.

Round-4 verdict item #6: the gate compared an order-insensitive multiset,
so ORDER BY row-order divergence was locally invisible.  These tests pin
the fix: oracles with a top-level ORDER BY are compared as row
sequences, and a deliberately shuffled ordered result FAILS the gate.
"""

import sys

sys.path.insert(0, "/root/repo/tools")

from check_oracle import (  # noqa: E402
    df_to_multiset,
    df_to_sequence,
    has_toplevel_order_by,
)


class TestOrderByDetection:
    def test_plain_order_by(self):
        assert has_toplevel_order_by("SELECT a FROM t ORDER BY a")

    def test_order_by_with_limit(self):
        assert has_toplevel_order_by("SELECT a FROM t ORDER BY a DESC LIMIT 5")

    def test_no_order_by(self):
        assert not has_toplevel_order_by("SELECT a, count(*) FROM t GROUP BY a")

    def test_subquery_order_by_is_not_toplevel(self):
        sql = "SELECT * FROM (SELECT a FROM t ORDER BY a LIMIT 3) s"
        assert not has_toplevel_order_by(sql)

    def test_window_order_by_is_not_toplevel(self):
        sql = ("SELECT a, row_number() OVER (PARTITION BY b ORDER BY c) rn "
               "FROM t")
        assert not has_toplevel_order_by(sql)

    def test_cte_then_toplevel_order_by(self):
        sql = ("WITH s AS (SELECT a FROM t ORDER BY a LIMIT 3) "
               "SELECT * FROM s ORDER BY a")
        assert has_toplevel_order_by(sql)

    def test_order_inside_string_literal_ignored(self):
        assert not has_toplevel_order_by(
            "SELECT 'ORDER BY nothing' AS s FROM t")

    def test_case_insensitive(self):
        assert has_toplevel_order_by("select a from t order by a")


class TestShuffledOrderedResultFails:
    COLS = ["k", "v"]
    ROWS = [(1, "a"), (2, "b"), (3, "c")]
    SHUFFLED = [(3, "c"), (1, "a"), (2, "b")]

    def test_sequence_compare_catches_shuffle(self):
        # The fix: an ordered oracle compared as a sequence FAILS when the
        # engine returns the right rows in the wrong order.
        assert (df_to_sequence(self.COLS, self.ROWS)
                != df_to_sequence(self.COLS, self.SHUFFLED))

    def test_multiset_compare_would_have_missed_it(self):
        # The pre-fix behavior (documents why the sequence path exists).
        assert (df_to_multiset(self.COLS, self.ROWS)
                == df_to_multiset(self.COLS, self.SHUFFLED))

    def test_sequence_compare_passes_when_order_matches(self):
        assert (df_to_sequence(self.COLS, self.ROWS)
                == df_to_sequence(self.COLS, list(self.ROWS)))
