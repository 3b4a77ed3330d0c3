"""Property-based tests (hypothesis) — beyond the reference's test
strategy (SURVEY §5 notes it has none).

Each property pins an algebraic invariant of an operator against a plain
Python model on randomized inputs.  Examples are kept small and the Spark
session is reused, so the suite stays fast.
"""

from __future__ import annotations

import hashlib

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F

SETTINGS = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

texts = st.text(
    alphabet=st.sampled_from("ab cdef"), min_size=0, max_size=40
)


def _py_stable_hash64(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


class TestStableHash:
    @SETTINGS
    @given(st.lists(texts, min_size=1, max_size=8, unique=True))
    def test_matches_python_md5_model(self, spark, vals):
        from mvrepair.functions import stable_hash64

        df = spark.createDataFrame([(v,) for v in vals], ["t"])
        got = {r.t: r.h for r in df.select("t", stable_hash64(F.col("t")).alias("h")).collect()}
        assert got == {v: _py_stable_hash64(v) for v in vals}


class TestShingles:
    @SETTINGS
    @given(texts)
    def test_matches_python_model(self, spark, text):
        from mvrepair.operators.dedup import SHINGLE_N, shingles

        df = spark.createDataFrame([(text,)], ["t"])
        [row] = df.select(shingles(F.col("t")).alias("s")).collect()
        toks = text.split(" ")
        want = (
            [" ".join(toks[i : i + SHINGLE_N]) for i in range(len(toks) - SHINGLE_N + 1)]
            if len(toks) >= SHINGLE_N
            else []
        )
        assert row.s == want


class TestMinHash:
    @SETTINGS
    @given(st.lists(texts, min_size=1, max_size=6))
    def test_signature_matches_python_model(self, spark, docs):
        from mvrepair.operators import dedup as D

        rows = [(i, t) for i, t in enumerate(docs)]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        got = {
            r.doc_id: tuple(r[f"sig_{i}"] for i in range(D.N_HASHES))
            for r in D.minhash_signatures(df).collect()
        }
        for i, t in rows:
            toks = t.split(" ")
            sh = (
                {" ".join(toks[j : j + D.SHINGLE_N]) for j in range(len(toks) - D.SHINGLE_N + 1)}
                if len(toks) >= D.SHINGLE_N
                else set()
            )
            hs = [_py_stable_hash64(s) % D.MINHASH_P for s in sh]
            want = tuple(
                min(((a * h + b) % D.MINHASH_P for h in hs), default=None)
                for a, b in zip(D.MINHASH_A, D.MINHASH_B)
            )
            assert got[i] == want

    @SETTINGS
    @given(texts.filter(lambda t: len(t.split(" ")) >= 3))
    def test_identical_docs_always_pair(self, spark, text):
        from mvrepair.operators import dedup as D

        df = spark.createDataFrame([(0, text), (1, text)], ["doc_id", "text"])
        pairs = {(r.id_a, r.id_b) for r in D.minhash_candidate_pairs(df).collect()}
        assert (0, 1) in pairs


class TestSampling:
    @SETTINGS
    @given(st.lists(st.integers(min_value=0, max_value=10**12), min_size=1, max_size=30, unique=True))
    def test_split_is_partition_of_input(self, spark, ids):
        from mvrepair.operators.sampling import hash_split

        df = spark.createDataFrame([(i,) for i in ids], ["doc_id"])
        rows = hash_split(df).collect()
        assert len(rows) == len(ids)
        assert all(r.split in ("train", "val", "test") for r in rows)
        # model: bucket from the same md5 arithmetic
        for r in rows:
            b = _py_stable_hash64(str(r.doc_id)) % 100
            want = "train" if b < 98 else ("val" if b < 99 else "test")
            assert r.split == want


class TestSaltedAgg:
    @SETTINGS
    @given(
        st.lists(
            st.tuples(st.sampled_from("abc"), st.integers(-1000, 1000)),
            min_size=1,
            max_size=40,
        )
    )
    def test_equals_plain_agg(self, spark, rows):
        from mvrepair.operators.skew import salted_agg

        df = spark.createDataFrame(rows, ["k", "v"])
        got = {
            r.k: (r.n, r.tot)
            for r in salted_agg(
                df,
                ["k"],
                {"n": (F.count(F.lit(1)), F.sum("n")), "tot": (F.sum("v"), F.sum("tot"))},
                salt=4,
            ).collect()
        }
        want = {
            r.k: (r.n, r.tot)
            for r in df.groupBy("k")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("tot"))
            .collect()
        }
        assert got == want


class TestHeavyHitters:
    @SETTINGS
    @given(st.lists(texts, min_size=1, max_size=12))
    def test_matches_counter_model(self, spark, docs):
        from collections import Counter

        from mvrepair.operators.text import heavy_hitters

        df = spark.createDataFrame(list(enumerate(docs)), ["doc_id", "text"])
        got = [(r.token, r.n, r.n_docs) for r in heavy_hitters(df, k=5).collect()]

        counts: Counter[str] = Counter()
        doc_sets: dict[str, set[int]] = {}
        for i, t in enumerate(docs):
            for tok in t.split(" "):
                counts[tok] += 1
                doc_sets.setdefault(tok, set()).add(i)
        want = sorted(
            ((tok, n, len(doc_sets[tok])) for tok, n in counts.items()),
            key=lambda x: (-x[1], x[0]),
        )[:5]
        assert got == want


class TestTokenQuantiles:
    @SETTINGS
    @given(st.lists(st.integers(0, 30), min_size=1, max_size=20))
    def test_matches_sorted_position_model(self, spark, lens):
        import math

        from mvrepair.operators.text import token_quantiles

        rows = [(i, "g", " ".join(["t"] * n) if n else "") for i, n in enumerate(lens)]
        df = spark.createDataFrame(rows, ["doc_id", "lang", "text"])
        got = {
            r.pct: r.n_tokens for r in token_quantiles(df).collect()
        }
        # model: "" splits to [''] (1 token) — same as Spark's split
        sizes = sorted(max(n, 1) for n in lens)
        n = len(sizes)
        want = {
            pct: sizes[math.ceil(q * n) - 1]
            for pct, q in [("p25", 0.25), ("p50", 0.5), ("p75", 0.75), ("p90", 0.9)]
        }
        assert got == want


class TestKMV:
    @SETTINGS
    @given(st.lists(texts, min_size=1, max_size=30))
    def test_matches_bottom_k_model(self, spark, vals):
        from mvrepair.operators.sketch import kmv_distinct

        df = spark.createDataFrame([(v,) for v in vals], ["text"])
        [r] = kmv_distinct(df, "text", k=4).collect()
        hashes = sorted({_py_stable_hash64(v) for v in vals})
        bottom = hashes[:4]
        assert r.n_seen == len(bottom)
        assert r.kth_min == bottom[-1]
        if len(hashes) < 4:
            assert r.est_distinct == float(len(hashes))
        else:
            assert r.est_distinct == 3.0 * float(2**60) / float(bottom[-1])


class TestBinnedTemporalJoins:
    H = 3_600_000_000  # bin width (1h in us)

    @SETTINGS
    @given(
        # starts may be NEGATIVE (pre-1970 µs): bin assignment must be true
        # floor division — truncating DIV gave the bin containing zero
        # nearly double width and broke the meet rule's exactly-once
        # guarantee there (round-4 ADVICE)
        st.lists(  # left intervals: (start, length) in quarter-hours
            st.tuples(st.integers(-40, 40), st.integers(0, 12)),
            min_size=1, max_size=8,
        ),
        st.lists(
            st.tuples(st.integers(-40, 40), st.integers(0, 12)),
            min_size=1, max_size=8,
        ),
    )
    def test_interval_overlap_matches_quadratic_model(self, spark, ls, rs):
        from mvrepair.operators.temporal import interval_overlap_join

        Q = self.H // 4  # quarter-hour grid exercises bin boundaries
        left = spark.createDataFrame(
            [(i, s * Q, (s + d) * Q) for i, (s, d) in enumerate(ls)],
            ["l_id", "l_start_us", "l_end_us"],
        )
        right = spark.createDataFrame(
            [(i, s * Q, (s + d) * Q) for i, (s, d) in enumerate(rs)],
            ["r_id", "r_start_us", "r_end_us"],
        )
        got = sorted(
            (r.l_id, r.r_id, r.overlap_us)
            for r in interval_overlap_join(
                left, right, [], "l_start_us", "l_end_us",
                "r_start_us", "r_end_us", bin_width_us=self.H,
            ).collect()
        )
        want = sorted(
            (i, j, min((ls_ + ld) * Q, (rs_ + rd) * Q)
             - max(ls_ * Q, rs_ * Q))
            for i, (ls_, ld) in enumerate(ls)
            for j, (rs_, rd) in enumerate(rs)
            if ls_ * Q < (rs_ + rd) * Q and rs_ * Q < (ls_ + ld) * Q
            and ld > 0 and rd > 0
        )
        assert got == want

    @SETTINGS
    @given(
        st.lists(st.integers(0, 50), min_size=1, max_size=10),  # points
        st.lists(  # intervals
            st.tuples(st.integers(0, 50), st.integers(0, 10)),
            min_size=1, max_size=6,
        ),
    )
    def test_range_join_matches_quadratic_model(self, spark, pts, ivs):
        from datetime import datetime, timedelta

        from mvrepair.operators.temporal import range_join

        # base just before the epoch: the quarter-hour grid straddles
        # t=0, so some points/intervals land on NEGATIVE unix_micros —
        # exercising true-floor bin assignment (see interval test above)
        base = datetime(1969, 12, 31, 20, 0, 0)

        def ts(q):  # quarter-hours from base
            return base + timedelta(minutes=15 * q)

        left = spark.createDataFrame(
            [(i, ts(q)) for i, q in enumerate(pts)], ["p_id", "ts"]
        )
        right = spark.createDataFrame(
            [(i, ts(s), ts(s + d)) for i, (s, d) in enumerate(ivs)],
            ["iv_id", "w_start", "w_end"],
        )
        got = sorted(
            (r.p_id, r.iv_id)
            for r in range_join(
                left, right, [], "ts", "w_start", "w_end"
            ).collect()
        )
        want = sorted(
            (i, j)
            for i, q in enumerate(pts)
            for j, (s, d) in enumerate(ivs)
            if s <= q <= s + d  # both bounds inclusive
        )
        assert got == want


class TestRepetitionStats:
    @SETTINGS
    @given(st.lists(texts, min_size=1, max_size=6))
    def test_matches_python_model(self, spark, docs):
        from collections import Counter

        from mvrepair.operators.text import repetition_stats

        df = spark.createDataFrame(list(enumerate(docs)), ["doc_id", "text"])
        got = {r.doc_id: r for r in repetition_stats(df).collect()}

        def grams(toks, n):
            return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]

        for i, text in enumerate(docs):
            toks = text.split(" ")
            c1 = Counter(toks)
            dup_tok = sum(v for v in c1.values() if v > 1) / len(toks)
            c2, c3 = Counter(grams(toks, 2)), Counter(grams(toks, 3))
            top2 = max(c2.values()) / sum(c2.values()) if c2 else 0.0
            dup3 = (
                sum(v for v in c3.values() if v > 1) / sum(c3.values())
                if c3
                else 0.0
            )
            r = got[i]
            assert r.dup_token_frac == pytest.approx(dup_tok)
            assert r.top_2gram_frac == pytest.approx(top2)
            assert r.dup_3gram_frac == pytest.approx(dup3)
            assert r.repetitive == (top2 > 0.20 or dup3 > 0.30)


class TestSubstringDupStats:
    @SETTINGS
    @given(st.lists(st.text(alphabet=st.sampled_from("xy z"), min_size=0, max_size=30), min_size=1, max_size=6))
    def test_matches_python_model(self, spark, docs):
        from collections import Counter

        from mvrepair.operators.dedup import substring_dup_stats

        N = 3  # small n so short random docs still produce grams
        df = spark.createDataFrame(list(enumerate(docs)), ["doc_id", "text"])
        got = {r.doc_id: r for r in substring_dup_stats(df, n=N).collect()}

        per_doc: dict[int, list[str]] = {}
        corpus: Counter = Counter()
        for i, text in enumerate(docs):
            toks = text.split(" ")
            gs = (
                [" ".join(toks[j : j + N]) for j in range(len(toks) - N + 1)]
                if len(toks) >= N
                else []
            )
            per_doc[i] = gs
            corpus.update(gs)
        for i in range(len(docs)):
            gs = per_doc[i]
            dup = sum(1 for g in gs if corpus[g] > 1)
            r = got[i]
            assert (r.n_grams, r.n_dup_grams) == (len(gs), dup)
            want_frac = dup / len(gs) if gs else 0.0
            assert r.dup_frac == pytest.approx(want_frac)
            assert r.mostly_dup == (want_frac >= 0.3 if gs else False)


class TestSpanDedup:
    @SETTINGS
    @given(
        st.lists(
            st.text(alphabet=st.sampled_from("ab c"), min_size=0, max_size=30),
            min_size=1,
            max_size=8,
        )
    )
    def test_kept_spans_equal_distinct_span_values(self, spark, docs):
        """Exactly one occurrence of every distinct span value survives:
        sum(n_spans - n_removed) == |distinct full-span contents|."""
        from mvrepair.operators.dedup import span_dedup

        w = 3
        df = spark.createDataFrame(list(enumerate(docs)), ["doc_id", "text"])
        rows = span_dedup(df, w=w).collect()
        kept_total = sum(r["n_spans"] - r["n_removed"] for r in rows)
        distinct_spans = set()
        for d in docs:
            toks = d.split(" ")
            for i in range(len(toks) // w):
                distinct_spans.add(" ".join(toks[i * w:(i + 1) * w]))
        assert kept_total == len(distinct_spans)
        # full model comparison (subsumes token conservation; avoids the
        # ambiguity of parsing '' back into tokens)
        occurrences: dict[str, tuple[int, int]] = {}
        for did, d in enumerate(docs):
            toks = d.split(" ")
            for i in range(len(toks) // w):
                occurrences.setdefault(
                    " ".join(toks[i * w:(i + 1) * w]), (did, i)
                )
        for r in rows:
            toks = docs[r["doc_id"]].split(" ")
            nsp = len(toks) // w
            kept_toks = [
                t
                for i in range(nsp)
                if occurrences[" ".join(toks[i * w:(i + 1) * w])]
                == (r["doc_id"], i)
                for t in toks[i * w:(i + 1) * w]
            ] + toks[nsp * w:]
            assert r["clean_text"] == " ".join(kept_toks)


class TestTokenBudgetFill:
    @SETTINGS
    @given(
        st.lists(
            st.tuples(
                st.sampled_from(["s1", "s2"]),
                st.text(alphabet=st.sampled_from("the a of x"), min_size=1, max_size=30),
            ),
            min_size=1,
            max_size=10,
        ),
        st.integers(min_value=1, max_value=40),
        st.sampled_from([1, 2, 3, 4096]),
    )
    def test_budget_respected_and_greedy(self, spark, rows, budget, width):
        from mvrepair.operators.sampling import token_budget_fill

        data = [(i, grp, text) for i, (grp, text) in enumerate(rows)]
        df = spark.createDataFrame(data, ["doc_id", "source", "text"])
        got = token_budget_fill(df, budget=budget, bucket_width=width).collect()
        # budget never exceeded per group
        by_grp: dict[str, int] = {}
        kept = set()
        for r in got:
            by_grp[r["source"]] = by_grp.get(r["source"], 0) + r["n_tokens"]
            kept.add(r["doc_id"])
        assert all(v <= budget for v in by_grp.values())
        # greedy-prefix: matches the plain model exactly
        def q(text):
            toks = text.split(" ")
            stop = {"the", "a", "of", "and", "to", "in", "is", "for"}
            return (
                (1 if 5 <= len(toks) <= 100000 else 0)
                + (1 if any(t in stop for t in toks) else 0)
                + (1 if len(set(toks)) / len(toks) > 0.2 else 0)
            )
        want = set()
        for grp in {g for _, (g, _) in zip(range(len(rows)), rows)}:
            run = 0
            docs = [(i, q(t), len(t.split(" "))) for i, (g, t) in enumerate(rows) if g == grp]
            for did, qs, n in sorted(docs, key=lambda d: (-d[1], d[0])):
                if run + n > budget:
                    break
                run += n
                want.add(did)
        assert kept == want


class TestKeySkewProfile:
    @SETTINGS
    @given(
        st.lists(
            st.integers(min_value=0, max_value=8), min_size=1, max_size=60
        )
    )
    def test_matches_python_model(self, spark, keys):
        """Exact quantile/concentration stats vs a brute-force model on
        random key multisets — pins the ceil-position cross-multiplication
        and the partial-top-K accounting."""
        import math
        from collections import Counter

        from mvrepair.operators.sketch import key_skew_profile

        df = spark.createDataFrame([(k,) for k in keys], ["k"])
        got = {
            r["stat"]: r["value"]
            for r in key_skew_profile(df, "k", top_keys=10).collect()
        }
        sizes = sorted(Counter(keys).values())
        n_rows, n_keys = len(keys), len(sizes)

        def q(frac_num, frac_den):
            pos = -(-frac_num * n_keys // frac_den)  # ceil
            return sizes[pos - 1]

        top10 = sum(sorted(sizes, reverse=True)[:10])
        assert got["n_rows"] == n_rows
        assert got["n_keys"] == n_keys
        assert got["max_size"] == sizes[-1]
        assert got["p50_size"] == q(1, 2)
        assert got["p90_size"] == q(9, 10)
        assert got["p99_size"] == q(99, 100)
        assert got["top1_share_micro"] == sizes[-1] * 1000000 // n_rows
        assert got["top10_share_micro"] == top10 * 1000000 // n_rows


class TestDsirScores:
    @SETTINGS
    @given(
        st.lists(
            st.tuples(
                st.booleans(),
                st.text(alphabet=st.sampled_from("ab cd"), min_size=1, max_size=20),
            ),
            min_size=1,
            max_size=12,
        ).filter(lambda rows: any(t for t, _ in rows))
    )
    def test_matches_python_model(self, spark, rows):
        """dsir_micro vs a Python replica of the micro-quantized
        log-likelihood-ratio arithmetic — py_micro_log2 composes only
        IEEE-exact float ops, so the model is EXACT, not same-libm."""
        from collections import Counter

        from mvrepair.functions.exactlog import py_micro_log2
        from mvrepair.operators.sampling import dsir_scores

        B = 16
        data = [(i, text, "t" if is_t else "r") for i, (is_t, text) in enumerate(rows)]
        df = spark.createDataFrame(data, ["doc_id", "text", "grp"])
        got = {
            r["doc_id"]: (r["n_tokens"], r["dsir_micro"])
            for r in dsir_scores(df, F.col("grp") == "t", buckets=B).collect()
        }

        def bucket(tok):
            return _py_stable_hash64(tok) % B

        cr, ct = Counter(), Counter()
        for _, text, grp in data:
            for tok in text.split(" "):
                b = bucket(tok)
                cr[b] += 1
                if grp == "t":
                    ct[b] += 1
        tr, tt = sum(cr.values()), sum(ct.values())
        w = {
            b: py_micro_log2(
                ((ct[b] + 1) / (tt + B)) / ((cr[b] + 1) / (tr + B))
            )
            for b in cr
        }
        want = {}
        for did, text, _ in data:
            toks = text.split(" ")
            want[did] = (len(toks), sum(w[bucket(t)] for t in toks))
        assert got == want


class TestNaiveBayes:
    @SETTINGS
    @given(
        st.lists(
            st.tuples(
                st.sampled_from(["x", "y"]),
                st.text(alphabet=st.sampled_from("ab cd"), min_size=1, max_size=16),
            ),
            min_size=2,
            max_size=10,
        ).filter(lambda rows: len({g for g, _ in rows}) == 2)
    )
    def test_matches_python_model(self, spark, rows):
        """Predictions + posterior micro-scores vs a Python replica of the
        densified add-one NB arithmetic (exact py_micro_log2 model)."""
        from collections import Counter

        from mvrepair.functions.exactlog import py_micro_log2
        from mvrepair.operators.nbayes import nb_train_classify

        B = 16
        data = [(i, text, grp) for i, (grp, text) in enumerate(rows)]
        df = spark.createDataFrame(data, ["doc_id", "text", "lang"])
        got = {
            r["doc_id"]: (r["pred"], r["score_micro"])
            for r in nb_train_classify(df, buckets=B).collect()
        }

        def bucket(tok):
            return _py_stable_hash64(tok) % B

        classes = sorted({g for _, _, g in data})
        ct = {c: Counter() for c in classes}
        nd = Counter()
        for _, text, grp in data:
            nd[grp] += 1
            for tok in text.split(" "):
                ct[grp][bucket(tok)] += 1
        n_docs = sum(nd.values())
        w = {
            c: {
                b: py_micro_log2((ct[c][b] + 1) / (sum(ct[c].values()) + B))
                for b in range(B)
            }
            for c in classes
        }
        prior = {c: py_micro_log2(nd[c] / n_docs) for c in classes}
        want = {}
        for did, text, _ in data:
            posts = {
                c: prior[c] + sum(w[c][bucket(t)] for t in text.split(" "))
                for c in classes
            }
            # tie-break: highest post, then lexicographically SMALLEST class
            best = sorted(classes, key=lambda c: (-posts[c], c))[0]
            want[did] = (best, posts[best])
        assert got == want


class TestMicroLog2CrossEngine:
    """Boundary-adversarial verification of the exactlog convention that
    replaced floor(ln(ratio)*1e6) in nb_classify / dsir_scores.

    History: the original ln-micro convention was tested here against
    count grids tuned (via continued-fraction convergents of
    exp(k*1e-6)) to land within ~1 ulp of a floor boundary — and FAILED:
    10 of ~11k grids floored differently in Spark (Java Math.log) vs
    DuckDB (libm log), e.g. ln(268159373/6065685)*1e6 → 3788933 vs
    3788934.  micro_log2 composes only IEEE-correctly-rounded ops, so
    the same adversarial construction (now also aimed at the log2
    quantization boundaries 2^(k/2^20)) must agree EXACTLY across
    Spark, DuckDB, and the plain-Python model — on every grid, not
    statistically.
    """

    @staticmethod
    def _boundary_pairs() -> list[tuple[int, int]]:
        import math
        import random
        from fractions import Fraction

        from mvrepair.functions.exactlog import SCALE

        rng = random.Random(0xB0FF)
        pairs: list[tuple[int, int]] = []
        seen: set[tuple[int, int]] = set()
        targets: list[float] = []
        # old-convention boundaries (exp(k/1e6)) — where libm ln was
        # observed to diverge — plus the new convention's own
        # quantization boundaries (2^(k/2^20))
        for k in rng.sample(range(-14_000_000, 14_000_000), 1400):
            if k:
                targets.append(math.exp(k * 1e-6))
        for k in rng.sample(range(-40 * SCALE, 40 * SCALE), 1400):
            if k:
                targets.append(2.0 ** (k / SCALE))
        for r in targets:
            fr = Fraction(r)  # exactly the double
            for dmax in (10**3, 10**5, 10**7, 10**9, 10**11, 10**12):
                c = fr.limit_denominator(dmax)
                a, b = c.numerator, c.denominator
                # keep counts int64-exact as doubles
                if a < 1 or a > 2**50 or b > 2**50 or (a, b) in seen:
                    continue
                seen.add((a, b))
                pairs.append((a, b))
        return pairs

    def test_micro_log2_agrees_across_spark_duckdb_python(self, spark):
        import duckdb

        from mvrepair.functions.exactlog import (
            micro_log2_df,
            micro_log2_sql,
            py_micro_log2,
        )

        pairs = self._boundary_pairs()
        assert len(pairs) >= 10_000, len(pairs)
        model = {(a, b): py_micro_log2(a / b) for a, b in pairs}

        df = spark.createDataFrame(pairs, ["a", "b"])
        got_spark = {
            (r["a"], r["b"]): r["w"]
            for r in micro_log2_df(
                df, F.col("a").cast("double") / F.col("b"), "w", ["a", "b"]
            ).collect()
        }
        mism = {p: (model[p], got_spark[p]) for p in model if model[p] != got_spark[p]}
        assert not mism, f"{len(mism)} spark-vs-model divergences: {list(mism.items())[:5]}"

        con = duckdb.connect()
        con.execute("CREATE TABLE g(a BIGINT, b BIGINT)")
        con.executemany("INSERT INTO g VALUES (?, ?)", pairs)
        sql = micro_log2_sql(
            "SELECT a, b, CAST(a AS DOUBLE)/b AS r FROM g", "r", ["a", "b"], "w"
        )
        got_duck = {(a, b): w for a, b, w in con.execute(sql).fetchall()}
        mism = {p: (model[p], got_duck[p]) for p in model if model[p] != got_duck[p]}
        assert not mism, f"{len(mism)} duckdb-vs-model divergences: {list(mism.items())[:5]}"

    def test_micro_log2_is_monotone_and_anchored(self, spark):
        # quantization sanity on exact powers of two and monotonicity on
        # a sorted ratio sweep — accuracy is secondary to cross-engine
        # equality, but the ranking NB/dsir consume must be preserved
        import math
        import random

        from mvrepair.functions.exactlog import SCALE, py_micro_log2

        for k in range(-60, 61):
            assert py_micro_log2(2.0**k) == k * SCALE
        rng = random.Random(3)
        xs = sorted(math.exp(rng.uniform(-40, 40)) for _ in range(5000))
        ws = [py_micro_log2(x) for x in xs]
        assert all(w1 <= w2 for w1, w2 in zip(ws, ws[1:]))
        # resolution: within 2 quantization steps of true log2
        for x, w in zip(xs, ws):
            assert abs(w / SCALE - math.log2(x)) < 2.0 / SCALE * SCALE / SCALE + 2e-6


class TestBudgetApportion:
    @SETTINGS
    @given(
        st.lists(
            st.tuples(st.integers(0, 25), st.integers(1, 10_000)),
            min_size=1,
            max_size=12,
            unique_by=lambda t: t[0],
        ),
        st.integers(0, 100_000),
    )
    def test_exact_sum_and_quota_property(self, spark, rows, budget):
        """Hamilton invariants on random weights: allocations sum
        EXACTLY to the budget, and every allocation is within 1 of the
        real-valued proportional share (the quota property)."""
        from mvrepair.operators.sampling import budget_apportion

        df = spark.createDataFrame(
            [(f"k{k}", w) for k, w in rows], "k string, w long"
        )
        out = budget_apportion(df, "k", "w", budget).collect()
        total_w = sum(w for _, w in rows)
        assert sum(r["alloc"] for r in out) == budget
        for r in out:
            share = budget * r["wt"] / total_w
            assert share - 1 < r["alloc"] < share + 1


class TestGini:
    @SETTINGS
    @given(
        st.lists(st.integers(0, 10_000), min_size=2, max_size=40).filter(
            lambda xs: sum(xs) > 0
        )
    )
    def test_matches_python_model_and_bounds(self, spark, vals):
        from mvrepair.operators.dq import gini_concentration

        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vals)], "k long, v long"
        )
        [r] = gini_concentration(df, "k", "v").collect()
        xs = sorted(vals)
        n, tot = len(xs), sum(xs)
        num = sum((2 * (i + 1) - n - 1) * x for i, x in enumerate(xs))
        assert r["gini_micro"] == (1_000_000 * num) // (n * tot)
        assert 0 <= r["gini_micro"] < 1_000_000


class TestKMSurvival:
    @SETTINGS
    @given(
        st.lists(
            st.tuples(
                st.integers(0, 10),  # duration bucket (hours)
                st.booleans(),  # converted?
            ),
            min_size=1,
            max_size=20,
        )
    )
    def test_matches_python_recurrence(self, spark, subjects):
        """The in-plan fold equals the plain-Python KM recurrence on
        arbitrary (duration, converted) life histories."""
        from datetime import datetime, timedelta

        from mvrepair.operators.temporal import km_survival

        base = datetime(2024, 1, 1)
        rows = []
        for uid, (t, conv) in enumerate(subjects):
            rows.append((uid, base, "view"))
            if conv:
                rows.append((uid, base + timedelta(hours=t), "purchase"))
            elif t > 0:
                rows.append((uid, base + timedelta(hours=t), "view"))
        df = spark.createDataFrame(
            rows, "user_id long, ts timestamp, event_type string"
        )
        got = {r["t"]: r for r in km_survival(df).collect()}
        # python model
        from collections import Counter

        d, c = Counter(), Counter()
        for t, conv in subjects:
            (d if conv else c)[t] += 1
        n = len(subjects)
        s = 1_000_000
        for t in sorted(set(d) | set(c)):
            s = s * (n - d[t]) // n
            assert got[t]["n"] == n and got[t]["d"] == d[t]
            assert got[t]["c"] == c[t] and got[t]["s_micro"] == s
            n -= d[t] + c[t]


class TestLinearAttribution:
    @SETTINGS
    @given(st.integers(1, 25))
    def test_per_conversion_credit_sums_to_exactly_one(self, spark, n_touch):
        """For ANY touch count the Hamilton split hands out exactly 1e6
        micro-credits."""
        from datetime import datetime, timedelta

        from mvrepair.operators.temporal import linear_attribution

        base = datetime(2024, 1, 5)
        rows = [
            (i, base + timedelta(minutes=i), 1, "view")
            for i in range(n_touch)
        ] + [(99, base + timedelta(hours=1), 1, "purchase")]
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, event_type string"
        )
        out = linear_attribution(df).collect()
        assert sum(r["credit_micro"] for r in out) == 1_000_000
        assert out[0]["total_credit_micro"] == 1_000_000
