"""Greedy k-center selection (mvrepair.operators.selection).

Properties pinned:
- parity with a pure-Python replay of the identical greedy rounds
  (seed = max squared norm, then repeated max-min, ties to lowest id)
  on the real fixture — centers AND full assignment;
- the covering radius (max over points of distance to nearest center)
  is non-increasing in k — the greedy invariant;
- centers self-assign at distance 0 with their own selection round;
- no persisted frame survives the call (the loop's scoped persists are
  all released; the returned assignment is a lazy map-side plan).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mvrepair.operators import selection as SEL


def _load(spark, sf_dir, n=None):
    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    if n is not None:
        df = df.orderBy("vec_id").limit(n)
    return df


def _py_quant(vec):
    import math

    return [int(math.floor(float(x) * 1_000_000)) for x in vec]


def _py_greedy(rows, k):
    """Reference replay: rows = {id: qv}."""

    def d2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    seed = max(rows, key=lambda i: (sum(v * v for v in rows[i]), -i))
    # ties to LOWEST id: max() above prefers -i max == lowest id
    centers = [(0, seed)]
    mind2 = {i: d2(rows[i], rows[seed]) for i in rows}
    for rnd in range(1, k):
        far = max(rows, key=lambda i: (mind2[i], -i))
        centers.append((rnd, far))
        for i in rows:
            d = d2(rows[i], rows[far])
            if d < mind2[i]:
                mind2[i] = d
    assign = {}
    for i in rows:
        best = min(
            (d2(rows[i], rows[cid]), rnd, cid) for rnd, cid in centers
        )
        assign[i] = best
    return centers, assign


@pytest.fixture(scope="module")
def tiny(spark, sf_dir):
    df = _load(spark, sf_dir, n=60)
    rows = {
        r["vec_id"]: _py_quant(r["embedding"])
        for r in df.collect()
    }
    return df, rows


def test_matches_python_replay(tiny):
    df, rows = tiny
    centers, out = SEL.kcenter_select(df, k=4)
    ref_centers, ref_assign = _py_greedy(rows, 4)
    assert [(rnd, cid) for rnd, cid, _ in centers] == ref_centers
    got = {
        r["vec_id"]: (r["d2"], r["center_round"], r["center_id"])
        for r in out.collect()
    }
    assert got == ref_assign


def test_radius_non_increasing(tiny):
    df, _ = tiny
    radii = []
    for k in (1, 2, 4, 6):
        _, out = SEL.kcenter_select(df, k=k)
        radii.append(out.agg(F.max("d2")).collect()[0][0])
    assert radii == sorted(radii, reverse=True)
    assert radii[0] > radii[-1] > 0  # real progress on this fixture


def test_centers_self_assign(spark, sf_dir):
    df = _load(spark, sf_dir)
    centers, out = SEL.kcenter_select(df, k=5)
    cids = [cid for _, cid, _ in centers]
    assert len(set(cids)) == 5
    got = {
        r["vec_id"]: r
        for r in out.filter(F.col("is_center")).collect()
    }
    assert sorted(got) == sorted(cids)
    for rnd, cid, _ in centers:
        assert got[cid]["d2"] == 0
        assert got[cid]["center_round"] == rnd
    assert out.filter(~F.col("is_center") & (F.col("d2") == 0)).count() == 0


def test_no_persisted_frame_survives(spark, sf_dir):
    jsc = spark.sparkContext._jsc
    before = set(jsc.getPersistentRDDs().keySet().toArray())
    _, out = SEL.kcenter_select(_load(spark, sf_dir), k=3)
    out.count()
    after = set(jsc.getPersistentRDDs().keySet().toArray())
    assert after <= before


def test_k_validation(spark, sf_dir):
    with pytest.raises(ValueError):
        SEL.kcenter_select(_load(spark, sf_dir), k=0)


# ------------------------------------------------------------------ MMR


def _py_cos_micro(a, b):
    import math

    dot = sum(x * y for x, y in zip(a, b))
    return math.floor(
        dot
        / (
            math.sqrt(sum(x * x for x in a))
            * math.sqrt(sum(y * y for y in b))
        )
        * 1000000.0
    )


def _py_mmr(rows, k, qid, ln=7, ld=10):
    q = rows[qid]
    rel = {i: _py_cos_micro(rows[i], q) for i in rows}
    seed = max(rows, key=lambda i: (rel[i], -i))
    picks = [(0, seed)]
    ms = {i: _py_cos_micro(rows[i], rows[seed]) for i in rows}
    for rnd in range(1, k):
        cand = [i for i in rows if i not in {p for _, p in picks}]
        best = max(cand, key=lambda i: (ln * rel[i] - (ld - ln) * ms[i], -i))
        picks.append((rnd, best))
        for i in rows:
            s = _py_cos_micro(rows[i], rows[best])
            if s > ms[i]:
                ms[i] = s
    return picks, rel, ms


def test_mmr_matches_python_replay(tiny):
    df, rows = tiny
    qid = min(rows)
    picks, out = SEL.mmr_select(df, k=5)
    ref_picks, rel, ms = _py_mmr(rows, 5, qid)
    assert [(rnd, pid) for rnd, pid, _ in picks] == ref_picks
    got = {r["vec_id"]: r for r in out.collect()}
    ranks = dict((pid, rnd) for rnd, pid in ref_picks)
    for i in rows:
        assert got[i]["rel_micro"] == rel[i]
        assert got[i]["maxsim_micro"] == ms[i]
        assert got[i]["selected"] == (i in ranks)
        assert got[i]["sel_rank"] == ranks.get(i)


def test_mmr_pure_relevance_is_topk(tiny):
    df, rows = tiny
    qid = min(rows)
    rel = {i: _py_cos_micro(rows[i], rows[qid]) for i in rows}
    topk = sorted(rows, key=lambda i: (-rel[i], i))[:4]
    picks, _ = SEL.mmr_select(df, k=4, lam_num=10, lam_den=10)
    assert [pid for _, pid, _ in picks] == topk


def test_mmr_diversifies_vs_pure_relevance(tiny):
    df, rows = tiny

    def max_pairwise(ids):
        return max(
            _py_cos_micro(rows[a], rows[b])
            for a in ids
            for b in ids
            if a < b
        )

    pure, _ = SEL.mmr_select(df, k=5, lam_num=10, lam_den=10)
    div, _ = SEL.mmr_select(df, k=5, lam_num=5, lam_den=10)
    assert max_pairwise([p for _, p, _ in div]) <= max_pairwise(
        [p for _, p, _ in pure]
    )


def test_mmr_no_persisted_frame_survives(spark, sf_dir):
    jsc = spark.sparkContext._jsc
    before = set(jsc.getPersistentRDDs().keySet().toArray())
    _, out = SEL.mmr_select(_load(spark, sf_dir), k=3)
    out.count()
    after = set(jsc.getPersistentRDDs().keySet().toArray())
    assert after <= before


def test_mmr_validation(spark, sf_dir):
    import pytest as _pytest

    with _pytest.raises(ValueError):
        SEL.mmr_select(_load(spark, sf_dir), k=0)
    with _pytest.raises(ValueError):
        SEL.mmr_select(_load(spark, sf_dir), k=2, lam_num=0)
    with _pytest.raises(ValueError):
        SEL.mmr_select(_load(spark, sf_dir), k=2, lam_num=11, lam_den=10)
