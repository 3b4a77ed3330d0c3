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
