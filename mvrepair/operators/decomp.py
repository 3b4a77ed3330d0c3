"""Exact-integer spectral decomposition: single-pass covariance
sufficient statistics + power-iteration PCA over embedding columns.

The dimensionality-reduction primitive of an embedding pipeline
(decorrelate before LSH, compress before storage, rank by principal
component for curriculum/outlier sweeps), built the way every iterative
algorithm here is built (the kmeans / pagerank doctrine): quantize once,
then keep EVERY arithmetic step in deterministic int64 — floor-quantized
components, integer cross-products, truncating integer divisions — so a
DuckDB oracle replays the entire eigen-iteration bit-for-bit and the
driver hash gates it like any aggregate.

Scale design (the tall-skinny Gram trick, e.g. Constantine & Gleich,
"Tall and skinny QR factorizations in MapReduce"): a d-dimensional
corpus of ANY row count reduces to d(d+1)/2 + d + 1 sufficient
statistics — each executor folds its partition into a local d x d
int64 Gram via one Arrow-batched ``mapInPandas`` (built-in column
algebra cannot express a 2080-cell outer-product fold without either a
2080-column aggregate or a 2080x row Expand; this is the legitimate
Pandas-UDF case), and the shuffle carries <= 2,145 rows per partition.
The eigen-iteration then runs driver-side on that bounded artifact (the
train_kmeans model doctrine) and the principal axis broadcasts back as
a literal for the projection — corpus scanned twice total (stats,
scores), no corpus-sized shuffle anywhere.

Centering without division: covariance is kept as the integer matrix
M = n*S - s s^T  (n^2 times the covariance), which preserves
eigenvectors exactly; projections use the n-scaled centered component
(n*q_ij - s_j), again eigen-direction-preserving.  Truncating division
(DuckDB ``//`` semantics) is used for the two per-iteration rescales.

Domain preconditions (the normalize_expr doctrine — documented AND
enforced): with quantization Q and n rows of d components bounded by
|x| <= X, the statistics need n*(QX)^2 < 2^62 and (n*QX)^2 < 2^62 for
the n*S and s_i*s_j products; ``principal_axis`` asserts both on the
ACTUAL collected values and names the sizing rule (shrink Q as n
grows: Q ~ 2^31 / (n*X)) in the error.  After the M rescale every
iteration value is bounded by construction (|M'| < 2^30, |v| <= 2^20,
|u| <= d * 2^50), independent of data.
"""

from __future__ import annotations

import math
from typing import Iterable, Iterator

from pyspark.sql import DataFrame, functions as F

QUANT = 10_000  # component quantization (4 decimal digits)
VSCALE = 1 << 20  # iteration vector magnitude cap
MCAP = 1 << 30  # rescaled-matrix magnitude cap
PCA_ITERS = 6


def _tdiv(a: int, b: int) -> int:
    """Integer division truncating toward zero — DuckDB's ``//`` (and
    Spark's ``div``); Python's ``//`` floors, which differs on negative
    numerators, so every oracle-replayed division goes through this."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def pca_suffstats(
    df: DataFrame,
    vec_col: str,
    dim: int,
    quant: int = QUANT,
    group_col: str | None = None,
) -> DataFrame:
    """One corpus pass -> the bounded sufficient-statistics frame.

    Encoding (merged by one map-combinable sum): rows (i, j, v) with
    0 <= i <= j < dim hold the Gram cell sum(q_i * q_j); rows (i, -1)
    hold the component sum s_i; row (-1, -1) holds the row count.
    Output: <= dim*(dim+1)/2 + dim + 1 rows.

    With ``group_col`` (an integral key; a bounded enum by contract)
    the Arrow fold accumulates one Gram per group PER BATCH — grouped
    model fitting at the SAME per-row cost as the global fold (a numpy
    slice per group, still sums not rows through the partial agg; the
    column-algebra ``pca_suffstats_cells`` pays ~d^2/2 exploded rows
    per input row for the same grouped result — measured 0.99-exponent
    and ~20x the wall at 30x volume — so the Arrow path is the batch
    form and the cells path exists for streaming state).  Output gains
    the group column.
    """

    def fold(batches: Iterable) -> Iterator:
        import numpy as np
        import pandas as pd

        accs: dict = {}

        def acc_for(key):
            if key not in accs:
                accs[key] = [
                    np.zeros((dim, dim), dtype=np.int64),
                    np.zeros(dim, dtype=np.int64),
                    0,
                ]
            return accs[key]

        for pdf in batches:
            if len(pdf) == 0:
                continue
            Q = np.floor(
                np.stack(pdf[vec_col].to_numpy()).astype(np.float64) * quant
            ).astype(np.int64)
            if Q.shape[1] != dim:
                raise ValueError(
                    f"pca_suffstats: expected dim={dim}, got {Q.shape[1]}"
                )
            if group_col is None:
                parts = [(None, np.arange(len(pdf)))]
            else:
                keys = pdf[group_col].to_numpy()
                parts = [
                    (k, np.nonzero(keys == k)[0])
                    for k in np.unique(keys)
                ]
            for key, idx in parts:
                Qg = Q[idx]
                a = acc_for(key)
                a[0] += Qg.T @ Qg
                a[1] += Qg.sum(axis=0)
                a[2] += len(idx)
        if not accs:
            return
        iu, ju = np.triu_indices(dim)
        frames = []
        for key, (G, s, n) in accs.items():
            pdf_out = pd.DataFrame(
                {
                    "i": np.concatenate([iu, np.arange(dim), [-1]]),
                    "j": np.concatenate([ju, np.full(dim, -1), [-1]]),
                    "v": np.concatenate([G[iu, ju], s, [n]]),
                }
            )
            if group_col is not None:
                pdf_out.insert(0, group_col, int(key))
            frames.append(pdf_out)
        yield pd.concat(frames, ignore_index=True)

    if group_col is None:
        return (
            df.select(vec_col)
            .mapInPandas(fold, schema="i int, j int, v long")
            .groupBy("i", "j")
            .agg(F.sum("v").alias("v"))
        )
    return (
        df.select(group_col, vec_col)
        .mapInPandas(fold, schema=f"{group_col} long, i int, j int, v long")
        .groupBy(group_col, "i", "j")
        .agg(F.sum("v").alias("v"))
    )


def principal_axis(
    stats_rows, dim: int, iters: int = PCA_ITERS
) -> tuple[list[int], int, list[int]]:
    """Driver-side exact-integer power iteration on the collected
    sufficient statistics (a bounded model artifact, never the corpus).

    Returns (v, n, s): the principal-axis vector (ints, |v| <= 2^20),
    the row count, and the component sums — everything ``pca_scores``
    needs to project.  Deterministic: all-ones start, fixed ``iters``,
    truncating divisions; M = n*S - s s^T is PSD so the iterate never
    flips sign.
    """
    S = {}
    s = [0] * dim
    n = 0
    for r in stats_rows:
        i, j, v = int(r["i"]), int(r["j"]), int(r["v"])
        if i == -1:
            n = v
        elif j == -1:
            s[i] = v
        else:
            S[(i, j)] = v
    if n <= 0:
        raise ValueError("principal_axis: empty corpus")
    max_S = max(abs(v) for v in S.values()) if S else 0
    max_s = max(abs(x) for x in s)
    if n * max_S >= 1 << 62 or max_s * max_s >= 1 << 62:
        raise ValueError(
            "principal_axis: statistics exceed the int64 domain "
            f"(n*max|S|={n * max_S}, max|s|^2={max_s * max_s}); shrink "
            "the quantization as the corpus grows (Q ~ 2^31 / (n*X) "
            "for components bounded by X)"
        )
    # The projection bound the docstring promises: pca_scores computes
    # Σ_j (n*q_j - s_j)*v_j with |v_j| <= VSCALE, so each of the dim
    # terms must stay under 2^62/dim.  max|q_j| is derivable from the
    # collected diagonal — S_jj = Σ_rows q_j² >= q_j² for every row —
    # so n*max|q| <= n*ceil(sqrt(max_j S_jj)).  The sum-based max_s²
    # check above can pass on centered data (sums near zero) while
    # n*max|q| is huge; this is the check that actually guards the
    # per-row projection term (round-10 ADVICE).
    max_diag = max(
        (v for (i, j), v in S.items() if i == j), default=0
    )
    q_bound = math.isqrt(max(max_diag, 0)) + 1
    if (n * q_bound + max_s) * VSCALE >= (1 << 62) // max(dim, 1):
        raise ValueError(
            "principal_axis: projection term would exceed int64 "
            f"(n*max|q| bound={n * q_bound}, max|s|={max_s}, dim={dim}, "
            f"VSCALE={VSCALE}); shrink the quantization as the corpus "
            "grows (Q ~ 2^31 / (n*X) for components bounded by X)"
        )
    M = [[0] * dim for _ in range(dim)]
    for (i, j), v in S.items():
        m = n * v - s[i] * s[j]
        M[i][j] = m
        if i != j:
            M[j][i] = m
    max_m = max(abs(M[i][j]) for i in range(dim) for j in range(dim))
    d = max(1, max_m // MCAP)
    Ms = [[_tdiv(M[i][j], d) for j in range(dim)] for i in range(dim)]
    v = [VSCALE] * dim
    for _ in range(iters):
        u = [
            sum(Ms[i][j] * v[j] for j in range(dim)) for i in range(dim)
        ]
        # no early exit on mx == 0 (zero-variance corpus -> axis and
        # all scores collapse to 0): the oracle's unrolled recurrence
        # has no branch, so neither does this
        mx = max(abs(x) for x in u)
        d2 = max(1, mx // VSCALE)
        v = [_tdiv(x, d2) for x in u]
    return v, n, s


def pca_scores(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    axis: list[int],
    n: int,
    s: list[int],
    quant: int = QUANT,
) -> DataFrame:
    """Project every vector onto the principal axis, exactly:
    score = Σ_j (n*q_j - s_j) * v_j  (the n-scaled centered component
    against the integer axis — direction-identical to the centered
    projection, and pure JVM-side column algebra: the axis and the
    sums are literals, the corpus never shuffles).

    Output: (id_col, pc1_score bigint).
    """
    q = F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * quant).cast("bigint"),
    )
    s_arr = F.array(*[F.lit(int(x)).cast("bigint") for x in s])
    a_arr = F.array(*[F.lit(int(x)).cast("bigint") for x in axis])
    # one indexed transform + one aggregate fold: the quantization is
    # evaluated ONCE per row (a per-component sum expression would
    # inline 64 copies of it and blow up codegen)
    terms = F.transform(
        q,
        lambda x, i: (
            F.lit(n).cast("bigint") * x - F.element_at(s_arr, i + 1)
        )
        * F.element_at(a_arr, i + 1),
    )
    score = F.aggregate(
        terms, F.lit(0).cast("bigint"), lambda acc, t: acc + t
    )
    return df.select(F.col(id_col), score.alias("pc1_score"))


def pca_suffstats_cells(
    df: DataFrame,
    vec_col: str,
    dim: int,
    quant: int = QUANT,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """The sufficient-statistics pass as PURE column algebra (no Arrow,
    no Python): each row explodes into its d(d+1)/2 + d + 1 cell
    contributions via nested row-local array transforms, and ONE
    map-combinable sum folds them — the same (i, j, v) encoding as
    ``pca_suffstats``, bit-identical output.

    This is the STREAMING-CAPABLE formulation: a streaming source can't
    run ``mapInPandas`` under an aggregation, but it can run a Generate
    under a stateful agg, giving continuously-maintained covariance
    (model-drift monitoring, incremental PCA) with ~2,145 rows of JVM
    state at any stream volume — the mv_agg_refresh doctrine for the
    Gram matrix.  Batch callers should prefer ``pca_suffstats``: the
    Arrow/numpy fold moves d(d+1)/2 SUMS per partition where this
    moves d(d+1)/2 ROWS per input row through the partial agg (same
    shuffle size, ~d^2/2 more pre-agg rows per input row).

    ``group_cols`` generalizes to GROUPED model fitting (per-label
    covariance — the grouped-operator doctrine applied to PCA): the
    output carries the group keys and every group's statistics fold in
    the same single aggregate.
    """
    group_cols = group_cols or []
    q = F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * quant).cast("bigint"),
    )
    qc = F.col("__q")
    # r11 optimization round: build ONLY the upper triangle (slice the
    # tail of the vector per i) instead of all d² structs + a filter —
    # the struct stream this explodes is the operator's whole cost
    # (measured ~2x on the streaming PCA path), and the surviving
    # (i, j>=i, qi·qj) cells are identical element-for-element
    gram_cells = F.flatten(
        F.transform(
            qc,
            lambda qi, i: F.transform(
                F.slice(qc, i + 1, F.size(qc) - i),
                lambda qj, j: F.struct(
                    i.cast("int").alias("i"),
                    (i + j).cast("int").alias("j"),
                    (qi * qj).alias("v"),
                ),
            ),
        )
    )
    sum_cells = F.transform(
        qc,
        lambda qi, i: F.struct(
            i.cast("int").alias("i"),
            F.lit(-1).cast("int").alias("j"),
            qi.alias("v"),
        ),
    )
    count_cell = F.array(
        F.struct(
            F.lit(-1).cast("int").alias("i"),
            F.lit(-1).cast("int").alias("j"),
            F.lit(1).cast("bigint").alias("v"),
        )
    )
    return (
        df.select(*group_cols, q.alias("__q"))
        .select(
            *group_cols,
            F.explode(
                F.concat(gram_cells, sum_cells, count_cell)
            ).alias("c"),
        )
        .groupBy(
            *group_cols, F.col("c.i").alias("i"), F.col("c.j").alias("j")
        )
        .agg(F.sum("c.v").alias("v"))
    )


def grouped_pca_scores(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    group_col: str,
    dim: int,
    quant: int = QUANT,
    iters: int = PCA_ITERS,
) -> DataFrame:
    """Per-GROUP principal-component scores: one grouped Arrow fold
    accumulates EVERY group's sufficient statistics in a single pass
    (groups x 2,145 bounded rows; a numpy slice per group per batch —
    the cell-explode formulation measured ~20x slower at 30x volume,
    see pca_suffstats), the driver runs one
    exact-integer power iteration per group (the per-group model
    artifact — groups are a bounded enum by contract, the kmv_overlap
    doctrine), and the per-group axes come back as a small model FRAME
    broadcast-joined on the group key — scoring is array column
    algebra against the joined axis/sums columns, never a shuffle of
    the corpus beyond the one stats exchange.

    The grouped-operator doctrine (stratified A-ES sampling, per-group
    KMV) applied to model fitting: per-label principal axes serve
    label-conditioned outlier sweeps and per-domain drift monitoring.

    Output: (id_col, group_col, pc1_score bigint).
    """
    stats = pca_suffstats(
        df.select(group_col, vec_col), vec_col, dim, quant=quant,
        group_col=group_col,
    ).collect()
    by_group: dict = {}
    for r in stats:
        by_group.setdefault(r[group_col], []).append(r)
    spark = df.sparkSession
    model_rows = []
    for g, rows in sorted(by_group.items()):
        v, n, s = principal_axis(rows, dim, iters=iters)
        model_rows.append((g, v, n, s))
    model = F.broadcast(
        spark.createDataFrame(
            model_rows, f"{group_col} long, __axis array<long>, "
            "__n long, __s array<long>"
        )
    )
    q = F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * quant).cast("bigint"),
    )
    joined = df.select(
        F.col(id_col), F.col(group_col), q.alias("__q")
    ).join(model, group_col)
    terms = F.transform(
        F.col("__q"),
        lambda x, i: (
            F.col("__n") * x - F.element_at(F.col("__s"), i + 1)
        )
        * F.element_at(F.col("__axis"), i + 1),
    )
    score = F.aggregate(
        terms, F.lit(0).cast("bigint"), lambda acc, t: acc + t
    )
    return joined.select(
        F.col(id_col), F.col(group_col), score.alias("pc1_score")
    )
