"""Cross-engine-exact quantized log2 — the hash-stable replacement for
``floor(ln(ratio) * 1e6)``.

Why: the ln-micro convention (nb_classify, dsir_scores) feeds both
engines the SAME double (an IEEE-exact integer-ratio division), but
Java's ``Math.log`` and DuckDB's libm ``log`` may differ in the last
ulp — and a boundary-adversarial experiment (see
``tests/test_properties.py::TestLnQuantizationBoundary``) MEASURED the
failure: 10 of ~11k count grids tuned to land within ~1 ulp of a
``floor`` boundary quantize differently across the engines.  The risk
the rare_tokens docstring names is real, not hypothetical.

Fix: quantize with a composition of ONLY IEEE-754 correctly-rounded
operations — comparisons, multiplication, and division by powers of two
— which every IEEE-double engine computes bit-for-bit identically.  The
classic bit-by-bit log2:

1. Range-reduce ``x`` (valid domain ``(2^-64, 2^64)``) to ``m ∈ [1, 2)``
   and integer exponent ``e``: pre-scale by ``2^64`` when ``x < 1``
   (exact — power-of-two multiply only shifts the exponent), then a
   compare/divide ladder over ``2^32, 2^16, ..., 2^1`` (each division
   exact).
2. ``FRAC_BITS`` rounds of squaring: ``m ← m·m`` (correctly rounded,
   hence deterministic); if ``m ≥ 2`` emit bit 1 and halve (exact),
   else emit bit 0.
3. Result: ``e · 2^FRAC_BITS + bits`` as int64 — a monotone(*) integer
   quantization of ``log2(x)`` with ~2^-20 resolution, the same
   granularity as the old 1e-6 ln-micros (1 log2-step = ln2 micro-ish).

(*) Monotone up to the quantization step, exactly like ``floor``; what
matters for the oracle gate is not accuracy but that the deterministic
rounding path is IDENTICAL in Spark, DuckDB, and the plain-Python test
models — all three implementations below are generated from the same
step sequence.

Spark-side form: ONE Column expression built from higher-order
``F.aggregate`` folds (the ladder folds over the 6 power-of-two
thresholds, the squaring loop over a 20-element sequence), so the whole
quantizer is a single shallow projection.  A first version emitted the
steps as ~50 CHAINED projections — semantically identical, but Catalyst
analysis/optimization over the deep plan cost whole SECONDS of driver
time per query (nb_classify 2.4 s → 8.2 s measured), dwarfing the
sub-millisecond execution on the model-sized frames.  The SQL twin
keeps the nested-subquery emission: DuckDB plans 50 nested SELECTs in
milliseconds.  Each step still references its predecessor 2-3 times —
inside a fold that re-evaluates a couple of multiplies per row, which
is free; as nested *expression* inlining it would be 2^50 nodes, which
is why the fold (not expression substitution) is the right shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

FRAC_BITS = 20
SCALE = 1 << FRAC_BITS  # one unit of log2 is 2^20 "log2-micros"
_LADDER = (32, 16, 8, 4, 2, 1)
_TWO64 = float(2**64)


def micro_log2(x: Column) -> Column:
    """micro_log2(``x``) as a single int64 Column expression.  ``x`` must
    be a positive double in (2^-64, 2^64); integer-count ratios from any
    realistic corpus are (counts < 2^63, so ratios are within 2^±63)."""
    xd = x.cast("double")
    lt1 = xd < F.lit(1.0)
    start = F.struct(
        F.when(lt1, xd * F.lit(_TWO64)).otherwise(xd).alias("m"),
        F.when(lt1, F.lit(-64)).otherwise(F.lit(0)).cast("long").alias("e"),
    )
    ladder = F.array(
        *[
            F.struct(
                F.lit(float(2**k)).alias("t"),
                F.lit(k).cast("long").alias("k"),
            )
            for k in _LADDER
        ]
    )
    reduced = F.aggregate(
        ladder,
        start,
        lambda acc, s: F.struct(
            F.when(acc["m"] >= s["t"], acc["m"] / s["t"])
            .otherwise(acc["m"])
            .alias("m"),
            F.when(acc["m"] >= s["t"], acc["e"] + s["k"])
            .otherwise(acc["e"])
            .alias("e"),
        ),
    )
    sq = F.aggregate(
        F.sequence(F.lit(1), F.lit(FRAC_BITS)),
        F.struct(
            reduced["m"].alias("m"), F.lit(0).cast("long").alias("bits")
        ),
        lambda acc, _: F.struct(
            F.when(
                acc["m"] * acc["m"] >= F.lit(2.0),
                acc["m"] * acc["m"] / F.lit(2.0),
            )
            .otherwise(acc["m"] * acc["m"])
            .alias("m"),
            (
                acc["bits"] * 2
                + F.when(acc["m"] * acc["m"] >= F.lit(2.0), 1).otherwise(0)
            ).alias("bits"),
        ),
    )
    return reduced["e"] * F.lit(SCALE) + sq["bits"]


def micro_log2_df(
    df: DataFrame, x: Column, out: str, keep: list[str]
) -> DataFrame:
    """Attach ``out`` = micro_log2(``x``) (int64) to ``df``, carrying the
    ``keep`` columns."""
    return df.select(*keep, micro_log2(x).alias(out))


def micro_log2_sql(inner: str, x_expr: str, keep: list[str], out: str) -> str:
    """DuckDB twin of ``micro_log2_df``: nested subqueries generated from
    the SAME step sequence.  ``inner`` is a SQL query producing the
    ``keep`` columns plus whatever ``x_expr`` references."""
    ks = ", ".join(keep)
    q = f"SELECT {ks}, CAST({x_expr} AS DOUBLE) AS __x FROM ({inner})"
    q = (
        f"SELECT {ks},"
        f" CASE WHEN __x < 1 THEN __x * {_TWO64!r} ELSE __x END AS __m,"
        f" CASE WHEN __x < 1 THEN -64 ELSE 0 END AS __e FROM ({q})"
    )
    for k in _LADDER:
        t = float(2**k)
        q = (
            f"SELECT {ks},"
            f" CASE WHEN __m >= {t!r} THEN __m / {t!r} ELSE __m END AS __m,"
            f" CASE WHEN __m >= {t!r} THEN __e + {k} ELSE __e END AS __e"
            f" FROM ({q})"
        )
    q = f"SELECT {ks}, __m, __e, CAST(0 AS BIGINT) AS __bits FROM ({q})"
    for _ in range(FRAC_BITS):
        q = f"SELECT {ks}, __e, __m * __m AS __m2, __bits FROM ({q})"
        q = (
            f"SELECT {ks}, __e,"
            f" CASE WHEN __m2 >= 2 THEN __m2 / 2 ELSE __m2 END AS __m,"
            f" __bits * 2 + CASE WHEN __m2 >= 2 THEN 1 ELSE 0 END AS __bits"
            f" FROM ({q})"
        )
    return (
        f"SELECT {ks}, CAST(__e AS BIGINT) * {SCALE} + __bits AS {out}"
        f" FROM ({q})"
    )


def py_micro_log2(x: float) -> int:
    """Plain-Python twin (CPython floats are IEEE doubles with correctly
    rounded arithmetic, so this matches both engines bit-for-bit) — the
    exact model for property tests."""
    assert x > 0.0
    if x < 1.0:
        m, e = x * _TWO64, -64
    else:
        m, e = x, 0
    for k in _LADDER:
        t = float(2**k)
        if m >= t:
            m, e = m / t, e + k
    bits = 0
    for _ in range(FRAC_BITS):
        m = m * m
        if m >= 2.0:
            m /= 2.0
            bits = bits * 2 + 1
        else:
            bits = bits * 2
    return e * SCALE + bits
