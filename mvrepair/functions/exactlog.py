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

The expressions are emitted as CHAINED projections (DataFrame selects /
nested SQL subqueries), never one nested expression: each step
references its predecessor 2-3 times, so a single expression tree would
grow exponentially.  Catalyst keeps non-cheap multiply-referenced
aliases un-collapsed, and the frames this runs on are model-sized
(classes x buckets), so plan depth is free.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

FRAC_BITS = 20
SCALE = 1 << FRAC_BITS  # one unit of log2 is 2^20 "log2-micros"
_LADDER = (32, 16, 8, 4, 2, 1)
_TWO64 = float(2**64)


def micro_log2_df(
    df: DataFrame, x: Column, out: str, keep: list[str]
) -> DataFrame:
    """Attach ``out`` = micro_log2(``x``) (int64) to ``df``, carrying the
    ``keep`` columns.  ``x`` must be a positive double in (2^-64, 2^64);
    integer-count ratios from any realistic corpus are (counts < 2^63,
    so ratios are within 2^±63)."""
    d = df.select(*keep, x.cast("double").alias("__x"))
    lt1 = F.col("__x") < F.lit(1.0)
    d = d.select(
        *keep,
        F.when(lt1, F.col("__x") * F.lit(_TWO64)).otherwise(
            F.col("__x")
        ).alias("__m"),
        F.when(lt1, F.lit(-64)).otherwise(F.lit(0)).alias("__e"),
    )
    for k in _LADDER:
        t = float(2**k)
        ge = F.col("__m") >= F.lit(t)
        d = d.select(
            *keep,
            F.when(ge, F.col("__m") / F.lit(t)).otherwise(F.col("__m")).alias(
                "__m"
            ),
            F.when(ge, F.col("__e") + F.lit(k)).otherwise(F.col("__e")).alias(
                "__e"
            ),
        )
    d = d.withColumn("__bits", F.lit(0).cast("long"))
    for _ in range(FRAC_BITS):
        d = d.select(
            *keep, "__e", (F.col("__m") * F.col("__m")).alias("__m2"), "__bits"
        )
        ge2 = F.col("__m2") >= F.lit(2.0)
        d = d.select(
            *keep,
            "__e",
            F.when(ge2, F.col("__m2") / F.lit(2.0)).otherwise(
                F.col("__m2")
            ).alias("__m"),
            (
                F.col("__bits") * 2
                + F.when(ge2, F.lit(1)).otherwise(F.lit(0))
            ).alias("__bits"),
        )
    return d.select(
        *keep,
        (F.col("__e").cast("long") * F.lit(SCALE) + F.col("__bits")).alias(
            out
        ),
    )


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
