"""Deterministic base/MV pair derived from the ``orders`` fixture table.

FIXTURES.md F4: the reconciliation harness derives the pair from the driver
testdata — base = ``orders`` keyed ``(o_orderkey)``, "MV" = the same rows
re-keyed ``(o_custkey, o_orderkey)`` (``o_custkey`` promoted to partition
key, mirroring the reference's MV pattern) with seeded, arithmetic-only
defect injection so a DuckDB oracle can compute the exact same expected
classification:

- drop rows with ``o_orderkey % 97 == 3``          → MISSING_IN_MV_TABLE
- perturb ``o_totalprice`` (+1.0) where ``% 89 == 5``  → INCONSISTENT
- perturb ``o_orderpriority`` where ``% 91 == 7``      → INCONSISTENT
  (keys hit by both perturbations report ``o_orderpriority`` — the
  alphabetically first differing column, O10 semantics)
- add orphan rows (key + 10_000_000) where ``% 101 == 11`` → MISSING_IN_BASE_TABLE
- every non-PK column's ``__writetime`` = ``epoch µs(o_orderdate)``; the
  reconcile window ends 2000-01-01, so orders dated after it are SKIPPED.

Only modulo arithmetic and +/concat are used for injection — no engine
hash functions — so Spark and DuckDB agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mvrepair.schema import MVSpec, TableSchema
from mvrepair.sources import load_table

NON_PK = ["o_orderdate", "o_orderpriority", "o_orderstatus", "o_totalprice"]

MISSING_MOD, MISSING_REM = 97, 3
PRICE_MOD, PRICE_REM = 89, 5
PRIO_MOD, PRIO_REM = 91, 7
ORPHAN_MOD, ORPHAN_REM = 101, 11
ORPHAN_OFFSET = 10_000_000
PRIO_PERTURBED = "9-REPAIRME"

# window [0, 2000-01-01) in µs — reference-inclusive bounds in seconds
WINDOW_START_US = 0
WINDOW_END_US = 946_684_800_000_000
WINDOW = (WINDOW_START_US, WINDOW_END_US)
_END_SEC = WINDOW_END_US // 1_000_000


def spec() -> MVSpec:
    cols = {
        "o_orderkey": "BIGINT",
        "o_custkey": "BIGINT",
        "o_orderstatus": "TEXT",
        "o_totalprice": "DOUBLE",
        "o_orderdate": "TIMESTAMP",
        "o_orderpriority": "TEXT",
    }
    return MVSpec(
        base=TableSchema(pk=["o_orderkey"], columns=dict(cols)),
        mv=TableSchema(pk=["o_custkey", "o_orderkey"], columns=dict(cols)),
    )


def base_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    wt = F.unix_micros(F.col("o_orderdate"))
    return orders.select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
        *[wt.alias(f"{c}__writetime") for c in NON_PK],
        *[F.lit(None).cast("int").alias(f"{c}__ttl") for c in NON_PK],
    )


def base_stream_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ``base_df``: the same projection over a
    readStream source (pure projection — valid on a streaming plan)."""
    from mvrepair.sources.parquet import load_stream

    orders = load_stream(spark, sf_dir, "orders")
    wt = F.unix_micros(F.col("o_orderdate"))
    return orders.select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
        *[wt.alias(f"{c}__writetime") for c in NON_PK],
        *[F.lit(None).cast("int").alias(f"{c}__ttl") for c in NON_PK],
    )


def mv_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = base_df(spark, sf_dir)
    k = F.col("o_orderkey")
    body = (
        base.filter(k % MISSING_MOD != MISSING_REM)
        .withColumn(
            "o_totalprice",
            F.when(k % PRICE_MOD == PRICE_REM, F.col("o_totalprice") + 1.0).otherwise(
                F.col("o_totalprice")
            ),
        )
        .withColumn(
            "o_orderpriority",
            F.when(k % PRIO_MOD == PRIO_REM, F.lit(PRIO_PERTURBED)).otherwise(
                F.col("o_orderpriority")
            ),
        )
    )
    orphans = base.filter(k % ORPHAN_MOD == ORPHAN_REM).withColumn(
        "o_orderkey", k + ORPHAN_OFFSET
    )
    return body.unionByName(orphans)


# ---------------------------------------------------------------------------
# DuckDB oracle: the same derivation + classification as ANSI SQL.
# The driver pre-registers the fixture tables as views (``orders`` etc.).
# ---------------------------------------------------------------------------

def oracle_pair_cte() -> str:
    """CTEs ``ob`` (base) and ``om`` (mv) with ``wt`` = writetime µs."""
    return f"""
ob AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
         o_orderpriority, epoch_us(o_orderdate) AS wt
  FROM orders
),
om AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         CASE WHEN o_orderkey % {PRICE_MOD} = {PRICE_REM}
              THEN o_totalprice + 1.0 ELSE o_totalprice END AS o_totalprice,
         o_orderdate,
         CASE WHEN o_orderkey % {PRIO_MOD} = {PRIO_REM}
              THEN '{PRIO_PERTURBED}' ELSE o_orderpriority END AS o_orderpriority,
         wt
  FROM ob WHERE o_orderkey % {MISSING_MOD} <> {MISSING_REM}
  UNION ALL
  SELECT o_orderkey + {ORPHAN_OFFSET}, o_custkey, o_orderstatus, o_totalprice,
         o_orderdate, o_orderpriority, wt
  FROM ob WHERE o_orderkey % {ORPHAN_MOD} = {ORPHAN_REM}
)"""


def oracle_classified_cte(window: bool = True) -> str:
    """CTE ``cls``: full-outer join + window skip + first-mismatch diff.

    Mirrors classify(): skip-either-side, existence classes, alphabetical
    first differing common column with convertToString-style rendering
    (timestamps → epoch millis).  ``window=False`` drops the SKIPPED
    branch — the twin of ``classify(window=None)`` (native unbounded
    mode, used by the merkle-composed repair)."""
    diffs = [
        ("o_orderdate", "b.o_orderdate IS DISTINCT FROM m.o_orderdate",
         "CAST(epoch_ms(b.o_orderdate) AS VARCHAR)",
         "CAST(epoch_ms(m.o_orderdate) AS VARCHAR)", "TIMESTAMP"),
        ("o_orderpriority", "b.o_orderpriority IS DISTINCT FROM m.o_orderpriority",
         "b.o_orderpriority", "m.o_orderpriority", "TEXT"),
        ("o_orderstatus", "b.o_orderstatus IS DISTINCT FROM m.o_orderstatus",
         "b.o_orderstatus", "m.o_orderstatus", "TEXT"),
        ("o_totalprice", "b.o_totalprice IS DISTINCT FROM m.o_totalprice",
         "CAST(b.o_totalprice AS VARCHAR)", "CAST(m.o_totalprice AS VARCHAR)", "DOUBLE"),
    ]
    any_diff = " OR ".join(d[1] for d in diffs)
    diff_col = "CASE " + " ".join(f"WHEN {d[1]} THEN '{d[0]}'" for d in diffs) + " END"
    diff_type = "CASE " + " ".join(f"WHEN {d[1]} THEN '{d[4]}'" for d in diffs) + " END"
    base_val = "CASE " + " ".join(f"WHEN {d[1]} THEN {d[2]}" for d in diffs) + " END"
    mv_val = "CASE " + " ".join(f"WHEN {d[1]} THEN {d[3]}" for d in diffs) + " END"
    skip_branch = f"""
      WHEN (b.o_orderkey IS NOT NULL AND b.wt // 1000000 > {_END_SEC})
        OR (m.o_orderkey IS NOT NULL AND m.wt // 1000000 > {_END_SEC})
        THEN 'SKIPPED'""" if window else ""
    return f"""{oracle_pair_cte()},
cls AS (
  SELECT
    coalesce(b.o_custkey, m.o_custkey) AS o_custkey,
    coalesce(b.o_orderkey, m.o_orderkey) AS o_orderkey,
    b.o_orderkey IS NOT NULL AS bp,
    m.o_orderkey IS NOT NULL AS mp,
    CASE{skip_branch}
      WHEN b.o_orderkey IS NULL THEN 'MISSING_IN_BASE_TABLE'
      WHEN m.o_orderkey IS NULL THEN 'MISSING_IN_MV_TABLE'
      WHEN {any_diff} THEN 'INCONSISTENT'
      ELSE 'CONSISTENT'
    END AS problem,
    CASE WHEN b.o_orderkey IS NOT NULL AND m.o_orderkey IS NOT NULL
         THEN {diff_col} END AS diff_column,
    CASE WHEN b.o_orderkey IS NOT NULL AND m.o_orderkey IS NOT NULL
         THEN {diff_type} END AS diff_type,
    CASE WHEN b.o_orderkey IS NOT NULL AND m.o_orderkey IS NOT NULL
         THEN {base_val} END AS base_value,
    CASE WHEN b.o_orderkey IS NOT NULL AND m.o_orderkey IS NOT NULL
         THEN {mv_val} END AS mv_value,
    b.o_orderstatus AS b_status, b.o_totalprice AS b_price,
    b.o_orderdate AS b_date, b.o_orderpriority AS b_prio, b.wt AS b_wt,
    m.o_orderstatus AS m_status, m.o_totalprice AS m_price,
    m.o_orderdate AS m_date, m.o_orderpriority AS m_prio, m.wt AS m_wt
  FROM ob b
  FULL OUTER JOIN om m
    ON b.o_custkey = m.o_custkey AND b.o_orderkey = m.o_orderkey
)"""


def oracle_stream_classified_cte() -> str:
    """CTE ``scls``: the stream-static twin of ``cls`` — base LEFT JOIN mv,
    no window skip (incremental mode classifies every arriving change), so
    only the stream-detectable classes appear: MISSING_IN_MV_TABLE,
    INCONSISTENT, CONSISTENT."""
    diffs = [
        ("o_orderdate", "b.o_orderdate IS DISTINCT FROM m.o_orderdate"),
        ("o_orderpriority", "b.o_orderpriority IS DISTINCT FROM m.o_orderpriority"),
        ("o_orderstatus", "b.o_orderstatus IS DISTINCT FROM m.o_orderstatus"),
        ("o_totalprice", "b.o_totalprice IS DISTINCT FROM m.o_totalprice"),
    ]
    any_diff = " OR ".join(d[1] for d in diffs)
    return f"""{oracle_pair_cte()},
scls AS (
  SELECT
    b.o_custkey, b.o_orderkey,
    m.o_orderkey IS NOT NULL AS mp,
    CASE
      WHEN m.o_orderkey IS NULL THEN 'MISSING_IN_MV_TABLE'
      WHEN {any_diff} THEN 'INCONSISTENT'
      ELSE 'CONSISTENT'
    END AS problem,
    b.o_orderstatus AS b_status, b.o_totalprice AS b_price,
    b.o_orderdate AS b_date, b.o_orderpriority AS b_prio, b.wt AS b_wt,
    m.o_orderstatus AS m_status, m.o_totalprice AS m_price,
    m.o_orderdate AS m_date, m.o_orderpriority AS m_prio, m.wt AS m_wt
  FROM ob b
  LEFT JOIN om m
    ON b.o_custkey = m.o_custkey AND b.o_orderkey = m.o_orderkey
)"""
