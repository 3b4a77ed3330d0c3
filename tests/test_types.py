"""21-type equality matrix — FIXTURES.md F3.

Mirrors the reference's ``dataMatchForXXXType`` tests
(MvSyncTest.java:2511-2953): for every CQL type, an equal pair is
CONSISTENT and an unequal pair is INCONSISTENT with that column as the
first-mismatch.  One classify call covers all rows (one row per type).
"""

import datetime
from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from mvrepair.operators.reconcile import CONSISTENT, INCONSISTENT, classify
from mvrepair.schema import MVSpec, TableSchema

WT = 1_704_153_600_000_000
WINDOW = (0, 1_704_153_601_000_000)

# (column, CQL type, spark ddl type, equal value, different value)
CASES = [
    ("ascii_col", "ASCII", "string", "example_ascii", "other_ascii"),
    ("bigint_col", "BIGINT", "long", 1234567890, 987654321),
    ("blob_col", "BLOB", "binary", b"Hello", b"World"),
    ("boolean_col", "BOOLEAN", "boolean", True, False),
    ("date_col", "DATE", "date", datetime.date(2024, 1, 2), datetime.date(2024, 1, 3)),
    ("decimal_col", "DECIMAL", "decimal(38,2)", Decimal("123.45"), Decimal("543.21")),
    ("double_col", "DOUBLE", "double", 3.14, 2.71),
    ("float_col", "FLOAT", "float", 1.5, 2.5),
    ("inet_col", "INET", "string", "127.0.0.1", "10.0.0.1"),
    ("int_col", "INT", "int", 42, 43),
    ("list_col", "LIST", "array<string>", ["value1", "value2"], ["value1", "value3"]),
    ("map_col", "MAP", "map<string,string>", {"key1": "1", "key2": "2"}, {"key1": "1", "key2": "3"}),
    ("set_col", "SET", "array<string>", ["a", "b"], ["a", "c"]),
    ("smallint_col", "SMALLINT", "short", 7, 8),
    ("text_col", "TEXT", "string", "hello", "world"),
    ("time_col", "TIME", "long", 3_600_000_000_000, 7_200_000_000_000),
    ("timestamp_col", "TIMESTAMP", "timestamp",
     datetime.datetime(2024, 1, 2, 3, 4, 5), datetime.datetime(2024, 1, 2, 3, 4, 6)),
    ("timeuuid_col", "TIMEUUID", "string",
     "6c84fb90-12c4-11e1-840d-7b25c5ee775a", "7c84fb90-12c4-11e1-840d-7b25c5ee775a"),
    ("tinyint_col", "TINYINT", "byte", 1, 2),
    ("uuid_col", "UUID", "string",
     "123e4567-e89b-12d3-a456-426614174000", "223e4567-e89b-12d3-a456-426614174000"),
    ("varint_col", "VARINT", "decimal(38,0)", Decimal("99"), Decimal("100")),
]

COLLECTIONS = {"list_col", "map_col", "set_col"}


def _schema() -> MVSpec:
    cols = {"id": "TEXT"}
    cols.update({c: t for c, t, *_ in CASES})
    ts = TableSchema(pk=["id"], columns=cols)
    return MVSpec(base=ts, mv=TableSchema(pk=["id"], columns=dict(cols)))


def _ddl() -> str:
    parts = ["id string"]
    for c, _t, ddl, *_ in CASES:
        parts.append(f"{c} {ddl}")
        if c not in COLLECTIONS:
            parts.append(f"{c}__writetime long")
            parts.append(f"{c}__ttl int")
    return ", ".join(parts)


def _row(row_id: str, override: dict | None = None) -> dict:
    d = {"id": row_id}
    for c, _t, _ddl, eq, _neq in CASES:
        d[c] = eq
        if c not in COLLECTIONS:
            d[f"{c}__writetime"] = WT
            d[f"{c}__ttl"] = None
    if override:
        d.update(override)
    return d


@pytest.fixture(scope="module")
def matrix_result(spark):
    """One classify over: one row per type (that type perturbed) + one
    fully-equal row."""
    spec = _schema()
    ddl = _ddl()
    base_rows = [_row(c) for c, *_ in CASES] + [_row("all_equal")]
    mv_rows = [
        _row(c, {c: neq}) for c, _t, _ddl2, _eq, neq in CASES
    ] + [_row("all_equal")]
    base = spark.createDataFrame(base_rows, schema=ddl)
    mv = spark.createDataFrame(mv_rows, schema=ddl)
    wide = classify(base, mv, spec, window=WINDOW)
    return {r["id"]: r for r in wide.collect()}


@pytest.mark.parametrize("col,cql_type", [(c, t) for c, t, *_ in CASES])
def test_unequal_value_detected(matrix_result, col, cql_type):
    row = matrix_result[col]
    assert row["problem"] == INCONSISTENT
    assert row["diff_column"] == col
    assert row["diff_type"] == cql_type


def test_all_equal_row_consistent(matrix_result):
    assert matrix_result["all_equal"]["problem"] == CONSISTENT


def test_set_semantics_order_insensitive(spark):
    """CQL sets are unordered: ['b','a'] == ['a','b'] (SURVEY §1)."""
    spec = _schema()
    ddl = _ddl()
    base = spark.createDataFrame([_row("k", {"set_col": ["a", "b"]})], schema=ddl)
    mv = spark.createDataFrame([_row("k", {"set_col": ["b", "a"]})], schema=ddl)
    wide = classify(base, mv, spec, window=WINDOW)
    assert wide.collect()[0]["problem"] == CONSISTENT


def test_list_semantics_order_sensitive(spark):
    """CQL lists are ordered: ['b','a'] != ['a','b']."""
    spec = _schema()
    ddl = _ddl()
    base = spark.createDataFrame([_row("k", {"list_col": ["a", "b"]})], schema=ddl)
    mv = spark.createDataFrame([_row("k", {"list_col": ["b", "a"]})], schema=ddl)
    wide = classify(base, mv, spec, window=WINDOW)
    row = wide.collect()[0]
    assert row["problem"] == INCONSISTENT
    assert row["diff_column"] == "list_col"


def test_map_null_vs_empty_are_different(spark):
    spec = _schema()
    ddl = _ddl()
    base = spark.createDataFrame([_row("k", {"map_col": None})], schema=ddl)
    mv = spark.createDataFrame([_row("k", {"map_col": {}})], schema=ddl)
    wide = classify(base, mv, spec, window=WINDOW)
    row = wide.collect()[0]
    assert row["problem"] == INCONSISTENT
    assert row["diff_column"] == "map_col"


def test_rendering_of_diff_values(matrix_result):
    # convertToString parity spot checks (DBOperations.java:446-460)
    assert matrix_result["blob_col"]["base_value"] == "Hello"  # bytes → UTF-8
    assert matrix_result["timestamp_col"]["base_value"] == str(
        int(datetime.datetime(2024, 1, 2, 3, 4, 5,
                              tzinfo=datetime.timezone.utc).timestamp() * 1000)
    )  # timestamp → epoch millis
    assert matrix_result["list_col"]["base_value"] == "[value1, value2]"
    assert matrix_result["map_col"]["base_value"] == "{key1=1, key2=2}"
