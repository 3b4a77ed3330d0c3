"""Column-expression building blocks (all JVM-side, codegen-friendly).

- ``deep_eq``: null-safe deep equality per logical type, parity with
  ``Objects.deepEquals`` at /root/reference/src/main/java/mvsync/MvSync.java:491
  (null==null equal; null vs value unequal; byte[]/list/set/map element-wise).
- ``render_value``: string rendering parity with
  ``DBOperations.convertToString`` (db/DBOperations.java:446-460):
  Date→epoch-millis, bytes→UTF-8, null→"null".

No Python UDFs here — everything compiles to Catalyst expressions so the
whole compare stays inside WholeStageCodegen at 100 TB scale.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from mvrepair.schema import normalize_type


def deep_eq(a: Column, b: Column, logical_type: str) -> Column:
    """Null-safe deep equality for one column pair.

    SET semantics: CQL sets are unordered, so compare sorted arrays
    (SURVEY §1 — "sets: sorted array for deterministic equality").
    MAP semantics: Spark disallows ``=`` on MapType, so compare entry
    arrays sorted by key.  Everything else (including arrays and binary)
    uses Spark's native null-safe equality ``<=>``.
    """
    t = normalize_type(logical_type)
    if t == "SET":
        return F.array_sort(a).eqNullSafe(F.array_sort(b))
    if t == "MAP":
        ea, eb = F.array_sort(F.map_entries(a)), F.array_sort(F.map_entries(b))
        return (
            F.when(a.isNull() & b.isNull(), F.lit(True))
            .when(a.isNull() | b.isNull(), F.lit(False))
            .otherwise(ea == eb)
        )
    return a.eqNullSafe(b)


def render_value(c: Column, logical_type: str) -> Column:
    """Render a value to text, ``convertToString`` parity
    (DBOperations.java:446-460): null→"null", TIMESTAMP→epoch millis,
    BLOB→UTF-8 string; collections render Java-style but in sorted order
    (the reference's map iteration order is not deterministic — SURVEY §7
    "match the parsed content, not byte order")."""
    t = normalize_type(logical_type)
    if t == "TIMESTAMP":
        rendered = F.unix_millis(c).cast("string")
    elif t == "DATE":
        rendered = F.unix_millis(c.cast("timestamp")).cast("string")
    elif t == "BLOB":
        rendered = c.cast("string")  # binary → UTF-8 text
    elif t in ("LIST", "SET"):
        arr = F.array_sort(c) if t == "SET" else c
        rendered = F.concat(
            F.lit("["), F.array_join(arr, ", ", null_replacement="null"), F.lit("]")
        )
    elif t == "MAP":
        entries = F.array_sort(F.map_entries(c))
        rendered = F.concat(
            F.lit("{"),
            F.array_join(
                F.transform(
                    entries,
                    lambda e: F.concat(
                        e["key"].cast("string"), F.lit("="), e["value"].cast("string")
                    ),
                ),
                ", ",
            ),
            F.lit("}"),
        )
    else:
        rendered = c.cast("string")
    return F.coalesce(rendered, F.lit("null"))


def first_non_null(cols: list[Column]) -> Column:
    """coalesce over an arbitrary (possibly empty) column list."""
    if not cols:
        return F.lit(None)
    return F.coalesce(*cols)


def stable_hash64(c: Column) -> Column:
    """Deterministic 60-bit hash of a string column, identical across
    engines: first 15 hex digits of md5, parsed base-16.  Used by MinHash /
    SimHash / fingerprinting so a DuckDB oracle
    (``CAST('0x' || substr(md5(x),1,15) AS BIGINT)``) reproduces it exactly.
    """
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")
