"""Schema registry: CQL-ish logical types → Spark types, PK/non-PK split,
companion-column convention, common-column intersection.

Parity notes (citations into /root/reference):
- 21 supported types: DBOperations.isSupportedType
  (src/main/java/mvsync/db/DBOperations.java:417-444).  DURATION/TUPLE are
  detect-only — repair mode fails early (MvSync.java:92-106).
- Parameterized collections normalize to their container kind:
  ``LIST(...)`` → ``LIST`` etc. (MvSync.java:158-169 ``getType``).
- All column iteration is in sorted (alphabetical) order, mirroring the
  reference's TreeMaps (TableAndMVColumns.java:8-17) — this ordering is
  observable ("first mismatching column").
- Only non-PK columns present in BOTH tables with EQUAL declared type are
  compared (MvSync.java:274-285).
- Every non-collection non-PK column ``c`` carries companion columns
  ``c__writetime`` (long, µs) and ``c__ttl`` (int, nullable), mirroring the
  ``writetime(c)``/``ttl(c)`` projections (MvSync.java:216-230); collections
  have no per-cell writetime (guard at :224, :458).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T

WRITETIME_SUFFIX = "__writetime"
TTL_SUFFIX = "__ttl"

COLLECTION_TYPES = {"LIST", "SET", "MAP"}

# DBOperations.java:417-444 — the 21 supported CQL types.
SUPPORTED_TYPES = {
    "UUID", "INT", "INET", "LIST", "TIMEUUID", "VARINT", "BIGINT", "BOOLEAN",
    "ASCII", "DATE", "BLOB", "FLOAT", "SET", "SMALLINT", "TIMESTAMP", "MAP",
    "TINYINT", "TEXT", "TIME", "DOUBLE", "DECIMAL",
}

# MvSync.java:92-106 — repair refuses these; detection-only still works.
REPAIR_UNSUPPORTED_TYPES = {"DURATION", "TUPLE"}

# §1 Spark mapping (SURVEY.md): logical type name → Spark DataType.
_SPARK_TYPE = {
    "ASCII": T.StringType(),
    "TEXT": T.StringType(),
    "VARCHAR": T.StringType(),
    "INT": T.IntegerType(),
    "BIGINT": T.LongType(),
    "SMALLINT": T.ShortType(),
    "TINYINT": T.ByteType(),
    "FLOAT": T.FloatType(),
    "DOUBLE": T.DoubleType(),
    "DECIMAL": T.DecimalType(38, 2),
    "VARINT": T.DecimalType(38, 0),
    "BOOLEAN": T.BooleanType(),
    "BLOB": T.BinaryType(),
    "DATE": T.DateType(),
    "TIMESTAMP": T.TimestampType(),
    "TIME": T.LongType(),          # nanos of day (DBOperations.java:164-168)
    "UUID": T.StringType(),        # canonical text form
    "TIMEUUID": T.StringType(),
    "INET": T.StringType(),
    "LIST": T.ArrayType(T.StringType()),
    "SET": T.ArrayType(T.StringType()),   # kept sorted for equality
    "MAP": T.MapType(T.StringType(), T.StringType()),
}


# Reverse mapping for runtime discovery: Spark DataType → logical type.
# Ambiguous Spark types resolve to the canonical logical name (StringType →
# TEXT, LongType → BIGINT, DecimalType(38,0) → VARINT, other decimals →
# DECIMAL, ArrayType → LIST, MapType → MAP).
def logical_type_of(dt: T.DataType) -> str:
    if isinstance(dt, T.StringType):
        return "TEXT"
    if isinstance(dt, T.IntegerType):
        return "INT"
    if isinstance(dt, T.LongType):
        return "BIGINT"
    if isinstance(dt, T.ShortType):
        return "SMALLINT"
    if isinstance(dt, T.ByteType):
        return "TINYINT"
    if isinstance(dt, T.FloatType):
        return "FLOAT"
    if isinstance(dt, T.DoubleType):
        return "DOUBLE"
    if isinstance(dt, T.DecimalType):
        return "VARINT" if dt.scale == 0 else "DECIMAL"
    if isinstance(dt, T.BooleanType):
        return "BOOLEAN"
    if isinstance(dt, T.BinaryType):
        return "BLOB"
    if isinstance(dt, T.DateType):
        return "DATE"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return "TIMESTAMP"
    if isinstance(dt, T.ArrayType):
        return "LIST"
    if isinstance(dt, T.MapType):
        return "MAP"
    raise ValueError(f"no logical type mapping for Spark type {dt}")


def normalize_type(type_name: str) -> str:
    """``LIST(TEXT)`` → ``LIST``; ``int`` → ``INT`` (MvSync.java:158-169)."""
    t = type_name.strip().upper()
    paren = t.find("(")
    base = t[:paren] if paren > 0 else t
    # DECIMAL(38,2) stays DECIMAL; LIST/SET/MAP collapse to container kind.
    return base


def spark_type(type_name: str) -> T.DataType:
    return _SPARK_TYPE[normalize_type(type_name)]


def is_collection(type_name: str) -> bool:
    return normalize_type(type_name) in COLLECTION_TYPES


def is_supported(type_name: str) -> bool:
    return normalize_type(type_name) in SUPPORTED_TYPES


def writetime_col(c: str) -> str:
    return f"{c}{WRITETIME_SUFFIX}"


def ttl_col(c: str) -> str:
    return f"{c}{TTL_SUFFIX}"


class UnsupportedTypeError(ValueError):
    """Raised in repair mode for DURATION/TUPLE columns (MvSync.java:92-106)."""


class MetadataError(ValueError):
    """Missing keyspace/table/view at discovery time (MvSync.java:176-189)."""


@dataclass
class TableSchema:
    """PK vs non-PK name→type maps, iterated in sorted order.

    Mirrors ``populateSchemaInformation`` (MvSync.java:197-214) and the
    TreeMap ordering of TableAndMVColumns.java:8-17.  ``pk`` is ordered
    (partition + clustering order matters for key rendering); ``columns``
    maps every column name → normalized logical type.
    """

    pk: list[str]
    columns: dict[str, str]

    @classmethod
    def from_df(cls, df, pk: list[str]) -> "TableSchema":
        """Infer the logical schema from a DataFrame's Spark schema
        (companion ``__writetime``/``__ttl`` columns are scan artifacts,
        not table columns — excluded)."""
        cols = {
            f.name: logical_type_of(f.dataType)
            for f in df.schema.fields
            if not f.name.endswith((WRITETIME_SUFFIX, TTL_SUFFIX))
        }
        return cls(pk=list(pk), columns=cols)

    def __post_init__(self) -> None:
        self.columns = {c: normalize_type(t) for c, t in self.columns.items()}
        missing = [c for c in self.pk if c not in self.columns]
        if missing:
            raise ValueError(f"PK columns missing from schema: {missing}")

    @property
    def pk_types(self) -> dict[str, str]:
        return {c: self.columns[c] for c in self.pk}

    @property
    def non_pk(self) -> dict[str, str]:
        """Sorted name→type of non-primary-key columns."""
        return {c: t for c, t in sorted(self.columns.items()) if c not in self.pk}

    def validate_repairable(self) -> None:
        """Fail early on repair-unsupported column types, with the
        reference's error text (MvSync.java:92-106)."""
        for t in self.columns.values():
            if t in REPAIR_UNSUPPORTED_TYPES:
                raise UnsupportedTypeError(
                    "Cannot do an automated fixing of inconsistencies for "
                    f"the unsupported type: {t}"
                )

    def select_columns(self) -> list[str]:
        """Scan projection: all columns + writetime/ttl companions for
        non-collection non-PK columns (buildSelectStatement,
        MvSync.java:216-230)."""
        cols = list(self.columns)
        for c, t in self.non_pk.items():
            if t not in COLLECTION_TYPES:
                cols += [writetime_col(c), ttl_col(c)]
        return cols


@dataclass
class MVSpec:
    """A base-table/materialized-view pair to reconcile.

    The join key is always the MV's primary key for BOTH sides
    (MvSync.java:129, :138-139): the MV PK is a superset/permutation of the
    base PK plus the promoted column(s).
    """

    base: TableSchema
    mv: TableSchema
    _common: list[tuple[str, str]] = field(init=False, repr=False)

    PK_PROPERTY = "mvrepair.pk"

    @classmethod
    def from_dataframes(
        cls, base_df, mv_df, base_pk: list[str], mv_pk: list[str]
    ) -> "MVSpec":
        """Build a spec from two live DataFrames (schemas inferred)."""
        return cls(
            base=TableSchema.from_df(base_df, base_pk),
            mv=TableSchema.from_df(mv_df, mv_pk),
        )

    @classmethod
    def from_catalog(
        cls,
        spark,
        keyspace: str,
        base_table: str,
        mv_name: str,
        base_pk: list[str] | None = None,
        mv_pk: list[str] | None = None,
        metrics=None,
    ) -> "MVSpec":
        """Runtime schema discovery against the Spark catalog.

        Parity with ``getBaseAndMvTableColumns`` (MvSync.java:171-195):
        the keyspace maps to a Spark database, the base table and MV to
        tables/views within it, and the three missing-metadata cases fail
        with the reference's error text (and bump the matching lifecycle
        counters, MvSyncJobMetrics.java:10-11).  Primary keys — which the
        Spark catalog has no native notion of — come from the table
        property ``mvrepair.pk`` (comma-separated, partition+clustering
        order) or the explicit ``base_pk``/``mv_pk`` arguments.
        """
        from mvrepair.metrics import GLOBAL_METRICS

        metrics = metrics if metrics is not None else GLOBAL_METRICS
        if not spark.catalog.databaseExists(keyspace):
            metrics.inc("KeyspaceMetadataError")
            raise MetadataError("The keyspace does not exist")
        if not spark.catalog.tableExists(f"{keyspace}.{base_table}"):
            metrics.inc("KeyspaceMetadataError")
            raise MetadataError("The table does not exist")
        if not spark.catalog.tableExists(f"{keyspace}.{mv_name}"):
            metrics.inc("MVDoesNotExist")
            raise MetadataError("The MV does not exist")

        def discover(name: str, pk: list[str] | None) -> TableSchema:
            df = spark.table(f"{keyspace}.{name}")
            if pk is None:
                pk = cls._pk_from_properties(spark, keyspace, name)
            return TableSchema.from_df(df, pk)

        return cls(
            base=discover(base_table, base_pk), mv=discover(mv_name, mv_pk)
        )

    @classmethod
    def _pk_from_properties(cls, spark, keyspace: str, name: str) -> list[str]:
        rows = spark.sql(
            f"SHOW TBLPROPERTIES {keyspace}.{name}"
        ).collect()
        props = {r["key"]: r["value"] for r in rows}
        if cls.PK_PROPERTY not in props:
            raise MetadataError(
                f"table {keyspace}.{name} has no {cls.PK_PROPERTY!r} property "
                "and no explicit primary key was given"
            )
        return [c.strip() for c in props[cls.PK_PROPERTY].split(",") if c.strip()]

    def __post_init__(self) -> None:
        missing = [c for c in self.mv.pk if c not in self.base.columns]
        if missing:
            raise ValueError(f"MV PK columns absent from base table: {missing}")
        # MvSync.java:274-285 — compare only non-PK columns present in both
        # tables with equal declared type, alphabetical order.
        base_non_pk = self.base.non_pk
        mv_non_pk = self.mv.non_pk
        self._common = sorted(
            (c, t)
            for c, t in mv_non_pk.items()
            if c in base_non_pk and base_non_pk[c] == t
        )

    @property
    def mv_pk(self) -> list[str]:
        return list(self.mv.pk)

    @property
    def compare_columns(self) -> list[tuple[str, str]]:
        """Sorted (name, type) of comparable non-PK columns."""
        return list(self._common)

    @property
    def compare_names(self) -> list[str]:
        return [c for c, _ in self._common]

    def writetime_columns(self, side: TableSchema) -> list[str]:
        """Writetime companions that participate in the window bound
        (non-collection non-PK columns; MvSync.java:452-479, guard :458)."""
        return [
            writetime_col(c)
            for c, t in side.non_pk.items()
            if t not in COLLECTION_TYPES
        ]

    def validate_repairable(self) -> None:
        """Repair-mode early fail, checkForUnsupportedTypesForAutomatic-
        FixingInconsistencies parity (MvSync.java:92-106): only the MV's
        NON-PK columns matter — those are the ones upserts bind values for
        (detection-only mode still works on any type; deletes bind only
        PK values, which Cassandra forbids to be DURATION/TUPLE anyway)."""
        for t in self.mv.non_pk.values():
            if t in REPAIR_UNSUPPORTED_TYPES:
                raise UnsupportedTypeError(
                    "Cannot do an automated fixing of inconsistencies for "
                    f"the unsupported type: {t}"
                )
