"""Logical types + semantic tags layered on Spark StructType.

Mirrors the role of the Woodwork schema in the reference
(featuretools/entityset/entityset.py:610-632 — inference;
mock_ds.py:345-422 — explicit), but implemented as a thin
engine-side annotation: Spark's StructType carries the physical
type; we keep (logical_type, semantic_tags) per column.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T

# Logical type names (subset of the reference's Woodwork types that
# change engine behavior; everything else is carried as metadata).
INTEGER = "Integer"
DOUBLE = "Double"
BOOLEAN = "Boolean"
CATEGORICAL = "Categorical"
ORDINAL = "Ordinal"
DATETIME = "Datetime"
NATURAL_LANGUAGE = "NaturalLanguage"
LATLONG = "LatLong"  # struct<lat:double, lng:double>
URL = "URL"
EMAIL = "EmailAddress"
POSTAL_CODE = "PostalCode"
IP_ADDRESS = "IPAddress"
PERSON_FULL_NAME = "PersonFullName"
PHONE_NUMBER = "PhoneNumber"
FILE_PATH = "Filepath"
TOKENS = "Tokens"  # array<int> — pass-through payload, never enters UDFs

# logical type -> DFS matching kind for the typed string columns the
# reference models as distinct Woodwork types (entityset.py:610-632):
# enumeration only offers URL transforms to URL columns, etc.
TYPED_STRING_KINDS = {
    URL: "url",
    EMAIL: "email",
    POSTAL_CODE: "postal_code",
    IP_ADDRESS: "ip_address",
    PERSON_FULL_NAME: "person_full_name",
    PHONE_NUMBER: "phone_number",
    FILE_PATH: "file_path",
    NATURAL_LANGUAGE: "text",
}

_NUMERIC_SPARK = (
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.DecimalType,
)


@dataclass
class ColumnSchema:
    """(logical_type, semantic_tags) — the unit matched by primitive
    input_types, cf. reference feature_base/feature_base.py:177-192."""

    logical_type: str | None = None
    semantic_tags: set = field(default_factory=set)

    def is_numeric(self) -> bool:
        return "numeric" in self.semantic_tags or self.logical_type in (
            INTEGER,
            DOUBLE,
        )

    def is_categorical(self) -> bool:
        return "category" in self.semantic_tags or self.logical_type in (
            CATEGORICAL,
            ORDINAL,
        )

    def is_datetime(self) -> bool:
        return self.logical_type == DATETIME

    def is_boolean(self) -> bool:
        return self.logical_type == BOOLEAN

    def is_text(self) -> bool:
        return self.logical_type == NATURAL_LANGUAGE


def infer_logical_type(spark_type: T.DataType) -> str:
    """Map a Spark physical type to a default logical type
    (reference infers via Woodwork; we infer from StructType)."""
    if isinstance(spark_type, T.BooleanType):
        return BOOLEAN
    if isinstance(spark_type, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        return DATETIME
    if isinstance(spark_type, (T.FloatType, T.DoubleType, T.DecimalType)):
        return DOUBLE
    if isinstance(spark_type, _NUMERIC_SPARK):
        return INTEGER
    if isinstance(spark_type, T.StringType):
        return CATEGORICAL
    if isinstance(spark_type, T.ArrayType) and isinstance(
        spark_type.elementType, (T.IntegerType, T.LongType)
    ):
        return TOKENS
    return CATEGORICAL


def default_tags(logical_type: str) -> set:
    if logical_type in (INTEGER, DOUBLE):
        return {"numeric"}
    if logical_type in (CATEGORICAL, ORDINAL):
        return {"category"}
    return set()
