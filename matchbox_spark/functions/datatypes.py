"""Serialisable recursive data types — the reference's ``DataTypes`` mirror.

The reference ships a Polars-backed recursive dtype model with a compact
wire format (semantics studied at src/matchbox/common/datatypes.py:22-324):
simple types serialise as bare names (``"String"``), containers as JSON
(``{"type": "List", "inner": "String"}``), arrays carry a fixed ``shape``,
structs carry named ``fields``. Source configs persist index-field types in
this format, so a Spark engine must parse and emit the SAME strings.

This module keeps the wire format bit-compatible and maps to **Spark**
types instead of Polars:

- signed ints → Byte/Short/Integer/Long; Float32/64 → Float/Double.
- unsigned ints widen to the next signed Spark type that holds their range
  (UInt8→Short, UInt16→Integer, UInt32→Long, UInt64→Decimal(20,0)) — Spark
  has no unsigned integers; widening is lossless, and ``from_spark`` maps
  back to the signed names (the unsigned origin is not recoverable).
- List AND Array → ArrayType (Spark arrays are unsized); an Array's shape
  survives JSON round-trips but is erased by a Spark round-trip.
- Struct → StructType (field order preserved), Null → NullType,
  Datetime → TimestampType, Date → DateType, Time → TimeType,
  Duration → DayTimeIntervalType, Decimal → DecimalType(38,18) default.
- Object / Categorical / Enum degrade to StringType (documented one-way).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, replace

from pyspark.sql import types as T

_SIMPLE_TO_SPARK: dict[str, T.DataType] = {
    "Boolean": T.BooleanType(),
    "Int8": T.ByteType(),
    "Int16": T.ShortType(),
    "Int32": T.IntegerType(),
    "Int64": T.LongType(),
    "UInt8": T.ShortType(),
    "UInt16": T.IntegerType(),
    "UInt32": T.LongType(),
    "UInt64": T.DecimalType(20, 0),
    "Float32": T.FloatType(),
    "Float64": T.DoubleType(),
    "Decimal": T.DecimalType(38, 18),
    "String": T.StringType(),
    "Binary": T.BinaryType(),
    "Date": T.DateType(),
    "Time": T.TimeType(),
    "Datetime": T.TimestampType(),
    "Duration": T.DayTimeIntervalType(),
    "Null": T.NullType(),
    "Object": T.StringType(),
    "Categorical": T.StringType(),
    "Enum": T.StringType(),
}

_SPARK_TO_SIMPLE: dict[type, str] = {
    T.BooleanType: "Boolean",
    T.ByteType: "Int8",
    T.ShortType: "Int16",
    T.IntegerType: "Int32",
    T.LongType: "Int64",
    T.FloatType: "Float32",
    T.DoubleType: "Float64",
    T.StringType: "String",
    T.CharType: "String",
    T.VarcharType: "String",
    T.BinaryType: "Binary",
    T.DateType: "Date",
    T.TimeType: "Time",
    T.TimestampType: "Datetime",
    T.TimestampNTZType: "Datetime",
    T.DayTimeIntervalType: "Duration",
    T.NullType: "Null",
}

_VALID_NAMES = set(_SIMPLE_TO_SPARK) | {"Array", "List", "Struct"}


@dataclass(frozen=True)
class DataTypes:
    """Recursive serialisable dtype; wire-compatible with the reference.

    Nesting mirrors the reference's constructor-call style::

        DataTypes.LIST(DataTypes.STRING)
        DataTypes.ARRAY(DataTypes.INT64, shape=3)
        DataTypes.STRUCT(fields={"name": DataTypes.STRING})
    """

    base_type: str
    inner: "DataTypes | None" = None
    shape: tuple[int, ...] | None = None
    fields: tuple[tuple[str, "DataTypes"], ...] | None = None

    def __post_init__(self):
        if self.base_type not in _VALID_NAMES:
            raise ValueError(f"unknown data type {self.base_type!r}")

    def __call__(
        self,
        inner: "DataTypes | None" = None,
        shape: tuple[int, ...] | int | None = None,
        fields: dict[str, "DataTypes"] | None = None,
    ) -> "DataTypes":
        if isinstance(shape, int):
            shape = (shape,)
        return replace(
            self,
            inner=inner,
            shape=shape,
            fields=tuple(fields.items()) if fields is not None else None,
        )

    # -- wire format ---------------------------------------------------------

    def _to_obj(self) -> str | dict:
        if self.inner is None and self.fields is None:
            return self.base_type
        data: dict = {"type": self.base_type}
        if self.inner is not None:
            data["inner"] = self.inner._to_obj()
        if self.shape is not None:
            data["shape"] = list(self.shape)
        if self.fields is not None:
            data["fields"] = {n: d._to_obj() for n, d in self.fields}
        return data

    @property
    def value(self) -> str:
        """Storage string: bare name for simple types, JSON for nested —
        byte-identical to the reference's ``DataTypes.value``."""
        obj = self._to_obj()
        return obj if isinstance(obj, str) else json.dumps(obj)

    @classmethod
    def parse(cls, value: "str | dict | DataTypes") -> "DataTypes":
        """Inverse of ``value``; accepts bare names, JSON strings, dicts."""
        if isinstance(value, cls):
            return value
        if isinstance(value, str):
            if value.startswith("{"):
                return cls.parse(json.loads(value))
            return cls(value)
        shape = value.get("shape")
        if isinstance(shape, int):
            shape = (shape,)
        elif isinstance(shape, list):
            shape = tuple(shape)
        fields = value.get("fields")
        return cls(
            base_type=value["type"],
            inner=cls.parse(value["inner"]) if "inner" in value else None,
            shape=shape,
            fields=tuple((n, cls.parse(d)) for n, d in fields.items())
            if fields is not None
            else None,
        )

    # -- Spark mapping -------------------------------------------------------

    def to_spark(self) -> T.DataType:
        if self.base_type in ("List", "Array"):
            if self.inner is None:
                raise ValueError(f"{self.base_type} requires an inner type")
            return T.ArrayType(self.inner.to_spark())
        if self.base_type == "Struct":
            if self.fields is None:
                raise ValueError("Struct requires fields")
            return T.StructType(
                [T.StructField(n, d.to_spark()) for n, d in self.fields]
            )
        return _SIMPLE_TO_SPARK[self.base_type]

    @classmethod
    def from_spark(cls, dtype: T.DataType) -> "DataTypes":
        if isinstance(dtype, T.ArrayType):
            return cls("List", inner=cls.from_spark(dtype.elementType))
        if isinstance(dtype, T.StructType):
            return cls(
                "Struct",
                fields=tuple(
                    (f.name, cls.from_spark(f.dataType)) for f in dtype.fields
                ),
            )
        if isinstance(dtype, T.DecimalType):
            if (dtype.precision, dtype.scale) == (20, 0):
                return cls("UInt64")
            return cls("Decimal")
        name = _SPARK_TO_SIMPLE.get(type(dtype))
        if name is None:
            raise ValueError(f"no DataTypes mapping for Spark type {dtype}")
        return cls(name)

    @classmethod
    def from_schema(cls, schema: T.StructType) -> dict[str, str]:
        """Serialise a whole schema: column → wire string (what a source
        config stores for its typed index fields)."""
        return {f.name: cls.from_spark(f.dataType).value for f in schema.fields}

    @classmethod
    def schema_from_values(cls, columns: dict[str, str]) -> T.StructType:
        """Inverse of ``from_schema``."""
        return T.StructType(
            [
                T.StructField(name, cls.parse(v).to_spark())
                for name, v in columns.items()
            ]
        )


# simple-type constants, mirroring the reference's enum-member access style
for _name in _SIMPLE_TO_SPARK:
    setattr(DataTypes, _name.upper(), DataTypes(_name))
DataTypes.LIST = DataTypes("List")
DataTypes.ARRAY = DataTypes("Array")
DataTypes.STRUCT = DataTypes("Struct")
