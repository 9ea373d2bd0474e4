"""DataTypes recursive mirror: wire-format pins + Spark round-trips
(reference src/matchbox/common/datatypes.py:22-324)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from matchbox_spark.functions.datatypes import DataTypes


def test_simple_wire_format_and_parse():
    assert DataTypes.STRING.value == "String"
    assert DataTypes.INT64.value == "Int64"
    assert DataTypes.parse("String") == DataTypes.STRING
    assert DataTypes.parse("Boolean").to_spark() == T.BooleanType()


def test_nested_wire_format_pins():
    # byte-identical to the reference's serialisation
    assert DataTypes.LIST(DataTypes.STRING).value == (
        '{"type": "List", "inner": "String"}'
    )
    assert DataTypes.ARRAY(DataTypes.INT64, shape=3).value == (
        '{"type": "Array", "inner": "Int64", "shape": [3]}'
    )
    assert DataTypes.STRUCT(
        fields={"name": DataTypes.STRING, "age": DataTypes.INT64}
    ).value == ('{"type": "Struct", "fields": {"name": "String", "age": "Int64"}}')


def test_json_roundtrip_deep_nesting():
    t = DataTypes.STRUCT(
        fields={
            "tags": DataTypes.LIST(DataTypes.STRING),
            "emb": DataTypes.ARRAY(DataTypes.FLOAT32, shape=(16,)),
            "meta": DataTypes.STRUCT(fields={"n": DataTypes.INT32}),
        }
    )
    assert DataTypes.parse(t.value) == t
    # int shape normalises to tuple, like the reference
    assert DataTypes.parse(
        {"type": "Array", "inner": "Int64", "shape": 3}
    ).shape == (3,)


def test_spark_mapping():
    assert DataTypes.LIST(DataTypes.STRING).to_spark() == T.ArrayType(
        T.StringType()
    )
    st = DataTypes.STRUCT(
        fields={"a": DataTypes.INT64, "b": DataTypes.LIST(DataTypes.FLOAT64)}
    ).to_spark()
    assert st == T.StructType(
        [
            T.StructField("a", T.LongType()),
            T.StructField("b", T.ArrayType(T.DoubleType())),
        ]
    )
    # unsigned ints widen losslessly
    assert DataTypes.UINT8.to_spark() == T.ShortType()
    assert DataTypes.UINT64.to_spark() == T.DecimalType(20, 0)


def test_spark_roundtrip_on_real_schema(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/customer.parquet")
    wire = DataTypes.from_schema(df.schema)
    back = DataTypes.schema_from_values(wire)
    assert [f.dataType for f in back.fields] == [
        f.dataType for f in df.schema.fields
    ]
    # wire strings survive a JSON round-trip unchanged
    for v in wire.values():
        assert DataTypes.parse(v).value == v


def test_degraded_and_invalid():
    assert DataTypes.OBJECT.to_spark() == T.StringType()  # documented one-way
    with pytest.raises(ValueError, match="unknown data type"):
        DataTypes.parse("Int128")
    with pytest.raises(ValueError, match="inner"):
        DataTypes.LIST.to_spark()
