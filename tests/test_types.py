"""Arrow->Spark type-mapping contract (SURVEY.md §1.2, unsigned widening
policy §7 risk 2)."""

from __future__ import annotations

import pyarrow as pa
import pytest
from pyspark.sql import types as T

from arrow_ballista_spark.types import to_spark_schema, to_spark_type

CASES = [
    (pa.bool_(), T.BooleanType()),
    (pa.int8(), T.ByteType()),
    (pa.int64(), T.LongType()),
    (pa.uint8(), T.ShortType()),
    (pa.uint16(), T.IntegerType()),
    (pa.uint32(), T.LongType()),
    (pa.uint64(), T.DecimalType(20, 0)),
    (pa.float16(), T.FloatType()),
    (pa.float64(), T.DoubleType()),
    (pa.string(), T.StringType()),
    (pa.large_utf8(), T.StringType()),
    (pa.binary(), T.BinaryType()),
    (pa.binary(16), T.BinaryType()),
    (pa.date32(), T.DateType()),
    (pa.date64(), T.DateType()),
    (pa.timestamp("ns"), T.TimestampNTZType()),
    (pa.timestamp("us", tz="UTC"), T.TimestampType()),
    (pa.time64("us"), T.LongType()),
    (pa.duration("ms"), T.LongType()),
    (pa.decimal128(15, 2), T.DecimalType(15, 2)),
    (pa.list_(pa.int32()), T.ArrayType(T.IntegerType())),
    (pa.map_(pa.string(), pa.int64()), T.MapType(T.StringType(), T.LongType())),
    (
        pa.dictionary(pa.int32(), pa.string()),
        T.StringType(),
    ),
]


@pytest.mark.parametrize("arrow_t,spark_t", CASES, ids=[str(c[0]) for c in CASES])
def test_type_mapping(arrow_t, spark_t):
    assert to_spark_type(arrow_t) == spark_t


def test_struct_and_schema():
    s = pa.schema(
        [
            pa.field("id", pa.uint32(), nullable=False),
            pa.field("meta", pa.struct([pa.field("w", pa.int32())])),
        ]
    )
    out = to_spark_schema(s)
    assert out["id"].dataType == T.LongType() and not out["id"].nullable
    assert out["meta"].dataType == T.StructType(
        [T.StructField("w", T.IntegerType(), True)]
    )


def test_union_rejected():
    with pytest.raises(TypeError):
        to_spark_type(pa.union([pa.field("a", pa.int32())], mode="sparse"))


def test_roundtrip_through_spark(spark):
    """A widened schema must be constructible and usable by Spark."""
    tbl = pa.table(
        {
            "u32": pa.array([1, 2], pa.uint32()),
            "s": pa.array(["a", "b"]),
        }
    )
    df = spark.createDataFrame(
        tbl.to_pylist(), to_spark_schema(tbl.schema)
    )
    assert df.schema["u32"].dataType == T.LongType()
    assert df.count() == 2
