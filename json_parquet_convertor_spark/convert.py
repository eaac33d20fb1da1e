"""Reference-parity JSON→Parquet conversion (SURVEY.md §1, §2 A3-A6).

Reproduces the reference's exact conversion semantics
(``/root/reference/convertor/struct.go:4-28``, ``convertor/convertor.go:137-153``):

- fixed compiled-in schema; unknown JSON keys silently dropped;
- missing keys → zero values ("" / 0), NOT null — the Go structs are
  non-pointer and every parquet column is ``required``;
- a type-mismatched record is skipped (DROPMALFORMED);
- output columns renamed per the parquet tags (``ID``→``id`` style) and age
  narrowed to an 8-bit int (INT32/INT_8 → reads back as TINYINT);
- snappy compression, dictionary-encoded strings.

The reference does this one row per file via an SQS-notified worker pool;
here it is one declarative job that scales to any number of files/rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from json_parquet_convertor_spark.sources.io import read_json, write_parquet

# the reference's input schema: convertor/struct.go:4-9
PERSON_JSON_SCHEMA = StructType(
    [
        StructField("ID", StringType(), True),
        StructField("name", StringType(), True),
        StructField("nationality", StringType(), True),
        StructField("age", IntegerType(), True),
    ]
)


def person_to_parquet_df(df: DataFrame) -> DataFrame:
    """The reference's ``toParquet`` row-map (convertor/struct.go:20-28) as a
    projection: rename + zero-fill + narrowing cast to tinyint (INT_8)."""
    return df.select(
        F.coalesce(F.col("ID"), F.lit("")).alias("id"),
        F.coalesce(F.col("name"), F.lit("")).alias("name"),
        F.coalesce(F.col("nationality"), F.lit("")).alias("nationality"),
        F.coalesce(F.col("age"), F.lit(0)).cast("tinyint").alias("age"),
    )


def json_to_parquet(
    spark: SparkSession, src: str, dst: str, schema: StructType | None = None
) -> DataFrame:
    """End-to-end A3→A5→A6: read JSON, apply conversion semantics, write
    snappy parquet, return the read-back DataFrame."""
    schema = schema or PERSON_JSON_SCHEMA
    raw = read_json(spark, src, schema=schema, multiline=True, drop_malformed=True)
    converted = person_to_parquet_df(raw) if schema is PERSON_JSON_SCHEMA else raw
    write_parquet(converted, dst, compression="snappy")
    return spark.read.parquet(dst)


# The reference's sample inputs (sample_json/person{2,3,4}.json), embedded so
# parity tests don't depend on the read-only reference checkout at runtime.
SAMPLE_PERSONS: dict[str, str] = {
    "person2.json": '{\n "ID": "1234",\n "name": "Jon",\n "nationality": "CM",\n "age": 12\n}\n',
    "person3.json": '{\n "ID": "12",\n "name": "AMY",\n "nationality": "AC",\n "age": 56\n}\n',
    "person4.json": '{\n "ID": "1122",\n "name": "KIM",\n "nationality": "CM",\n "age": 34\n}\n',
}


def write_sample_json(dirpath: str) -> str:
    """Materialize the embedded reference samples into ``dirpath``."""
    import os

    os.makedirs(dirpath, exist_ok=True)
    for name, body in SAMPLE_PERSONS.items():
        with open(os.path.join(dirpath, name), "w") as f:
            f.write(body)
    return dirpath
