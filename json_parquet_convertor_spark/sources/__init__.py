from json_parquet_convertor_spark.sources.io import (  # noqa: F401
    load_table,
    read_json,
    write_parquet,
)
