from lua_mapreduce_spark.sources.readers import (
    read_binary_files,
    read_csv,
    read_json,
    read_orc,
    read_parquet,
    read_text,
    whole_text_files,
    write_csv,
    write_json,
    write_orc,
    write_clustered_parquet,
    write_parquet,
)

__all__ = [
    "read_binary_files",
    "read_csv",
    "read_json",
    "read_orc",
    "read_parquet",
    "read_text",
    "whole_text_files",
    "write_csv",
    "write_json",
    "write_orc",
    "write_clustered_parquet",
    "write_parquet",
]
