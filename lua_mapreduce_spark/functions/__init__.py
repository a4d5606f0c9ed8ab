"""Reusable column expressions shared by the operator library."""

from lua_mapreduce_spark.functions.exact import davg_expr, dec, dsum_expr
from lua_mapreduce_spark.functions.texthash import md5_bigint_expr, words_expr

__all__ = ["davg_expr", "dec", "dsum_expr", "md5_bigint_expr", "words_expr"]
