"""Presto/Trino scalar-function aliases (SURVEY.md §2.8 "standard scalar
surface").

pandas-td users wrote Presto SQL; this registers Presto function *names*
Spark lacks as SQL scalar functions (analyzer-inlined ``CREATE TEMPORARY
FUNCTION ... RETURN <expr>`` — zero runtime cost, full Catalyst
visibility) so raw query text ports unchanged.

Coverage notes:
* Much of the Presto surface is already native in Spark 3.5/4.x under the
  same name (``cardinality``, ``element_at``, ``regexp_like``, ``chr``,
  ``json_array_length``, ``array_agg``, ``bool_and/bool_or``,
  ``min_by/max_by``, ``any_value``) — those are intentionally NOT
  re-registered (Spark refuses temporary functions that shadow builtins).
* SQL UDFs cannot define aggregates: ``approx_distinct`` must be renamed
  to ``approx_count_distinct`` in query text (documented deviation).
* ``date_diff`` cannot be aliased: Spark ships a builtin ``date_diff(a,b)``
  (2-arg, days); Presto's 3-arg ``date_diff(unit,a,b)`` ports to
  ``timestampdiff(unit, a, b)`` which Spark also provides natively.
* ``day_of_week`` follows Presto/ISO numbering (Mon=1..Sun=7), which is
  NOT Spark's ``dayofweek`` (Sun=1) — implemented via ``weekday()+1``.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

__all__ = ["register_presto_functions", "PRESTO_SCALAR_ALIASES"]

# name -> (args signature, return type, body)
PRESTO_SCALAR_ALIASES: dict[str, tuple[str, str, str]] = {
    # strings
    "strpos": ("s STRING, sub STRING", "INT", "locate(sub, s)"),
    "codepoint": ("s STRING", "INT", "ascii(s)"),
    "from_utf8": ("b BINARY", "STRING", "decode(b, 'UTF-8')"),
    "to_utf8": ("s STRING", "BINARY", "encode(s, 'UTF-8')"),
    # json
    "json_extract_scalar": ("j STRING, p STRING", "STRING", "get_json_object(j, p)"),
    "json_format": ("j STRING", "STRING", "to_json(from_json(j, 'map<string,string>'))"),
    # url
    "url_extract_host": ("u STRING", "STRING", "parse_url(u, 'HOST')"),
    "url_extract_path": ("u STRING", "STRING", "parse_url(u, 'PATH')"),
    "url_extract_query": ("u STRING", "STRING", "parse_url(u, 'QUERY')"),
    # datetime
    "to_unixtime": ("t TIMESTAMP", "DOUBLE", "cast(unix_timestamp(t) as double)"),
    "day_of_week": ("t TIMESTAMP", "INT", "weekday(t) + 1"),
    "day_of_year": ("t TIMESTAMP", "INT", "dayofyear(t)"),
    "week_of_year": ("t TIMESTAMP", "INT", "weekofyear(t)"),
    # math / misc
    "truncate": ("x DOUBLE", "DOUBLE", "cast(cast(x as bigint) as double)"),
    "infinity": ("", "DOUBLE", "cast('Infinity' as double)"),
    "nan": ("", "DOUBLE", "cast('NaN' as double)"),
    "is_nan": ("x DOUBLE", "BOOLEAN", "isnan(x)"),
}


def register_presto_functions(spark: SparkSession) -> None:
    for name, (args, ret, body) in PRESTO_SCALAR_ALIASES.items():
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {name}({args}) "
            f"RETURNS {ret} RETURN {body}"
        )
