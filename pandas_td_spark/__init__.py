"""pandas_td_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of treasure-data/pandas-td, extended with
LLM-data-pipeline operators (dedup, similarity search, text analysis,
multimodal columns) and Structured Streaming.

Public surface mirrors the reference's ``pandas_td/__init__.py`` re-exports
(SURVEY.md §0; /root/reference is empty — parity reconstructed from the
public upstream API), plus the engine-native layers:

* ``pandas_td_spark.compat``     — drop-in pandas-td API (pandas in/out)
* ``pandas_td_spark.sources``    — DataFrame-level read/write
* ``pandas_td_spark.functions``  — td_* SQL function family
* ``pandas_td_spark.operators``  — dedup / similarity / sessionize / asof
* ``pandas_td_spark.streaming``  — Structured Streaming jobs
* ``pandas_td_spark.queries``    — the SURVEY §2 operator inventory as
  named, oracle-checked queries
"""

from pandas_td_spark.compat import (
    Connection,
    QueryEngine,
    ResultProxy,
    connect,
    create_engine,
    read_td,
    read_td_job,
    read_td_query,
    read_td_table,
    to_td,
)

__version__ = "0.1.0"

__all__ = [
    "connect",
    "create_engine",
    "read_td",
    "read_td_query",
    "read_td_job",
    "read_td_table",
    "to_td",
    "Connection",
    "QueryEngine",
    "ResultProxy",
    "__version__",
]
