"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship CDC-compaction query at sf0.001;
``queries()``/``oracle_sql()`` expose every implemented operator from
SURVEY §2 (plus the training-data extensions) with DuckDB oracles.
Implementations live in ``mongo_es_spark/queries.py``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from mongo_es_spark import queries as _registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _registry.cdc_compaction(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    return _registry.oracle_sql()
