"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship pipeline (tile assignment zooms 0-14 +
buffered MVT encode at z5) on sf0.001.  ``queries``/``oracle_sql`` pairs
exercise each engine operator against DuckDB oracles at sf0.01 — see
zellige_spark/queries.py for the implementations.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: customer-derived geotagged points -> tile assignment
    (zooms 0-14, pure Column math) -> per-tile MVT assembly (streaming
    fold) at z5; returns per-tile stats + tile bytes."""
    from zellige_spark import queries as Q

    return Q.q_mvt_encode(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from zellige_spark import queries as Q

    return dict(Q.QUERIES)


def oracle_sql() -> dict[str, str]:
    from zellige_spark import queries as Q

    return dict(Q.ORACLES)
