"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: token multiplicity via a
    distributed CQF sketch (build per partition -> tree merge -> broadcast
    probe)."""
    from cqf_spark.queries import q_token_multiplicity

    return q_token_multiplicity(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from cqf_spark.queries import SKETCH_QUERIES

    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    out.update(SKETCH_QUERIES)
    try:
        from cqf_spark.operators.registry import PIPELINE_QUERIES

        out.update(PIPELINE_QUERIES)
    except ImportError:
        pass
    return out


def oracle_sql() -> dict[str, str]:
    from cqf_spark.queries import SKETCH_ORACLES

    out: dict[str, str] = {}
    out.update(SKETCH_ORACLES)
    try:
        from cqf_spark.operators.registry import PIPELINE_ORACLES

        out.update(PIPELINE_ORACLES)
    except ImportError:
        pass
    return out
