"""Registry of pipeline queries beyond the core CQF sketch set.

``__spark_entry__.queries()/oracle_sql()`` merge these dicts; ``bench.py``
benches the names in ``BENCH_QUERIES``.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from .webtext_queries import WEBTEXT_ORACLES, WEBTEXT_QUERIES

PIPELINE_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
PIPELINE_ORACLES: dict[str, str] = {}

PIPELINE_QUERIES.update(WEBTEXT_QUERIES)
PIPELINE_ORACLES.update(WEBTEXT_ORACLES)

for _mod, _q, _o in [
    ("dedup_queries", "DEDUP_QUERIES", "DEDUP_ORACLES"),
    ("text_queries", "TEXT_QUERIES", "TEXT_ORACLES"),
    ("ann_queries", "ANN_QUERIES", "ANN_ORACLES"),
    ("sketch_family_queries", "FAMILY_QUERIES", "FAMILY_ORACLES"),
    ("multimodal", "MULTIMODAL_QUERIES", "MULTIMODAL_ORACLES"),
    ("curation", "CURATION_QUERIES", "CURATION_ORACLES"),
]:
    try:
        _m = __import__(f"cqf_spark.operators.{_mod}", fromlist=[_q, _o])
        PIPELINE_QUERIES.update(getattr(_m, _q))
        PIPELINE_ORACLES.update(getattr(_m, _o))
    except ImportError:
        pass

# headline pipeline queries the bench harness times at sf0.1
BENCH_QUERIES = ["webtext_bigram_multiplicity", "curate_training_corpus"]
