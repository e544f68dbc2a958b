"""Sketch-family queries with deterministic, oracle-checkable outputs.

Approximate answers can't equal SQL aggregates bit-for-bit, so each query
emits the *published error-bound check itself* as a column: the Spark side
computes estimate AND exact (exact via ordinary Spark aggregation) and
emits booleans the DuckDB oracle pins to TRUE — plus exact values the
oracle recomputes independently.  A broken sketch flips a boolean and the
driver's value-hash comparison fails; the gate is as strict as the bound.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sketches import BloomFilter, CountMinSketch, HyperLogLog, KllSketch, TDigest
from ..sketches.harness import hash_any_series, sketch_aggregate


def _load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


# --------------------------------------------------------------------- #
# HyperLogLog: distinct l_partkey within the 3-sigma bound
# --------------------------------------------------------------------- #

def q_hll_ndistinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _load(spark, sf_dir, "lineitem")
    hll = sketch_aggregate(li, "l_partkey", lambda: HyperLogLog(p=14))
    exact = li.select(F.countDistinct("l_partkey")).collect()[0][0]
    est = hll.estimate()
    ok = bool(abs(est / exact - 1.0) <= 3 * hll.rel_error)
    return spark.createDataFrame(
        [(int(exact), ok)], "exact_nd long, within_3sigma boolean"
    )


# --------------------------------------------------------------------- #
# Count-Min: per-key bounds (never under, over by <= 4*eN/w)
# --------------------------------------------------------------------- #

def q_cm_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _load(spark, sf_dir, "lineitem")
    cm = sketch_aggregate(li, "l_suppkey", lambda: CountMinSketch(4, 16))
    margin = 4.0 * cm.error_bound() + 1.0
    exact = li.groupBy("l_suppkey").agg(F.count("*").alias("exact_count"))
    blob = spark.sparkContext.broadcast(cm.to_bytes())

    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import LongType

    @pandas_udf(LongType())
    def cm_est(keys: pd.Series) -> pd.Series:
        from ..sketches import from_bytes

        sk = from_bytes(blob.value)
        return pd.Series(sk.query(hash_any_series(keys)).astype(np.int64))

    return exact.select(
        "l_suppkey",
        "exact_count",
        (cm_est("l_suppkey") >= F.col("exact_count")).alias("lower_ok"),
        (cm_est("l_suppkey") <= F.col("exact_count") + F.lit(margin)).alias(
            "upper_ok"
        ),
    )


# --------------------------------------------------------------------- #
# Bloom: zero false negatives on o_custkey; FP rate within formula bound
# --------------------------------------------------------------------- #

def q_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-false-negative + FP-bound gate with NO full-column driver
    materialization (VERDICT r3 #7): the present-key FN count and the
    disjoint-universe FP rate are both Spark aggregates over a broadcast
    filter blob — the driver sees three scalars (the distinct count to
    size the filter, then the two aggregate rows)."""
    orders = _load(spark, sf_dir, "orders")
    nd = orders.select(F.countDistinct("o_custkey")).collect()[0][0]  # scalar
    bf = sketch_aggregate(
        orders, "o_custkey", lambda: BloomFilter.for_capacity(int(nd), 0.01)
    )
    blob = spark.sparkContext.broadcast(bf.to_bytes())

    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import BooleanType

    @pandas_udf(BooleanType())
    def bf_contains(keys: pd.Series) -> pd.Series:
        from ..sketches import from_bytes

        sk = from_bytes(blob.value)
        return pd.Series(sk.contains(hash_any_series(keys)))

    fn = int(
        orders.select("o_custkey")
        .distinct()
        .agg(F.sum((~bf_contains("o_custkey")).cast("long")))
        .collect()[0][0]
    )
    # disjoint probe universe: keys far above any custkey, generated as a
    # distributed range (never a driver-side array)
    fp_rate = float(
        spark.range(10**12, 10**12 + 50_000)
        .agg(F.avg(bf_contains(F.col("id").cast("long")).cast("double")))
        .collect()[0][0]
    )
    # 2x the analytic mean + absolute floor: single-instance FP rates at
    # small m have high relative variance (the formula is an expectation)
    fp_ok = fp_rate <= max(2.0 * bf.expected_fp_rate(int(nd)), 2e-3)
    return spark.createDataFrame(
        [(fn, bool(fp_ok))], "false_negatives long, fp_rate_ok boolean"
    )


# --------------------------------------------------------------------- #
# t-digest / KLL: quantiles within rank-error bounds
# --------------------------------------------------------------------- #

_QS = [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]


def _rank_check(
    df: DataFrame, col: str, estimates: np.ndarray, eps: float
) -> DataFrame:
    """For each target q: true rank interval of the estimate
    [P(x < est), P(x <= est)] must intersect [q-eps, q+eps].
    One Spark pass computes all 2*len(qs) ranks."""
    n = df.count()
    aggs = []
    for i, e in enumerate(estimates):
        aggs.append(
            (F.sum((F.col(col) < float(e)).cast("long")) / n).alias(f"lt{i}")
        )
        aggs.append(
            (F.sum((F.col(col) <= float(e)).cast("long")) / n).alias(f"le{i}")
        )
    row = df.agg(*aggs).collect()[0]
    out = []
    for i, q in enumerate(_QS):
        ok = (row[f"lt{i}"] - eps) <= q <= (row[f"le{i}"] + eps)
        out.append((float(q), bool(ok)))
    return df.sparkSession.createDataFrame(out, "q double, rank_err_ok boolean")


def q_tdigest_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _load(spark, sf_dir, "events")
    td = sketch_aggregate(
        ev, "value", lambda: TDigest(200.0), kind="numeric"
    )
    est = td.quantile(np.array(_QS))
    return _rank_check(ev.select("value"), "value", est, eps=0.02)


def q_kll_extendedprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _load(spark, sf_dir, "lineitem")
    kll = sketch_aggregate(
        li, "l_extendedprice", lambda: KllSketch(200), kind="numeric"
    )
    est = kll.quantile(np.array(_QS))
    return _rank_check(
        li.select("l_extendedprice"), "l_extendedprice", est, eps=0.03
    )


def q_filter_sketch_gates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL distinct-count and Bloom membership gates union-shaped into
    one row set (driver gate caps at 50 queries — see __spark_entry__):
    ('hll_ndistinct', exact_nd, within_3sigma) and
    ('bloom', false_negatives, fp_rate_ok) — both stay value-checked."""
    hll = q_hll_ndistinct(spark, sf_dir).select(
        F.lit("hll_ndistinct").alias("gate"),
        F.col("exact_nd").alias("val"),
        F.col("within_3sigma").alias("ok"),
    )
    bloom = q_bloom_membership(spark, sf_dir).select(
        F.lit("bloom").alias("gate"),
        F.col("false_negatives").alias("val"),
        F.col("fp_rate_ok").alias("ok"),
    )
    return hll.unionByName(bloom)


def q_quantile_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-digest (events.value) and KLL (lineitem.l_extendedprice) rank-
    error gates union-shaped into one row set (same (q, ok) grain; the
    driver gate caps at 50 queries — see __spark_entry__)."""
    td = q_tdigest_event_values(spark, sf_dir).select(
        F.lit("tdigest").alias("sketch"), "q", "rank_err_ok"
    )
    kll = q_kll_extendedprice(spark, sf_dir).select(
        F.lit("kll").alias("sketch"), "q", "rank_err_ok"
    )
    return td.unionByName(kll)


FAMILY_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "filter_sketch_gates": q_filter_sketch_gates,
    "cm_counts_suppkey": q_cm_counts,
    "quantile_sketches": q_quantile_sketches,
}

FAMILY_ORACLES: dict[str, str] = {
    "filter_sketch_gates": (
        "SELECT 'hll_ndistinct' AS gate, "
        "CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS val, "
        "TRUE AS ok FROM lineitem "
        "UNION ALL "
        "SELECT 'bloom' AS gate, CAST(0 AS BIGINT) AS val, TRUE AS ok"
    ),
    "cm_counts_suppkey": (
        "SELECT l_suppkey, COUNT(*) AS exact_count, TRUE AS lower_ok, "
        "TRUE AS upper_ok FROM lineitem GROUP BY l_suppkey"
    ),
    "quantile_sketches": (
        "SELECT s AS sketch, CAST(q AS DOUBLE) AS q, TRUE AS rank_err_ok "
        "FROM (VALUES ('tdigest'), ('kll')) AS st(s), (VALUES (0.01), "
        "(0.1), (0.25), (0.5), (0.75), (0.9), (0.99)) AS t(q)"
    ),
}
