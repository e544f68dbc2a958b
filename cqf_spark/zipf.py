"""Deterministic Zipfian key stream (the reference's skew workload:
src/bm.c:106-138, src/zipf.c:58-137 — s defaults to 1.5, samples by
binary search over a cumulative bucket table).

Spark-native: ``spark.range(n)`` ids are hashed to uniforms (murmur, so
the stream is identical no matter how rows are partitioned), then mapped
through the precomputed inverse CDF with one ``searchsorted`` per batch.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from .functions.hashing import murmur64a_u64


def zipf_cdf(universe: int, s: float = 1.5) -> np.ndarray:
    ranks = np.arange(1, universe + 1, dtype=np.float64)
    w = ranks**-s
    return np.cumsum(w) / w.sum()


def zipf_keys(
    spark: SparkSession,
    n: int,
    universe: int = 1_000_000,
    s: float = 1.5,
    seed: int = 0x21F,
    parts: int | None = None,
) -> DataFrame:
    """DataFrame[key long] of n Zipf(s) draws over [0, universe) —
    deterministic in (n, universe, s, seed), independent of partitioning."""
    cdf = zipf_cdf(universe, s)
    bc = spark.sparkContext.broadcast(cdf)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        table = bc.value
        for pdf in batches:
            ids = pdf["id"].to_numpy().astype(np.int64).view(np.uint64)
            u = murmur64a_u64(ids, seed).astype(np.float64) / 2.0**64
            keys = np.searchsorted(table, u, side="left")
            yield pd.DataFrame({"key": keys.astype(np.int64)})

    rng = spark.range(n)
    if parts:
        rng = rng.repartition(parts)
    return rng.mapInPandas(gen, schema="key long")


def uniform_keys(
    spark: SparkSession,
    n: int,
    maxvalue: int = 2**63,
    seed: int = 0x7E1,
    parts: int | None = None,
) -> DataFrame:
    """DataFrame[key long] of n uniform draws over [0, maxvalue) — the
    reference's ``uniform_online`` workload generator (src/bm.c:347-378:
    keys drawn from a seeded PRNG *as the stream is consumed*, not
    pregenerated).  Spark-native analog: the draw happens inside the
    executor's mapInPandas batch, so — exactly like the reference mode —
    key generation cost is inside any window that times this stream, and
    nothing is materialized up front.  Deterministic in (n, maxvalue,
    seed) and independent of partitioning (murmur of the row id, not a
    stateful PRNG, so splitting the range across executors cannot
    reorder the stream)."""
    if not 0 < maxvalue <= 2**63:
        # keys ride a Spark ``long``; a larger modulus would wrap the
        # top half of the range into negative values
        raise ValueError(f"maxvalue must be in (0, 2**63], got {maxvalue}")
    mv = np.uint64(maxvalue)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy().astype(np.int64).view(np.uint64)
            keys = murmur64a_u64(ids, seed) % mv
            yield pd.DataFrame({"key": keys.view(np.int64)})

    rng = spark.range(n)
    if parts:
        rng = rng.repartition(parts)
    return rng.mapInPandas(gen, schema="key long")


def keys_from_file(spark: SparkSession, path: str) -> DataFrame:
    """DataFrame[key long] from a newline-delimited integer key file —
    the reference's ``app_file_read`` workload source (src/bm.c:213-255:
    fscanf one integer per line into the pregen buffer).  Spark-native:
    ``spark.read.text`` keeps the file read distributed and splittable
    (a 1 TB key file scans in parallel instead of through one fscanf
    loop); blank lines are dropped, matching fscanf's whitespace
    skipping.  Unlike fscanf — which silently STOPS at the first
    non-numeric token, truncating the workload — a malformed non-blank
    line raises, so a corrupt key file cannot silently shrink a
    benchmark or gate."""
    from pyspark.sql import functions as F

    txt = spark.read.text(path)
    raw = F.trim(F.col("value"))
    key = raw.try_cast("long")
    # validate in-stream (no extra pass): a non-blank line that fails the
    # cast aborts the job with the offending text in the error message
    checked = F.when(
        key.isNull() & (raw != F.lit("")),
        F.raise_error(F.concat(F.lit("non-integer line in key file: "), raw)),
    ).otherwise(key)
    return (
        txt.select(checked.alias("key")).where(F.col("key").isNotNull())
    )
