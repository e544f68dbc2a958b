"""Similarity search over embedding columns (array<float>).

* brute-force cosine top-k — the exact baseline: JVM-side dot products
  via ``F.zip_with`` + ``F.aggregate`` against a broadcast query set, then
  a window top-k.  No Python in the scoring path.
* LSH-bucketed ANN — the scale path: random-hyperplane signatures
  (vectorized batch UDF), multi-table bucket join to form candidates,
  exact rerank of candidates only.  At 100 TB the bucket join touches
  ~n/2^bits of the corpus per query instead of all of it.
* embedding near-dup pairs — all pairs with cosine >= threshold via the
  same signature banding.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _norm_expr(col: str) -> Any:
    return F.sqrt(
        F.aggregate(
            F.transform(F.col(col), lambda x: x * x),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def with_unit_vectors(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """L2-normalize once up front so cosine = dot; everything in float64
    so results are comparable with double-precision oracles."""
    df = df.withColumn("_v64", F.col(vec_col).cast("array<double>"))
    n = _norm_expr("_v64")
    return df.withColumn(
        "_unit",
        F.when(
            n > 0, F.transform(F.col("_v64"), lambda x: x / n)
        ).otherwise(F.col("_v64")),
    ).drop("_v64")


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: broadcast the (small) query set, score every
    corpus row with zip_with/aggregate (codegen), window top-k.

    Returns (query_id, rank, vec_id, cos).  Ties break by vec_id so the
    result is deterministic.
    """
    c = with_unit_vectors(corpus, vec_col).select(
        F.col(id_col).alias("vec_id"), F.col("_unit").alias("cv")
    )
    q = with_unit_vectors(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col("_unit").alias("qv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.aggregate(
                F.zip_with("cv", "qv", lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cos")
    )


def hyperplane_signatures(
    df: DataFrame,
    dim: int,
    n_bits: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 0xA11,
) -> DataFrame:
    """Random-hyperplane (SimHash-for-cosine) signatures: sign pattern of
    n_bits fixed Gaussian projections, one matrix multiply per batch."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_bits))

    def sig(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            m = np.stack(pdf[vec_col].to_numpy())  # (n, dim)
            bits = (m @ planes) > 0  # (n, n_bits)
            weights = (1 << np.arange(n_bits, dtype=np.int64))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "sig": (bits @ weights).astype(np.int64),
                }
            )

    return df.select(id_col, vec_col).mapInPandas(
        sig, schema=f"{id_col} long, sig long"
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_bits: int = 12,
    n_tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 0xA11,
) -> DataFrame:
    """ANN top-k: candidates = corpus rows sharing a signature with the
    query in ANY of n_tables independent hyperplane tables; exact cosine
    rerank of candidates only.  Returns (query_id, rank, vec_id, cos)."""
    tables = []
    for t in range(n_tables):
        cs = hyperplane_signatures(corpus, dim, n_bits, id_col, vec_col, seed + t)
        qs = hyperplane_signatures(queries, dim, n_bits, id_col, vec_col, seed + t)
        tables.append(
            cs.join(
                qs.select(
                    F.col(id_col).alias("query_id"), F.col("sig")
                ),
                "sig",
            ).select("query_id", id_col)
        )
    cand: DataFrame = tables[0]
    for t in tables[1:]:
        cand = cand.unionByName(t)
    cand = cand.where(F.col(id_col) != F.col("query_id")).distinct()

    c = with_unit_vectors(corpus, vec_col).select(
        F.col(id_col), F.col("_unit").alias("cv")
    )
    q = with_unit_vectors(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col("_unit").alias("qv")
    )
    scored = (
        cand.join(c, id_col)
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            id_col,
            F.aggregate(
                F.zip_with("cv", "qv", lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", id_col, "cos")
    )


def cosine_near_dup_pairs(
    corpus: DataFrame,
    dim: int,
    threshold: float = 0.9,
    n_bits: int = 12,
    n_tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 0xA11,
) -> DataFrame:
    """All pairs with cosine >= threshold: signature-bucket self-join
    candidates, exact verification (i < j)."""
    tables = []
    for t in range(n_tables):
        s = hyperplane_signatures(corpus, dim, n_bits, id_col, vec_col, seed + t)
        a, b = s.alias("a"), s.alias("b")
        tables.append(
            a.join(
                b,
                (F.col("a.sig") == F.col("b.sig"))
                & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
            ).select(
                F.col(f"a.{id_col}").alias("i"), F.col(f"b.{id_col}").alias("j")
            )
        )
    cand: DataFrame = tables[0]
    for t in tables[1:]:
        cand = cand.unionByName(t)
    cand = cand.distinct()
    u = with_unit_vectors(corpus, vec_col).select(
        F.col(id_col), F.col("_unit")
    )
    ua = u.select(F.col(id_col).alias("i"), F.col("_unit").alias("va"))
    ub = u.select(F.col(id_col).alias("j"), F.col("_unit").alias("vb"))
    return (
        cand.join(ua, "i")
        .join(ub, "j")
        .select(
            "i",
            "j",
            F.aggregate(
                F.zip_with("va", "vb", lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("cos"),
        )
        .where(F.col("cos") >= threshold)
    )
