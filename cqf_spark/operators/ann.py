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


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF (inverted-file) ANN top-k — the cell-partitioned scale path.

    * **Assign** (map-side, no shuffle): every corpus row scores against
      the broadcast centroid set with codegen ``zip_with``/``aggregate``
      dot products and takes its cell via ``array_max`` over
      ``struct(score, cell)`` — one pass, no key shuffle, O(n * n_cells * d)
      flops in whole-stage codegen.  At 100 TB this is the same cost shape
      as reading the data once.
    * **Probe**: each query ranks the same centroid set and keeps its top
      ``nprobe`` cells; candidates are corpus rows assigned to any probed
      cell — a join on the (tiny) cell id, so ~nprobe/n_cells of the
      corpus is scored per query instead of all of it.
    * **Rerank**: exact cosine on candidates only, window top-k.

    Centroids are supplied by the caller (a deterministic corpus sample
    here; a k-means output in production — the operator is agnostic).
    Scores are rounded to 4 decimals before every argmax/rank with id
    tie-breaks, so results are reproducible bit-for-bit across engines
    (the tolerance the brute-force oracle has already proven sufficient).
    Returns (query_id, rank, vec_id, cos).
    """
    cent = with_unit_vectors(centroids, vec_col).select(
        F.col(id_col).alias("cell"), F.col("_unit").alias("mv")
    )
    cent_rows = cent.collect()  # n_cells rows — tiny by construction
    c = with_unit_vectors(corpus, vec_col).select(
        F.col(id_col), F.col("_unit").alias("cv")
    )
    q = with_unit_vectors(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col("_unit").alias("qv")
    )

    def dot(vec_field: str, mv: list) -> Any:
        lit = F.array(*[F.lit(float(x)) for x in mv])
        return F.aggregate(
            F.zip_with(vec_field, lit, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    # assign: argmax over struct(score, cell) — ties to the LARGER cell id
    # (struct ordering), mirrored in the oracle's ORDER BY score DESC,
    # cell DESC
    def scored_structs(vec_field: str) -> Any:
        return F.array(
            *[
                F.struct(
                    F.round(dot(vec_field, r["mv"]), 4).alias("s"),
                    F.lit(int(r["cell"])).alias("cell"),
                )
                for r in cent_rows
            ]
        )

    assigned = c.select(
        id_col, "cv", F.array_max(scored_structs("cv"))["cell"].alias("cell")
    )

    # probe: top-nprobe cells per query (rank on rounded score, ties to
    # larger cell — same ordering as assignment)
    probe = (
        q.select(
            "query_id",
            "qv",
            F.explode(scored_structs("qv")).alias("sc"),
        )
        .select("query_id", "qv", F.col("sc.s").alias("s"), F.col("sc.cell").alias("cell"))
        .withColumn(
            "cell_rank",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.col("s").desc(), F.col("cell").desc()
                )
            ),
        )
        .where(F.col("cell_rank") <= nprobe)
        .select("query_id", "qv", "cell")
    )

    scored = (
        assigned.join(F.broadcast(probe), "cell")
        .where(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            id_col,
            F.round(
                F.aggregate(
                    F.zip_with("cv", "qv", lambda a, b: a * b),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
                4,
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
