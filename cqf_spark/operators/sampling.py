"""Deterministic dataset splitting and stratified sampling — the
reproducibility primitives of a training-data pipeline: every document's
split/sample fate is a pure function of its key and a salt, so reruns,
backfills, and incremental crawls land rows in the same bucket with no
coordination, no RNG state, and no shuffle (both operators are one
codegen Project over the scan).

The hash is md5's leading 8 hex chars compared as strings (equal-length
lowercase hex compares identically to its numeric value).  md5 here is a
portability choice, not a speed one: Spark, DuckDB, and every warehouse
SQL dialect agree on md5(text), so the driver gate can mirror the exact
assignment — and the per-row cost is the same one-pass digest
xxhash64 would be.  Salts namespace decisions: a doc's train/val/test
split and its eval-subsample membership are independent coins.
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

_HEX_SPACE = 16**8  # first 8 md5 hex chars = uniform 32-bit bucket


def _bucket(salt: str, *cols: Column) -> Column:
    """Leading-8-hex md5 bucket of (salt | col | col ...), uniform on
    [0, 16^8) as a comparable fixed-width hex string."""
    return F.substring(
        F.md5(F.concat_ws("|", F.lit(salt), *cols)), 1, 8
    )


def _thresholds(weights: Sequence[float]) -> list[str]:
    """Cumulative-weight bucket boundaries as 8-hex-digit literals."""
    total = float(sum(weights))
    out, cum = [], 0.0
    for w in weights[:-1]:
        cum += w / total
        out.append(format(int(cum * _HEX_SPACE), "08x"))
    return out


def train_val_test_split(
    docs: DataFrame,
    key_col: str = "doc_id",
    names: Sequence[str] = ("train", "val", "test"),
    weights: Sequence[float] = (0.98, 0.01, 0.01),
    salt: str = "split",
) -> DataFrame:
    """docs plus a ``split`` column: deterministic hash-bucket assignment
    with expected proportions ``weights``.  Stable under reruns, appends,
    and repartitioning (the assignment reads nothing but the key)."""
    assert len(names) == len(weights) and len(names) >= 2
    assert all(w > 0 for w in weights), "weights must be positive"
    b = _bucket(salt, F.col(key_col).cast("string"))
    expr = F.lit(names[-1])
    for name, thr in reversed(list(zip(names[:-1], _thresholds(weights)))):
        expr = F.when(b < thr, F.lit(name)).otherwise(expr)
    return docs.withColumn("split", expr)


def stratified_sample(
    docs: DataFrame,
    fraction: float,
    strata_col: str,
    key_col: str = "doc_id",
    salt: str = "sample",
) -> DataFrame:
    """Keep a deterministic ~``fraction`` of every stratum: the sampling
    coin is hashed from (salt, stratum, key), so each stratum is sampled
    at the same rate regardless of its size — the property plain
    df.sample() only gives in expectation over the WHOLE frame — and
    membership is reproducible row-by-row.  One codegen filter, no
    shuffle, no count pass."""
    assert 0.0 < fraction <= 1.0
    thr = format(int(fraction * _HEX_SPACE), "08x")
    b = _bucket(
        salt, F.col(strata_col).cast("string"), F.col(key_col).cast("string")
    )
    return docs.where(b < thr)


# --------------------------------------------------------------------- #
# driver-gated query + standalone DuckDB oracle
# --------------------------------------------------------------------- #

_W = (0.8, 0.1, 0.1)
_FRAC = 0.25


def q_split_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per document: its train/val/test assignment (80/10/10) and whether
    the lang-stratified 25% subsample keeps it — both as pure functions
    of (doc_id, lang) the oracle recomputes byte-for-byte."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang"
    )
    split = train_val_test_split(docs, weights=_W, salt="s1")
    sampled = stratified_sample(
        docs, _FRAC, strata_col="lang", salt="s2"
    ).select("doc_id", F.lit(True).alias("sampled"))
    return (
        split.join(sampled, "doc_id", "left_outer")
        .select(
            "doc_id",
            "split",
            F.coalesce("sampled", F.lit(False)).alias("sampled"),
        )
    )


def _split_sql() -> str:
    t1, t2 = _thresholds(_W)
    thr = format(int(_FRAC * _HEX_SPACE), "08x")
    return f"""
SELECT doc_id,
       CASE WHEN substr(md5('s1' || '|' || CAST(doc_id AS VARCHAR)), 1, 8)
                 < '{t1}' THEN 'train'
            WHEN substr(md5('s1' || '|' || CAST(doc_id AS VARCHAR)), 1, 8)
                 < '{t2}' THEN 'val'
            ELSE 'test' END AS split,
       substr(md5('s2' || '|' || lang || '|' || CAST(doc_id AS VARCHAR)),
              1, 8) < '{thr}' AS sampled
FROM documents
"""


SAMPLING_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "corpus_split_sample": q_split_sample,
}

SAMPLING_ORACLES: dict[str, str] = {"corpus_split_sample": _split_sql()}
