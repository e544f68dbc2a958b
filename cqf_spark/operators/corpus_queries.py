"""Driver-gated queries for the corpus-construction operators
(operators/corpus.py): paragraph-level exact dedup and token-budget
shard packing, each against a standalone DuckDB oracle.

The paragraph-dedup gate re-chunks the documents table into 5-token
paragraphs and PLANTS cross-document duplicates deterministically (every
doc appends the first paragraph of its decade's base doc), so the gate
checks real drop behavior, not a no-op pass-through; both sides of the
comparison derive the planted corpus from (doc_id, text) alone.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .corpus import pack_corpus, paragraph_dedup

SEP = "\n\n"
_PARA_TOKENS = 5
_PACK_BUDGET = 500


def _planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents re-chunked into 5-token paragraphs with planted
    duplicates: every doc whose id is not a multiple of 10 appends the
    FIRST paragraph of doc (doc_id - doc_id % 10) when that doc exists."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    toks = F.split("text", " ")
    paras = F.transform(
        F.sequence(F.lit(0), F.ceil(F.size(toks) / _PARA_TOKENS) - 1),
        lambda i: F.array_join(
            F.slice(toks, i * _PARA_TOKENS + 1, _PARA_TOKENS), " "
        ),
    )
    base = docs.select("doc_id", F.array_join(paras, SEP).alias("text"))
    firsts = base.select(
        F.col("doc_id").alias("bid"),
        F.element_at(F.split("text", SEP), 1).alias("first_para"),
    )
    return (
        base.join(
            firsts,
            (F.col("doc_id") - F.col("doc_id") % 10) == F.col("bid"),
            "left_outer",
        )
        .select(
            "doc_id",
            F.when(
                (F.col("doc_id") % 10 != 0)
                & F.col("first_para").isNotNull(),
                F.concat_ws(SEP, "text", "first_para"),
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
    )


def q_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return paragraph_dedup(_planted(spark, sf_dir))


def q_pack_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global (total-order) packing mode — the SQL-expressible one; the
    zero-shuffle per-partition mode is plan-audited and invariant-tested
    in tests/test_corpus.py (its shard ids depend on the physical
    partitioning, which a SQL oracle cannot see)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    return pack_corpus(docs, budget_tokens=_PACK_BUDGET)


_NL2 = "chr(10) || chr(10)"

_PLANTED_SQL = f"""
chunk AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
paras AS (
  SELECT doc_id, list_transform(
    range(0, CAST(ceil(len(toks) / {_PARA_TOKENS}.0) AS BIGINT)),
    i -> array_to_string(
      toks[i * {_PARA_TOKENS} + 1 : i * {_PARA_TOKENS} + {_PARA_TOKENS}],
      ' ')) AS ps
  FROM chunk
),
pbase AS (
  SELECT doc_id, array_to_string(ps, {_NL2}) AS text, ps[1] AS first_para
  FROM paras
),
planted AS (
  SELECT b.doc_id,
         CASE WHEN b.doc_id % 10 <> 0 AND f.first_para IS NOT NULL
              THEN b.text || {_NL2} || f.first_para
              ELSE b.text END AS text
  FROM pbase b LEFT JOIN pbase f ON b.doc_id - b.doc_id % 10 = f.doc_id
)
"""

CORPUS_ORACLES: dict[str, str] = {
    "corpus_paragraph_dedup": f"""
WITH {_PLANTED_SQL},
s AS (SELECT doc_id, string_split(text, {_NL2}) AS ps FROM planted),
exploded AS (
  SELECT doc_id, unnest(ps) AS para,
         unnest(range(1, len(ps) + 1)) AS pos
  FROM s
),
parts AS (SELECT * FROM exploded WHERE length(trim(para)) > 0),
ranked AS (
  SELECT doc_id, para, pos,
         row_number() OVER (PARTITION BY para ORDER BY doc_id, pos) AS rn
  FROM parts
),
rebuilt AS (
  SELECT doc_id, string_agg(para, {_NL2} ORDER BY pos) AS clean_text,
         count(*) AS n_kept
  FROM ranked WHERE rn = 1 GROUP BY doc_id
),
totals AS (
  SELECT doc_id,
         len(list_filter(ps, p -> length(trim(p)) > 0)) AS n_paragraphs
  FROM s
)
SELECT t.doc_id, coalesce(r.clean_text, '') AS clean_text,
       t.n_paragraphs,
       t.n_paragraphs - coalesce(r.n_kept, 0) AS n_dropped
FROM totals t LEFT JOIN rebuilt r USING (doc_id)
""",
    "corpus_pack_shards": f"""
WITH t AS (
  SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents
),
c AS (
  SELECT doc_id, n_tokens,
         sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
           - n_tokens AS start
  FROM t
)
SELECT doc_id, n_tokens,
       '0-' || CAST(CAST(floor(start / {_PACK_BUDGET}) AS BIGINT) AS VARCHAR)
         AS shard_id,
       CAST(start - floor(start / {_PACK_BUDGET}) * {_PACK_BUDGET} AS BIGINT)
         AS shard_off
FROM c
""",
}

CORPUS_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "corpus_paragraph_dedup": q_paragraph_dedup,
    "corpus_pack_shards": q_pack_shards,
}
