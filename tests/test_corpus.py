"""Corpus-construction operators (operators/corpus.py): paragraph-level
exact dedup against a DuckDB window-SQL oracle, and token-budget shard
packing in both global (total-order) and per-partition (zero-shuffle)
modes."""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from cqf_spark.operators.corpus import pack_corpus, paragraph_dedup

SEP = "\n\n"


def _planted_corpus(spark, sf_dir, n=60, para_tokens=5):
    """Real corpus text re-chunked into 5-token paragraphs, with planted
    cross-document duplicates: every doc also carries the FIRST paragraph
    of doc (id-1) appended, and doc id+1000 repeats doc id's text."""
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text").orderBy("doc_id").limit(n)
    )
    toks = F.split("text", " ")
    paras = F.transform(
        F.sequence(F.lit(0), F.ceil(F.size(toks) / para_tokens) - 1),
        lambda i: F.array_join(
            F.slice(toks, i * para_tokens + 1, para_tokens), " "
        ),
    )
    base = docs.select("doc_id", F.array_join(paras, SEP).alias("text"))
    w = base.select(
        "doc_id", F.element_at(F.split("text", SEP), 1).alias("first_para")
    )
    shifted = w.select(
        (F.col("doc_id") + 1).alias("doc_id"),
        F.col("first_para").alias("prev_first"),
    )
    planted = base.join(shifted, "doc_id", "left_outer").select(
        "doc_id",
        F.when(
            F.col("prev_first").isNotNull(),
            F.concat_ws(SEP, "text", "prev_first"),
        ).otherwise(F.col("text")).alias("text"),
    )
    copies = planted.select(
        (F.col("doc_id") + 1000).alias("doc_id"), "text"
    ).where(F.col("doc_id") % 3 == 0)
    return planted.unionByName(copies)


def _duck_paragraph_dedup(pdf: pd.DataFrame) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("corpus", pdf)
    return con.execute(
        """
        WITH s AS (
          SELECT doc_id, string_split(text, chr(10) || chr(10)) AS ps
          FROM corpus
        ),
        exploded AS (
          SELECT doc_id,
                 unnest(ps) AS para,
                 unnest(range(1, len(ps) + 1)) AS pos
          FROM s
        ),
        parts AS (
          SELECT * FROM exploded WHERE length(trim(para)) > 0
        ),
        ranked AS (
          SELECT doc_id, para, pos,
                 row_number() OVER (
                   PARTITION BY para ORDER BY doc_id, pos
                 ) AS rn
          FROM parts
        ),
        rebuilt AS (
          SELECT doc_id,
                 string_agg(para, chr(10) || chr(10) ORDER BY pos)
                   AS clean_text,
                 count(*) AS n_kept
          FROM ranked WHERE rn = 1 GROUP BY doc_id
        ),
        totals AS (
          SELECT doc_id, count(*) AS n_paragraphs FROM parts GROUP BY doc_id
        )
        SELECT t.doc_id,
               coalesce(r.clean_text, '') AS clean_text,
               t.n_paragraphs,
               t.n_paragraphs - coalesce(r.n_kept, 0) AS n_dropped
        FROM totals t LEFT JOIN rebuilt r USING (doc_id)
        ORDER BY doc_id
        """
    ).df()


def test_paragraph_dedup_matches_sql_oracle(spark, sf_dir):
    corpus = _planted_corpus(spark, sf_dir)
    got = (
        paragraph_dedup(corpus)
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    want = _duck_paragraph_dedup(
        corpus.toPandas()
    ).sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # the planting really exercised the operator: copies lost everything,
    # originals lost the appended prev-first paragraph
    by_id = got.set_index("doc_id")
    planted_copies = [i for i in by_id.index if i >= 1000]
    assert planted_copies
    for i in planted_copies:
        assert by_id.loc[i, "n_dropped"] == by_id.loc[i, "n_paragraphs"]
        assert by_id.loc[i, "clean_text"] == ""
    assert (got["n_dropped"] > 0).sum() > len(planted_copies)
    assert (by_id.loc[[i for i in by_id.index if i < 1000], "n_dropped"]
            .sum() > 0)


def test_pack_corpus_global_matches_sql_oracle(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    got = (
        pack_corpus(docs, budget_tokens=500)
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("docs", docs.toPandas())
    want = con.execute(
        """
        WITH t AS (
          SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM docs
        ),
        c AS (
          SELECT doc_id, n_tokens,
                 sum(n_tokens) OVER (ORDER BY doc_id
                   ROWS UNBOUNDED PRECEDING) - n_tokens AS start
          FROM t
        )
        SELECT doc_id, n_tokens,
               '0-' || CAST(CAST(floor(start / 500) AS BIGINT) AS VARCHAR)
                 AS shard_id,
               CAST(start - floor(start / 500) * 500 AS BIGINT) AS shard_off
        FROM c ORDER BY doc_id
        """
    ).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert got["shard_id"].nunique() > 5  # budget actually splits


def test_pack_corpus_per_partition_invariants(spark, sf_dir):
    budget = 400
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text").repartition(6, "doc_id")
    )
    got = pack_corpus(
        docs, budget_tokens=budget, per_partition=True
    ).toPandas()
    # zero-shuffle mode keeps every document exactly once
    assert sorted(got["doc_id"]) == sorted(
        r[0] for r in docs.select("doc_id").collect()
    )
    # every shard's first doc starts inside the budget, and a shard
    # never exceeds budget + its largest single doc (streaming bound)
    for _, grp in got.groupby("shard_id"):
        assert grp["shard_off"].min() < budget
        assert grp["n_tokens"].sum() <= budget + grp["n_tokens"].max()
    # shard numbering restarts per input partition (ids are part-local)
    parts = {s.split("-")[0] for s in got["shard_id"]}
    assert len(parts) > 1


def test_pack_corpus_plan_shapes(spark, sf_dir):
    """Global mode is a total sort (one exchange); per-partition mode
    must plan with NO exchange at all — the 100 TB path."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    pp = pack_corpus(docs, 500, per_partition=True)
    plan = pp._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
