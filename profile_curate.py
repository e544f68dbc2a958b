#!/usr/bin/env python
"""Stage-level profile of curate_training_corpus at sf1.0 (guide §1.4:
noop sink isolation).  Run alone."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import cqf_spark  # noqa: F401

from bench_extra import make_spark, warm

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf1.0"
TRIALS = 2


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def t(label, fn):
    best = float("inf")
    for _ in range(TRIALS):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    print(f"{label:45s} {best:8.3f}s", flush=True)
    return best


def main():
    spark = make_spark()
    spark.sparkContext.setLogLevel("ERROR")
    warm(spark)

    from pyspark.sql import functions as F

    from cqf_spark.operators.curation import (
        JACCARD,
        KEEP_LANGS,
        MIN_ALPHA,
        MIN_TOKENS,
    )
    from cqf_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        shingle_df,
    )
    from cqf_spark.operators.text_queries import (
        alpha_ratio_expr,
        lang_pred_expr,
        n_tokens_expr,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    kept = (
        docs.select(
            "doc_id",
            "text",
            n_tokens_expr("text").alias("n_tokens"),
            alpha_ratio_expr("text").alias("alpha_ratio"),
            lang_pred_expr("text").alias("pred_lang"),
        )
        .where(
            (F.col("n_tokens") >= MIN_TOKENS)
            & (F.col("alpha_ratio") >= MIN_ALPHA)
            & F.col("pred_lang").isin(*KEEP_LANGS)
        )
    )
    t("scan only", lambda: noop(docs.select("doc_id", "text")))
    t("kept (features+filter)", lambda: noop(kept))
    kd = kept.select("doc_id", "text")
    sigs = minhash_signatures(kd)
    t("minhash signatures", lambda: noop(sigs))
    cand = lsh_candidate_pairs(sigs)
    t("lsh candidate pairs", lambda: noop(cand))
    print("  n_cand =", cand.count(), flush=True)
    sh = shingle_df(kd)
    t("shingle_df explode", lambda: noop(sh))
    sizes = sh.groupBy("id").agg(F.count("*").alias("sz"))
    t("shingle sizes agg", lambda: noop(sizes))
    a = sh.select(F.col("id").alias("i"), F.col("g"))
    b = sh.select(F.col("id").alias("j"), F.col("g"))
    inter = (
        cand.join(a, "i").join(b, ["j", "g"]).groupBy("i", "j").agg(
            F.count("*").alias("inter")
        )
    )
    t("verify inter join", lambda: noop(inter))
    sa = sizes.select(F.col("id").alias("i"), F.col("sz").alias("na"))
    sb = sizes.select(F.col("id").alias("j"), F.col("sz").alias("nb"))
    pairs = (
        inter.join(F.broadcast(sa), "i")
        .join(F.broadcast(sb), "j")
        .select(
            "i", "j",
            (F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))).alias("jac"),
        )
        .where(F.col("jac") >= JACCARD)
    )
    t("pairs (full verify)", lambda: noop(pairs))
    dropped = pairs.select(F.col("j").alias("doc_id")).distinct()
    final = kept.join(dropped, "doc_id", "left_anti").select(
        "doc_id", "pred_lang", "n_tokens"
    )
    t("full curate (count)", lambda: final.count())
    spark.stop()


if __name__ == "__main__":
    main()
