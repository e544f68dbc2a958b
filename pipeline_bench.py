"""Throughput of the training-data pipeline stages (supplementary to
bench.py's headline sketch queries): replicates the sf0.1 documents
table to ~500k rows (unique ids, shifted hosts so group structure is
preserved), then times each stage end-to-end and the full composed
chain.  One JSON line, same discipline as bench.py (warm arena, steady
-state trials, fresh actions per trial).

Run it ALONE — concurrent Spark work contaminates the numbers
(CLAUDE.md).  Usage: python pipeline_bench.py [replication]
"""

import json
import sys
import time

import cqf_spark  # noqa: F401  (malloc/Arrow pool pinning BEFORE the JVM)
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

REPL = int(sys.argv[1]) if len(sys.argv) > 1 else 100
SF_DIR = "/root/testdata/sf0.1"
TRIALS = 3


def corpus(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    reps = spark.range(REPL).select(F.col("id").alias("_r"))
    return (
        docs.crossJoin(F.broadcast(reps))
        .select(
            (F.col("doc_id") * REPL + F.col("_r")).alias("doc_id"),
            "text",
            "lang",
            F.concat_ws("-", "source", (F.col("_r") % 10).cast("string"))
            .alias("source"),
        )
        .repartition(32)
    )


def timed(fn):
    best = float("inf")
    for _ in range(TRIALS):
        t = time.time()
        fn()
        best = min(best, time.time() - t)
    return round(best, 3)


def main():
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.local.dir", "/dev/shm/spark-pipe-bench")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "262144")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from cqf_spark.operators.cleaning import scrub_pii, strip_boilerplate
    from cqf_spark.operators.components import resolve_duplicate_clusters
    from cqf_spark.operators.corpus import pack_corpus, shuffle_corpus
    from cqf_spark.operators.sampling import cap_per_group, temperature_mix

    docs = corpus(spark)
    docs.persist()
    n = docs.count()  # materialize once; stages below time THEIR work

    # planted duplicate graph for cluster resolution: each source doc's
    # REPL replicas form a CHAIN (maximum diameter per component — the
    # hardest shape for connected components; real LSH pair graphs are
    # denser and converge faster), ~n*(REPL-1)/REPL edges.
    dup_pairs = (
        docs.select("doc_id")
        .where((F.col("doc_id") % REPL) != 0)
        .select(F.col("doc_id").alias("i"), (F.col("doc_id") - 1).alias("j"))
    )

    stages = {
        "cap_per_group_prefilter": lambda: cap_per_group(
            docs, "source", k=2000, prefilter=True, est_rows_per_group=2500
        ).count(),
        "temperature_mix": lambda: temperature_mix(
            docs, "lang", 0.5, 0.9
        ).count(),
        "strip_boilerplate": lambda: strip_boilerplate(
            docs, min_docs=max(2, n // 100)
        ).agg(F.sum("n_dropped")).collect(),
        "scrub_pii": lambda: scrub_pii(docs)
        .agg(F.sum("n_email"), F.sum(F.length("clean_text"))).collect(),
        "shuffle_pack": lambda: pack_corpus(
            shuffle_corpus(docs, n_partitions=32),
            budget_tokens=100_000,
            per_partition=True,
        ).agg(F.max("shard_off")).collect(),
        "resolve_dup_clusters": lambda: resolve_duplicate_clusters(
            docs, dup_pairs
        ).count(),
    }
    out = {"n_docs": n, "sf": 0.1, "replication": REPL, "stages": {}}
    total = 0.0
    for name, fn in stages.items():
        sec = timed(fn)
        out["stages"][name] = {
            "sec": sec,
            "kdocs_per_s": round(n / sec / 1e3, 1),
        }
        total += sec
    out["total_sec"] = round(total, 3)
    docs.unpersist()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
