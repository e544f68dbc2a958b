#!/usr/bin/env python
"""Round-6 optimization harness (guide §1): per-query timing with the
noop sink, plan capture, and stage-level breakdowns.

NOT the driver contract — ``bench.py`` stays frozen.  This file exists so
optimization work can (a) isolate single queries, (b) capture
``.explain("formatted")`` into plans/r06/, and (c) time sub-stages of the
composed pipelines without touching the measured harness.

Usage:
    python bench_extra.py [--sf DIR] [--trials N] [--plans TAG] [q1 q2 ...]

With --plans TAG, writes plans/r06/<query>_<TAG>.txt for each query.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import cqf_spark  # noqa: F401  (malloc/arrow env before JVM)

DEFAULT_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def make_spark(cores: int = CPUS):
    # mirror bench.py's frozen session config exactly so numbers transfer
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(f"cqf-bench-extra-{cores}")
        .config("spark.sql.shuffle.partitions", str(cores))
        .config("spark.default.parallelism", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.local.dir", "/dev/shm/spark-local")
        .config("spark.shuffle.compress", "false")
        .config("spark.shuffle.spill.compress", "false")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "262144")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def warm(spark):
    import pandas as _pd

    def _warm(batches):
        import numpy as _np

        rng = _np.random.default_rng(0)
        a = rng.integers(0, 2**62, 2_000_000).astype(_np.uint64)
        for _ in range(3):
            _np.sort(a)
        n = 0
        for pdf in batches:
            n += len(pdf)
        yield _pd.DataFrame({"n": [n]})

    spark.range(1_000_000).repartition(CPUS * 2).mapInPandas(
        _warm, "n long"
    ).agg({"n": "sum"}).collect()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=DEFAULT_SF)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--plans", default=None, help="write plans/r06/<q>_<TAG>.txt")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    spark = make_spark()
    spark.sparkContext.setLogLevel("ERROR")
    warm(spark)

    from __spark_entry__ import queries as all_queries

    registry = all_queries()
    names = args.queries or [
        "curate_training_corpus",
        "webtext_bigram_multiplicity",
        "cqf_token_multiplicity",
        "cqf_multiplicity_partkey",
        "cqf_membership_custkey",
        "cqf_merge_union_counts",
        "cqf_set_algebra_events",
        "cqf_heavy_hitters_tokens",
    ]

    timings = {}
    for name in names:
        fn = registry[name]
        if args.plans:
            os.makedirs("plans/r06", exist_ok=True)
            df = fn(spark, args.sf)
            with open(f"plans/r06/{name}_{args.plans}.txt", "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        samples = []
        for _ in range(args.trials):
            spark.sparkContext.setJobDescription(f"r06:{name}")
            t0 = time.time()
            df = fn(spark, args.sf)
            n = df.count()
            samples.append(round(time.time() - t0, 3))
        timings[name] = {"min": min(samples), "samples": samples, "rows": n}
        print(json.dumps({name: timings[name]}), flush=True)

    print(json.dumps({
        "sf": args.sf,
        "total_min": round(sum(v["min"] for v in timings.values()), 3),
        "queries": {k: v["min"] for k, v in timings.items()},
    }))
    spark.stop()


if __name__ == "__main__":
    main()
