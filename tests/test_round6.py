"""Round-6 optimization-focused tests: internals changed for performance
must keep byte-identical results.

- counted_keys pre-aggregation produces the exact sketch the raw-stream
  build produced (bit-identical blobs);
- strip_boilerplate's fused min_doc_frac build (threshold scan removed)
  matches the equivalent absolute-threshold run, and an explicit n_docs
  is honored.
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F


def test_counted_keys_build_bit_identical(spark, sf_dir):
    """The pre-aggregated (key, count) build path must produce the exact
    sketch blob the raw-stream build produces — same hashes, same
    multiplicities, same geometry."""
    from cqf_spark.aggregator import cqf_aggregate
    from cqf_spark.queries import INT_CONFIG, counted_keys, load

    li = load(spark, sf_dir, "lineitem")
    raw = cqf_aggregate(li, "l_partkey", INT_CONFIG)
    counted = counted_keys(li, "l_partkey")
    pre = cqf_aggregate(counted, "l_partkey", INT_CONFIG, count_col="__cnt")
    counted.unpersist()
    assert raw.to_bytes() == pre.to_bytes()


def test_counted_keys_probe_set_matches_distinct(spark, sf_dir):
    from cqf_spark.queries import counted_keys, load

    li = load(spark, sf_dir, "lineitem")
    counted = counted_keys(li, "l_partkey")
    got = sorted(
        r[0] for r in counted.select("l_partkey").collect()
    )
    want = sorted(
        r[0] for r in li.select("l_partkey").distinct().collect()
    )
    counted.unpersist()
    assert got == want


def test_two_sided_counted_build_bit_identical(spark, sf_dir):
    """r6.2: q_merge_union_counts / q_distributed_delete derive both
    side frames from ONE (key, side) grouped scan.  Each side's counted
    frame — and therefore each side's sketch and the merged/subtracted
    result — must be bit-identical to the per-side filter-then-group
    build it replaced."""
    from cqf_spark.aggregator import cqf_aggregate
    from cqf_spark.queries import INT_CONFIG, counted_keys, load

    li = load(spark, sf_dir, "lineitem")
    sides = (
        li.groupBy("l_suppkey", (F.col("l_linenumber") <= 3).alias("__lo"))
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .persist()
    )
    lo = sides.where(F.col("__lo")).select("l_suppkey", "__cnt")
    hi = sides.where(~F.col("__lo")).select("l_suppkey", "__cnt")
    full = sides.groupBy("l_suppkey").agg(F.sum("__cnt").alias("__cnt"))

    old_lo = counted_keys(li.where(F.col("l_linenumber") <= 3), "l_suppkey")
    old_hi = counted_keys(li.where(F.col("l_linenumber") > 3), "l_suppkey")
    old_full = counted_keys(li, "l_suppkey")
    try:
        for new, old in ((lo, old_lo), (hi, old_hi), (full, old_full)):
            a = cqf_aggregate(new, "l_suppkey", INT_CONFIG, count_col="__cnt")
            b = cqf_aggregate(old, "l_suppkey", INT_CONFIG, count_col="__cnt")
            assert a.to_bytes() == b.to_bytes()
    finally:
        for df in (sides, old_lo, old_hi, old_full):
            df.unpersist()


def _bp_corpus(spark):
    """Small corpus with one line frequent enough to strip at frac=0.5."""
    rows = []
    for i in range(40):
        lines = [f"unique line {i}", f"other {i % 7}"]
        if i % 2 == 0:
            lines.append("COOKIE BANNER ACCEPT ALL")
        rows.append((i, "\n".join(lines)))
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"]),
        "doc_id long, text string",
    )


def test_strip_boilerplate_frac_fused_matches_min_docs(spark):
    from cqf_spark.operators.cleaning import strip_boilerplate

    docs = _bp_corpus(spark)
    n = docs.count()
    frac = 0.5
    import math

    eq_min_docs = max(2, math.ceil(frac * n))
    got = (
        strip_boilerplate(docs, min_doc_frac=frac)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = (
        strip_boilerplate(docs, min_docs=eq_min_docs)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
    assert (got["n_dropped"] > 0).any()  # the banner really stripped


def test_strip_boilerplate_explicit_n_docs_honored(spark):
    """Manifest-driven pipelines pass n_docs; the fraction must be taken
    against that number, not a recount."""
    from cqf_spark.operators.cleaning import strip_boilerplate

    docs = _bp_corpus(spark)
    # n_docs=400 makes ceil(0.5*400)=200 > any real doc frequency: nothing
    # may be stripped
    got = strip_boilerplate(docs, min_doc_frac=0.5, n_docs=400).toPandas()
    assert (got["n_dropped"] == 0).all()


def test_decode_runs_scalar_fast_path_bit_exact():
    """The few-long-runs scalar fast path must emit exactly what the
    vectorized per-counter loop emits (same arrays, same order) — forced
    by building one dense single-run layout (fast path) and re-decoding
    the same slots with run shapes that keep the vectorized path."""
    import numpy as np

    from cqf_spark.functions.counter import decode_runs, encode_counters

    rng = np.random.default_rng(7)
    rems = np.sort(rng.choice(2**17, 400, replace=False)).astype(np.uint64)
    cnts = rng.integers(1, 9, rems.size).astype(np.uint64)
    flat, lengths = encode_counters(rems, cnts, 17)
    slots = flat.astype(np.uint64)
    start = np.array([0], dtype=np.int64)
    end = np.array([slots.size - 1], dtype=np.int64)
    # single long run -> scalar fast path fires (slots >> 64*nruns)
    ri, rr, rc, rp = decode_runs(slots, start, end, 17)
    assert (rr == rems).all() and (rc == cnts).all()
    # split the same slot sequence into many short runs at counter
    # boundaries -> vectorized path; counter decode must agree per piece
    bounds = np.cumsum(lengths)
    starts = np.concatenate(([0], bounds[:-1])).astype(np.int64)
    ends = (bounds - 1).astype(np.int64)
    ri2, rr2, rc2, rp2 = decode_runs(slots, starts, ends, 17)
    assert (rr2 == rems).all() and (rc2 == cnts).all()
