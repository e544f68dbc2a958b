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
