"""Connected components (large-star/small-star) + cluster resolution.

Oracle: a driver-side union-find with min-label canonicalization — the
textbook-exact answer on graphs small enough to hold in memory.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from cqf_spark.operators.components import (
    connected_components,
    resolve_duplicate_clusters,
)


def _union_find_min(edges):
    """{node: min id of its component} for every node touched by edges."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        if a == b or a is None or b is None:
            continue
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {
        n: find(n) for (a, b) in edges if a != b for n in (a, b)
        if a is not None and b is not None
    }


def _cc_dict(spark, edges, **kw):
    df = spark.createDataFrame(edges, "i long, j long")
    out = connected_components(df, "i", "j", **kw)
    return {r["id"]: r["component"] for r in out.collect()}


def test_cc_random_graphs_match_union_find(spark):
    rng = np.random.default_rng(0xC0C0)
    for trial in range(4):
        n = int(rng.integers(20, 120))
        m = int(rng.integers(10, 4 * n))
        edges = [
            (int(a), int(b))
            for a, b in zip(
                rng.integers(0, n, m), rng.integers(0, n, m)
            )
        ]
        got = _cc_dict(spark, edges)
        want = _union_find_min(edges)
        assert got == want, f"trial {trial}: n={n} m={m}"


def test_cc_chain_worst_case_converges_fast(spark):
    # a 96-node path needs 96 rounds under label propagation; the star
    # alternation's bound is O(log^2 n).  max_iter=12 proves the
    # logarithmic behavior actually happens.
    edges = [(i, i + 1) for i in range(95)]
    got = _cc_dict(spark, edges, max_iter=12)
    assert got == {i: 0 for i in range(96)}


def test_cc_edge_cases(spark):
    # self-loops ignored, duplicate + reversed edges collapse, two
    # components keep distinct minima
    edges = [(5, 5), (1, 2), (2, 1), (1, 2), (7, 9), (9, 8)]
    got = _cc_dict(spark, edges)
    assert got == {1: 1, 2: 1, 7: 7, 8: 7, 9: 7}
    # all-self-loop input: no surviving edges, empty assignment
    df = spark.createDataFrame([(3, 3)], "i long, j long")
    assert connected_components(df).count() == 0


def test_cc_string_ids(spark):
    df = spark.createDataFrame(
        [("b", "c"), ("a", "b"), ("x", "y")], "i string, j string"
    )
    got = {r["id"]: r["component"] for r in
           connected_components(df).collect()}
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def _docs(spark):
    rows = [
        # cluster {1,2,3} via chain pairs; cluster {10,11}; 20/21 unique
        (1, "alpha", 5),
        (2, "alpha body longer", 17),
        (3, "alpha body", 10),
        (10, "beta", 4),
        (11, "beta!", 5),
        (20, "gamma", 5),
        (21, "delta", 5),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, n_chars long")


_PAIRS = [(1, 2), (2, 3), (10, 11)]


def test_resolve_keep_min_id(spark):
    docs = _docs(spark)
    pairs = spark.createDataFrame(_PAIRS, "i long, j long")
    kept = resolve_duplicate_clusters(docs, pairs)
    assert sorted(r["doc_id"] for r in kept.collect()) == [1, 10, 20, 21]
    # full doc schema preserved
    assert kept.columns == docs.columns


def test_resolve_keep_by_order(spark):
    docs = _docs(spark)
    pairs = spark.createDataFrame(_PAIRS, "i long, j long")
    kept = resolve_duplicate_clusters(
        docs, pairs, order_cols=[F.col("n_chars").desc()]
    )
    # longest doc wins each cluster: 2 (17 chars) and 11 (5 chars)
    assert sorted(r["doc_id"] for r in kept.collect()) == [2, 11, 20, 21]


def test_resolve_transitive_closure_via_minhash(spark, sf_dir):
    """End-to-end: LSH pairs over real near-dup documents resolve to one
    kept doc per transitive cluster, non-dups untouched."""
    from cqf_spark.operators.dedup import minhash_dedup_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = minhash_dedup_pairs(docs, threshold=0.5)
    kept = resolve_duplicate_clusters(docs, pairs)
    comp = connected_components(pairs)
    n_docs = docs.count()
    n_members = comp.count()
    n_clusters = comp.select("component").distinct().count()
    assert kept.count() == n_docs - n_members + n_clusters
    # exactly the cluster minima survive among members
    kept_ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    for r in comp.collect():
        assert (r["id"] in kept_ids) == (r["id"] == r["component"])


def test_resolve_corpus_never_shuffles(spark, sf_dir):
    """Plan audit: the corpus-facing side of the default keep policy is
    scan -> broadcast anti-join.  No hash-partition Exchange may touch
    the document rows; the only Exchange allowed in the final plan is
    the loser-set BroadcastExchange (the CC iteration itself ran eagerly
    behind localCheckpoint and is not part of this plan)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = spark.createDataFrame(_PAIRS, "i long, j long")
    kept = resolve_duplicate_clusters(docs, pairs)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = kept._jdf.queryExecution().explainString(mode)
    assert "BroadcastExchange" in plan, plan
    assert "Exchange hashpartitioning" not in plan, plan


def test_cc_unorderable_progress_guard(spark):
    pairs = spark.createDataFrame([(i, i + 1) for i in range(40)],
                                  "i long, j long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_iter=1)
