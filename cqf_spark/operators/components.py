"""Distributed connected components + duplicate-cluster resolution.

MinHash/SimHash LSH (operators/dedup.py) emits candidate *pairs*; a
production fuzzy dedup must then group the pairs into duplicate
*clusters* and keep exactly one canonical document per cluster —
similarity is not transitive but duplication policy is (A~B and B~C
put {A, B, C} in one cluster even when the pair A~C was never emitted).
This module implements the alternating large-star / small-star
algorithm (Kiveris et al., "Connected Components in MapReduce and
Beyond", ACM SoCC 2014) on plain DataFrames:

* **O(log^2 n) rounds worst-case** (2-4 rounds in practice for dedup
  graphs, whose components are short-diameter near-cliques), vs
  O(diameter) for naive min-label propagation — a 1M-doc chain would
  need 1M rounds under label propagation and ~10 here.
* **The corpus never enters the iteration.**  Each round is two
  groupBy/join passes over the EDGE set only; at 100 TB the edge set
  is bounded by the number of duplicate documents (orders of magnitude
  smaller than the corpus), and the final keep/drop decision reaches
  the corpus as a single broadcast anti-join on ids — the full-width
  document rows are never shuffled.
* **Lineage is cut every round** with an eager ``localCheckpoint``
  (iterative self-join plans otherwise grow exponentially and overflow
  the optimizer).  On a long-lived production cluster, configuring
  ``spark.sparkContext.setCheckpointDir`` and passing
  ``use_checkpoint_dir=True`` swaps in reliable checkpoints (an
  executor loss under localCheckpoint loses blocks and fails the job;
  for the minutes-long CC phase of a dedup run that trade is usually
  acceptable, hence the default).

Known skew note (inherent to the algorithm, documented in the paper):
the star construction concentrates a component's edges on its minimum
node, so a pathological single component of k docs puts k rows in one
groupBy key.  AQE's skew handling splits the join side; the groupBy
side is a single ``min`` aggregate whose partial aggregation
(map-side combine) bounds the reducer to one row per upstream
partition — both are safe at 10^8-row components.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "connected_components",
    "resolve_duplicate_clusters",
]

_U, _V = "_cc_u", "_cc_v"


def _large_star(e: DataFrame) -> DataFrame:
    """Emit (v, min(N+(u))) for every neighbor v > u (both orientations
    of every undirected edge are considered, so connectivity is
    preserved; Kiveris et al. Lemma 1)."""
    nb = e.union(e.select(F.col(_V).alias(_U), F.col(_U).alias(_V)))
    mn = nb.groupBy(_U).agg(F.min(_V).alias("_mnv"))
    mn = mn.select(_U, F.least(F.col("_mnv"), F.col(_U)).alias("_m"))
    return (
        nb.join(mn, _U)
        .where(F.col(_V) > F.col(_U))
        .select(F.col(_V).alias(_U), F.col("_m").alias(_V))
        .where(F.col(_U) != F.col(_V))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Orient every edge toward its larger endpoint, then connect each
    node's smaller neighborhood (and the node itself) to its minimum."""
    e2 = (
        e.select(
            F.greatest(_U, _V).alias(_U), F.least(_U, _V).alias(_V)
        )
        .where(F.col(_U) != F.col(_V))
        .distinct()
    )
    mn = e2.groupBy(_U).agg(F.min(_V).alias("_m"))
    return (
        e2.join(mn, _U)
        .select(F.col(_V).alias(_U), F.col("_m").alias(_V))
        .union(mn.select(F.col(_U), F.col("_m").alias(_V)))
        .where(F.col(_U) != F.col(_V))
        .distinct()
    )


def _checkpoint(df: DataFrame, use_checkpoint_dir: bool) -> DataFrame:
    if use_checkpoint_dir:
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)


def _star_edges(
    edges: DataFrame,
    src: str,
    dst: str,
    max_iter: int,
    use_checkpoint_dir: bool,
) -> DataFrame:
    """Iterate ls/ss to the fixpoint.  The fixpoints of the alternation
    are exactly star forests rooted at each component's minimum node
    (Kiveris et al. Thm 2), so the returned frame is (node, root) for
    every NON-root node; roots appear only on the _V side."""
    e = (
        edges.select(F.col(src).alias(_U), F.col(dst).alias(_V))
        .where(
            F.col(_U).isNotNull()
            & F.col(_V).isNotNull()
            & (F.col(_U) != F.col(_V))
        )
        .distinct()
    )
    e = _checkpoint(e, use_checkpoint_dir)
    prev_cnt = e.count()
    for _ in range(max_iter):
        ss = _checkpoint(
            _small_star(_large_star(e)), use_checkpoint_dir
        )
        cnt = ss.count()
        # a star forest is the unique fixpoint: unchanged set => done.
        if cnt == prev_cnt and ss.exceptAll(e).count() == 0:
            return ss
        e, prev_cnt = ss, cnt
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds "
        f"(edge set still changing at {prev_cnt} edges) — the bound is "
        "O(log^2 n) rounds, so this indicates ids of mixed/unorderable "
        "type or a max_iter far below log^2(n_nodes)"
    )


def connected_components(
    edges: DataFrame,
    src: str = "i",
    dst: str = "j",
    max_iter: int = 50,
    use_checkpoint_dir: bool = False,
) -> DataFrame:
    """Connected components of the undirected graph given as an edge
    list.  Returns ``(id, component)`` with one row per node that
    appears in ``edges``, where ``component`` is the minimum node id of
    the node's component (the canonical cluster representative).
    Self-loops and null endpoints are ignored; isolated nodes (no
    surviving edge) do not appear — absence from the output means "its
    own singleton cluster"."""
    star = _star_edges(edges, src, dst, max_iter, use_checkpoint_dir)
    roots = star.select(F.col(_V).alias("id")).distinct()
    return star.select(
        F.col(_U).alias("id"), F.col(_V).alias("component")
    ).union(roots.select("id", F.col("id").alias("component")))


def resolve_duplicate_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "i",
    dst: str = "j",
    order_cols: list | None = None,
    max_iter: int = 50,
    use_checkpoint_dir: bool = False,
) -> DataFrame:
    """Drop all-but-one document from every duplicate cluster implied by
    ``pairs`` (transitively closed), returning the kept rows of ``docs``
    with their full schema.

    Keep policy: with ``order_cols=None`` the minimum ``id_col`` in each
    cluster is kept — the loser set is then exactly the star frame's
    non-root side, and the corpus pays ONE broadcast anti-join (no
    corpus shuffle, no window over the full table).  With ``order_cols``
    (a list of Columns/names evaluated over ``docs``, e.g.
    ``[F.col("n_chars").desc()]``), the winner is the first row of each
    cluster under that ordering (ties broken by ``id_col`` for
    determinism); only the cluster MEMBERS — not the corpus — are
    ranked, so the window shuffle is bounded by the duplicate count.
    """
    star = _star_edges(pairs, src, dst, max_iter, use_checkpoint_dir)
    if order_cols is None:
        # at the fixpoint every non-root has exactly one (node, root) row,
        # so no distinct is needed — the loser set is shuffle-free.
        losers = star.select(F.col(_U).alias(id_col))
    else:
        roots = star.select(F.col(_V).alias("_cc_id")).distinct()
        assign = star.select(
            F.col(_U).alias("_cc_id"), F.col(_V).alias("_cc_comp")
        ).union(roots.select("_cc_id", F.col("_cc_id").alias("_cc_comp")))
        members = docs.join(
            F.broadcast(assign), docs[id_col] == assign["_cc_id"], "inner"
        )
        w = Window.partitionBy("_cc_comp").orderBy(
            *order_cols, F.col(id_col).asc()
        )
        losers = (
            members.withColumn("_cc_rk", F.row_number().over(w))
            .where(F.col("_cc_rk") > 1)
            .select(F.col(id_col))
        )
    return docs.join(F.broadcast(losers), id_col, "left_anti")
