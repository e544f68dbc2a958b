"""Corpus-construction operators a training-data pipeline runs after
filtering/dedup: paragraph-level exact dedup and token-budget shard
packing.  All native DataFrame expressions — no Python on any hot path.

Reference scope note: these extend the pipeline surface beyond the
reference repo (splatlab/cqf has no corpus stage); semantics follow the
published web-corpus pipelines (paragraph dedup per Falcon/RefinedWeb
and CCNet; greedy sequential shard packing as used for training-shard
creation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text_queries import n_tokens_expr


def paragraph_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n\n",
) -> DataFrame:
    """Corpus-wide paragraph-level exact dedup (RefinedWeb/CCNet stage):
    every paragraph keeps exactly its FIRST occurrence — ordered by
    (id, position) — and later copies are dropped from their documents;
    documents are reassembled from their surviving paragraphs in order.

    Returns (id_col, clean_text, n_paragraphs, n_dropped); documents
    whose every paragraph was seen earlier come back with an empty
    clean_text and n_dropped = n_paragraphs, so the caller decides the
    drop policy.

    Scale shape: posexplode -> one groupBy on the paragraph fingerprint
    (the canonical exact-dedup exchange; paragraphs themselves never
    shuffle — only (fp, id, pos) triples) -> join winners back by fp ->
    one groupBy(id) to reassemble.  Skew-safe: a boilerplate paragraph
    repeated 10^9 times is ONE group whose aggregate is a 16-byte min.
    """
    parts = docs.select(
        F.col(id_col).alias("_id"),
        F.posexplode(F.split(F.col(text_col), F.lit(sep))).alias(
            "_pos", "_para"
        ),
    ).where(F.length(F.trim("_para")) > 0)
    keyed = parts.select(
        "_id", "_pos", "_para", F.xxhash64("_para").alias("_fp")
    )
    winners = keyed.groupBy("_fp").agg(
        F.min(F.struct("_id", "_pos")).alias("_w")
    )
    kept = keyed.join(winners, "_fp").where(
        (F.col("_id") == F.col("_w._id")) & (F.col("_pos") == F.col("_w._pos"))
    )
    per_doc = docs.select(
        F.col(id_col).alias("_id"),
        F.size(
            F.filter(
                F.split(F.col(text_col), F.lit(sep)),
                lambda p: F.length(F.trim(p)) > 0,
            )
        ).alias("n_paragraphs"),
    )
    rebuilt = kept.groupBy("_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_pos", "_para"))),
                lambda s: s._para,
            ),
            sep,
        ).alias("clean_text"),
        F.count("*").alias("_n_kept"),
    )
    return (
        per_doc.join(rebuilt, "_id", "left_outer")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            "n_paragraphs",
            (
                F.col("n_paragraphs") - F.coalesce("_n_kept", F.lit(0))
            ).alias("n_dropped"),
        )
    )


def pack_corpus(
    docs: DataFrame,
    budget_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    per_partition: bool = False,
    order_by=None,
) -> DataFrame:
    """Greedy sequential token-budget shard packing (training-shard
    creation): documents in ``id_col`` order (or ``order_by``, a Column
    — e.g. ``shuffle_corpus``'s salted hash, so shards are packed in
    training order rather than crawl order) are placed into shard k =
    floor(start_offset / budget), i.e. a document opens a new shard when
    its first token would land past the current shard's budget.  Shards
    hold consecutive documents and may overflow by at most one document
    (the standard streaming-pack bound).

    ``per_partition=False`` (default): one global ordering — a total
    sort.  Deterministic, and the right mode up to the sort's practical
    limit.  ``per_partition=True``: the 100 TB mode — the running
    offset is carried across Arrow batches INSIDE each input partition
    (a ``mapInPandas`` whose plan contains no Exchange at all; shard
    ids are (partition, local_shard) pairs), trading global shard
    numbering for a fully parallel single pass, exactly how shard
    writers run on a real cluster.  A ``Window.partitionBy`` would NOT
    do this: window functions hash-repartition on their keys even when
    the key is ``spark_partition_id()`` (plan-audited in the tests).

    Returns (id_col, n_tokens, shard_id string, shard_off long).
    """
    import numpy as np
    import pandas as pd

    n_toks = n_tokens_expr(text_col)
    if per_partition:
        base = docs.select(
            F.col(id_col), n_toks.cast("long").alias("n_tokens"),
            F.spark_partition_id().alias("_part"),
        )

        def pack(batches):
            off = 0
            for pdf in batches:
                if not len(pdf):
                    continue
                n = pdf["n_tokens"].to_numpy(np.int64)
                start = off + np.concatenate(
                    ([0], np.cumsum(n, dtype=np.int64)[:-1])
                )
                off += int(n.sum())
                shard = start // budget_tokens
                yield pd.DataFrame(
                    {
                        id_col: pdf[id_col],
                        "n_tokens": n,
                        "shard_id": (
                            pdf["_part"].astype(str)
                            + "-"
                            + pd.Series(shard, index=pdf.index).astype(str)
                        ),
                        "shard_off": start - shard * budget_tokens,
                    }
                )

        return base.mapInPandas(
            pack,
            schema=(
                f"{id_col} long, n_tokens long, shard_id string, "
                "shard_off long"
            ),
        )
    ord_expr = F.col(id_col) if order_by is None else order_by
    base = docs.select(
        F.col(id_col),
        n_toks.cast("long").alias("n_tokens"),
        ord_expr.alias("_ord"),
    )
    # ROWS frame + id tiebreak, NOT the default RANGE frame: RANGE pools
    # every row tied on _ord into one cumulative value, so two rows with
    # equal order keys (e.g. up-sampled epoch copies ordered by a hash of
    # the doc id alone) would receive overlapping shard offsets
    win = Window.orderBy("_ord", id_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = base.withColumn(
        "_start", F.sum("n_tokens").over(win) - F.col("n_tokens")
    )
    shard_local = F.floor(F.col("_start") / F.lit(budget_tokens))
    return cum.select(
        id_col,
        "n_tokens",
        F.concat_ws("-", F.lit("0"), shard_local.cast("string")).alias(
            "shard_id"
        ),
        (F.col("_start") - shard_local * F.lit(budget_tokens)).alias(
            "shard_off"
        ),
    )


def shuffle_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    salt: str = "shuffle",
    n_partitions: int | None = None,
) -> DataFrame:
    """Deterministic global training-order shuffle — the step between
    curation and ``pack_corpus``: training examples must not arrive in
    crawl order (adjacent pages from one host correlate), and the order
    must be REPRODUCIBLE so a re-run, a resumed job, or an auditor packs
    byte-identical shards.  Sorting by a salted hash of the key gives a
    uniform pseudo-random permutation that is a pure function of
    (salt, key): no RNG state, stable under input partitioning and
    appends (new docs interleave without displacing old ones relative
    to each other).

    Scale shape: one range-repartitioning sort on an 8-byte hash —
    Spark samples hash boundaries, so the sort is skew-proof by
    construction (the sort key is uniform even if doc_ids or hosts are
    not).  ``n_partitions`` pins the output partition count (= shard
    writer parallelism); default leaves it to AQE.

    Salt discipline matches sampling.py: a different epoch's shuffle
    order is just a different salt (``salt="epoch-2"``), uncorrelated
    with epoch 1's by hash independence."""
    # id_col tiebreak: a 64-bit hash collision (~n^2/2^65 — real at 10^9
    # docs) would otherwise leave the tied pair's relative order
    # partitioning-dependent, voiding the byte-identical contract
    b = F.xxhash64(F.lit(salt), F.col(id_col))
    if n_partitions:
        # NOTE the pinned-partition mode pins the global ORDER; the range
        # boundaries themselves come from Spark's sampling and may land
        # differently across cluster runs, so the per-FILE split can move
        # even though the concatenated order cannot.  Shard identity that
        # must be stable across runs comes from pack_corpus's offsets,
        # not from the file boundaries.
        return docs.repartitionByRange(n_partitions, b, F.col(id_col)) \
            .sortWithinPartitions(b, F.col(id_col))
    return docs.orderBy(b, F.col(id_col))
