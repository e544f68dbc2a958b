"""Sketch-accelerated join pruning (bloom-join with a CQF).

At 100 TB the dominant cost of ``fact JOIN dim_subset`` is shuffling the
fact side; when the dim subset matches a small fraction of fact rows,
almost all of that exchange is wasted.  The classic fix is a bloom-join:
build an approximate-membership filter over the dim keys, broadcast it,
and drop non-matching fact rows BEFORE the exchange.  The CQF is exactly
such a filter (reference use case: src/gqf.c's qf_count_key_value as a
pre-filter; false-positive rate alpha * 2^-r), so this module composes
the existing pieces — ``cqf_aggregate`` build + ``contains_udf`` probe —
into join operators that are EXACT end-to-end:

* no false negatives: every dim key is inserted, so no matching fact row
  is ever pruned;
* false positives (bounded by the remainder width) survive the pre-filter
  but are removed by the real join that follows.

Spark's own runtime bloom-filter join (`spark.sql.optimizer.runtime.
bloomFilter.enabled`) covers the planner-visible case; this operator is
for when the "dim" side is itself the product of engine work (a sketch
already built, a deduped key set, a curation drop-list) or when the
filter must be reused across many queries — the CQF blob is buildable
once, serializable, and mergeable.

Scale notes: the sketch is broadcast once (q bits sized from the dim
count; ~(2^q * (r+3))/8 bytes, e.g. ~134 MB at q=27/r=8 for 1e8 keys at
95% load).  Past broadcastable sizes, use ``ShardedCqf.count_join``
(sharded.py) — the cogroup topology — instead of this operator.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..aggregator import cqf_aggregate, contains_udf
from ..config import CqfConfig
from ..core import Cqf


def build_key_filter(
    df: DataFrame,
    key_col: str,
    config: CqfConfig | None = None,
) -> Cqf:
    """Build the membership CQF over ``df[key_col]`` (distributed build,
    tree-merged to one sketch on the driver)."""
    config = config or CqfConfig(key_bits=48, seed=7)
    return cqf_aggregate(df, key_col, config)


def sketch_prune(
    big: DataFrame,
    key_col: str,
    sketch: Cqf,
    spark: Any = None,
) -> DataFrame:
    """``big`` filtered to rows whose key is PROBABLY in the sketch.

    No false negatives (every true match survives); false positives pass
    at rate <= alpha * 2^-r and must be cleaned up by a real join if
    exactness is required.  The filter is a broadcast-blob Arrow-batched
    probe evaluated BEFORE any exchange the caller adds downstream — the
    whole point is that the shuffle above this operator moves only
    ~|matches| + fp_rate * |big| rows."""
    spark = spark or big.sparkSession
    return big.where(contains_udf(spark, sketch)(big[key_col]))


def sketch_semi_join(
    big: DataFrame,
    small: DataFrame,
    key_col: str,
    config: CqfConfig | None = None,
) -> DataFrame:
    """Exact ``big LEFT SEMI JOIN small ON key_col`` with the big side
    pre-pruned by a CQF of the small side's keys."""
    sketch = build_key_filter(small.select(key_col), key_col, config)
    pruned = sketch_prune(big, key_col, sketch)
    return pruned.join(small.select(key_col).distinct(), key_col, "left_semi")


def sketch_anti_join(
    big: DataFrame,
    small: DataFrame,
    key_col: str,
    config: CqfConfig | None = None,
    sketch: Cqf | None = None,
) -> DataFrame:
    """Exact ``big LEFT ANTI JOIN small ON key_col`` — keep the rows of
    ``big`` whose key is NOT in ``small`` — with the exchange pruned to
    the sketch's suspects.

    This is the incremental-crawl dedup primitive: ``big`` = the new
    snapshot, ``small``/``sketch`` = fingerprints already seen.  The CQF
    splits the new snapshot scan-locally:

    * ``not contains`` -> DEFINITELY unseen (the CQF has no false
      negatives): emitted directly, no exchange at all;
    * ``contains`` -> seen OR a false positive (rate <= alpha * 2^-r):
      only these ~|dups| + fp * |big| rows reach the exact anti-join
      that removes the true duplicates.

    Pass ``sketch`` to reuse a filter built earlier (e.g. reloaded from a
    previous run's ``Cqf.to_reference_file`` image — the resumable
    snapshot-over-snapshot path); otherwise one is built from ``small``.

    Cost model at 100 TB: two scans of ``big`` (the two union branches)
    plus a shuffle of only the suspect fraction, vs one scan plus a FULL
    shuffle for the naive anti-join.  A shuffle costs a write + sort +
    read of every surviving column, so for dup rates well under 100% the
    two-branch plan wins; callers that already persist ``big`` pay one
    scan.  Past broadcastable sketch sizes use ``ShardedCqf.count_join``.
    """
    spark = big.sparkSession
    small_keys = small.select(key_col)
    if sketch is None:
        sketch = build_key_filter(small_keys, key_col, config)
    maybe = contains_udf(spark, sketch)(big[key_col])
    definitely_new = big.where(~maybe)
    suspects = big.where(maybe).join(
        small_keys.distinct(), key_col, "left_anti"
    )
    return definitely_new.unionByName(suspects)


def q_crawl_dedup(spark: Any, sf_dir: str) -> DataFrame:
    """Incremental-crawl dedup as a gate row: the 'previous crawl' is the
    doc_id % 3 == 0 slice of documents; the anti-join keeps exactly the
    rows whose text the previous crawl never saw.  Exercises the full
    operator — distributed CQF build of the seen set, broadcast scan-side
    probe, definitely-new fast path, exact anti-join of the suspects."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    seen = docs.where(F.col("doc_id") % 3 == 0).select("text")
    return sketch_anti_join(docs, seen, "text").select("doc_id")


SKETCH_JOIN_ORACLES: dict[str, str] = {
    "cqf_crawl_dedup": (
        "SELECT doc_id FROM documents WHERE text NOT IN "
        "(SELECT text FROM documents WHERE doc_id % 3 = 0)"
    ),
}

SKETCH_JOIN_QUERIES = {"cqf_crawl_dedup": q_crawl_dedup}


def sketch_inner_join(
    big: DataFrame,
    small: DataFrame,
    key_col: str,
    config: CqfConfig | None = None,
) -> DataFrame:
    """Exact ``big INNER JOIN small ON key_col`` with the big side
    pre-pruned by a CQF of the small side's keys.  Column set is the
    usual join output (key, big cols, small cols)."""
    sketch = build_key_filter(small.select(key_col), key_col, config)
    pruned = sketch_prune(big, key_col, sketch)
    return pruned.join(small, key_col)
