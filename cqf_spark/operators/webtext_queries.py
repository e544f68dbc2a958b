"""Webtext pipeline queries: the north star's end-to-end path
(synthesize pages -> extract text -> n-gram streams -> CQF sketch ->
probe), each with a DuckDB oracle over the driver's ``documents`` table.

Because ``synth_webtext`` derives every page deterministically from
``documents`` and extraction is the exact inverse of synthesis, these
queries prove the full chain: per-url byte-identical extraction AND
sketch counts equal to exact SQL aggregates.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..aggregator import count_udf, cqf_aggregate
from ..config import CqfConfig, HashMode
from ..webtext import (
    ngram_stream,
    synth_webtext,
    url_host_stream,
    with_extracted_text,
)

NGRAM_CONFIG = CqfConfig(key_bits=48, hash_mode=HashMode.DEFAULT, seed=2038074743)


def _pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..aggregator import ensure_parallelism

    return with_extracted_text(ensure_parallelism(synth_webtext(spark, sf_dir)))


def q_extract_identity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The input_hint invariant as a query: extracted text, keyed by doc_id,
    must be byte-identical to the source-of-truth text column."""
    return _pages(spark, sf_dir).select(
        "doc_id", F.col("extracted_text").alias("text")
    )


def q_bigram_multiplicity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-bigram frequencies over extracted text via a distributed CQF.

    r6: the gram stream partially aggregates map-side in JVM codegen
    (``counted_keys``) so extraction + explode run ONCE and the Python
    build sees one row per distinct bigram; the cached counted frame is
    also the probe set — the r5 plan consumed the gram stream twice
    (build + distinct) and therefore cached the compact extracted pages,
    a cache that would now have exactly one consumer and is dropped
    (caching the exploded gram stream itself would still pin every
    bigram string in executor memory, VERDICT r01)."""
    from ..queries import counted_keys

    pages = _pages(spark, sf_dir).select("extracted_text")
    grams = ngram_stream(pages, 2)
    counted = counted_keys(grams, "ngram")
    sketch = cqf_aggregate(counted, "ngram", NGRAM_CONFIG, count_col="__cnt")
    return counted.select(
        "ngram", count_udf(spark, sketch)("ngram").alias("approx_count")
    )


def q_url_host_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pages per host (parse_url on the synthesized urls) counted by CQF.

    r6: hosts derive from the synthesized ``url`` alone, so the stream no
    longer routes through the html->text extraction ``mapInPandas`` —
    opaque Python stages defeat column pruning (guide §4.1), and the r5
    plan ran the full extraction (twice: build + probe) for a column it
    never consumed.  ``counted_keys`` then makes it a single pass."""
    from ..aggregator import ensure_parallelism
    from ..queries import counted_keys

    pages = ensure_parallelism(synth_webtext(spark, sf_dir).select("url"))
    hosts = url_host_stream(pages)
    counted = counted_keys(hosts, "host")
    sketch = cqf_aggregate(counted, "host", NGRAM_CONFIG, count_col="__cnt")
    return counted.select(
        "host", count_udf(spark, sketch)("host").alias("approx_count")
    )


def q_pages_per_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pages per epoch-day from warc_ts, sketch-counted (keys = day index,
    tz-independent via unix seconds).  Same r6 shape as
    :func:`q_url_host_counts`: no extraction for a synthesized column,
    one ``counted_keys`` pass."""
    from ..aggregator import ensure_parallelism
    from ..queries import INT_CONFIG, counted_keys

    pages = ensure_parallelism(synth_webtext(spark, sf_dir).select("warc_ts"))
    days = pages.select(
        F.floor(F.unix_timestamp("warc_ts") / 86400).alias("epoch_day")
    )
    counted = counted_keys(days, "epoch_day")
    sketch = cqf_aggregate(counted, "epoch_day", INT_CONFIG, count_col="__cnt")
    return counted.select(
        "epoch_day", count_udf(spark, sketch)("epoch_day").alias("approx_count")
    )


def q_page_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pages per host AND pages per epoch-day as one gate row (both
    sketch-counted with their own CQF — string keys for hosts, int keys
    for days — union-shaped so the two dimension counts share a slot
    under the driver gate's 50-row cap; see __spark_entry__)."""
    hosts = q_url_host_counts(spark, sf_dir).select(
        F.concat(F.lit("host:"), F.col("host")).alias("key"), "approx_count"
    )
    days = q_pages_per_day(spark, sf_dir).select(
        F.concat(F.lit("day:"), F.col("epoch_day").cast("string")).alias(
            "key"
        ),
        "approx_count",
    )
    return hosts.unionByName(days)


def q_url_trigram_multiplicity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL character-trigram frequencies via CQF — the north star's "url
    n-gram stream".  Gram explosion is a pure codegen expression
    (transform over a sequence of substring offsets — no Python, no
    UDF); the sketch is the only Python stage.  r6: the gram stream
    partially aggregates map-side (``counted_keys``) before the build —
    the exchange carries at most distinct-trigrams-per-task (URL
    trigrams are a small, heavy-head alphabet, so the combine collapses
    the stream), and the cached frame doubles as the probe set."""
    from ..aggregator import ensure_parallelism
    from ..queries import counted_keys

    pages = ensure_parallelism(synth_webtext(spark, sf_dir).select("url"))
    grams = pages.select(
        F.explode(
            F.expr(
                "transform(sequence(1, length(url) - 2),"
                " i -> substring(url, i, 3))"
            )
        ).alias("ngram")
    )
    counted = counted_keys(grams, "ngram")
    sketch = cqf_aggregate(counted, "ngram", NGRAM_CONFIG, count_col="__cnt")
    return counted.select(
        "ngram", count_udf(spark, sketch)("ngram").alias("approx_count")
    )


def q_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization — the first dedup key of every crawl
    pipeline — over planted messy variants of the synthesized urls:
    uppercased scheme+host (v1), explicit default port + tracking params
    + fragment (v2), trailing /index.html (v3), tracking params
    interleaved with params that must SURVIVE (v4), and the adversarial
    shapes a naive unanchored regex corrupts — an Amazon-style ``/ref=``
    path segment plus an ``href=`` param whose name merely ends in a
    tracking name (v5).  The oracle computes the EXPECTED canonical form
    from (source, doc_id) directly — it does not mirror the regex chain,
    so a canonicalizer bug cannot cancel out.
    """
    from ..webtext import canonical_url

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source"
    )
    host = F.concat(F.col("source"), F.lit(".example.org"))
    page = F.concat(F.lit("/page-"), F.col("doc_id").cast("string"))
    clean = F.concat(F.lit("https://"), host, page, F.lit(".html"))
    v = (F.col("doc_id") % 6).cast("int")
    messy = (
        F.when(v == 1, F.concat(F.upper(F.concat(F.lit("https://"), host)),
                                page, F.lit(".html")))
        .when(v == 2, F.concat(F.lit("https://"), host, F.lit(":443"), page,
                               F.lit(".html?utm_source=feed&ref=rss#top")))
        .when(v == 3, F.concat(F.lit("https://"), host, page,
                               F.lit("/index.html")))
        .when(v == 4, F.concat(
            F.lit("https://"), host, page,
            F.lit(".html?utm_campaign=x&page=2&utm_source=y#frag")))
        .when(v == 5, F.concat(
            F.lit("https://"), host, page,
            F.lit(".html/ref=sr_1_1?href=/a&ref=x")))
        .otherwise(clean)
    )
    return docs.select(
        "doc_id", v.alias("variant"), canonical_url(messy).alias("canon")
    )


WEBTEXT_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "webtext_extract_identity": q_extract_identity,
    "webtext_bigram_multiplicity": q_bigram_multiplicity,
    "webtext_page_stats": q_page_stats,
    "webtext_url_trigram_multiplicity": q_url_trigram_multiplicity,
    "webtext_url_canonicalize": q_url_canonicalize,
}

WEBTEXT_ORACLES: dict[str, str] = {
    "webtext_extract_identity": "SELECT doc_id, text FROM documents",
    "webtext_bigram_multiplicity": (
        "SELECT ngram, COUNT(*) AS approx_count FROM ("
        "SELECT unnest(list_transform(range(1, len(l)), "
        "i -> l[i] || ' ' || l[i+1])) AS ngram "
        "FROM (SELECT string_split(text, ' ') AS l FROM documents)"
        ") GROUP BY ngram"
    ),
    "webtext_page_stats": (
        "SELECT 'host:' || source || '.example.org' AS key, "
        "COUNT(*) AS approx_count FROM documents GROUP BY source "
        "UNION ALL "
        "SELECT 'day:' || CAST(FLOOR((1700000000 + doc_id * 97) / 86400) "
        "AS BIGINT) AS key, COUNT(*) AS approx_count FROM documents "
        "GROUP BY FLOOR((1700000000 + doc_id * 97) / 86400)"
    ),
    "webtext_url_trigram_multiplicity": (
        "SELECT ngram, COUNT(*) AS approx_count FROM ("
        "SELECT unnest(list_transform(generate_series(1, length(u) - 2), "
        "i -> substring(u, i, 3))) AS ngram FROM ("
        "SELECT 'https://' || source || '.example.org/page-' || doc_id "
        "|| '.html' AS u FROM documents)) GROUP BY ngram"
    ),
    "webtext_url_canonicalize": (
        "SELECT doc_id, CAST(doc_id % 6 AS INT) AS variant, "
        "CASE doc_id % 6 "
        "WHEN 3 THEN "
        "'https://' || source || '.example.org/page-' || doc_id || '/' "
        "WHEN 4 THEN "
        "'https://' || source || '.example.org/page-' || doc_id "
        "|| '.html?page=2' "
        "WHEN 5 THEN "
        "'https://' || source || '.example.org/page-' || doc_id "
        "|| '.html/ref=sr_1_1?href=/a' "
        "ELSE 'https://' || source || '.example.org/page-' || doc_id "
        "|| '.html' END AS canon FROM documents"
    ),
}
