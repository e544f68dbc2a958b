"""Deduplication operators for training-data pipelines.

Five families, all Spark-first:

* exact            — hash groupBy on normalized text (one shuffle)
* n-gram Jaccard   — exact pairwise similarity via a shingle inverted-
                     index self-join (native joins/aggs, no Python)
* MinHash + LSH    — vectorized per-partition signatures (no shuffle of
                     shingles), band-bucket self-join, exact verification
* SimHash          — 64-bit signatures + pigeonhole chunk banding for
                     hamming <= k candidate pairs
* embedding cosine — see ann.py (shares the vector kernels)

Scale notes: signatures are computed row-local inside ``mapInPandas``
(a document's shingles never shuffle); only (id, signature/band) rows —
a few hundred bytes per doc — reach the joins.  The band self-join is the
standard LSH shuffle; bucket skew is bounded because band hashes are
uniform.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import murmur64a_bytes, murmur64a_u64

def word_shingles(tokens: list[str], n: int) -> list[str]:
    return [" ".join(tokens[i : i + n]) for i in range(len(tokens) - n + 1)]


def _doc_shingle_hashes(texts: pd.Series, n: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """All shingle hashes of a batch + doc start offsets (docs contiguous)."""
    all_shingles: list[bytes] = []
    starts = [0]
    for t in texts:
        toks = (t or "").split(" ")
        sh = word_shingles(toks, n) if len(toks) >= n else [" ".join(toks)]
        all_shingles.extend(s.encode("utf-8") for s in set(sh))
        starts.append(len(all_shingles))
    h = murmur64a_bytes(all_shingles, seed) if all_shingles else np.empty(0, np.uint64)
    return h, np.array(starts, dtype=np.int64)


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 128,
    shingle_n: int = 3,
    seed: int = 0x51,
) -> DataFrame:
    """(id, sig: array<long>[num_perm]) — one vectorized pass per batch;
    a document's shingles never leave the partition."""
    def sig_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            h, starts = _doc_shingle_hashes(pdf[text_col], shingle_n, seed)
            sigs = np.empty((len(pdf), num_perm), dtype=np.int64)
            seg = starts[:-1]
            valid = starts[1:] > seg
            for i in range(num_perm):
                # permutation i = an independently seeded murmur of the
                # base shingle hash (6 vector ops), min-folded per doc
                ph = murmur64a_u64(h, seed + 1 + i) >> np.uint64(1)
                mins = np.full(len(pdf), (1 << 63) - 1, dtype=np.uint64)
                if ph.size:
                    red = np.minimum.reduceat(ph, np.maximum(seg, 0))
                    mins[valid] = red[valid]
                sigs[:, i] = mins.astype(np.int64)
            yield pd.DataFrame({id_col: pdf[id_col], "sig": list(sigs)})

    return docs.select(id_col, text_col).mapInPandas(
        sig_batch, schema=f"{id_col} long, sig array<long>"
    )


def lsh_candidate_pairs(
    sig_df: DataFrame,
    id_col: str = "doc_id",
    num_perm: int = 128,
    bands: int = 32,
) -> DataFrame:
    """Band the signatures and self-join buckets -> candidate (i, j) pairs.

    rows-per-band r = num_perm/bands; detection prob of a pair with
    Jaccard j is 1-(1-j^r)^bands (r=4, bands=32: ~1-5e-8 at j=0.8)."""
    r = num_perm // bands
    band_cols = [
        F.hash(F.slice("sig", i * r + 1, r), F.lit(i)).alias("bh")
        for i in range(bands)
    ]
    buckets = sig_df.select(
        id_col,
        F.posexplode(F.array(*band_cols)).alias("band", "bh"),
    )
    a = buckets.alias("a")
    b = buckets.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("i"), F.col(f"b.{id_col}").alias("j")
        )
        .distinct()
    )


def shingle_df(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """Distinct (id, shingle) rows via native array ops (codegen)."""
    toks = F.split(F.col(text_col), " ")
    grams = F.when(
        F.size(toks) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - n),
                lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
            )
        ),
    ).otherwise(F.array(F.array_join(toks, " ")))
    return docs.select(F.col(id_col).alias("id"), F.explode(grams).alias("g"))


def exact_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact n-gram Jaccard over all pairs sharing >= 1 shingle: inverted-
    index self-join -> per-pair intersection counts -> |A|+|B|-inter.
    Native joins/aggs only; returns (i, j, jac)."""
    sh = shingle_df(docs, id_col, text_col, n)
    sizes = sh.groupBy("id").agg(F.count("*").alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("i"), F.col("b.id").alias("j"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("id").alias("i"), F.col("sz").alias("na"))
    sb = sizes.select(F.col("id").alias("j"), F.col("sz").alias("nb"))
    return (
        inter.join(F.broadcast(sa), "i")
        .join(F.broadcast(sb), "j")
        .select(
            "i",
            "j",
            (
                F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
            ).alias("jac"),
        )
        .where(F.col("jac") >= threshold)
    )


def minhash_dedup_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    num_perm: int = 128,
    bands: int = 32,
    shingle_n: int = 3,
    seed: int = 0x51,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: signatures -> banded candidate
    pairs -> EXACT Jaccard verification of candidates only (the standard
    'verify survivors' discipline).  Output (i, j, jac >= threshold)."""
    sigs = minhash_signatures(docs, id_col, text_col, num_perm, shingle_n, seed)
    cand = lsh_candidate_pairs(sigs, id_col, num_perm, bands)
    sh = shingle_df(docs, id_col, text_col, shingle_n)
    sizes = sh.groupBy("id").agg(F.count("*").alias("sz"))
    a = sh.select(F.col("id").alias("i"), F.col("g"))
    b = sh.select(F.col("id").alias("j"), F.col("g"))
    inter = (
        cand.join(a, "i").join(b, ["j", "g"]).groupBy("i", "j").agg(
            F.count("*").alias("inter")
        )
    )
    sa = sizes.select(F.col("id").alias("i"), F.col("sz").alias("na"))
    sb = sizes.select(F.col("id").alias("j"), F.col("sz").alias("nb"))
    return (
        inter.join(F.broadcast(sa), "i")
        .join(F.broadcast(sb), "j")
        .select(
            "i",
            "j",
            (
                F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
            ).alias("jac"),
        )
        .where(F.col("jac") >= threshold)
    )


# ------------------------------------------------------------------ #
# SimHash
# ------------------------------------------------------------------ #

def simhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 0x51A,
) -> DataFrame:
    """64-bit SimHash of the token multiset (Charikar 2002): sum +-1 per
    bit over token hashes, sign -> bit.  Vectorized via bit unpacking."""

    def sims(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            toks_all: list[bytes] = []
            starts = [0]
            for t in pdf[text_col]:
                ts = (t or "").split(" ")
                toks_all.extend(x.encode("utf-8") for x in ts)
                starts.append(len(toks_all))
            h = (
                murmur64a_bytes(toks_all, seed)
                if toks_all
                else np.empty(0, np.uint64)
            )
            # (n_tokens, 64) bits as +-1
            bits = (
                (h[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
            ).astype(np.int32) * 2 - 1
            out = np.zeros(len(pdf), dtype=np.uint64)
            st = np.array(starts)
            for d in range(len(pdf)):
                lo, hi = st[d], st[d + 1]
                if lo == hi:
                    continue
                v = bits[lo:hi].sum(axis=0) > 0
                out[d] = np.packbits(
                    v.astype(np.uint8), bitorder="little"
                ).view(np.uint64)[0]
            yield pd.DataFrame(
                {id_col: pdf[id_col], "simhash": out.astype(np.int64)}
            )

    return docs.select(id_col, text_col).mapInPandas(
        sims, schema=f"{id_col} long, simhash long"
    )


def simhash_pairs(
    sig_df: DataFrame, id_col: str = "doc_id", max_hamming: int = 3
) -> DataFrame:
    """Pairs with hamming distance <= max_hamming via pigeonhole banding:
    split 64 bits into max_hamming+1 chunks; any close pair must agree on
    at least one chunk (candidate join), then exact popcount verify."""
    k = max_hamming + 1
    width = 64 // k
    chunks = [
        F.shiftrightunsigned(F.col("simhash"), i * width).bitwiseAND(
            F.lit((1 << width) - 1)
        ).alias("ch")
        for i in range(k)
    ]
    buckets = sig_df.select(
        id_col, "simhash", F.posexplode(F.array(*chunks)).alias("band", "ch")
    )
    a, b = buckets.alias("a"), buckets.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.ch") == F.col("b.ch"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("i"),
            F.col(f"b.{id_col}").alias("j"),
            F.col("a.simhash").alias("sa"),
            F.col("b.simhash").alias("sb"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("sa").bitwiseXOR(F.col("sb")))
    return cand.select("i", "j", ham.alias("hamming")).where(
        F.col("hamming") <= max_hamming
    )
