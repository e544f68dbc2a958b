"""Text-analysis operators for training-data pipelines: quality scoring,
token counting, language ID, document fingerprinting.

Quality/token metrics are pure native SQL expressions (whole-stage
codegen, SQL-oracle-checkable).  Language ID and fingerprinting are
vectorized batch UDFs with unit-test oracles (not SQL-expressible).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import murmur64a_bytes

_STOPWORDS = "the a an and or of to in is it for on with as at by".split()

# tiny per-language stopword profiles for the n-gram/stopword heuristic
LANG_PROFILES: dict[str, list[str]] = {
    "en": "the and of to in is that it for was".split(),
    "de": "der die das und ist nicht ein zu den von".split(),
    "fr": "le la les et de un une est pour dans".split(),
    "es": "el la los las y de un una es que".split(),
}


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --------------------------------------------------------------------- #
# quality scoring — native expressions only
# --------------------------------------------------------------------- #

def quality_scores(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc quality features: char/token counts, mean token length,
    stopword ratio, alpha ratio.  All codegen expressions."""
    toks = F.split(F.col(text_col), " ")
    n_toks = F.size(toks)
    stop_arr = F.array(*[F.lit(w) for w in _STOPWORDS])
    n_stop = F.size(F.array_intersect(toks, stop_arr))  # distinct-stopword count
    alpha_chars = F.length(F.regexp_replace(F.col(text_col), "[^a-zA-Z]", ""))
    return docs.select(
        "doc_id",
        F.length(text_col).alias("n_chars"),
        n_toks.alias("n_tokens"),
        F.round(
            (F.length(text_col) - n_toks + 1) / n_toks, 4
        ).alias("mean_token_len"),
        F.round(n_stop / F.size(F.array_distinct(toks)), 4).alias(
            "stopword_type_ratio"
        ),
        F.round(alpha_chars / F.length(text_col), 4).alias("alpha_ratio"),
    )


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality_scores(_docs(spark, sf_dir))


def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace tokens + BPE-ish unit count ([a-z]+ | digit runs |
    single non-space symbol) per doc — regex stays JVM-side."""
    pat = "[a-z]+|[0-9]+|[^a-z0-9 ]"
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.size(F.split("text", " ")).alias("ws_tokens"),
        F.size(F.regexp_extract_all(F.lower("text"), F.lit(pat), 0)).alias(
            "bpeish_units"
        ),
    )


# --------------------------------------------------------------------- #
# language ID — stopword-profile heuristic (vectorized batch UDF)
# --------------------------------------------------------------------- #

def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Predict language by stopword-profile hit rate; 'und' (undetermined)
    when no profile scores above zero.  Deterministic tie-break by
    profile order."""
    langs = list(LANG_PROFILES)
    profiles = {k: set(v) for k, v in LANG_PROFILES.items()}

    def predict(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            preds = []
            for t in pdf[text_col]:
                toks = (t or "").lower().split()
                scores = [
                    sum(tok in profiles[lg] for tok in toks) for lg in langs
                ]
                best = max(range(len(langs)), key=lambda i: (scores[i], -i))
                preds.append(langs[best] if scores[best] > 0 else "und")
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "pred_lang": preds}
            )

    return docs.select("doc_id", text_col).mapInPandas(
        predict, schema="doc_id long, pred_lang string"
    )


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """No SQL oracle (heuristic model); rows-only check + unit tests with
    per-language fixtures in tests/test_text_ops.py."""
    return lang_id(_docs(spark, sf_dir))


# --------------------------------------------------------------------- #
# document fingerprinting — rolling polynomial hash
# --------------------------------------------------------------------- #

def fingerprints(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """64-bit content fingerprint: murmur of utf-8 bytes (whole-doc) plus
    a Karp-Rabin rolling hash of the token sequence folded by XOR —
    order-sensitive, deterministic, vectorized per batch."""
    B = np.uint64(1000003)

    def fp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts = [(t or "").encode("utf-8") for t in pdf[text_col]]
            whole = murmur64a_bytes(texts, 0x5EED)
            rolled = []
            with np.errstate(over="ignore"):  # mod-2^64 wraparound intended
                for t in pdf[text_col]:
                    toks = (t or "").split(" ")
                    th = murmur64a_bytes([x.encode("utf-8") for x in toks], 1)
                    # Horner fold vectorized: acc = sum(th[i] * B^(n-1-i))
                    pw = np.multiply.accumulate(
                        np.full(th.size, B, dtype=np.uint64)
                    ) // B  # [1, B, B^2, ...] mod 2^64
                    rolled.append(int((th * pw[::-1]).sum().astype(np.int64)))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "fingerprint": whole.astype(np.int64),
                    "rolling_fp": np.array(rolled, dtype=np.int64),
                }
            )

    return docs.select("doc_id", text_col).mapInPandas(
        fp, schema="doc_id long, fingerprint long, rolling_fp long"
    )


def q_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    return fingerprints(_docs(spark, sf_dir))


TEXT_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "text_quality_scores": q_text_quality,
    "text_token_counts": q_token_counts,
    "text_lang_id": q_lang_id,
    "text_fingerprints": q_fingerprints,
}

TEXT_ORACLES: dict[str, str] = {
    "text_quality_scores": (
        "WITH t AS (SELECT doc_id, text, string_split(text, ' ') l FROM documents) "
        "SELECT doc_id, LENGTH(text) AS n_chars, len(l) AS n_tokens, "
        "ROUND((LENGTH(text) - len(l) + 1) * 1.0 / len(l), 4) AS mean_token_len, "
        "ROUND(len(list_intersect(l, "
        "['the','a','an','and','or','of','to','in','is','it','for','on','with','as','at','by']"
        ")) * 1.0 / len(list_distinct(l)), 4) AS stopword_type_ratio, "
        "ROUND(LENGTH(regexp_replace(text, '[^a-zA-Z]', '', 'g')) * 1.0 "
        "/ LENGTH(text), 4) AS alpha_ratio FROM t"
    ),
    "text_token_counts": (
        "SELECT doc_id, len(string_split(text, ' ')) AS ws_tokens, "
        "len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')) "
        "AS bpeish_units FROM documents"
    ),
    # text_lang_id / text_fingerprints: rows-only (unit-tested)
}
