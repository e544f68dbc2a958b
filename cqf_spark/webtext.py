"""Common-Crawl-style webtext pipeline (BASELINE input_hint).

Input shape: an Iceberg-style table of web pages with columns
``(url: string, warc_ts: timestamp, html: binary, text: string,
lang: string)``.  This module provides

1. ``synth_webtext``   — a deterministic synthetic page table at any SF,
   derived row-for-row from the driver's ``documents`` parquet (seeded by
   ``doc_id``, no RNG state), so DuckDB oracles over ``documents`` stay
   valid for every downstream query;
2. ``with_extracted_text`` — the vectorized html -> text extraction stage
   (Arrow-batched pandas ops only, no per-row Python), whose output is
   **byte-identical per url** across runs and parallelism levels — the
   per-row invariant demanded by the north star;
3. token / n-gram stream extractors feeding the CQF aggregation
   (the "token/url n-gram streams" of the north star).

The extraction is a real HTML-ish text pipeline (script/style removal, tag
stripping, entity unescape, whitespace normalization) implemented with
vectorized ``pandas.Series.str`` regex ops; determinism comes from pinning
the exact pattern set — no locale, no env, no dict iteration order.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

# --------------------------------------------------------------------- #
# synthesis: documents -> (url, warc_ts, html, text, lang)
# --------------------------------------------------------------------- #

_TEMPLATES_TAGS = [
    # per doc_id % 4: different page shells, all extracting back to `text`
    '<!DOCTYPE html><html lang="{lang}"><head><title>doc {doc_id}</title>'
    "<script>var x = 1 < 2 && 3 > 2;</script></head><body><main><p>",
    '<html><head><style>.c {{ color: #000; }}</style><meta charset="utf-8">'
    "</head><body><div id='main'><p>",
    "<html><body><!-- crawler: {url} --><article><h1>Doc {doc_id}</h1><p>",
    '<html><body onload="init()"><section class="post"><p>',
]
_TEMPLATES_CLOSE = [
    "</p></main></body></html>",
    "</p></div></body></html>",
    "</p></article></body></html>",
    "</p></section></body></html>",
]


def synth_webtext(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Common-Crawl-style page table derived from
    ``documents``: url/warc_ts are pure functions of (source, doc_id);
    html wraps the document text in one of four page shells with entities
    escaped; text/lang pass through as ground truth.

    Everything is native Spark SQL expressions (whole-stage codegen);
    ``html`` is a true ``binary`` column (UTF-8 encoded page bytes).
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.org/page-"),
        F.col("doc_id").cast("string"),
        F.lit(".html"),
    )
    # deterministic timestamp ladder: one page every 97 seconds from epoch day
    warc_ts = F.timestamp_seconds(F.lit(1700000000) + F.col("doc_id") * 97)
    escaped = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), "&", "&amp;"), "<", "&lt;"
        ),
        ">",
        "&gt;",
    )
    shell = F.col("doc_id") % 4
    head = F.element_at(
        F.array(*[F.lit(t) for t in _TEMPLATES_TAGS]), (shell + 1).cast("int")
    )
    tail = F.element_at(
        F.array(*[F.lit(t) for t in _TEMPLATES_CLOSE]), (shell + 1).cast("int")
    )
    head = F.replace(head, F.lit("{lang}"), F.col("lang"))
    head = F.replace(head, F.lit("{doc_id}"), F.col("doc_id").cast("string"))
    head = F.replace(head, F.lit("{url}"), url)
    html = F.encode(F.concat(head, escaped, tail), "utf-8")
    return docs.select(
        url.alias("url"),
        warc_ts.alias("warc_ts"),
        html.alias("html"),
        F.col("text").alias("text"),
        F.col("lang").alias("lang"),
        F.col("doc_id").alias("doc_id"),  # kept for oracle joins; drop for prod
    )


_PAGES_COLUMNS = {"url", "warc_ts", "html", "text", "lang"}


def load_pages(
    spark: SparkSession, source: str, source_format: str | None = None
) -> DataFrame:
    """Load the web-pages table from an Iceberg/HMS catalog table name
    (``catalog.db.pages``) or a parquet path/directory.

    Everything downstream is catalog-agnostic DataFrame code; what an
    Iceberg source adds at 10^12-document scale is free hidden-partition
    pruning (e.g. ``days(warc_ts)``) and snapshot-isolated incremental
    reads — both arrive through this same ``spark.read.table`` plan with
    no downstream change.  Validates the input_hint schema so a
    mis-pointed table fails here, not deep inside an extraction stage.

    ``source_format`` disambiguates explicitly: ``"parquet"`` forces a
    path read, ``"table"`` forces a catalog lookup.  When ``None``, the
    SYNTAX of ``source`` decides — anything containing ``/`` or ending
    in ``.parquet`` is a path, everything else is a table name.  The
    resolver never probes the driver filesystem (ADVICE r4: an
    ``os.path.exists`` probe let a cwd-relative file silently shadow a
    catalog table, and was meaningless for remote paths anyway) — a bare
    local directory is addressed as ``./name``.
    """
    if source_format is None:
        source_format = (
            "parquet"
            if "/" in source or source.endswith(".parquet")
            else "table"
        )
    if source_format == "parquet":
        df = spark.read.parquet(source)
    elif source_format == "table":
        df = spark.read.table(source)
    else:
        raise ValueError(
            f"source_format must be 'parquet', 'table' or None, "
            f"got {source_format!r}"
        )
    missing = _PAGES_COLUMNS - set(df.columns)
    if missing:
        raise ValueError(
            f"pages source {source!r} lacks required columns {sorted(missing)}"
        )
    return df


# --------------------------------------------------------------------- #
# extraction: html binary -> text, vectorized and deterministic
# --------------------------------------------------------------------- #

_STRIP_BLOCKS = (
    r"(?s)<(script|style|head|h[1-6]|nav|header|footer|aside)\b[^>]*>.*?</\1>"
    r"|<!--.*?-->"
)
_STRIP_TAGS = r"(?s)<[^>]+>"
_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),  # last: &amp;lt; must decode to &lt;, not <
]


def _decode_utf8_series(html: pd.Series) -> pd.Series:
    """bytes -> str for a whole Arrow batch at buffer level (no per-row
    Python): a single binary->string cast validates and re-views the
    buffers.  Only a batch that actually contains invalid UTF-8 falls
    back to the per-row ``errors="replace"`` decode — same output, cold
    path only.  Nulls decode to ''."""
    import pyarrow as pa

    try:
        arr = pa.array(html, type=pa.large_binary())
        s = arr.cast(pa.large_string()).to_pandas()
    except (pa.ArrowInvalid, pa.ArrowTypeError):
        return html.map(
            lambda b: b.decode("utf-8", errors="replace")
            if b is not None
            else ""
        )
    s.index = html.index
    return s.fillna("")


def extract_text_series(html: pd.Series) -> pd.Series:
    """Vectorized html->text: one Arrow batch in, one out.

    Deterministic by construction: fixed regex set, fixed entity order
    (&amp; decoded last so double-escapes survive single-decode), unicode
    NFC-free (bytes in -> exact UTF-8 out), whitespace collapsed to single
    spaces and trimmed.
    """
    s = _decode_utf8_series(html)
    s = s.str.replace(_STRIP_BLOCKS, " ", regex=True)
    s = s.str.replace(_STRIP_TAGS, " ", regex=True)
    for ent, ch in _ENTITIES:
        s = s.str.replace(ent, ch, regex=False)
    s = s.str.replace(r"\s+", " ", regex=True).str.strip()
    return s


def with_extracted_text(
    pages: DataFrame, out_col: str = "extracted_text"
) -> DataFrame:
    """Add the extracted-text column via ``mapInPandas`` (Arrow batches).

    Uses mapInPandas rather than a scalar pandas_udf so the html bytes are
    dropped batch-by-batch (never retained past extraction) — at 100 TB the
    html column dominates page size, so the pipeline after this stage
    carries text only.
    """
    schema_out = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in pages.schema.fields
        if f.name != "html"
    ) + f", {out_col} string"
    names = [f.name for f in pages.schema.fields if f.name != "html"]

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[names].copy()
            out[out_col] = extract_text_series(pdf["html"])
            yield out

    return pages.mapInPandas(extract, schema=schema_out)


# --------------------------------------------------------------------- #
# n-gram streams (the sketch inputs of the north star)
# --------------------------------------------------------------------- #

def token_stream(pages: DataFrame, text_col: str = "extracted_text") -> DataFrame:
    """One token per row from the extracted text (codegen split+explode)."""
    return pages.select(
        F.explode(F.split(F.col(text_col), " ")).alias("token")
    ).where(F.col("token") != "")


def ngram_stream(
    pages: DataFrame, n: int, text_col: str = "extracted_text"
) -> DataFrame:
    """Word n-grams as space-joined strings — native array ops only:
    split -> transform over a sliding index range -> explode (no Python)."""
    toks = F.split(F.col(text_col), " ")
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return pages.select(F.explode(grams).alias("ngram"))


def url_host_stream(pages: DataFrame) -> DataFrame:
    """Hostnames from page urls (native parse_url)."""
    return pages.select(
        F.parse_url(F.col("url"), F.lit("HOST")).alias("host")
    )


def build_token_sketches(pages: DataFrame, config):
    """Fused pipeline stage: html->text extraction, tokenization, hashing
    and per-partition CQF build in ONE ``mapInPandas`` pass.

    The unfused form (extract stage -> explode -> build stage) ships every
    token string across two Arrow boundaries and runs two chained python
    workers per task; fusing keeps tokens as in-worker arrays from
    extraction to sketch, which is both faster and the memory-sane shape
    at 100 TB (token strings never materialize outside the worker).

    Returns DataFrame[sketch binary, nelts long, n_rows long] (one row per
    partition) — feed to ``aggregator.tree_merge``.
    """
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from .aggregator import ensure_shipped
    from .core import Cqf
    from .functions.hashing import murmur64a_concat

    ensure_shipped(pages.sparkSession)
    mask = np.uint64((1 << config.key_bits) - 1)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        chunks: list[np.ndarray] = []
        n_rows = 0
        for pdf in batches:
            if pdf.empty:
                continue
            text = extract_text_series(pdf["html"])
            # one C-level join+encode for the whole batch, then numpy run
            # detection — no per-token Python (extraction already collapses
            # whitespace to single 0x20s, and UTF-8 continuation bytes are
            # >= 0x80, so byte==0x20 is an exact token separator)
            flat = np.frombuffer(" ".join(text).encode("utf-8"), np.uint8)
            if flat.size == 0:
                continue
            is_sp = flat == 0x20
            nonsp = ~is_sp
            prev_sp = np.concatenate(([True], is_sp[:-1]))
            next_sp = np.concatenate((is_sp[1:], [True]))
            starts = np.flatnonzero(nonsp & prev_sp)
            lens = np.flatnonzero(nonsp & next_sp) - starts + 1
            if starts.size:
                n_rows += starts.size
                chunks.append(
                    murmur64a_concat(flat, starts, lens, config.seed) & mask
                )
        h = np.concatenate(chunks) if chunks else np.empty(0, np.uint64)
        sk = Cqf.from_hashes(config, h)
        yield pd.DataFrame(
            {"sketch": [sk.to_bytes()], "nelts": [sk.nelts], "n_rows": [n_rows]}
        )

    return pages.select("html").mapInPandas(
        run, schema="sketch binary, nelts long, n_rows long"
    )


def canonical_url(col: Any) -> Any:
    """Canonical form of a crawl URL — the first dedup key every
    Common-Crawl-style pipeline applies before any content hashing:

    1. drop the fragment (``#...``),
    2. lowercase the scheme+host (path stays case-sensitive),
    3. drop an explicit default port (``:443`` https / ``:80`` http),
    4. drop tracking query params (``utm_*``, ``ref``) and any emptied
       ``?``/``&`` leftovers — the param NAME is anchored to a ``?``/``&``
       separator, so path segments like Amazon's ``/ref=sr_1_1`` and
       params whose name merely ENDS in a tracking name (``href=``,
       ``pref=``) are untouched; a maximal RUN of consecutive tracking
       params collapses to its leading separator in one match, so the
       separator of a following kept param survives,
    5. drop a trailing ``/index.html``.

    Pure codegen ``regexp_replace`` chain — runs inside the scan's
    whole-stage codegen at 100 TB, and every step is mirrorable in ANSI
    SQL (the driver oracle recomputes it in DuckDB).
    """
    c = F.regexp_replace(col, "#.*$", "")
    c = F.concat(
        F.lower(F.regexp_extract(c, "(?i)^(https?://[^/]+)", 1)),
        F.regexp_replace(c, "(?i)^https?://[^/]+", ""),
    )
    c = F.regexp_replace(c, "^(https://[^/:]+):443(?=/|$)", "$1")
    c = F.regexp_replace(c, "^(http://[^/:]+):80(?=/|$)", "$1")
    # one maximal run of tracking params (each ending at '&' or EOS)
    # collapses to its leading separator; a kept param following the run
    # then sits directly after that separator.  '?utm_a=1&page=2' ->
    # '?page=2'; '?page=2&utm_a=1' -> '?page=2&' -> trailing cleanup.
    c = F.regexp_replace(
        c, "([?&])(?:(?:utm_[a-z]+|ref)=[^&#]*(?:&|$))+", "$1"
    )
    c = F.regexp_replace(c, "[?&]+$", "")
    c = F.regexp_replace(c, "/index\\.html$", "/")
    return c
