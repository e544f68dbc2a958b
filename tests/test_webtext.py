"""Webtext pipeline: synthesis determinism, byte-identical extraction
(the input_hint per-row invariant), and n-gram stream edge cases."""

import pandas as pd
from pyspark.sql import functions as F

from cqf_spark.webtext import (
    extract_text_series,
    ngram_stream,
    synth_webtext,
    with_extracted_text,
)


def test_extract_byte_identical_per_url(spark, sf_dir):
    pages = synth_webtext(spark, sf_dir)
    ext = with_extracted_text(pages)
    assert ext.where(F.col("extracted_text") != F.col("text")).count() == 0


def test_extract_invariant_across_parallelism(spark, sf_dir):
    pages = synth_webtext(spark, sf_dir)
    a = {
        r.url: r.extracted_text
        for r in with_extracted_text(pages.coalesce(1)).collect()
    }
    b = {
        r.url: r.extracted_text
        for r in with_extracted_text(pages.repartition(13)).collect()
    }
    assert a == b and len(a) > 0


def test_synth_deterministic(spark, sf_dir):
    a = synth_webtext(spark, sf_dir).orderBy("doc_id").collect()
    b = synth_webtext(spark, sf_dir).orderBy("doc_id").collect()
    assert [(r.url, bytes(r.html)) for r in a] == [
        (r.url, bytes(r.html)) for r in b
    ]
    # html is genuinely binary and contains the escaped text
    assert isinstance(bytes(a[0].html), bytes)
    assert b"<html" in bytes(a[0].html).lower()


def test_extract_entities_and_blocks():
    html = pd.Series(
        [
            b"<html><head><title>t</title></head><body><p>a &amp;lt; b "
            b"&quot;q&quot; &#39;s&#39;</p><script>1<2</script></body></html>",
            b"<div>x</div><!-- c --><style>p{}</style><h2>skip</h2> y",
            None,
            b"",
        ]
    )
    out = extract_text_series(html).tolist()
    assert out[0] == "a &lt; b \"q\" 's'"
    assert out[1] == "x y"
    assert out[2] == "" and out[3] == ""


def test_ngram_stream_short_docs(spark):
    df = spark.createDataFrame(
        [("a b c",), ("a",), ("",)], "extracted_text string"
    )
    grams = [r.ngram for r in ngram_stream(df, 2).collect()]
    assert sorted(grams) == ["a b", "b c"]
    tri = [r.ngram for r in ngram_stream(df, 3).collect()]
    assert tri == ["a b c"]
