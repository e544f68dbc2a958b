"""WARC ingestion round trip (sources/warc.py): synthesized pages ->
spec-conformant member-per-record .warc.gz archives -> read_warc ->
byte-identical url/timestamp/html, with text extraction continuing
end-to-end — the per-row invariant the webtext pipeline is gated on."""

import gzip

import pytest

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def pages_pdf(spark):
    from cqf_spark.webtext import synth_webtext

    return (
        synth_webtext(spark, SF_DIR)
        .select("url", F.unix_timestamp("warc_ts").alias("epoch"), "html",
                "text")
        .toPandas()
    )


@pytest.fixture(scope="module")
def warc_dir(tmp_path_factory, pages_pdf):
    from cqf_spark.sources.warc import write_warc_gz

    d = tmp_path_factory.mktemp("warc")
    # three archives, uneven sizes — one binaryFile row / parse task each
    thirds = [pages_pdf.iloc[i::3] for i in range(3)]
    for i, part in enumerate(thirds):
        n = write_warc_gz(
            ((r["url"], int(r["epoch"]), bytes(r["html"]))
             for _, r in part.iterrows()),
            str(d / f"part-{i}.warc.gz"),
        )
        assert n == len(part)
    # a non-matching file the pathGlobFilter must skip
    (d / "README.txt").write_text("not a warc")
    return str(d)


def test_warc_round_trip_byte_identical(spark, pages_pdf, warc_dir):
    from cqf_spark.sources.warc import read_warc

    got = (
        read_warc(spark, warc_dir)
        .select("url", F.unix_timestamp("warc_ts").alias("epoch"), "html")
        .toPandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    want = pages_pdf[["url", "epoch", "html"]].sort_values("url") \
        .reset_index(drop=True)
    assert len(got) == len(want)
    assert got["url"].tolist() == want["url"].tolist()
    assert got["epoch"].tolist() == want["epoch"].tolist()
    assert all(
        bytes(a) == bytes(b) for a, b in zip(got["html"], want["html"])
    )


def test_warc_extraction_continues_end_to_end(spark, pages_pdf, warc_dir):
    """read_warc -> with_extracted_text reproduces the ground-truth text
    per url, byte-identical (the north-star invariant)."""
    from cqf_spark.sources.warc import read_warc
    from cqf_spark.webtext import with_extracted_text

    got = {
        r["url"]: r["extracted_text"]
        for r in with_extracted_text(read_warc(spark, warc_dir)).collect()
    }
    want = dict(zip(pages_pdf["url"], pages_pdf["text"]))
    assert got == want


def test_warc_skips_non_response_records(spark, tmp_path):
    """warcinfo/request records are legitimate archive members and must
    be skipped, not raise; response records around them still parse."""
    import io

    from cqf_spark.sources.warc import parse_warc_bytes, write_warc_gz

    p = tmp_path / "mixed.warc.gz"
    write_warc_gz([("https://a.example/x", 1700000000, b"<html>A</html>")],
                  str(p))
    info = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\n"
        b"WARC-Date: 2023-11-14T22:13:20Z\r\n"
        b"Content-Type: application/warc-fields\r\n"
        b"Content-Length: 9\r\n\r\nrobots: x\r\n\r\n"
    )
    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
        gz.write(info)
    blob = buf.getvalue() + p.read_bytes()  # warcinfo member FIRST
    recs = parse_warc_bytes(blob)
    assert len(recs) == 1
    assert recs[0][0] == "https://a.example/x"
    assert recs[0][2] == b"<html>A</html>"


def test_warc_writer_members_are_independent(pages_pdf, tmp_path):
    """Each record is its own gzip member (the Common Crawl seekability
    convention): any member prefix of the file decompresses alone."""
    import zlib

    from cqf_spark.sources.warc import write_warc_gz

    p = tmp_path / "m.warc.gz"
    rows = pages_pdf.head(4)
    write_warc_gz(
        ((r["url"], int(r["epoch"]), bytes(r["html"]))
         for _, r in rows.iterrows()),
        str(p),
    )
    blob = p.read_bytes()
    # count members by walking unused_data
    n, buf = 0, blob
    while buf.strip(b"\x00"):
        d = zlib.decompressobj(47)
        first = d.decompress(buf)
        assert first.startswith(b"WARC/1.0\r\n")
        buf = d.unused_data
        n += 1
    assert n == 4
