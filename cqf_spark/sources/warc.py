"""WARC ingestion — the container Common Crawl is actually distributed
in (`*.warc.gz`, one gzip MEMBER per record so archives are seekable) —
parsed into the engine's pages schema ``(url, warc_ts, html)``.

Topology at 100 TB: Common Crawl ships ~1 GB archives, and the right
unit of work is ONE ARCHIVE PER TASK — ``spark.read.format("binaryFile")``
gives exactly that (no splitting mid-member, no shuffle), and the
record parse runs inside the task via ``mapInPandas``.  Extraction then
continues with :func:`cqf_spark.webtext.with_extracted_text` exactly as
for a catalog table, so the crawl->table->sketch path is end-to-end.

The writer exists so tests and benchmarks can synthesize archives
deterministically (no external data): it emits spec-conformant WARC/1.0
``response`` records with the member-per-record gzip framing.  The
round-trip test asserts url/timestamp/html come back BYTE-IDENTICAL —
the per-row invariant the engine's whole webtext pipeline is gated on.

Pure stdlib (gzip framing via zlib) — no warcio dependency.
"""

# NO `from __future__ import annotations`: pandas_udf/mapInPandas type
# hints must stay real objects for pyspark's introspection
import gzip
import io
import zlib
from datetime import datetime, timezone
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession


_CRLF = b"\r\n"


def _warc_date(epoch_s: int) -> str:
    return datetime.fromtimestamp(int(epoch_s), tz=timezone.utc).strftime(
        "%Y-%m-%dT%H:%M:%SZ"
    )


def write_warc_gz(records, path: str) -> int:
    """Write ``records`` — an iterable of (url, epoch_seconds,
    html_bytes) — as a WARC/1.0 ``response`` archive at ``path``, one
    gzip member per record (the Common Crawl convention: archives stay
    seekable and members stream-decompress independently).  Returns the
    record count.  Deterministic: gzip headers carry mtime=0."""
    n = 0
    with open(path, "wb") as out:
        for url, epoch_s, html in records:
            http = (
                b"HTTP/1.1 200 OK" + _CRLF
                + b"Content-Type: text/html; charset=utf-8" + _CRLF
                + b"Content-Length: " + str(len(html)).encode() + _CRLF
                + _CRLF
                + bytes(html)
            )
            header = (
                "WARC/1.0\r\n"
                "WARC-Type: response\r\n"
                f"WARC-Target-URI: {url}\r\n"
                f"WARC-Date: {_warc_date(epoch_s)}\r\n"
                "Content-Type: application/http; msgtype=response\r\n"
                f"Content-Length: {len(http)}\r\n"
                "\r\n"
            ).encode()
            member = io.BytesIO()
            with gzip.GzipFile(fileobj=member, mode="wb", mtime=0) as gz:
                gz.write(header + http + _CRLF + _CRLF)
            out.write(member.getvalue())
            n += 1
    return n


def _iter_members(blob: bytes) -> Iterator[bytes]:
    """Decompress a multi-member gzip blob member by member (wbits=47
    accepts the gzip wrapper; ``unused_data`` carries the next member)."""
    buf = bytes(blob)
    while buf:
        d = zlib.decompressobj(47)
        yield d.decompress(buf)
        buf = d.unused_data
        if not buf.strip(b"\x00"):
            break


def _parse_record(raw: bytes):
    """One decompressed WARC record -> (url, epoch_s, html bytes) for
    ``response`` records, None otherwise (warcinfo/request/metadata are
    real parts of a crawl archive and are skipped, not errors)."""
    head_end = raw.find(_CRLF + _CRLF)
    if head_end < 0 or not raw.startswith(b"WARC/"):
        raise ValueError("malformed WARC record (no header block)")
    fields = {}
    for line in raw[:head_end].split(_CRLF)[1:]:
        k, _, v = line.partition(b":")
        fields[k.strip().lower()] = v.strip()
    if fields.get(b"warc-type") != b"response":
        return None
    url = fields[b"warc-target-uri"].decode()
    ts = datetime.strptime(
        fields[b"warc-date"].decode(), "%Y-%m-%dT%H:%M:%SZ"
    ).replace(tzinfo=timezone.utc)
    payload = raw[head_end + 4 : head_end + 4 + int(fields[b"content-length"])]
    # HTTP response: headers end at the first blank line; body follows
    http_end = payload.find(_CRLF + _CRLF)
    if http_end < 0:
        raise ValueError(f"response record for {url} has no HTTP head")
    return url, int(ts.timestamp()), payload[http_end + 4 :]


def parse_warc_bytes(blob: bytes) -> list:
    """All (url, epoch_s, html) response tuples of one archive blob."""
    out = []
    for raw in _iter_members(blob):
        rec = _parse_record(raw)
        if rec is not None:
            out.append(rec)
    return out


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Read ``*.warc.gz`` archives into the pages-table prefix
    ``(url string, warc_ts timestamp, html binary)``.

    One archive = one ``binaryFile`` row = one parse task; record
    parsing is stdlib-zlib inside ``mapInPandas`` (Arrow-batched, no
    per-record Python round trips through the JVM), and nothing
    shuffles — downstream extraction/sketching consumes the scan
    directly.  Continue with
    ``cqf_spark.webtext.with_extracted_text`` for the text column."""
    import pandas as pd

    # Arrow hands tz-NAIVE timestamps to Spark, which interprets them in
    # the SESSION timezone — so the UTC instant from WARC-Date must be
    # converted to session wall time here or every non-UTC session would
    # shift warc_ts by its offset
    tz = spark.conf.get("spark.sql.session.timeZone")
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc.gz")
        .load(path)
        .select("content")
    )

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for blob in pdf["content"]:
                recs = parse_warc_bytes(bytes(blob))
                if not recs:
                    continue
                urls, ts, html = zip(*recs)
                yield pd.DataFrame(
                    {
                        "url": list(urls),
                        "warc_ts": pd.to_datetime(
                            list(ts), unit="s", utc=True
                        ).tz_convert(tz).tz_localize(None),
                        "html": list(html),
                    }
                )

    return files.mapInPandas(
        parse, schema="url string, warc_ts timestamp, html binary"
    )
