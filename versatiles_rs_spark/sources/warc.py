"""WARC (ISO 28500) source/sink in the Common-Crawl layout.

The north rule's input is "an Iceberg table of Common-Crawl-style web
pages"; on the wire those pages live in WARC archives — many ~1 GB
``.warc.gz`` files, each a *concatenation of gzip members, one member per
record* (the layout warc.paths shards use), so a record can be fetched
with one ranged read + one gzip member decode. This module keeps exactly
that layout:

- ``write_warc(pages, out_dir)``  — distributed sink: every Spark
  partition serializes its rows to one ``part-NNNNN.warc.gz`` (member per
  record) plus a ``part-NNNNN.cdx`` sidecar (the CDX index Common Crawl
  publishes next to its archives: url, member offset, member length), so
  a later point lookup is a seek, never a scan.
- ``read_warc(spark, path_or_glob)`` — distributed scan: one task per
  WARC file (file count is the parallelism unit — at 100 TB that is
  ~10^5 files, far beyond any cluster's core count, so file-level
  splitting is the scalable strategy and no byte-range splitting is
  needed). Yields the input_hint page shape plus (warc_file, warc_offset,
  warc_length) lineage columns.
- ``lookup_warc(path, url)``      — the serve path: CDX bisect + one
  ranged read + one member decode, O(log n) like the container lookups.

Record format follows WARC/1.0 (public spec, ISO 28500 / IIPC): each
response record carries WARC-Target-URI, WARC-Date, Content-Type
``application/http; msgtype=response``, and an HTTP/1.1 200 envelope
around the html payload — the same framing Common Crawl emits.

Determinism: gzip members are written with mtime=0 and no filename, the
HTTP envelope is fixed, and record order inside a part follows the
incoming partition order, so write→read round-trips byte-identically and
re-runs produce identical archives.
"""

from __future__ import annotations

import gzip
import io
import os
import zlib
from bisect import bisect_left
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

_CRLF = b"\r\n"
_WARC_VERSION = b"WARC/1.0"
# Fixed HTTP envelope — Common-Crawl response records wrap the payload in
# the captured HTTP response; a fixed 200 header keeps writes deterministic.
_HTTP_HEAD = b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=UTF-8\r\n"


def _warc_record(url: str, ts_iso: str, html: bytes) -> bytes:
    """One WARC/1.0 response record (uncompressed body of a gzip member)."""
    http = _HTTP_HEAD + b"Content-Length: " + str(len(html)).encode() + _CRLF + _CRLF + html
    headers = (
        _WARC_VERSION + _CRLF
        + b"WARC-Type: response" + _CRLF
        + b"WARC-Target-URI: " + url.encode() + _CRLF
        + b"WARC-Date: " + ts_iso.encode() + _CRLF
        + b"Content-Type: application/http; msgtype=response" + _CRLF
        + b"Content-Length: " + str(len(http)).encode() + _CRLF
        + _CRLF
    )
    return headers + http + _CRLF + _CRLF


def _gzip_member(raw: bytes) -> bytes:
    """Deterministic gzip member (mtime 0, no name) — one per record."""
    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
        gz.write(raw)
    return buf.getvalue()


def write_warc(pages: DataFrame, out_dir: str) -> dict:
    """Pages table -> directory of part-NNNNN.warc.gz + .cdx sidecars.

    Runs as one mapInPandas pass: each input partition streams its rows
    into one archive file (member per record) and emits a single stats
    row; only the per-part stats reach the driver. Requires columns
    url (string), warc_ts (timestamp), html (binary).
    """
    os.makedirs(out_dir, exist_ok=True)
    out_schema = StructType(
        [
            StructField("warc_file", StringType()),
            StructField("records", LongType()),
            StructField("bytes", LongType()),
        ]
    )

    def write_part(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        path = os.path.join(out_dir, f"part-{pid:05d}.warc.gz")
        cdx: list[tuple[str, int, int]] = []
        n = 0
        with open(path, "wb") as f:
            for pdf in it:
                ts = pd.to_datetime(pdf["warc_ts"]).dt.strftime("%Y-%m-%dT%H:%M:%SZ")
                for url, ts_iso, html in zip(pdf["url"], ts, pdf["html"]):
                    member = _gzip_member(_warc_record(url, ts_iso, bytes(html)))
                    cdx.append((url, f.tell(), len(member)))
                    f.write(member)
                    n += 1
        total = os.path.getsize(path)
        if n == 0:
            os.unlink(path)
            return
        # CDX sidecar, sorted by url for bisect lookups
        with open(os.path.join(out_dir, f"part-{pid:05d}.cdx"), "w") as f:
            for url, off, length in sorted(cdx):
                f.write(f"{url} {off} {length}\n")
        yield pd.DataFrame({"warc_file": [path], "records": [n], "bytes": [total]})

    stats = pages.select("url", "warc_ts", "html").mapInPandas(write_part, schema=out_schema).collect()
    return {
        "files": len(stats),
        "records": int(sum(r["records"] for r in stats)),
        "bytes": int(sum(r["bytes"] for r in stats)),
    }


def _split_members(blob: bytes) -> Iterator[tuple[int, int, bytes]]:
    """(offset, compressed_length, raw_record) per gzip member.

    zlib's decompressobj reports unused_data at each member boundary, so
    one linear pass recovers the member framing without re-scanning for
    magic bytes (which could false-positive inside compressed data).
    """
    pos = 0
    while pos < len(blob):
        d = zlib.decompressobj(wbits=31)
        raw = d.decompress(blob[pos:])
        raw += d.flush()
        consumed = len(blob) - pos - len(d.unused_data)
        yield pos, consumed, raw
        pos += consumed


def _parse_record(raw: bytes) -> tuple[str, str, bytes] | None:
    """raw WARC record -> (url, warc_date, html payload) for responses."""
    head_end = raw.find(_CRLF + _CRLF)
    if head_end < 0:
        return None
    fields = {}
    for line in raw[:head_end].split(_CRLF)[1:]:
        k, _, v = line.partition(b":")
        fields[k.strip().lower()] = v.strip()
    if fields.get(b"warc-type") != b"response":
        return None
    body = raw[head_end + 4 : head_end + 4 + int(fields[b"content-length"])]
    # strip the HTTP envelope
    http_end = body.find(_CRLF + _CRLF)
    html = body[http_end + 4 :] if http_end >= 0 else body
    return (
        fields[b"warc-target-uri"].decode(),
        fields[b"warc-date"].decode(),
        html,
    )


PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("html", BinaryType()),
        StructField("warc_file", StringType()),
        StructField("warc_offset", LongType()),
        StructField("warc_length", LongType()),
    ]
)


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC file / glob / directory -> pages DataFrame.

    binaryFile gives one row per archive; parsing fans out one task per
    file. ``.warc.gz`` (member-per-record) and plain ``.warc`` both work.
    """
    if os.path.isdir(path):
        path = os.path.join(path, "*.warc*")
    files = (
        spark.read.format("binaryFile")
        .load(path)
        .where(~F.col("path").endswith(".cdx"))
        .select("path", "content")
        .repartition(max(spark.sparkContext.defaultParallelism, 1), "path")
    )

    def parse(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            for fpath, blob in zip(pdf["path"], pdf["content"]):
                blob = bytes(blob)
                rows = []
                if blob[:2] == b"\x1f\x8b":
                    members = _split_members(blob)
                else:  # uncompressed .warc: records separated by blank lines
                    members = _iter_plain_records(blob)
                # salvage semantics: a truncated/corrupt archive yields the
                # records before the corruption point instead of failing the
                # whole 100 TB job on one bad shard (CC archives do contain
                # damaged members in the wild)
                try:
                    for off, length, raw in members:
                        rec = _parse_record(raw)
                        if rec is None:
                            continue
                        url, date, html = rec
                        rows.append((url, date, html, fpath, off, length))
                except (zlib.error, ValueError, KeyError, IndexError):
                    pass
                if rows:
                    out = pd.DataFrame(
                        rows,
                        columns=["url", "warc_ts", "html", "warc_file", "warc_offset", "warc_length"],
                    )
                    out["warc_ts"] = pd.to_datetime(out["warc_ts"], format="%Y-%m-%dT%H:%M:%SZ")
                    yield out

    return files.mapInPandas(parse, schema=PAGES_SCHEMA)


def _iter_plain_records(blob: bytes) -> Iterator[tuple[int, int, bytes]]:
    """Record framing for uncompressed .warc: header Content-Length walks."""
    pos = 0
    while pos < len(blob):
        head_end = blob.find(_CRLF + _CRLF, pos)
        if head_end < 0:
            return
        clen = 0
        for line in blob[pos:head_end].split(_CRLF):
            if line.lower().startswith(b"content-length:"):
                clen = int(line.split(b":")[1])
        end = head_end + 4 + clen + 4  # record + trailing CRLFCRLF
        yield pos, end - pos, blob[pos:end]
        pos = end


def lookup_warc(out_dir: str, url: str) -> bytes | None:
    """Point lookup via the CDX sidecars: bisect each part's sorted index,
    then ONE ranged read + one member decode. Never scans an archive."""
    for name in sorted(os.listdir(out_dir)):
        if not name.endswith(".cdx"):
            continue
        with open(os.path.join(out_dir, name)) as f:
            lines = f.read().splitlines()
        urls = [ln.split(" ", 1)[0] for ln in lines]
        i = bisect_left(urls, url)
        if i >= len(urls) or urls[i] != url:
            continue
        _, off, length = lines[i].rsplit(" ", 2)
        warc = os.path.join(out_dir, name[: -len(".cdx")] + ".warc.gz")
        with open(warc, "rb") as f:
            f.seek(int(off))
            member = f.read(int(length))
        rec = _parse_record(gzip.decompress(member))
        return rec[2] if rec else None
    return None
