"""WARC source/sink: Common-Crawl-layout archives of the pages table."""

import gzip
import os
import zlib

from pyspark.sql import functions as F

from versatiles_rs_spark.pages.extract import with_extracted_text
from versatiles_rs_spark.pages.generator import synth_pages
from versatiles_rs_spark.sources.warc import (
    lookup_warc,
    read_warc,
    write_warc,
)

SF = "/root/testdata/sf0.001"


def test_warc_roundtrip_byte_identical(spark, tmp_path):
    """pages -> .warc.gz -> pages: html byte-identical per url."""
    pages = synth_pages(spark, SF).repartition(4)
    out = str(tmp_path / "cc")
    stats = write_warc(pages, out)
    n = pages.count()
    assert stats["records"] == n
    assert stats["files"] == 4
    assert stats["bytes"] > 0

    back = read_warc(spark, out)
    assert back.count() == n
    joined = (
        pages.select("url", F.col("html").alias("want"), "warc_ts")
        .join(back.select("url", F.col("html").alias("got"), F.col("warc_ts").alias("ts2")), "url")
    )
    assert joined.count() == n
    assert joined.filter(F.col("want") != F.col("got")).count() == 0
    # warc_ts survives at second precision (WARC-Date is ISO-8601 seconds)
    assert joined.filter(F.date_trunc("second", "warc_ts") != F.col("ts2")).count() == 0


def test_warc_layout_is_member_per_record(spark, tmp_path):
    """Each record is its own gzip member (the Common-Crawl ranged-read
    contract): member count == record count, and any single member
    decompresses standalone."""
    pages = synth_pages(spark, SF).limit(20).coalesce(1)
    out = str(tmp_path / "cc")
    stats = write_warc(pages, out)
    path = os.path.join(out, "part-00000.warc.gz")
    blob = open(path, "rb").read()
    members = 0
    pos = 0
    while pos < len(blob):
        d = zlib.decompressobj(wbits=31)
        d.decompress(blob[pos:])
        d.flush()
        pos = len(blob) - len(d.unused_data)
        members += 1
    assert members == stats["records"] == 20

    # standalone member decode from the CDX offsets
    cdx = open(os.path.join(out, "part-00000.cdx")).read().splitlines()
    assert len(cdx) == 20
    url, off, length = cdx[3].rsplit(" ", 2)
    member = blob[int(off) : int(off) + int(length)]
    raw = gzip.decompress(member)
    assert raw.startswith(b"WARC/1.0\r\n")
    assert ("WARC-Target-URI: " + url).encode() in raw


def test_warc_deterministic_bytes(spark, tmp_path):
    """Two writes of the same pages produce identical archives."""
    pages = synth_pages(spark, SF).orderBy("doc_id").coalesce(1)
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    write_warc(pages, a)
    write_warc(pages, b)
    ba = open(os.path.join(a, "part-00000.warc.gz"), "rb").read()
    bb = open(os.path.join(b, "part-00000.warc.gz"), "rb").read()
    assert ba == bb


def test_warc_point_lookup(spark, tmp_path):
    pages = synth_pages(spark, SF).repartition(3)
    out = str(tmp_path / "cc")
    write_warc(pages, out)
    row = pages.orderBy("doc_id").limit(1).collect()[0]
    assert lookup_warc(out, row["url"]) == bytes(row["html"])
    assert lookup_warc(out, "https://nowhere.example.com/x") is None


def test_warc_to_extracted_text_invariant(spark, tmp_path):
    """The full web-scale ingest chain: WARC -> pages -> extracted text,
    byte-identical to the golden documents.text per url."""
    pages = synth_pages(spark, SF)
    out = str(tmp_path / "cc")
    write_warc(pages, out)

    back = with_extracted_text(read_warc(spark, out))
    golden = pages.select("url", F.col("text").alias("golden"))
    j = back.join(golden, "url")
    assert j.count() == pages.count()
    assert j.filter(F.col("extracted_text") != F.col("golden")).count() == 0


def test_warc_uncompressed_read(spark, tmp_path):
    """Plain .warc (no gzip) parses through the same reader."""
    pages = synth_pages(spark, SF).limit(5).coalesce(1)
    gz_dir = str(tmp_path / "gz")
    write_warc(pages, gz_dir)
    blob = open(os.path.join(gz_dir, "part-00000.warc.gz"), "rb").read()
    # concatenate the decompressed members into one plain .warc
    plain = bytearray()
    pos = 0
    while pos < len(blob):
        d = zlib.decompressobj(wbits=31)
        plain += d.decompress(blob[pos:]) + d.flush()
        pos = len(blob) - len(d.unused_data)
    plain_dir = tmp_path / "plain"
    plain_dir.mkdir()
    (plain_dir / "part-00000.warc").write_bytes(bytes(plain))

    back = read_warc(spark, str(plain_dir))
    assert back.count() == 5
    want = {r["url"]: bytes(r["html"]) for r in pages.collect()}
    for r in back.collect():
        assert bytes(r["html"]) == want[r["url"]]


def test_warc_salvages_corrupt_archives(spark, tmp_path):
    """A truncated/garbage archive yields the records before the corruption
    point — never a job failure (CC shards contain damaged members)."""
    pages = synth_pages(spark, SF).limit(6).coalesce(1)
    good = str(tmp_path / "good")
    write_warc(pages, good)
    blob = open(os.path.join(good, "part-00000.warc.gz"), "rb").read()
    # find the 4th member boundary and truncate mid-member + append garbage
    cdx = open(os.path.join(good, "part-00000.cdx")).read().splitlines()
    offs = sorted(int(ln.rsplit(" ", 2)[1]) for ln in cdx)
    bad_dir = tmp_path / "bad"
    bad_dir.mkdir()
    (bad_dir / "a.warc.gz").write_bytes(blob[: offs[3] + 10] + b"\xff" * 64)
    (bad_dir / "b.warc.gz").write_bytes(b"\x1f\x8b\xff garbage not gzip")
    (bad_dir / "c.warc").write_bytes(b"not a warc at all")

    got = read_warc(spark, str(bad_dir)).collect()
    assert len(got) == 3  # the 3 intact members of a.warc.gz survive
    want = {r["url"]: bytes(r["html"]) for r in pages.collect()}
    for r in got:
        assert bytes(r["html"]) == want[r["url"]]
