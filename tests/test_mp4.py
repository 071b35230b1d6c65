"""MP4/ISO BMFF container demux (multimodal/mp4.py): real sample-table
math, honest codec stub."""

import struct

import pandas as pd
import pytest

from versatiles_rs_spark.multimodal.mp4 import (
    encode_minimal_mp4,
    parse_mp4,
    sample_byte_ranges,
)


def _frames(n, base=40):
    # deterministic variable-size fake codec payloads
    return [bytes([(i * 37 + j) % 256 for j in range(base + (i % 5) * 7)]) for i in range(n)]


def test_roundtrip_tables_resolve_to_real_payloads():
    frames = _frames(9)
    blob = encode_minimal_mp4(frames, width=64, height=48, fps=10)
    meta = parse_mp4(blob)
    assert meta["brand"] == "isom"
    assert meta["duration_s"] == pytest.approx(0.9)
    (track,) = meta["tracks"]
    assert track["handler"] == "vide"
    assert track["codec"] == "mp4v"
    assert (track["width"], track["height"]) == (64, 48)
    assert track["n_samples"] == 9
    assert track["sample_sizes"] == [len(f) for f in frames]
    # THE test: resolved byte ranges slice the original payloads out of mdat
    ranges = sample_byte_ranges(track)
    assert len(ranges) == 9
    for (off, size), want in zip(ranges, frames):
        assert blob[off : off + size] == want


def test_multi_chunk_stsc_expansion():
    """Odd frame count -> last chunk holds 1 sample (two stsc runs)."""
    frames = _frames(7)
    blob = encode_minimal_mp4(frames)
    (track,) = parse_mp4(blob)["tracks"]
    assert len(track["chunk_offsets"]) == 4
    assert track["stsc_runs"] == [(1, 2), (4, 1)]
    for (off, size), want in zip(sample_byte_ranges(track), frames):
        assert blob[off : off + size] == want


def test_parse_rejects_garbage():
    for bad in (b"", b"\x00" * 16, b"RIFF1234WAVE"):
        with pytest.raises(ValueError):
            parse_mp4(bad)


def test_frame_sample_video_real_mp4(spark):
    """The Spark frame sampler does REAL demux on MP4: byte ranges point at
    the actual bitstream payloads; every_n subsampling honored."""
    from versatiles_rs_spark.multimodal.media import frame_sample_video

    frames = _frames(10)
    blob = encode_minimal_mp4(frames)
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "media": [blob]})
    )
    out = frame_sample_video(df, every_n=3).toPandas().sort_values("frame_idx")
    assert out["frame_idx"].tolist() == [0, 3, 6, 9]
    assert (out["frame"] == "BITSTREAM_mp4v").all()
    for _, r in out.iterrows():
        want = frames[int(r["frame_idx"])]
        assert bytes(r["frame_payload"]) == want
        assert int(r["frame_n_bytes"]) == len(want)
        assert blob[int(r["frame_offset_bytes"]) : int(r["frame_offset_bytes"]) + len(want)] == want


def test_frame_sample_video_non_mp4_stays_stub(spark):
    from versatiles_rs_spark.multimodal.media import frame_sample_video

    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [7], "media": [b"\x00" * 4096]})
    )
    out = frame_sample_video(df, every_n=2).toPandas()
    assert (out["frame"] == "STUB_FRAME_NO_CODEC").all()
    assert out["frame_payload"].isna().all()


def test_media_metadata_sniffs_mp4_dimensions(spark):
    from versatiles_rs_spark.multimodal.media import with_media_metadata

    blob = encode_minimal_mp4(_frames(3), width=320, height=200)
    df = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "media": [blob]}))
    row = with_media_metadata(df).collect()[0]
    assert row["media_type"] == "video/mp4"
    assert (row["width"], row["height"]) == (320, 200)
