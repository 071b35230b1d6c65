"""WebM/Matroska EBML demux (multimodal/webm.py)."""

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from versatiles_rs_spark.multimodal.webm import (
    encode_minimal_webm,
    parse_webm,
)


def _frames(n, base=30):
    return [bytes([(i * 13 + j) % 256 for j in range(base + (i % 4) * 9)]) for i in range(n)]


def test_roundtrip_frames_resolve_to_payloads():
    frames = _frames(8)
    blob = encode_minimal_webm(frames, width=320, height=180, fps=25, codec="V_VP9")
    meta = parse_webm(blob)
    assert meta["doctype"] == "webm"
    assert meta["timecode_scale_ns"] == 1_000_000
    assert meta["duration_s"] == pytest.approx(8 * 40 / 1000)
    (track,) = meta["tracks"]
    assert track["type"] == 1 and track["codec"] == "V_VP9"
    assert (track["width"], track["height"]) == (320, 180)
    assert len(meta["frames"]) == 8
    for k, (tno, t_ms, off, size) in enumerate(meta["frames"]):
        assert tno == 1
        assert t_ms == k * 40
        assert blob[off : off + size] == frames[k]


def test_parse_rejects_garbage():
    for bad in (b"", b"\x00" * 32, b"\x1aE\xdf\xa3" + b"\xff" * 8, b"RIFFxxxxWEBP"):
        with pytest.raises(ValueError):
            parse_webm(bad)


@settings(max_examples=30, deadline=None)
@given(frames=st.lists(st.binary(min_size=1, max_size=200), min_size=1, max_size=16))
def test_roundtrip_any_frames(frames):
    blob = encode_minimal_webm(frames)
    meta = parse_webm(blob)
    assert [blob[o : o + n] for _, _, o, n in meta["frames"]] == frames


def test_frame_sample_video_real_webm(spark):
    from versatiles_rs_spark.multimodal.media import frame_sample_video

    frames = _frames(9)
    blob = encode_minimal_webm(frames)
    df = spark.createDataFrame(pd.DataFrame({"doc_id": [2], "media": [blob]}))
    out = frame_sample_video(df, every_n=4).toPandas().sort_values("frame_idx")
    assert out["frame_idx"].tolist() == [0, 4, 8]
    assert (out["frame"] == "BITSTREAM_V_VP8").all()
    for _, r in out.iterrows():
        assert bytes(r["frame_payload"]) == frames[int(r["frame_idx"])]


def test_media_metadata_sniffs_webm(spark):
    from versatiles_rs_spark.multimodal.media import with_media_metadata

    blob = encode_minimal_webm(_frames(2), width=640, height=360)
    df = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "media": [blob]}))
    row = with_media_metadata(df).collect()[0]
    assert row["media_type"] == "video/webm"
    assert (row["width"], row["height"]) == (640, 360)
