"""Structured Streaming tiling + multimodal column plumbing."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from versatiles_rs_spark.functions.raster import png_encode
from versatiles_rs_spark.multimodal import (
    extract_image_features,
    frame_sample_video,
    with_media_metadata,
)
from versatiles_rs_spark.streaming import (
    streaming_tile_counts,
    streaming_windowed_tile_stats,
)


def test_streaming_tile_counts_matches_batch(spark, tmp_path, sf_dir):
    """rate-limited file stream of events -> per-tile counts == batch result."""
    from versatiles_rs_spark.queries import _events_geo

    ev = _events_geo(spark, sf_dir).select("lon", "lat", "ts")
    src = str(tmp_path / "stream_src")
    ev.coalesce(2).write.parquet(src)

    stream = spark.readStream.schema(ev.schema).parquet(src)
    q = (
        streaming_tile_counts(stream, zoom=4)
        .writeStream.format("memory")
        .queryName("tile_counts_stream")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql("select * from tile_counts_stream").toPandas()
    finally:
        q.stop()
    want = streaming_tile_counts(ev, zoom=4).toPandas()
    g = got.sort_values(["x", "y"]).reset_index(drop=True)
    w = want.sort_values(["x", "y"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(g, w)


def test_streaming_windowed_stats(spark, tmp_path, sf_dir):
    from versatiles_rs_spark.queries import _events_geo

    ev = _events_geo(spark, sf_dir).select("lon", "lat", "ts", "value")
    src = str(tmp_path / "stream_src2")
    ev.write.parquet(src)
    stream = spark.readStream.schema(ev.schema).parquet(src)
    q = (
        streaming_windowed_tile_stats(stream, zoom=2, window="60 minutes", value_col="value")
        .writeStream.format("memory")
        .queryName("windowed_stream")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql("select * from windowed_stream").toPandas()
    finally:
        q.stop()
    # watermark closes all windows except possibly the trailing ones; check
    # the emitted rows agree with a batch recompute restricted to same keys
    assert set(got.columns) == {"window_start", "x", "y", "n", "avg_value"}
    assert (got["n"] >= 1).all()


def test_media_metadata_sniffing(spark):
    png = png_encode(np.full((4, 6, 3), 7, np.uint8))
    rows = [
        (0, bytearray(png)),
        (1, bytearray(b"\xff\xd8\xff rest-of-jpeg")),
        (2, bytearray(b"OggS audio")),
        (3, bytearray(b"random bytes")),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "media"])
    out = with_media_metadata(df).toPandas().set_index("doc_id")
    assert out.loc[0, "media_type"] == "image/png"
    assert (out.loc[0, "width"], out.loc[0, "height"], out.loc[0, "channels"]) == (6, 4, 3)
    assert out.loc[1, "media_type"] == "image/jpeg"
    assert out.loc[2, "media_type"] == "audio/ogg"
    assert out.loc[3, "media_type"] == "application/octet-stream"


def test_image_features_real_png_and_stub(spark):
    png = png_encode(np.full((8, 8, 3), 100, np.uint8))
    df = spark.createDataFrame([(0, bytearray(png)), (1, bytearray(b"not-an-image"))], ["doc_id", "media"])
    out = extract_image_features(df).toPandas().set_index("doc_id")
    np.testing.assert_allclose(out.loc[0, "mean_rgb"], [100.0, 100.0, 100.0])
    assert abs(out.loc[0, "brightness"] - 100 / 255) < 1e-6
    assert len(out.loc[0, "embedding8"]) == 8
    # stub decode is deterministic
    out2 = extract_image_features(df).toPandas().set_index("doc_id")
    assert list(out.loc[1, "embedding8"]) == list(out2.loc[1, "embedding8"])


def test_frame_sampling_offsets(spark):
    blob = bytearray(b"\x00" * 10240)  # 10 "frames"
    df = spark.createDataFrame([(5, blob)], ["doc_id", "media"])
    out = frame_sample_video(df, every_n=3).toPandas()
    assert out["frame_idx"].tolist() == [0, 3, 6, 9]
    assert out["frame_offset_bytes"].tolist() == [0, 3072, 6144, 9216]
    assert (out["frame"] == "STUB_FRAME_NO_CODEC").all()


def test_media_jpeg_real_decode_and_metadata(spark):
    """JPEG blobs now decode for real (functions/jpeg.py): metadata carries
    true dimensions from the SOF header and feature extraction sees the
    actual pixels, not the deterministic fake."""
    import numpy as np
    import pandas as pd

    from versatiles_rs_spark.functions.jpeg import jpeg_encode
    from versatiles_rs_spark.multimodal.media import (
        decode_image_stub,
        extract_image_features,
        with_media_metadata,
    )

    img = np.full((24, 40, 3), 128, np.uint8)
    img[:, :20] = (255, 0, 0)
    blob = jpeg_encode(img, 90)
    assert np.abs(decode_image_stub(blob).astype(int) - img.astype(int)).mean() < 3.0
    df = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "media": [blob]}))
    meta = with_media_metadata(df).collect()[0]
    assert meta["media_type"] == "image/jpeg"
    assert meta["width"] == 40 and meta["height"] == 24 and meta["channels"] == 3
    feats = extract_image_features(df).collect()[0]
    # left half red, right half gray -> mean R > mean B
    assert feats["mean_rgb"][0] > feats["mean_rgb"][2]


def test_wav_decode_and_audio_features(spark):
    """WAV audio now decodes for REAL (stdlib RIFF walk): synthesized sine
    round-trips with known duration/RMS/ZCR; non-audio blobs yield
    null-feature rows with a stable schema."""
    import numpy as np
    import pandas as pd

    from versatiles_rs_spark.multimodal.media import (
        decode_wav,
        encode_wav,
        extract_audio_features,
    )

    rate = 8000
    t = np.arange(rate)  # 1 second
    sine = 0.5 * np.sin(2 * np.pi * 440 * t / rate)
    blob = encode_wav(rate, sine)
    r2, x = decode_wav(blob)
    assert r2 == rate and len(x) == rate
    assert abs(np.sqrt(np.mean(x * x)) - 0.5 / np.sqrt(2)) < 1e-3  # sine RMS
    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2], "media": [blob, b"not audio at all"],
    }))
    rows = {r["doc_id"]: r for r in extract_audio_features(df).collect()}
    good = rows[1]
    assert good["sample_rate"] == rate and good["n_samples"] == rate
    assert abs(good["duration_s"] - 1.0) < 1e-9
    assert abs(good["rms"] - 0.3536) < 1e-3
    # 440 Hz sine crosses zero ~880 times/sec -> zcr ~ 880/8000
    assert abs(good["zero_crossing_rate"] - 880 / 8000) < 0.01
    assert rows[2]["sample_rate"] is None  # non-WAV -> nulls, not a crash


def test_multimodal_real_webp_avif_decode():
    """Round 3: webp/avif blobs in the multimodal path decode for REAL
    through the system-library bindings (no more deterministic fake for
    these formats when the libs are present)."""
    import pytest as _pytest

    from versatiles_rs_spark.functions.avif_native import HAS_AVIF, avif_encode
    from versatiles_rs_spark.functions.webp_native import HAS_WEBP, webp_encode
    from versatiles_rs_spark.multimodal.media import decode_image_stub

    if not (HAS_WEBP and HAS_AVIF):
        _pytest.skip("system image codecs absent")
    img = np.zeros((16, 16, 3), np.uint8)
    img[:, :, 0] = 200
    w = decode_image_stub(webp_encode(img, quality=None))
    assert w.shape[:2] == (16, 16) and abs(int(w[0, 0, 0]) - 200) < 2
    a = decode_image_stub(avif_encode(img, quality=90))
    assert a.shape[:2] == (16, 16) and abs(int(a[0, 0, 0]) - 200) < 12
