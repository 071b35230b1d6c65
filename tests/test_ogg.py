"""Ogg container demux (multimodal/ogg.py)."""

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from versatiles_rs_spark.multimodal.ogg import encode_minimal_ogg, parse_ogg


def test_roundtrip_packets_and_identification():
    packets = [bytes([i] * (40 + i * 3)) for i in range(6)]
    blob = encode_minimal_ogg(packets, sample_rate=22050, channels=1)
    meta = parse_ogg(blob)
    assert meta["codec"] == "vorbis"
    assert meta["channels"] == 1
    assert meta["sample_rate"] == 22050
    assert meta["n_packets"] == 1 + 6  # id header + data packets
    # packet ranges slice the original payloads back out
    for (off, size), want in zip(meta["packets"][1:], packets):
        assert blob[off : off + size] == want
    assert meta["duration_s"] == pytest.approx(6000 / 22050)


def test_long_packet_lacing_continuation():
    """A packet > 255 bytes uses 255-continuation lacing; reassembly must
    join segments."""
    packets = [b"\xab" * 700]  # lacing [255, 255, 190]
    blob = encode_minimal_ogg(packets)
    meta = parse_ogg(blob)
    off, size = meta["packets"][1]
    assert size == 700
    assert blob[off : off + size] == packets[0]


def test_exact_255_multiple_packet():
    """A 510-byte packet needs a trailing 0 lacing value."""
    packets = [b"\x11" * 510]
    blob = encode_minimal_ogg(packets)
    meta = parse_ogg(blob)
    off, size = meta["packets"][1]
    assert size == 510 and blob[off : off + size] == packets[0]


def test_rejects_garbage():
    for bad in (b"", b"NotOgg...", b"OggS" + b"\x01" + b"\x00" * 30):
        with pytest.raises(ValueError):
            parse_ogg(bad)


@settings(max_examples=30, deadline=None)
@given(packets=st.lists(st.binary(min_size=0, max_size=600), min_size=1, max_size=8))
def test_roundtrip_any_packets(packets):
    blob = encode_minimal_ogg(packets)
    meta = parse_ogg(blob)
    assert meta["n_packets"] == len(packets) + 1
    for (off, size), want in zip(meta["packets"][1:], packets):
        assert blob[off : off + size] == want


def test_audio_features_ogg_metadata(spark):
    from versatiles_rs_spark.multimodal.media import extract_audio_features

    blob = encode_minimal_ogg([b"\x01" * 50, b"\x02" * 60], sample_rate=48000, channels=2)
    df = spark.createDataFrame(pd.DataFrame({"doc_id": [5], "media": [blob]}))
    row = extract_audio_features(df).collect()[0]
    assert row["sample_rate"] == 48000
    assert row["n_channels"] == 2
    assert row["duration_s"] == pytest.approx(2000 / 48000)
    assert row["rms"] is None  # honest: no Vorbis decoder
