"""Fast-gzip variant (reference gzip.rs:52 parity)."""

import gzip

from versatiles_rs_spark.functions.compression import compress, compress_gzip_fast, decompress


def test_gzip_fast_roundtrip_and_determinism():
    data = b"payload " * 500
    fast = compress_gzip_fast(data)
    assert gzip.decompress(fast) == data
    assert decompress(fast, "gzip") == data
    assert compress_gzip_fast(data) == fast  # deterministic bytes
    # faster level trades ratio: still compresses, but not below level 9
    assert len(fast) < len(data)
    assert len(fast) >= len(compress(data, "gzip"))
