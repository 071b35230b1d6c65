"""Bloom-filter URL-seen semantics (pages/bloom.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from versatiles_rs_spark.pages.bloom import (
    BLOOM_A,
    bloom_bits,
    bloom_probe,
    url_seen_stats,
)
from versatiles_rs_spark.session import get_spark

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    return get_spark(app_name="test-bloom", master="local[4]", shuffle_partitions=4)


def _urls(spark, urls):
    return spark.createDataFrame([(u,) for u in urls], "u string")


def test_no_false_negatives_even_at_tiny_m(spark):
    # every inserted url MUST probe maybe_seen=true, even with a saturated
    # 64-bit filter — false negatives are structurally impossible
    urls = [f"https://h{i}.example.com/p/{i}" for i in range(40)]
    hist = _urls(spark, urls)
    bits = bloom_bits(hist, "u", m=64)
    probed = bloom_probe(hist, bits, "u", m=64, keep=["u"])
    assert probed.where("NOT maybe_seen").count() == 0


def test_definitely_new_is_exact(spark):
    # maybe_seen=false rows are guaranteed absent from the history
    hist = _urls(spark, [f"https://a{i}.com/" for i in range(20)])
    probes = _urls(spark, [f"https://b{i}.net/" for i in range(200)])
    bits = bloom_bits(hist, "u", m=256)
    probed = bloom_probe(probes, bits, "u", m=256, keep=["u"])
    new = probed.where("NOT maybe_seen").select("u")
    assert new.join(hist, "u", "left_semi").count() == 0


def test_small_m_produces_false_positives_not_negatives(spark):
    # saturate a tiny filter: expect some false positives (probabilistic
    # but deterministic for fixed hashes/data), never a false negative
    hist = _urls(spark, [f"https://x{i}.org/" for i in range(60)])
    probes = _urls(spark, [f"https://y{i}.org/" for i in range(300)])
    bits = bloom_bits(hist, "u", m=64)
    probed = bloom_probe(probes, bits, "u", m=64, keep=["u"])
    fp = probed.where("maybe_seen").join(hist, "u", "left_semi").count()
    assert fp == 0  # disjoint sets: every maybe_seen is a false positive
    assert probed.where("maybe_seen").count() > 0


def test_url_seen_stats_classes(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    rows = {r["status"]: r for r in url_seen_stats(docs, m=512).collect()}
    assert set(rows) <= {"definitely_new", "seen", "false_positive"}
    # the re-probed history urls (doc_id % 5 == 0 among probes) are all seen
    n_expected_seen = docs.where(
        "doc_id % 3 != 0 AND doc_id % 5 = 0 AND (doc_id - doc_id % 3) % 3 = 0"
    ).count()
    assert rows["seen"]["n_urls"] == n_expected_seen


def test_k_positions_are_distinct_hashes(spark):
    assert len(set(BLOOM_A)) == len(BLOOM_A)
