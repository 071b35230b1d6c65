"""Bloom-filter URL-seen test — the crawl-frontier membership primitive.

A 10^12-document crawl cannot afford an exact `url IN seen_set` join for
every candidate URL: the seen-set is corpus-sized and the join shuffles
both sides. The standard fix (CACM 1970 Bloom filter; used by every
production crawler since Mercator, see Heydon & Najork, WWW 1999) is a
fixed-size bit array that answers "definitely new" with zero error and
"maybe seen" with a bounded false-positive rate — so the expensive exact
join runs only over the tiny maybe-seen subset.

Relational formulation (scale shape):
- the filter is a DISTINCT over hash positions — bounded by m (the bit
  count) REGARDLESS of corpus size, so it aggregates map-side and
  broadcasts everywhere;
- probes explode to k positions and equi-join the bit table (AQE
  broadcasts it — nothing corpus-sized shuffles);
- the exact verification join runs ONLY over probes whose k positions
  all hit (`maybe_seen`), i.e. true-seen plus the false-positive sliver,
  never the full probe stream.

No false negatives is a THEOREM of the construction; `url_seen_stats`
surfaces it as data: the (truly_seen AND NOT maybe_seen) class must be
empty, and the oracle twin checks that cross-engine.

Cross-engine determinism: the position hashes are pure integer math —
the same Rabin-Karp Horner hash as dedup/substrings.py (base 131 mod
2^31-1) composed with k affine maps (Knuth/xxhash multiplicative
constants; products stay < 2^63, exact in BIGINT on both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from versatiles_rs_spark.dedup.substrings import RK_B, RK_P

BLOOM_M = 16384  # bits; 2 KiB of filter state per 2^14 positions

# the documents table carries no url column; both engines synthesize the
# same deterministic url from (source, doc_id) — unique per document
URL_SPARK = "'https://www.' || source || '.example.com/p/' || cast(doc_id as string)"
URL_DUCK = "'https://www.' || source || '.example.com/p/' || CAST(doc_id AS VARCHAR)"
BLOOM_A = (2654435761, 2246822519, 3266489917)  # k = 3 affine multipliers
BLOOM_B = (0, 1013904223, 2027808446)


def _rk_hash_expr(col: str) -> str:
    """Spark SQL: Rabin-Karp Horner hash of a string column (exact BIGINT)."""
    return (
        f"aggregate(split({col}, ''), 0L, "
        f"(a, c) -> (a * {RK_B} + ascii(c)) % {RK_P})"
    )


def with_bloom_positions(
    df: DataFrame, col: str, out: str = "positions", m: int = BLOOM_M
) -> DataFrame:
    """Adds array<bigint> column `out` with the k bloom positions of `col`."""
    d = df.withColumn("_h", F.expr(_rk_hash_expr(col)))
    parts = ", ".join(
        f"((_h * {a}L + {b}L) % {RK_P}) % {m}" for a, b in zip(BLOOM_A, BLOOM_B)
    )
    return d.withColumn(out, F.expr(f"array({parts})")).drop("_h")


def bloom_bits(df: DataFrame, col: str, m: int = BLOOM_M) -> DataFrame:
    """The filter itself: DISTINCT hash positions of every value of `col`.
    Bounded by m rows regardless of input size — map-side combined and
    broadcastable."""
    return (
        with_bloom_positions(df, col, m=m)
        .select(F.explode("positions").alias("pos"))
        .distinct()
    )


def bloom_probe(
    probes: DataFrame,
    bits: DataFrame,
    col: str,
    m: int = BLOOM_M,
    keep: list[str] | None = None,
) -> DataFrame:
    """Adds boolean `maybe_seen`: true iff ALL k positions of `col` are set.

    The bit table is bounded by m rows regardless of corpus size, so it is
    collected (the one driver pull, <= m ints) and compiled into a LITERAL
    m-bit bitmap of m/64 longs — the probe stage is then a zero-shuffle
    whole-stage-codegen Project testing k bits per row (the same
    broadcast-literal pattern as the k-means assign stage). Nothing
    corpus-sized shuffles, joins, or touches the driver."""
    keep = keep if keep is not None else probes.columns
    words = [0] * ((m + 63) // 64)
    for r in bits.collect():  # bounded by m rows
        pos = int(r["pos"])
        words[pos // 64] |= 1 << (pos % 64)
    signed = [w - (1 << 64) if w >= (1 << 63) else w for w in words]
    bitmap = "array(" + ", ".join(f"{w}L" for w in signed) + ")"
    test = (
        f"forall(positions, p -> "
        f"(shiftright(element_at({bitmap}, cast(p div 64 as int) + 1), "
        f"cast(p % 64 as int)) & 1L) = 1L)"
    )
    return (
        with_bloom_positions(probes, col, m=m)
        .withColumn("maybe_seen", F.expr(test))
        .select(*keep, "maybe_seen")
    )


def url_seen_stats(docs: DataFrame, m: int = BLOOM_M) -> DataFrame:
    """Crawl-frontier dedup over the documents table, oracle-shaped.

    History = docs with doc_id % 3 == 0 (their urls are "already crawled");
    probes = the rest, where every 5th probe re-probes a HISTORY url
    (probe_url = url of doc_id - doc_id % 3) so the true-seen class is
    non-empty. Output: one row per (maybe_seen, truly_seen) class with
    n_urls and a sum(doc_id) checksum. The class (truly AND NOT maybe)
    must never appear — bloom filters have no false negatives — and the
    exact join runs only over the maybe_seen subset.
    """
    docs = docs.withColumn("url", F.expr(URL_SPARK))
    hist = docs.where("doc_id % 3 = 0").select("doc_id", "url")
    probe_base = (
        docs.where("doc_id % 3 != 0")
        .select(
            "doc_id",
            F.expr("doc_id - doc_id % 3").alias("_hk"),
            F.col("url").alias("_own_url"),
        )
        .join(
            hist.select(F.col("doc_id").alias("_hk"), F.col("url").alias("_hist_url")),
            "_hk",
            "left",
        )
        .select(
            "doc_id",
            F.expr(
                "CASE WHEN doc_id % 5 = 0 AND _hist_url IS NOT NULL "
                "THEN _hist_url ELSE _own_url END"
            ).alias("probe_url"),
        )
    )
    bits = bloom_bits(hist, "url", m=m)
    probed = bloom_probe(probe_base, bits, "probe_url", m=m, keep=["doc_id", "probe_url"])
    # exact verification ONLY over the maybe_seen sliver
    maybe = probed.where("maybe_seen")
    truly = (
        maybe.join(
            hist.select(F.col("url").alias("probe_url")).distinct(),
            "probe_url",
            "left_semi",
        )
        .select("doc_id")
        .withColumn("truly_seen", F.lit(True))
    )
    classed = (
        probed.join(truly, "doc_id", "left")
        .select(
            "doc_id",
            F.expr(
                "CASE WHEN NOT maybe_seen THEN 'definitely_new' "
                "WHEN truly_seen THEN 'seen' ELSE 'false_positive' END"
            ).alias("status"),
        )
    )
    return classed.groupBy("status").agg(
        F.count("*").alias("n_urls"),
        F.sum("doc_id").alias("id_checksum"),
    )


def url_seen_stats_sql(m: int = BLOOM_M, table: str = "documents") -> str:
    """DuckDB twin of `url_seen_stats` (identical classes and checksums)."""
    rk = (
        "list_reduce(list_prepend(0::BIGINT, "
        "list_transform(range(1, length(u) + 1), "
        "i -> CAST(ord(substr(u, i, 1)) AS BIGINT))), "
        f"(a, c) -> (a * {RK_B} + c) % {RK_P})"
    )
    pos_list = ", ".join(
        f"((h * {a} + {b}) % {RK_P}) % {m}" for a, b in zip(BLOOM_A, BLOOM_B)
    )
    k = len(BLOOM_A)
    return f"""
WITH du AS (
  SELECT doc_id, {URL_DUCK} AS url FROM {table}
), hist AS (
  SELECT doc_id, url FROM du WHERE doc_id % 3 = 0
), probe AS (
  SELECT d.doc_id,
         CASE WHEN d.doc_id % 5 = 0 AND h.url IS NOT NULL
              THEN h.url ELSE d.url END AS probe_url
  FROM du d
  LEFT JOIN hist h ON h.doc_id = d.doc_id - d.doc_id % 3
  WHERE d.doc_id % 3 != 0
), hh AS (
  SELECT url AS u, {rk} AS h FROM hist
), bits AS (
  SELECT DISTINCT unnest([{pos_list}]) AS pos FROM hh
), ph AS (
  SELECT doc_id, probe_url, probe_url AS u FROM probe
), ppos AS (
  SELECT doc_id, probe_url, unnest([{pos_list}]) AS pos
  FROM (SELECT doc_id, probe_url, {rk} AS h FROM ph)
), hits AS (
  SELECT doc_id, count(*) AS n_hits
  FROM ppos JOIN bits USING (pos) GROUP BY doc_id
), classed AS (
  SELECT p.doc_id,
         CASE WHEN coalesce(n_hits, 0) != {k} THEN 'definitely_new'
              WHEN EXISTS (SELECT 1 FROM hist WHERE hist.url = p.probe_url)
              THEN 'seen' ELSE 'false_positive' END AS status
  FROM probe p LEFT JOIN hits USING (doc_id)
)
SELECT status, count(*) AS n_urls,
       CAST(sum(doc_id) AS BIGINT) AS id_checksum
FROM classed GROUP BY status
"""
