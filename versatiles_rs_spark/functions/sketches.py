"""Mergeable distinct-count sketches (HyperLogLog) as relational state.

Spark's ``approx_count_distinct`` is HLL++ but its sketch is opaque —
it cannot be persisted per crawl snapshot and merged later, which is
the operation an incremental 100 TB pipeline actually needs ("distinct
URLs ever seen", updated per batch like dedup/snapshots.py updates the
fingerprint store). This module keeps the sketch as DATA: a
(group, bucket, max_rho) relation, so

- building it is one map-side-combined groupBy (bounded output:
  m = 2^p rows per group at ANY corpus size),
- merging two snapshots is ``union -> groupBy -> max`` (the HLL merge
  law), again bounded,
- and the whole computation is integer-exact and cross-engine
  reproducible (the DuckDB oracle recomputes identical registers).

Hash: the first 15 hex digits of md5 (60 bits, the engine's standard
cross-engine hash bridge — Spark ``conv(substr(md5(x),1,15),16,10)`` ==
DuckDB ``CAST('0x'||substr(md5(x),1,15) AS BIGINT)``). Register index =
``h % m``; rho = leading-zero count of the remaining 60-p bits + 1,
computed EXACTLY via bit-length: ``rho = (60 - p) - length(bin(w)) + 1``
for w > 0 (no float log2 anywhere).

The estimator (``hll_estimate``) is the standard alpha_m * m^2 /
sum(2^-rho) with the small-range linear-counting correction; it runs
driver-side over the m-row register table and is validated for accuracy
in pytest (the oracle attests the registers, which determine the
estimate).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _hash60(col):
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast("bigint")


def hll_registers(
    df: DataFrame, group_cols: list[str], value_col: str, p: int = 7
) -> DataFrame:
    """(group_cols..., bucket, max_rho): the HLL sketch of
    ``count(distinct value_col)`` per group, m = 2^p registers.

    Only MATERIALIZED buckets appear (absent bucket == register 0);
    keeps the relation sparse and the merge law a plain groupBy-max.
    """
    m = 1 << p
    h = _hash60(F.col(value_col))
    # h >> p, NOT h/m: bigint/int division goes through double and loses
    # exactness above 2^53 (h is up to 60 bits).
    w = F.shiftright(h, p)
    rho = F.when(
        F.col("_w") > 0, F.lit(60 - p + 1) - F.length(F.bin(F.col("_w")))
    ).otherwise(F.lit(60 - p + 1))
    return (
        df.select(*group_cols, (h % F.lit(m)).alias("bucket"), w.alias("_w"))
        .select(*group_cols, "bucket", rho.alias("rho"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("max_rho"))
    )


def hll_merge(sketches: list[DataFrame], group_cols: list[str]) -> DataFrame:
    """Merge snapshot sketches: union -> max per (group, bucket)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy(*group_cols, "bucket").agg(
        F.max("max_rho").alias("max_rho")
    )


def hll_estimate(registers: list[int], p: int = 7) -> float:
    """Standard HLL estimate from a dense register list (driver-side,
    m values; absent buckets passed as 0). Small-range correction:
    linear counting when E <= 2.5m and zero registers exist."""
    m = 1 << p
    assert len(registers) == m
    alpha = 0.7213 / (1 + 1.079 / m) if m >= 128 else {16: 0.673, 32: 0.697, 64: 0.709}[m]
    e = alpha * m * m / sum(2.0 ** -r for r in registers)
    zeros = registers.count(0)
    if e <= 2.5 * m and zeros:
        e = m * math.log(m / zeros)
    return e


def hll_estimate_df(sketch: DataFrame, group_cols: list[str], p: int = 7) -> dict:
    """Collect the (bounded) sketch and estimate per group."""
    m = 1 << p
    rows = sketch.collect()
    groups: dict[tuple, list[int]] = {}
    for r in rows:
        key = tuple(r[c] for c in group_cols)
        groups.setdefault(key, [0] * m)[r["bucket"]] = max(
            groups.setdefault(key, [0] * m)[r["bucket"]], r["max_rho"]
        )
    return {k: hll_estimate(v, p) for k, v in groups.items()}


# ---------------------------------------------------------------------------
# Count-min sketch: mergeable heavy-hitter state as a relation.
# ---------------------------------------------------------------------------
#
# d hash rows x w buckets of COUNTS. Like the HLL above, the sketch is
# kept as DATA — (group, row, bucket, cnt) — so building is one bounded
# groupBy (<= d*w rows per group at ANY corpus size), merging snapshots
# is union -> groupBy -> SUM (counts are additive), and a point estimate
# is min over the d rows' buckets. Hash rows derive from the same 60-bit
# md5 bridge: row i uses an RK-affine recombination of the two 30-bit
# halves (pairwise-independent family), so the DuckDB oracle recomputes
# identical buckets.


def cms_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    d: int = 4,
    w: int = 256,
    weight_col: str | None = None,
) -> DataFrame:
    """(group_cols..., row, bucket, cnt): count-min sketch of value
    frequencies (or weight sums) per group."""
    h = _hash60(F.col(value_col))
    lo = h % F.lit(1 << 30)
    hi = F.shiftright(h, 30)
    wcol = F.col(weight_col) if weight_col else F.lit(1)
    rows = None
    for i in range(d):
        # row-i hash: (lo + (i+1)*hi) mod w  — affine in (lo, hi)
        b = (lo + F.lit(i + 1) * hi) % F.lit(w)
        r = df.select(
            *group_cols, F.lit(i).alias("row"), b.alias("bucket"),
            wcol.alias("_w"),
        )
        rows = r if rows is None else rows.unionByName(r)
    return rows.groupBy(*group_cols, "row", "bucket").agg(
        F.sum("_w").alias("cnt")
    )


def cms_merge(sketches: list[DataFrame], group_cols: list[str]) -> DataFrame:
    """Merge snapshot sketches: union -> sum per (group, row, bucket)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy(*group_cols, "row", "bucket").agg(
        F.sum("cnt").alias("cnt")
    )


def cms_estimate(
    sketch: DataFrame, probes: DataFrame, group_cols: list[str],
    value_col: str, d: int = 4, w: int = 256,
) -> DataFrame:
    """Point-estimate each probe value's count against the sketch:
    min over the d rows (the CMS upper-bound estimator). The probe set
    is the small side — its (row, bucket) keys join the bounded sketch
    relation; the corpus is not touched."""
    h = _hash60(F.col(value_col))
    lo = h % F.lit(1 << 30)
    hi = F.shiftright(h, 30)
    keys = None
    for i in range(d):
        b = (lo + F.lit(i + 1) * hi) % F.lit(w)
        r = probes.select(
            *group_cols, F.col(value_col), F.lit(i).alias("row"), b.alias("bucket")
        )
        keys = r if keys is None else keys.unionByName(r)
    joined = keys.join(F.broadcast(sketch), on=[*group_cols, "row", "bucket"], how="left")
    return (
        joined.fillna(0, subset=["cnt"])
        .groupBy(*group_cols, value_col)
        .agg(F.min("cnt").alias("est"))
    )


# ---------------------------------------------------------------------------
# Log-bucket quantile histogram (DDSketch-flavored, integer-exact).
# ---------------------------------------------------------------------------
#
# Third member of the mergeable-sketch family: quantiles. Values are
# 1e6-quantized to int64, then bucketed by (octave, mantissa-eighth):
# octave = bit_length(qv), mantissa = top 3 bits after the leading one —
# a base-2^(1/8) geometric grid (~9% relative width) computed ENTIRELY
# with bit ops (bin-length + shifts; no float log anywhere, so the
# DuckDB oracle recomputes identical buckets). qv < 8 gets exact unit
# buckets. Bounded (<= 8*63 + 8 ids), additive merges, driver-side
# quantile estimation from the cumulated histogram.


def log_histogram(
    df: DataFrame, group_cols: list[str], value_col: str
) -> DataFrame:
    """(group_cols..., bucket_id, cnt): geometric-grid histogram of the
    1e6-quantized positive values of ``value_col``."""
    qv = F.round(F.col(value_col).cast("double") * 1e6).cast("bigint")
    d = df.select(*group_cols, qv.alias("qv")).filter(F.col("qv") > 0)
    b = F.length(F.bin(F.col("qv")))
    bucket = F.when(F.col("qv") < 8, F.col("qv")).otherwise(
        b.cast("bigint") * 8 + F.expr("shiftright(qv, length(bin(qv)) - 4)") % 8
    )
    return (
        d.select(*group_cols, bucket.alias("bucket_id"))
        .groupBy(*group_cols, "bucket_id")
        .agg(F.count("*").alias("cnt"))
    )


def quantile_estimate(
    buckets: list[tuple[int, int]], qs: list[float]
) -> list[float]:
    """Estimate quantiles from (bucket_id, cnt) pairs of one group.
    Bucket representative = geometric midpoint of its bounds, back in
    the original (un-quantized) unit."""
    import math

    def bounds(bid: int) -> tuple[float, float]:
        if bid < 8:
            return float(bid), float(bid)
        b, m = divmod(bid, 8)
        lo = (8 + m) * 2.0 ** (b - 4)
        hi = (9 + m) * 2.0 ** (b - 4)
        return lo, hi

    items = sorted(buckets)
    total = sum(c for _, c in items)
    out = []
    for q in qs:
        target = q * total
        run = 0
        val = bounds(items[-1][0])[1]
        for bid, c in items:
            run += c
            if run >= target:
                lo, hi = bounds(bid)
                val = math.sqrt(lo * hi) if lo > 0 else hi
                break
        out.append(val / 1e6)
    return out


def exact_percentiles(
    df: DataFrame,
    key_col: str,
    value_col: str,
    ps: tuple[int, ...] = (50, 90, 99),
) -> DataFrame:
    """EXACT per-group percentiles — the sort-based twin of
    ``log_histogram`` (which answers the same question approximately
    from a bounded sketch). percentile_disc semantics: the p-th
    percentile is the value at 1-based rank ceil(p*n/100) of the
    group's sorted values; values are 1e6-quantized int64 so both
    engines select the identical element, and rank ties among equal
    values cannot change the selected VALUE.

    Plan: ONE hash exchange on the group key feeds a window
    row_number + count (in-partition sort, never a global sort — the
    shard_shuffle discipline), then a bounded (|ps|-row) join keeps the
    ranked rows. Use the sketch when groups are huge and 1/16-octave
    error is fine; use this when the answer must be exact — the cost
    difference IS the sort.
    """
    qv = F.round(F.col(value_col).cast("double") * 1_000_000).cast("long")
    w = Window.partitionBy("k").orderBy("qv")
    ranked = (
        df.select(F.col(key_col).alias("k"), qv.alias("qv"))
        .select(
            "k", "qv",
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(Window.partitionBy("k")).alias("n"),
        )
    )
    spark = df.sparkSession
    pdf = spark.createDataFrame([(int(p),) for p in ps], "p bigint")
    return ranked.join(
        F.broadcast(pdf),
        F.col("rn") == F.expr("(p * n + 99) div 100"),
    ).select("k", "p", "qv")
