"""robots.txt policy filtering — the crawl-compliance op.

A crawl pipeline must drop pages fetched from paths a host's robots.txt
disallows (compliance re-checks run over the whole corpus when policies
change). Formulated relationally, Google-spec semantics
(REP, RFC 9309):

- ``parse_robots`` turns (host, robots.txt bytes) rows into a RULES table
  ``(host, rule, prefix)`` for the targeted user-agent group — an
  Arrow-batched transform over the (tiny: one row per host) config table.
- ``apply_robots`` joins pages to rules on host with a prefix match and
  picks the winner per page with one window: longest prefix wins, allow
  beats disallow on ties, no matching rule means allowed. The rules table
  is broadcast (hosts ≪ pages); the pages side never shuffles.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType
from pyspark.sql.window import Window

from versatiles_rs_spark.pages.urls import host_of

RULES_SCHEMA = StructType(
    [
        StructField("host", StringType()),
        StructField("rule", StringType()),  # 'allow' | 'disallow'
        StructField("prefix", StringType()),
    ]
)


def parse_robots_text(text: str, agent: str = "*") -> list[tuple[str, str]]:
    """robots.txt body -> [(rule, prefix)] for the given user-agent group.

    Group semantics per RFC 9309: consecutive User-agent lines open a
    group; the most specific matching group applies (exact agent beats
    ``*``); empty Disallow means allow-all.
    """
    groups: list[tuple[list[str], list[tuple[str, str]]]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[str, str]] = []
    in_agents = True
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if not in_agents:
                groups.append((cur_agents, cur_rules))
                cur_agents, cur_rules = [], []
                in_agents = True
            cur_agents.append(val.lower())
        elif key in ("allow", "disallow"):
            in_agents = False
            if val:
                cur_rules.append((key, val))
            elif key == "disallow":
                pass  # empty Disallow: allow all (no rule)
    if cur_agents:
        groups.append((cur_agents, cur_rules))
    agent = agent.lower()
    exact = [r for agents, rules in groups if agent in agents for r in rules]
    if any(agent in agents for agents, _ in groups):
        return exact
    return [r for agents, rules in groups if "*" in agents for r in rules]


def parse_robots(robots: DataFrame, agent: str = "*") -> DataFrame:
    """(host, robots binary) -> rules table (host, rule, prefix)."""

    def parse(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for host, blob in zip(pdf["host"], pdf["robots"]):
                for rule, prefix in parse_robots_text(bytes(blob).decode("utf-8", "replace"), agent):
                    rows.append((host, rule, prefix))
            yield pd.DataFrame(rows, columns=["host", "rule", "prefix"])

    return robots.mapInPandas(parse, RULES_SCHEMA)


def apply_robots(pages: DataFrame, rules: DataFrame, url_col: str = "url") -> DataFrame:
    """Append an ``allowed`` flag: longest-prefix rule wins, allow beats
    disallow on equal length, hosts without rules are allowed.

    Zero pages-side shuffle: rules collapse to ONE array row per host
    (tiny aggregation on the rules side only), broadcast-join on host, and
    the winner is picked ROW-LOCALLY with array higher-order functions —
    each matching rule maps to a sortable key ``lpad(prefix_len) ||
    allow-bit`` and ``array_max`` selects it, so no window, no exchange,
    no row explosion ever touches the pages table."""
    u = F.col(url_col)
    path = F.regexp_replace(
        F.regexp_replace(u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/]*", ""), "^$", "/"
    )
    per_host = rules.groupBy("host").agg(
        F.collect_list(F.struct("prefix", "rule")).alias("_rules")
    ).withColumnRenamed("host", "_host")
    pg = pages.withColumn("_host", host_of(u)).withColumn("_path", path)
    joined = pg.join(F.broadcast(per_host), "_host", "left")
    # sortable winner key: 4-digit prefix length, then '1' for allow so the
    # max at equal length is the allow rule
    matched = F.filter(
        F.coalesce(F.col("_rules"), F.array()),
        lambda r: F.col("_path").startswith(r["prefix"]),
    )
    keys = F.transform(
        matched,
        lambda r: F.concat(
            F.lpad(F.length(r["prefix"]).cast("string"), 4, "0"),
            F.when(r["rule"] == "allow", F.lit("1")).otherwise(F.lit("0")),
        ),
    )
    best = F.array_max(keys)
    allowed = F.when(F.size(keys) == 0, F.lit(True)).otherwise(
        F.substring(best, 5, 1) == "1"
    )
    return joined.withColumn("allowed", allowed).drop("_host", "_path", "_rules")
