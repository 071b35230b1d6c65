"""robots.txt policy filtering — the crawl-compliance op.

A crawl pipeline must drop pages fetched from paths a host's robots.txt
disallows (compliance re-checks run over the whole corpus when policies
change). Formulated relationally, Google-spec semantics
(REP, RFC 9309), including the spec's pattern language:

- ``parse_robots`` turns (host, robots.txt bytes) rows into a RULES table
  ``(host, rule, prefix, pattern)`` for the targeted user-agent group —
  an Arrow-batched transform over the (tiny: one row per host) config
  table. ``pattern`` is the rule value translated to an anchored regex
  implementing RFC 9309 §2.2.2/2.2.3: ``*`` matches any octet sequence,
  a trailing ``$`` anchors at end-of-path, everything else is literal.
- ``apply_robots`` joins pages to rules on host with the regex match and
  picks the winner per page row-locally: longest rule VALUE wins (the
  spec's most-specific-match order), allow beats disallow on ties, no
  matching rule means allowed. The rules table is broadcast (hosts ≪
  pages); the pages side never shuffles.

User-agent group selection follows the REP product-token rule: the
crawler agent is reduced to its leading product token (``MyBot/1.0`` →
``mybot``) and a group applies when its name is a case-insensitive
prefix of that token; among matching names the longest wins, with ``*``
as the fallback group.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from versatiles_rs_spark.pages.urls import host_of

RULES_SCHEMA = StructType(
    [
        StructField("host", StringType()),
        StructField("rule", StringType()),  # 'allow' | 'disallow'
        StructField("prefix", StringType()),  # raw rule value (specificity key)
        StructField("pattern", StringType()),  # anchored regex (match key)
    ]
)

# Leading product token of a crawler user-agent, per the REP grammar
# (letters, digits, '-' and '_'; Google's matcher uses the same set).
_TOKEN_RE = re.compile(r"[a-zA-Z0-9_-]*")


def _agent_token(agent: str) -> str:
    return _TOKEN_RE.match(agent).group(0).lower()


def rule_regex(value: str) -> str:
    """RFC 9309 rule value -> anchored regex, valid in BOTH Java regex
    (Spark's rlike/regexp) and Python ``re``: ``*`` -> ``.*``, a trailing
    ``$`` -> end anchor, all other octets escaped literally. A ``$``
    anywhere but the end is a literal octet (Google REP behavior)."""
    anchored = value.endswith("$")
    core = value[:-1] if anchored else value
    pat = "^" + ".*".join(re.escape(part) for part in core.split("*"))
    return pat + "$" if anchored else pat


def parse_robots_text(text: str, agent: str = "*") -> list[tuple[str, str]]:
    """robots.txt body -> [(rule, value)] for the given user-agent.

    Group semantics per RFC 9309: consecutive User-agent lines open a
    group; a group name applies when it is a case-insensitive prefix of
    the crawler's product token; the longest matching name wins (all
    groups bearing that name merge); ``*`` groups are the fallback;
    empty Disallow means allow-all.
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
    token = _agent_token(agent)
    # Most specific matching group name: longest name that prefixes the
    # crawler token. Names are themselves reduced to their product token
    # before comparison ('mybot/2.1' in a UA line still groups 'mybot').
    best = ""
    for agents, _ in groups:
        for a in agents:
            name = _agent_token(a)
            if name and token.startswith(name) and len(name) > len(best):
                best = name
    if best:
        return [
            r
            for agents, rules in groups
            if any(_agent_token(a) == best for a in agents)
            for r in rules
        ]
    return [r for agents, rules in groups if "*" in agents for r in rules]


def robots_allowed(path: str, rules: list[tuple[str, str]]) -> bool:
    """Pure-python winner selection over ``parse_robots_text`` output —
    the single-node parity twin of ``apply_robots`` (same regexes, same
    longest-value / allow-on-tie order)."""
    best: tuple[int, int] | None = None  # (value_len, allow_bit)
    for rule, value in rules:
        if re.match(rule_regex(value), path):
            key = (len(value), 1 if rule == "allow" else 0)
            if best is None or key > best:
                best = key
    return best is None or best[1] == 1


def parse_robots(robots: DataFrame, agent: str = "*") -> DataFrame:
    """(host, robots binary) -> rules table (host, rule, prefix, pattern)."""

    def parse(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for host, blob in zip(pdf["host"], pdf["robots"]):
                for rule, value in parse_robots_text(bytes(blob).decode("utf-8", "replace"), agent):
                    rows.append((host, rule, value, rule_regex(value)))
            yield pd.DataFrame(rows, columns=["host", "rule", "prefix", "pattern"])

    return robots.mapInPandas(parse, RULES_SCHEMA)


def apply_robots(pages: DataFrame, rules: DataFrame, url_col: str = "url") -> DataFrame:
    """Append an ``allowed`` flag: longest-rule-value winner per page
    (allow beats disallow on equal length), hosts without rules allowed.

    Zero pages-side shuffle: rules collapse to ONE array row per host
    (tiny aggregation on the rules side only), broadcast-join on host, and
    the winner is picked ROW-LOCALLY with array higher-order functions —
    each matching rule maps to a sortable key ``lpad(value_len) ||
    allow-bit`` and ``array_max`` selects it, so no window, no exchange,
    no row explosion ever touches the pages table. The match itself is
    ``F.regexp`` against the precompiled RFC 9309 pattern, still inside
    codegen."""
    u = F.col(url_col)
    path = F.regexp_replace(
        F.regexp_replace(u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/]*", ""), "^$", "/"
    )
    per_host = rules.groupBy("host").agg(
        F.collect_list(F.struct("prefix", "rule", "pattern")).alias("_rules")
    ).withColumnRenamed("host", "_host")
    pg = pages.withColumn("_host", host_of(u)).withColumn("_path", path)
    joined = pg.join(F.broadcast(per_host), "_host", "left")
    # sortable winner key: 4-digit rule-value length, then '1' for allow so
    # the max at equal length is the allow rule
    matched = F.filter(
        F.coalesce(F.col("_rules"), F.array()),
        lambda r: F.regexp(F.col("_path"), r["pattern"]),
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
