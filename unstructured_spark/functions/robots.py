"""robots.txt (RFC 9309) parsing and distributed URL filtering — the
politeness gate every crawl pipeline applies between the URL frontier
and fetching, and the provenance filter corpus builds re-apply when
honoring retroactive opt-outs.

Semantics implemented (RFC 9309 + the de-facto Googlebot extensions):

- groups: one or more ``User-agent:`` lines followed by
  ``Allow:``/``Disallow:`` rules; the group whose agent token matches
  the crawler (case-insensitive substring-token match, most specific
  token wins) applies, else the ``*`` group; a crawler matches at most
  ONE group.
- rule match: the URL path is matched against each rule pattern;
  ``*`` is a wildcard, a trailing ``$`` anchors at end; patterns are
  otherwise literal prefixes.
- decision: the MOST SPECIFIC matching rule wins — longest pattern in
  octets; on a length tie, Allow wins. No matching rule (or no
  applicable group, or an empty ``Disallow:``) = allowed.

Spark shape: robots.txt documents parse into a per-host RULE TABLE
(host, pattern, is_allow, rule_len, rule_regex) — a few dozen rows per
host, millions of hosts at crawl scale — and filtering is one
host-keyed equi-join of the URL table against it, a per-pair regex
evaluated JVM-side (``rlike`` with a column pattern), and a
``max_by`` over (rule_len, is_allow): no window over the URL corpus,
no Python in the per-URL path. The regex translation targets the
portable ``^literal.*literal$`` subset so a DuckDB oracle replays the
same matches.
"""

from __future__ import annotations

import re
from typing import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

RULES_SCHEMA = (
    "host string, pattern string, is_allow boolean, rule_len int,"
    " rule_regex string"
)


def parse_robots(text: str, agent: str = "*") -> list[tuple[str, bool]]:
    """The (pattern, is_allow) rules applying to ``agent`` — group
    selection per RFC 9309: the group with the longest agent token
    contained in ``agent`` (case-insensitive) wins; else the ``*``
    group; comments (#) and unknown directives are ignored; an empty
    Disallow contributes no rule (it means allow-all)."""
    agent_lc = agent.lower()
    groups: list[tuple[list[str], list[tuple[str, bool]]]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[str, bool]] = []
    in_rules = False

    def flush():
        nonlocal cur_agents, cur_rules, in_rules
        if cur_agents:
            groups.append((cur_agents, cur_rules))
        cur_agents, cur_rules, in_rules = [], [], False

    for raw in (text or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, val = line.split(":", 1)
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if in_rules:
                flush()
            cur_agents.append(val.lower())
        elif key in ("allow", "disallow"):
            in_rules = True
            if val:
                cur_rules.append((val, key == "allow"))
        # crawl-delay / sitemap / unknown: ignored, but they do end a
        # user-agent run (RFC: a group is agents + following rules)
        elif cur_agents:
            in_rules = True
    flush()

    best: list[tuple[str, bool]] | None = None
    best_len = -1
    star: list[tuple[str, bool]] | None = None
    for agents, rules in groups:
        for a in agents:
            if a == "*":
                if star is None:
                    star = rules
            elif a in agent_lc and len(a) > best_len:
                best, best_len = rules, len(a)
    if best is not None:
        return best
    return star if star is not None else []


def rule_regex(pattern: str) -> str:
    """Anchored regex for a robots rule pattern, in the dialect subset
    Java regex and RE2 (DuckDB) evaluate identically: ``*`` → ``.*``,
    a trailing ``$`` anchors, everything else is escaped literal."""
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    parts = [re.escape(p) for p in body.split("*")]
    return "^" + ".*".join(parts) + ("$" if anchored else "")


def robots_rules(
    robots: DataFrame,
    *,
    host_col: str = "host",
    text_col: str = "robots_txt",
    agent: str = "*",
) -> DataFrame:
    """(host, robots.txt text) → the RULE TABLE for ``agent``
    (``RULES_SCHEMA``). Map-only: each host's file parses
    independently; hosts with no applicable rules emit nothing (=
    everything allowed)."""
    import pandas as pd

    src = robots.select(host_col, text_col)
    cols = ["host", "pattern", "is_allow", "rule_len", "rule_regex"]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows: list[dict] = []
        for pdf in batches:
            for host, text in zip(pdf[host_col], pdf[text_col]):
                for pattern, is_allow in parse_robots(text or "", agent):
                    rows.append({
                        "host": host,
                        "pattern": pattern,
                        "is_allow": is_allow,
                        "rule_len": len(pattern),
                        "rule_regex": rule_regex(pattern),
                    })
                if len(rows) >= 4096:
                    yield pd.DataFrame(rows, columns=cols)
                    rows = []
        yield pd.DataFrame(rows, columns=cols)

    return src.mapInPandas(gen, RULES_SCHEMA)


def url_host(url: Column) -> Column:
    """Lowercased host of an absolute http(s) URL (port kept)."""
    return F.lower(F.regexp_extract(url, r"^[a-zA-Z][\w+.-]*://([^/?#]+)", 1))


def url_path(url: Column) -> Column:
    """Path+query of an absolute URL, '/' when absent — the string
    robots rules match against (query included, fragment excluded,
    per the de-facto standard)."""
    p = F.regexp_extract(url, r"^[a-zA-Z][\w+.-]*://[^/?#]*([^#]*)", 1)
    return F.when(p == "", F.lit("/")).otherwise(p)


def apply_robots(
    urls: DataFrame,
    rules: DataFrame,
    *,
    url_col: str = "url",
    broadcast_rules: bool = False,
) -> DataFrame:
    """Join each URL against its host's rules and decide per RFC 9309
    longest-match. Adds ``allowed`` (boolean) and ``matched_rule``
    (the winning pattern, NULL when no rule matched).

    Scale shape: one host-keyed equi-join (broadcast it for a bounded
    host set via ``broadcast_rules``; at web scale both sides hash on
    host — rules tables are tiny per host, so no skew beyond the
    hosts' own URL skew), the per-pair regex JVM-side, then ONE
    groupBy over the URL's own key — no window, no Python."""
    r = F.broadcast(rules) if broadcast_rules else rules
    u = urls.withColumn("_h", url_host(F.col(url_col))).withColumn(
        "_p", url_path(F.col(url_col))
    )
    joined = u.join(r, u["_h"] == r["host"], "left").withColumn(
        "_m",
        F.col("pattern").isNotNull() & F.expr("_p rlike rule_regex"),
    )
    out_cols = [c for c in urls.columns]
    # winner = max (rule_len, is_allow): longest pattern, allow on tie
    win = F.max_by(
        F.struct(F.col("is_allow"), F.col("pattern")),
        F.when(
            F.col("_m"),
            F.col("rule_len") * 2 + F.col("is_allow").cast("int"),
        ),
    )
    return (
        joined.groupBy(*[urls[c] for c in out_cols])
        .agg(win.alias("_w"))
        .select(
            *out_cols,
            F.coalesce(F.col("_w.is_allow"), F.lit(True)).alias("allowed"),
            F.col("_w.pattern").alias("matched_rule"),
        )
    )
