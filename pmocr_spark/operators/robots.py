"""robots.txt parsing + RFC 9309 longest-match URL admission.

pmOCR itself has no crawl-policy stage (it converts files already on
disk), but the north rule's extraction pipeline sits immediately
downstream of a web crawl, where robots evaluation is the canonical
URL admission filter: CommonCrawl fetches and honors robots.txt per
host, and corpus-curation stacks re-apply it when policies change
between crawl and training. Semantics follow RFC 9309 (public):

  * group selection — the group whose ``User-agent`` token is the
    LONGEST case-insensitive substring match for the product token
    wins; ``*`` is the fallback group; consecutive UA lines share one
    group.
  * rule matching — ``Allow``/``Disallow`` paths are octet-wise
    prefixes with ``*`` (any run) and ``$`` (end anchor) wildcards.
  * precedence — the rule with the MOST matched octets wins; on a
    tie, ``Allow`` wins. No matching rule (or no group) => allowed.
    An empty ``Disallow:`` matches nothing.

Spark-first shape (the blocklist.py twin, one tier up the stack):
  * ``rules_table``  — robots blobs -> (host, rule, allow, rlen) via
    ONE Arrow-batched parse pass (robots.txt files are tiny; the
    explode is bounded by total rule count, Heaps-law small).
  * ``evaluate``     — URLs x rules as a broadcast equi-join on host
    (the robots side of a crawl is ~hosts-sized, orders of magnitude
    below the URL side) + per-URL argmax on matched length; URLs on
    hosts with no rules pass through the left join untouched. No
    nested loop, no UDF in the match (prefix rules compile to
    ``startswith``; wildcard rules fall back to one regex per rule,
    still JVM-side).
  * ``longest_match_lit`` — pure-codegen literal form for small rule
    sets (the gate arm; keeps q40's 0-exchange pin): higher-order
    filter/transform over a literal array of (rule, allow) structs.

Under the driver gate as q40 part='robots' (prefix rules; the oracle
restates filter+argmax+tiebreak in DuckDB over the same literal rule
set). Wildcard matching, group selection, and the join form are
pinned by tests/test_robots.py against hand-stated RFC 9309 examples.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# driver/UDF-side parsing (pure python — robots.txt files are KB-sized)
# ---------------------------------------------------------------------------


def parse_robots(txt: str, agent: str = "*") -> list[tuple[str, bool]]:
    """Parse a robots.txt body into the [(path_rule, allow)] list of the
    group governing ``agent`` (RFC 9309 §2.2.1 group selection: longest
    matching user-agent token, ``*`` fallback). Empty-path rules are
    dropped (they match nothing). Lines that aren't UA/Allow/Disallow
    records (Sitemap, Crawl-delay, comments, garbage) are ignored —
    error-as-data, never an exception."""
    agent = agent.lower()
    groups: list[tuple[list[str], list[tuple[str, bool]]]] = []
    cur_agents: list[str] = []
    in_rules = False
    for raw in txt.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if in_rules or not groups:
                groups.append(([], []))
                in_rules = False
            groups[-1][0].append(val.lower())
        elif key in ("allow", "disallow"):
            if not groups:
                continue  # rules before any UA line: no group, ignored
            in_rules = True
            if val:
                groups[-1][1].append((val, key == "allow"))
    best: list[tuple[str, bool]] | None = None
    best_len = -1
    for agents, rules in groups:
        for ua in agents:
            if ua == "*":
                if best_len < 0:
                    best = rules
            elif ua in agent and len(ua) > best_len:
                best, best_len = rules, len(ua)
    return list(best or [])


def _rule_regex(rule: str) -> re.Pattern:
    """Compile one RFC 9309 path rule to an anchored-prefix regex:
    ``*`` -> ``.*``, trailing ``$`` -> end anchor, everything else
    literal."""
    anchored = rule.endswith("$")
    body = rule[:-1] if anchored else rule
    pat = ".*".join(re.escape(p) for p in body.split("*"))
    return re.compile("^" + pat + ("$" if anchored else ""))


def match_len(rule: str, path: str) -> int:
    """Octets of ``rule`` that match ``path`` per RFC 9309 precedence
    (-1 if the rule doesn't match). For wildcard-free rules this is the
    prefix length; wildcards count the rule's own specified octets (the
    reference robotstxt library's tie measure)."""
    if "*" not in rule and not rule.endswith("$"):
        return len(rule) if path.startswith(rule) else -1
    return len(rule) if _rule_regex(rule).match(path) else -1


def evaluate_path(rules: list[tuple[str, bool]], path: str) -> bool:
    """True (allowed) per longest-match / allow-wins-ties / default-allow."""
    matched = [(match_len(r, path), a) for r, a in rules]
    matched = [(m, a) for m, a in matched if m >= 0]
    if not matched:
        return True
    top = max(m for m, _ in matched)
    return any(a for m, a in matched if m == top)


# ---------------------------------------------------------------------------
# relational form
# ---------------------------------------------------------------------------


def rules_table(
    robots: DataFrame,
    host_col: str = "host",
    content_col: str = "content",
    agent: str = "*",
) -> DataFrame:
    """robots.txt blobs -> (host, rule:string, allow:int, rlen:int,
    wildcard:int). One Arrow-batched parse pass + one explode bounded
    by total rule count. ``content`` may be binary or string."""
    import pandas as pd
    from pyspark.sql import types as T

    out_t = T.ArrayType(
        T.StructType(
            [
                T.StructField("rule", T.StringType()),
                T.StructField("allow", T.IntegerType()),
            ]
        )
    )

    @F.pandas_udf(out_t)
    def parse(content):
        res = []
        for body in content:
            if body is None:
                res.append([])
                continue
            if isinstance(body, (bytes, bytearray)):
                body = bytes(body).decode("utf-8", "replace")
            res.append([(r, int(a)) for r, a in parse_robots(body, agent)])
        return pd.Series(res, dtype=object)

    r = F.col("r")
    return (
        robots.select(F.col(host_col).alias("host"), F.explode(parse(F.col(content_col))).alias("r"))
        .select(
            "host",
            r["rule"].alias("rule"),
            r["allow"].alias("allow"),
            F.length(r["rule"]).alias("rlen"),
            (r["rule"].contains("*") | r["rule"].endswith("$")).cast("int").alias("wildcard"),
        )
    )


def evaluate(
    urls: DataFrame,
    rules: DataFrame,
    host_col: str = "host",
    path_col: str = "path",
    broadcast_rules: bool = True,
) -> DataFrame:
    """urls + rules_table output -> urls with an ``allowed`` int column.

    Broadcast equi-join on host (rules side is hosts-sized — tiny next
    to a URL corpus; pass broadcast_rules=False past the broadcast
    budget and it becomes a plain keyed shuffle join, still never a
    nested loop). Prefix rules match via ``startswith`` (codegen);
    wildcard rules via per-row regex built from the rule column —
    JVM-side, no Python. Longest-match argmax + allow-wins tiebreak as
    one map-side-combinable max over an encoded (mlen, allow) word;
    hosts without rules (or with no matching rule) default to allowed."""
    r = F.broadcast(rules) if broadcast_rules else rules
    u = urls.select(F.col(host_col).alias("host"), F.col(path_col).alias("path")).distinct()
    path = F.col("path")
    # regex translation of the rule, computed from the rule column:
    # escape regex metachars, then * -> .*, trailing $ -> anchor
    esc = F.regexp_replace(F.col("rule"), r"([.^$+?()\[\]{}|\\])", r"\\$1")
    wild = F.regexp_replace(esc, r"\*", ".*")
    # trailing escaped \$ back to an end anchor (replacement $ must
    # itself be escaped — bare $ is a group reference in Java regex)
    rx = F.concat(F.lit("^"), F.regexp_replace(wild, r"\\\$$", r"\$"))
    hit = F.when(F.col("wildcard") == 0, path.startswith(F.col("rule"))).otherwise(
        F.regexp_like(path, rx)
    )
    # encode (match_len, allow) into one word so argmax+tiebreak is a
    # single max(): mlen * 2 + allow — longer match dominates, allow
    # wins equal lengths
    word = F.max(F.when(hit, F.col("rlen") * 2 + F.col("allow"))).alias("w")
    verdicts = (
        u.join(r, "host", "left")
        .groupBy("host", "path")
        .agg(word)
        .select(
            "host",
            "path",
            F.when(F.col("w").isNull(), F.lit(1))
            .otherwise((F.col("w") % 2 == 1).cast("int"))
            .alias("allowed"),
        )
    )
    return urls.join(
        verdicts.withColumnRenamed("host", host_col).withColumnRenamed("path", path_col),
        [host_col, path_col],
        "left",
    ).withColumn("allowed", F.coalesce(F.col("allowed"), F.lit(1)))


# ---------------------------------------------------------------------------
# literal codegen form (small rule sets; the q40 gate arm)
# ---------------------------------------------------------------------------


def _lit_rules(rules: list[tuple[str, int]]):
    return F.array(
        *[
            F.struct(F.lit(r).alias("r"), F.lit(int(a)).alias("a"))
            for r, a in rules
        ]
    )


def longest_match_lit(path, rules: list[tuple[str, int]]):
    """(n_matched, best_len, allow) Column triple for a literal
    prefix-rule set — pure higher-order-function codegen, map-only
    (q40's 0-exchange pin carries it). Wildcards belong to the
    relational form; literal rules here are plain prefixes."""
    m = F.filter(_lit_rules(rules), lambda e: path.startswith(e["r"]))
    best = F.coalesce(F.array_max(F.transform(m, lambda e: F.length(e["r"]))), F.lit(0))
    allow = F.when(F.size(m) == 0, F.lit(1)).otherwise(
        F.array_max(
            F.transform(
                F.filter(m, lambda e: F.length(e["r"]) == best), lambda e: e["a"]
            )
        )
    )
    return F.size(m), best, allow
