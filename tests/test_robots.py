"""robots.txt parsing + RFC 9309 evaluation (operators/robots.py):
group selection, wildcard/anchor matching, longest-match precedence
against a pure-python reference, the relational join form, and
literal-form == join-form regime parity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pmocr_spark.operators import robots as R

ROBOTS_TXT = """\
# crawl policy
User-agent: megabot
Disallow: /private
Allow: /private/pub

User-agent: *
Disallow: /tmp
Disallow: /cgi-bin/
Allow: /tmp/ok
Sitemap: https://example.com/sitemap.xml
"""


def test_parse_group_selection():
    # specific UA group beats the * fallback
    assert R.parse_robots(ROBOTS_TXT, "megabot/1.2") == [
        ("/private", False),
        ("/private/pub", True),
    ]
    # unknown agent falls back to *
    assert R.parse_robots(ROBOTS_TXT, "otherbot") == [
        ("/tmp", False),
        ("/cgi-bin/", False),
        ("/tmp/ok", True),
    ]


def test_parse_edge_cases():
    # consecutive UA lines share one group; rules before any UA are
    # ignored; empty Disallow matches nothing and is dropped
    txt = "Disallow: /orphan\nUser-agent: a\nUser-agent: b\nDisallow:\nDisallow: /x\n"
    assert R.parse_robots(txt, "a") == [("/x", False)]
    assert R.parse_robots(txt, "b") == [("/x", False)]
    assert R.parse_robots(txt, "c") == []  # no * group -> no rules


def test_match_semantics():
    # plain prefix
    assert R.match_len("/fish", "/fishheads") == 5
    assert R.match_len("/fish", "/Fish") == -1
    # * wildcard spans any run
    assert R.match_len("/*.php", "/index.php") == 6
    assert R.match_len("/*.php", "/index.html") == -1
    # $ anchors at the end
    assert R.match_len("/fish$", "/fish") == 6
    assert R.match_len("/fish$", "/fishheads") == -1


@pytest.mark.parametrize(
    ("rules", "path", "allowed"),
    [
        ([], "/anything", True),  # no rules -> allow
        ([("/p", False)], "/q", True),  # no match -> allow
        ([("/p", False)], "/p/x", False),
        ([("/p", False), ("/p/pub", True)], "/p/pub/1", True),  # longest wins
        # wildcard rule counts its own 6 octets > /page's 5 -> deny
        ([("/page", True), ("/*.htm", False)], "/page.htm", False),
        ([("/x", False), ("/x", True)], "/x/1", True),  # allow wins ties
    ],
)
def test_evaluate_path(rules, path, allowed):
    assert R.evaluate_path(rules, path) is allowed


def test_rfc_longest_match_example():
    # RFC 9309 §2.4.2-style: the most specific (most octets) rule wins
    rules = [("/example", True), ("/example/page/disallowed.gif", False)]
    assert R.evaluate_path(rules, "/example/page/disallowed.gif") is False
    assert R.evaluate_path(rules, "/example/page/ok.gif") is True


HOST_ROBOTS = [
    ("a.com", ROBOTS_TXT.encode()),
    ("b.com", b"User-agent: *\nDisallow: /*.php\nAllow: /shop*.php$\n"),
]
URLS = [
    ("a.com", "/tmp/x"),  # * group: denied
    ("a.com", "/tmp/ok/1"),  # allow override
    ("a.com", "/private/x"),  # megabot rule does NOT apply to * agent
    ("b.com", "/index.php"),  # wildcard deny
    ("b.com", "/shop1.php"),  # $-anchored allow (11 octets > 6)
    ("b.com", "/plain.html"),  # no match
    ("c.com", "/whatever"),  # no robots at all
]


@pytest.fixture(scope="module")
def verdicts(spark):
    robots_df = spark.createDataFrame(HOST_ROBOTS, "host string, content binary")
    urls_df = spark.createDataFrame(URLS, "host string, path string")
    rules = R.rules_table(robots_df, agent="*")
    out = R.evaluate(urls_df, rules)
    return {(r["host"], r["path"]): r["allowed"] for r in out.collect()}


def test_evaluate_join_form_matches_python(verdicts):
    py_rules = {h: R.parse_robots(c.decode(), "*") for h, c in HOST_ROBOTS}
    for host, path in URLS:
        expect = R.evaluate_path(py_rules.get(host, []), path)
        assert verdicts[(host, path)] == int(expect), (host, path)


def test_evaluate_expected_verdicts(verdicts):
    assert verdicts == {
        ("a.com", "/tmp/x"): 0,
        ("a.com", "/tmp/ok/1"): 1,
        ("a.com", "/private/x"): 1,
        ("b.com", "/index.php"): 0,
        ("b.com", "/shop1.php"): 1,
        ("b.com", "/plain.html"): 1,
        ("c.com", "/whatever"): 1,
    }


def test_literal_form_matches_join_form(spark):
    """Regime parity: the q40 literal codegen form and the relational
    join form agree on every path for a prefix-only rule set."""
    rules = [("/src0", 0), ("/src0/p3", 1), ("/src1/p", 0), ("/src1/p2", 1)]
    paths = [(f"/src{i}/p{j}{'/deep' if j % 2 else ''}",) for i in range(3) for j in range(5)]
    urls = spark.createDataFrame(paths, "path string").withColumn("host", F.lit("x"))
    _, _, allow = R.longest_match_lit(F.col("path"), rules)
    lit_v = {r["path"]: r["a"] for r in urls.select("path", allow.alias("a")).collect()}
    robots_body = "User-agent: *\n" + "".join(
        f"{'Allow' if a else 'Disallow'}: {p}\n" for p, a in rules
    )
    rdf = R.rules_table(
        spark.createDataFrame([("x", robots_body.encode())], "host string, content binary")
    )
    join_v = {
        r["path"]: r["allowed"] for r in R.evaluate(urls, rdf).collect()
    }
    assert lit_v == join_v


def test_evaluate_broadcasts_rules(spark):
    robots_df = spark.createDataFrame(HOST_ROBOTS, "host string, content binary")
    urls_df = spark.createDataFrame(URLS, "host string, path string")
    out = R.evaluate(urls_df, R.rules_table(robots_df))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_cli_robots_filter(spark, tmp_path):
    """Full CLI lifecycle: url-column splitting, agent selection, and
    verdict parity with the pure-python reference."""
    from pmocr_spark import cli

    robots_src = str(tmp_path / "robots.parquet")
    spark.createDataFrame(
        HOST_ROBOTS, "host string, content binary"
    ).write.parquet(robots_src)
    urls = [
        (f"http://{h}{p}",) for h, p in URLS
    ] + [("https://a.com",)]  # empty path -> '/'
    urls_src = str(tmp_path / "urls.parquet")
    spark.createDataFrame(urls, "url string").write.parquet(urls_src)
    out = str(tmp_path / "out")
    cli.main([
        "--robots-filter", robots_src, "--input", urls_src,
        "--output", out, "--master", "local[2]",
    ])
    got = {r["url"]: r["allowed"] for r in spark.read.parquet(out).collect()}
    py_rules = {h: R.parse_robots(c.decode(), "*") for h, c in HOST_ROBOTS}
    for h, p in URLS:
        assert got[f"http://{h}{p}"] == int(R.evaluate_path(py_rules.get(h, []), p))
    assert got["https://a.com"] == 1  # '/' matches nothing in a.com's * group

    # mode-exclusivity + missing-column guards
    import pytest as _pytest

    with _pytest.raises(SystemExit):
        cli.main(["--robots-filter", robots_src, "--batch", "--input", urls_src,
                  "--blobs", "b", "--output", out, "--lineage", "l",
                  "--master", "local[2]"])
    with _pytest.raises(SystemExit):
        cli.main(["--robots-agent", "megabot", "--pagerank", "--input", urls_src,
                  "--output", out, "--master", "local[2]"])
