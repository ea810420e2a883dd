"""robots.txt parsing + RFC 9309 longest-match URL filtering
(functions/robots.py)."""

from __future__ import annotations

from unstructured_spark.functions.robots import (
    parse_robots,
    rule_regex,
)

ROBOTS = """
# corpus crawler policy
User-agent: googlebot
Disallow: /nogoogle/

User-agent: *
Disallow: /private/
Allow: /private/pub/
Disallow: /tmp/*
Disallow: /*.exe$
Crawl-delay: 2
"""


class TestParse:
    def test_star_group_for_unknown_agent(self):
        rules = parse_robots(ROBOTS, "corpusbot/1.0")
        assert ("/private/", False) in rules
        assert ("/private/pub/", True) in rules
        assert ("/nogoogle/", False) not in rules

    def test_specific_group_wins(self):
        rules = parse_robots(ROBOTS, "Googlebot/2.1")
        assert rules == [("/nogoogle/", False)]

    def test_longest_agent_token_wins(self):
        txt = ("User-agent: bot\nDisallow: /a/\n\n"
               "User-agent: bigbot\nDisallow: /b/\n")
        assert parse_robots(txt, "mybigbot") == [("/b/", False)]

    def test_shared_group_agents(self):
        txt = "User-agent: a\nUser-agent: b\nDisallow: /x/\n"
        assert parse_robots(txt, "b") == [("/x/", False)]

    def test_empty_disallow_is_no_rule(self):
        assert parse_robots("User-agent: *\nDisallow:\n", "any") == []

    def test_no_star_group_means_no_rules(self):
        assert parse_robots("User-agent: foo\nDisallow: /\n", "bar") == []

    def test_comments_and_blank_lines(self):
        txt = "User-agent: * # all\n# note\n\nDisallow: /p/ # private\n"
        assert parse_robots(txt, "x") == [("/p/", False)]


class TestRegex:
    def test_prefix(self):
        import re
        r = re.compile(rule_regex("/private/"))
        assert r.search("/private/a.html")
        assert not r.search("/pub/private/")

    def test_wildcard_and_anchor(self):
        import re
        assert re.compile(rule_regex("/tmp/*")).search("/tmp/x/y")
        rx = re.compile(rule_regex("/*.exe$"))
        assert rx.search("/bin/tool.exe")
        assert not rx.search("/bin/tool.exe.txt")

    def test_literal_specials_escaped(self):
        import re
        rx = re.compile(rule_regex("/a+b(c)?"))
        assert rx.search("/a+b(c)?x")
        assert not rx.search("/aab")


class TestApplyRobots:
    def test_longest_match_decisions(self, spark):
        from unstructured_spark.functions.robots import (
            apply_robots,
            robots_rules,
        )

        robots = spark.createDataFrame(
            [("h.example.com", ROBOTS), ("open.example.com", "")],
            "host string, robots_txt string",
        )
        rules = robots_rules(robots, agent="corpusbot")
        urls = spark.createDataFrame(
            [
                (1, "http://h.example.com/a/doc.html"),
                (2, "http://h.example.com/private/doc.html"),
                (3, "http://h.example.com/private/pub/doc.html"),
                (4, "http://h.example.com/tmp/x"),
                (5, "http://h.example.com/bin/tool.exe"),
                (6, "http://h.example.com/nogoogle/doc.html"),
                (7, "http://open.example.com/private/doc.html"),
                (8, "https://H.EXAMPLE.COM/private/pub/x"),  # host case
                (9, "http://unknown.example.com/q"),
            ],
            "doc_id long, url string",
        )
        out = {r["doc_id"]: r for r in
               apply_robots(urls, rules, broadcast_rules=True).collect()}
        assert out[1]["allowed"] is True and out[1]["matched_rule"] is None
        assert out[2]["allowed"] is False
        assert out[2]["matched_rule"] == "/private/"
        assert out[3]["allowed"] is True   # longer Allow wins
        assert out[3]["matched_rule"] == "/private/pub/"
        assert out[4]["allowed"] is False  # wildcard
        assert out[5]["allowed"] is False  # $ anchor
        assert out[6]["allowed"] is True   # googlebot-only rule
        assert out[7]["allowed"] is True   # empty robots
        assert out[8]["allowed"] is True   # case-folded host match
        assert out[9]["allowed"] is True   # host with no robots at all

    def test_no_corpus_window_in_plan(self, spark):
        from unstructured_spark.functions.robots import (
            apply_robots,
            robots_rules,
        )

        robots = spark.createDataFrame(
            [("h", "User-agent: *\nDisallow: /p/\n")],
            "host string, robots_txt string",
        )
        urls = spark.createDataFrame([(1, "http://h/p/x")],
                                     "doc_id long, url string")
        plan = (
            apply_robots(urls, robots_rules(robots), broadcast_rules=True)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Window" not in plan
