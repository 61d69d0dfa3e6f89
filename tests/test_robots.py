"""robots.txt matcher (gitprov_ray/robots.py): RFC 9309 group selection,
longest-match precedence, wildcard/anchor semantics (the published
Google robots-spec examples), and per-row vs vectorized parity."""

import numpy as np
import pandas as pd

from gitprov_ray.robots import RobotsMatcher, match_paths_vec, parse_robots


def test_group_selection_specific_beats_star():
    txt = """
User-agent: googlebot
Disallow: /g

User-agent: *
Disallow: /all
"""
    assert parse_robots(txt, "googlebot") == [(False, "/g")]
    assert parse_robots(txt, "otherbot") == [(False, "/all")]


def test_group_selection_longest_agent_wins():
    txt = """
User-agent: googlebot-news
Disallow: /news

User-agent: googlebot
Disallow: /general
"""
    assert parse_robots(txt, "googlebot-news") == [(False, "/news")]
    assert parse_robots(txt, "googlebot") == [(False, "/general")]


def test_shared_group_and_multiple_star_groups_merge():
    txt = """
User-agent: a
User-agent: b
Disallow: /x

User-agent: *
Disallow: /one

User-agent: *
Disallow: /two
"""
    assert parse_robots(txt, "b") == [(False, "/x")]
    assert parse_robots(txt, "nomatch") == [(False, "/one"), (False, "/two")]


def test_comments_blank_lines_and_unknown_fields_ignored():
    txt = """
# header comment
User-agent: bot  # trailing comment
Crawl-delay: 10
Sitemap: https://e.example/sitemap.xml
Disallow: /a
"""
    assert parse_robots(txt, "bot") == [(False, "/a")]


def test_empty_disallow_allows_everything():
    m = RobotsMatcher("User-agent: *\nDisallow:\n")
    assert m.allowed("/anything")
    assert m.decide("/anything") == (True, -1)


def test_no_group_matches_means_allowed():
    m = RobotsMatcher("User-agent: onlybot\nDisallow: /\n", "other")
    assert m.allowed("/deep/path")


# --- the published precedence examples (Google robots spec table) ---

def test_precedence_allow_longer_than_disallow():
    m = RobotsMatcher("User-agent: *\nAllow: /p\nDisallow: /\n")
    assert m.allowed("/page")


def test_precedence_tie_allow_wins():
    m = RobotsMatcher("User-agent: *\nAllow: /folder\nDisallow: /folder\n")
    assert m.allowed("/folder/page")


def test_precedence_wildcard_more_specific():
    m = RobotsMatcher("User-agent: *\nAllow: /page\nDisallow: /*.htm\n")
    assert not m.allowed("/page.htm")      # /*.htm (7) beats /page (5)
    assert m.allowed("/page")


def test_precedence_dollar_anchor_root_only():
    m = RobotsMatcher("User-agent: *\nAllow: /$\nDisallow: /\n")
    assert m.allowed("/")
    assert not m.allowed("/page")


def test_dollar_anchors_and_star_spans():
    m = RobotsMatcher("User-agent: *\nDisallow: /*.php$\n")
    assert not m.allowed("/index.php")
    assert not m.allowed("/a/b/c.php")
    assert m.allowed("/index.php?x=1")     # $ means true end
    assert m.allowed("/index.phpx")


def test_vectorized_matches_per_row():
    txt = """
User-agent: *
Disallow: /private
Allow: /private/pub
Disallow: /*.tmp$
Allow: /$
Disallow: /search
Allow: /search/about$
"""
    m = RobotsMatcher(txt)
    paths = ["/", "/private/x", "/private/pub/x", "/a/b.tmp", "/b.tmp?x",
             "/search/q", "/search/about", "/search/aboutx", "/open",
             "", "/private"]
    s = pd.Series(paths)
    allowed, rlen = match_paths_vec(s, m.rules)
    for i, p in enumerate(paths):
        want = m.decide(p)
        assert (bool(allowed[i]), int(rlen[i])) == want, p
    assert allowed.dtype == np.bool_ and rlen.dtype == np.int64
