"""robots.txt parsing and URL filtering (RFC 9309, the Robots Exclusion
Protocol) — the crawl-politeness gate of a web pipeline.

Implements the public spec's matching model:

  * group selection: the group whose ``User-agent`` line is the LONGEST
    case-insensitive match for the product token wins; ``*`` groups
    apply only when no specific group matches; multiple user-agent
    lines may head one shared rule group;
  * rule matching: ``Allow``/``Disallow`` values are path prefixes with
    ``*`` (any octet run) and ``$`` (end anchor) wildcards;
  * precedence: the rule with the MOST SPECIFIC match — longest pattern
    in octets (RFC 9309 §2.2.2) — wins; on a tie, Allow wins; no match
    means allowed; an empty Disallow value allows everything.

The module is pure and vectorizable per batch: ``RobotsMatcher``
compiles every rule pattern once (the actor-pool ``__init__``
contract), then evaluates paths against the compiled rule list.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd


def parse_robots(text: str, agent: str = "*") -> list:
    """robots.txt text → ordered [(allow: bool, pattern: str), ...] for
    the most specific matching user-agent group."""
    groups: list = []                   # [( [agents], [(allow, pat)] )]
    cur_agents: list = []
    cur_rules: list = []
    agents_open = False                 # collecting a UA header run
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if not agents_open and cur_agents:
                groups.append((cur_agents, cur_rules))
                cur_agents, cur_rules = [], []
            cur_agents.append(value.lower())
            agents_open = True
        elif field in ("allow", "disallow"):
            agents_open = False
            if cur_agents:
                cur_rules.append((field == "allow", value))
        # crawl-delay / sitemap / unknown fields: ignored per RFC
    if cur_agents:
        groups.append((cur_agents, cur_rules))
    al = agent.lower()
    best: tuple = (-1, [])              # (match specificity, rules)
    star: list = []
    star_seen = False
    for agents, rules in groups:
        for a in agents:
            if a == "*":
                if not star_seen:
                    star, star_seen = rules, True
                else:
                    star = star + rules
            elif a and al.startswith(a):
                if len(a) > best[0]:
                    best = (len(a), rules)
    return best[1] if best[0] >= 0 else star


def _compile(pattern: str):
    """Rule pattern → compiled anchored regex (* → .*, $ → end)."""
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    rx = "".join(".*" if c == "*" else re.escape(c) for c in body)
    return re.compile("^" + rx + ("$" if anchored else ""))


class RobotsMatcher:
    """Compiled rule set for one robots.txt + agent: ``allowed(path)``
    applies RFC 9309 longest-match / allow-wins-ties precedence."""

    def __init__(self, text: str, agent: str = "*"):
        # an empty value matches nothing (an empty Disallow is the
        # canonical allow-everything idiom) — drop empty patterns
        self.rules = [(allow, pat, _compile(pat), len(pat))
                      for allow, pat in parse_robots(text, agent)
                      if pat != ""]

    def decide(self, path: str):
        """→ (allowed, matched-pattern length; -1 when no rule matches)."""
        best_len = -1
        best_allow = True
        for allow, pat, rx, plen in self.rules:
            if rx.match(path):
                if plen > best_len or (plen == best_len and allow):
                    best_len = plen
                    best_allow = allow
        return best_allow, best_len

    def allowed(self, path: str) -> bool:
        return self.decide(path)[0]


def match_paths_vec(paths: pd.Series, rules) -> tuple:
    """Vectorized RobotsMatcher.decide over a path Series: one regex
    sweep per RULE (rules are few, paths are many) instead of a Python
    loop per path. Encoding: score = plen*2 + allow, max over matching
    rules — the longest-match / allow-wins-ties precedence falls out of
    integer max. → (allowed bool ndarray, rule_len int64 ndarray)."""
    best = np.full(len(paths), -1, dtype=np.int64)
    for allow, pat, rx, plen in rules:
        hit = paths.str.match(rx, na=False).to_numpy(dtype=bool)
        np.maximum(best, np.where(hit, plen * 2 + int(allow), -1),
                   out=best)
    allowed = (best < 0) | (best % 2 == 1)
    rule_len = np.where(best < 0, -1, best >> 1).astype(np.int64)
    return allowed, rule_len
