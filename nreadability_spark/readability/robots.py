"""robots.txt parsing and URL gating (Robots Exclusion Protocol).

A crawl-scale extraction pipeline must honor robots.txt before a page
ever reaches the transcoder; the reference (a per-document library) has
no crawl layer, so this is a from-scratch implementation of the REP as
specified by RFC 9309 + the Googlebot extensions every large crawler
implements:

* group structure: consecutive ``User-agent`` lines open ONE group; the
  group's rules apply to all of them; a ``User-agent`` line after at
  least one rule starts a new group;
* agent selection: the group whose agent token is the LONGEST prefix of
  the caller's product token wins; ``*`` matches any agent but only when
  no specific group matches;
* rule matching: ``Allow``/``Disallow`` paths match as prefixes with
  ``*`` (any chars) and ``$`` (end anchor) wildcards; among all matching
  rules the LONGEST pattern wins, and on equal length ``Allow`` wins;
* an empty ``Disallow:`` means allow-all; missing/unparseable files and
  unmatched paths default to allowed.

Parsing never raises; unknown directives are ignored (``Crawl-delay``
and ``Sitemap`` are surfaced, not interpreted).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


@dataclass
class RobotsGroup:
    agents: list[str] = field(default_factory=list)
    # (is_allow, pattern) in file order
    rules: list[tuple[bool, str]] = field(default_factory=list)
    crawl_delay: float | None = None


@dataclass
class Robots:
    groups: list[RobotsGroup] = field(default_factory=list)
    sitemaps: list[str] = field(default_factory=list)


def parse_robots(text: str) -> Robots:
    """Parse a robots.txt body. Never raises."""
    out = Robots()
    group: RobotsGroup | None = None
    group_open = False  # collecting consecutive User-agent lines
    for raw in (text or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if not group_open:
                group = RobotsGroup()
                out.groups.append(group)
                group_open = True
            group.agents.append(val.lower())
        elif key in ("allow", "disallow"):
            if group is None:
                continue  # rules before any User-agent: ignored
            group_open = False
            if key == "disallow" and val == "":
                # explicit allow-all marker: a rule that matches nothing
                continue
            group.rules.append((key == "allow", val))
        elif key == "crawl-delay":
            if group is not None:
                group_open = False
                try:
                    group.crawl_delay = float(val)
                except ValueError:
                    pass
        elif key == "sitemap":
            out.sitemaps.append(val)
        else:
            if group is not None:
                group_open = False
    return out


def _pattern_matches(pattern: str, path: str) -> bool:
    """REP wildcard prefix match: ``*`` spans any chars, ``$`` anchors
    the end, otherwise the pattern is a prefix."""
    rx = re.escape(pattern).replace(r"\*", ".*")
    if rx.endswith(r"\$"):
        rx = rx[:-2] + "$"
    try:
        return re.match(rx, path) is not None
    except re.error:
        return False


def _select_group(robots: Robots, agent: str) -> RobotsGroup | None:
    """Longest agent-token prefix match; ``*`` only as fallback.

    RFC 9309 §2.2.1: when MULTIPLE groups match the product token (two
    ``User-agent: bot`` blocks, or several ``*`` blocks), their rules
    are combined — a later group's Disallow must not be silently
    dropped. So all groups matching at the winning specificity are
    merged (rules concatenated in file order; first crawl-delay wins).
    """
    agent = (agent or "").lower()
    best_len = -1
    for g in robots.groups:
        for a in g.agents:
            if a != "*" and agent.startswith(a) and len(a) > best_len:
                best_len = len(a)
    if best_len >= 0:
        matched = [g for g in robots.groups
                   if any(a != "*" and len(a) == best_len
                          and agent.startswith(a) for a in g.agents)]
    else:
        matched = [g for g in robots.groups if "*" in g.agents]
    if not matched:
        return None
    if len(matched) == 1:
        return matched[0]
    merged = RobotsGroup(
        agents=[a for g in matched for a in g.agents],
        rules=[r for g in matched for r in g.rules])
    for g in matched:
        if g.crawl_delay is not None:
            merged.crawl_delay = g.crawl_delay
            break
    return merged


def is_allowed(robots: Robots, agent: str, path: str) -> bool:
    """Longest-match rule decision for ``path`` (which must include the
    leading slash); allowed when nothing matches."""
    g = _select_group(robots, agent)
    if g is None:
        return True
    path = path or "/"
    best_len = -1
    best_allow = True
    for is_allow, pattern in g.rules:
        if not pattern:
            continue
        if _pattern_matches(pattern, path):
            plen = len(pattern)
            if plen > best_len or (plen == best_len and is_allow
                                   and not best_allow):
                best_len, best_allow = plen, is_allow
    return best_allow if best_len >= 0 else True


def crawl_delay(robots: Robots, agent: str) -> float | None:
    g = _select_group(robots, agent)
    return g.crawl_delay if g is not None else None
