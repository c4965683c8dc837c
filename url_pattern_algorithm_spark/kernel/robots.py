"""robots.txt parsing kernel (north_rule crawl realism).

The reference consumes pre-structured inputs only; a real frontier ingests
per-host ``robots.txt`` bodies. This kernel parses one body into the
(prefix, allow) rule rows + Crawl-delay that ``operators/frontier``
consumes (robots_filter handles the '*'/'$' wildcards downstream; this
layer is pure line/grouping semantics).

Grounded in the public robots.txt convention (REP, RFC 9309):

- records are groups: one or more consecutive ``User-agent:`` lines
  followed by rules; most-specific-wins group selection — when ANY group
  names the caller's agent token exactly (case-insensitive), only those
  groups apply and every ``*`` group is ignored; otherwise the ``*``
  groups apply. Substring/longest-agent-token matching is deliberately
  out of scope (one agent, exact token);
- ``Disallow:`` / ``Allow:`` with a non-empty value emit a rule; an EMPTY
  ``Disallow:`` is the spec's allow-all no-op (no rule emitted);
- ``Crawl-delay:`` (a de-facto extension) sets the per-host delay; across
  several applying groups the LARGEST wins (the same conservative reading
  host_crawl_delays applies across rows);
- ``#`` starts a comment; blank/unknown/malformed lines are ignored
  (web-scale robots bodies are full of garbage — never raise); blank and
  comment lines do not break a User-agent header run (the de-facto
  Google parser ignores them for grouping), other garbage ends it.

Pure python: doubles as the oracle for the Spark wrapper
(sources/robots.py) and is testable without Spark.
"""

from __future__ import annotations

import math


def _parse_groups(body: str) -> list[tuple[list[str], list[tuple[str, bool]], float | None]]:
    """body -> [(agent_tokens_lower, rules, crawl_delay), ...] in file order."""
    groups: list[tuple[list[str], list[tuple[str, bool]], float | None]] = []
    agents: list[str] = []
    rules: list[tuple[str, bool]] = []
    delay: float | None = None
    in_group_header = False
    started = False

    def flush() -> None:
        nonlocal agents, rules, delay, started
        if started:
            groups.append((agents, rules, delay))
        agents, rules, delay, started = [], [], None, False

    for raw in (body or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue  # blanks/comments do not break a header run
        if ":" not in line:
            in_group_header = False  # garbage ends the header run
            continue
        key, value = line.split(":", 1)
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            if not in_group_header:
                flush()
                in_group_header = True
            agents.append(value.lower())
            started = True
            continue
        in_group_header = False
        if not started:
            continue  # rules before any User-agent line: no group, ignored
        if key == "disallow":
            if value:  # empty Disallow = allow-all no-op
                rules.append((value, False))
        elif key == "allow":
            if value:
                rules.append((value, True))
        elif key == "crawl-delay":
            try:
                d = float(value)
            except ValueError:
                continue
            # real-web bodies carry 'Crawl-delay: 0' / negatives / 'inf':
            # a non-positive or non-finite delay poisons the politeness
            # refill (REFILL / delay -> div-zero, Infinity, or a token
            # DRAIN) — treat them like unparseable and keep the default
            if not (d > 0 and math.isfinite(d)):
                continue
            delay = d if delay is None else max(delay, d)
    flush()
    return groups


def parse_robots_txt(
    body: str, agent: str = "*"
) -> tuple[list[tuple[str, bool]], float | None]:
    """One robots.txt body -> ([(prefix, allow), ...], crawl_delay|None).

    Group selection is most-specific-wins (module docstring). Rules keep
    file order across the selected groups (downstream longest-match
    precedence is order-insensitive; order only aids reproducibility).
    """
    groups = _parse_groups(body)
    tok = agent.strip().lower()
    exact = [g for g in groups if tok != "*" and tok in g[0]]
    chosen = exact if exact else [g for g in groups if "*" in g[0]]
    rules: list[tuple[str, bool]] = []
    delay: float | None = None
    for _, g_rules, g_delay in chosen:
        rules.extend(g_rules)
        if g_delay is not None:
            delay = g_delay if delay is None else max(delay, g_delay)
    return rules, delay
