"""robots.txt parsing + crawl-permission filtering for the pages table.

The crawl-side complement of the feed/sitemap sources and the meta-robots
gate (`urlnorm.robots_noindex_batch`): a corpus assembled from raw crawls
should be filterable by the publisher's robots.txt policy.  Semantics
follow RFC 9309 (+ the de-facto Google extensions the RFC codified):

- groups of ``User-agent:`` lines followed by ``Allow:``/``Disallow:``
  rules; the group picked for an agent is the LONGEST agent token that is
  a case-insensitive prefix of the product token, with ``*`` as fallback;
- rule matching is longest-match wins over the raw rule text, with
  ``Allow`` beating ``Disallow`` on equal length;
- ``*`` wildcards anywhere in a rule, ``$`` anchors the end;
- an empty ``Disallow:`` line permits everything (explicitly ignored);
- unknown directives (Crawl-delay, Sitemap, ...) are skipped.

Scale shape: robots.txt files are per-HOST and tiny — the parsed index for
even a 10^8-host crawl is a few GB of compiled rules, hosted once per node
via ``ray.put`` and probed scan-side (`RobotsFilter`), never shuffled.
Pages whose host has no robots.txt are allowed (the crawl default).
"""
from __future__ import annotations

import re
from urllib.parse import urlsplit

import pyarrow as pa


def _rule_regex(rule: str) -> "re.Pattern[str]":
    """robots rule -> anchored regex: '*' = any run, trailing '$' = end."""
    anchored = rule.endswith("$")
    if anchored:
        rule = rule[:-1]
    pattern = "".join(".*" if ch == "*" else re.escape(ch) for ch in rule)
    return re.compile("^" + pattern + ("$" if anchored else ""))


class RobotsRules:
    """Compiled Allow/Disallow rules for one (host, agent) pair."""

    __slots__ = ("rules",)

    def __init__(self, rules: list[tuple[bool, str]]):
        # (is_allow, raw_rule) -> precompiled, sorted once by specificity
        # (longest raw rule first; allow before disallow on ties)
        self.rules = sorted(
            ((len(raw), allow, raw, _rule_regex(raw))
             for allow, raw in rules if raw),
            key=lambda t: (-t[0], not t[1]))

    def allowed(self, path: str) -> bool:
        if not path.startswith("/"):
            path = "/" + path
        for _ln, allow, _raw, rx in self.rules:
            if rx.match(path):
                return allow
        return True  # no matching rule -> allowed


def parse_robots(payload: bytes | str, agent: str = "*") -> RobotsRules:
    """robots.txt bytes -> compiled rules for ``agent`` (RFC 9309 group
    selection: longest agent token that prefixes ``agent``, else '*')."""
    text = (payload.decode("utf-8", "replace")
            if isinstance(payload, (bytes, bytearray)) else payload)
    agent_l = agent.lower()
    groups: list[tuple[list[str], list[tuple[bool, str]]]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[bool, str]] = []
    in_agent_run = False
    for line in text.splitlines():
        line = line.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if not in_agent_run and cur_agents:
                groups.append((cur_agents, cur_rules))
                cur_agents, cur_rules = [], []
            cur_agents.append(val.lower())
            in_agent_run = True
        elif key in ("allow", "disallow"):
            in_agent_run = False
            if cur_agents:
                if val:  # empty Disallow permits everything: skip the rule
                    cur_rules.append((key == "allow", val))
        # Crawl-delay/Sitemap/unknown directives: ignored entirely (RFC
        # 9309 section 2.2.4 — they neither join nor split a group)
    if cur_agents:
        groups.append((cur_agents, cur_rules))

    best_len, best_rules = -1, []
    for agents, rules in groups:
        for a in agents:
            if a == "*":
                if best_len < 0:
                    best_rules = rules
            elif agent_l.startswith(a) and len(a) > best_len:
                best_len, best_rules = len(a), rules
    return RobotsRules(best_rules)


def build_robots_index(robots_tbl: pa.Table, agent: str = "*",
                       host_col: str = "host",
                       payload_col: str = "payload") -> dict[str, RobotsRules]:
    """(host, payload) table -> {host: compiled rules}.  Hosts are
    lowercased; the last payload per host wins (crawl recency order)."""
    index: dict[str, RobotsRules] = {}
    for host, payload in zip(robots_tbl.column(host_col).to_pylist(),
                             robots_tbl.column(payload_col).to_pylist()):
        if host and payload is not None:
            index[host.lower()] = parse_robots(payload, agent)
    return index


class RobotsFilter:
    """Actor stage: append a ``robots_allowed`` bool column by probing the
    broadcast {host: rules} index (ray.put once, fetched per actor).
    Hosts absent from the index are allowed — robots.txt is opt-out.
    Filtering is the caller's policy decision, same contract as
    ``robots_noindex_batch``."""

    def __init__(self, index_ref, url_col: str = "url"):
        import ray as _ray

        self.index = _ray.get(index_ref)
        self.url_col = url_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        flags = []
        for url in batch.column(self.url_col).to_pylist():
            try:
                parts = urlsplit(url)
                rules = self.index.get((parts.hostname or "").lower())
                flags.append(rules.allowed(parts.path or "/")
                             if rules is not None else True)
            except ValueError:
                flags.append(True)
        return batch.append_column("robots_allowed",
                                   pa.array(flags, pa.bool_()))


def apply_robots_filter(pages_ds, robots_tbl: pa.Table, agent: str = "*",
                        concurrency=(1, 4)):
    """pages Dataset + robots table -> pages with ``robots_allowed``."""
    import ray as _ray

    ref = _ray.put(build_robots_index(robots_tbl, agent))
    return pages_ds.map_batches(
        RobotsFilter, fn_constructor_kwargs={"index_ref": ref},
        batch_format="pyarrow", concurrency=concurrency, num_cpus=1)
