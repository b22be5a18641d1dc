"""robots.txt parsing for the politeness gate (T6, north_rule "robots.txt
gating").

The reference has no robots handling — its closest analogue is
rate-limit backoff (ref shared/utils/retry.py:150-158). The crawl engine
consumes real robots.txt text: the synthetic web serves one robots.txt
per host (synth.robots_txt) and BOTH the engine and the oracle parse it
through this module, so the gate's semantics are defined by the parser,
not by a side-channel rule dict.

Subset supported (the parts a politeness gate needs): ``User-agent``
groups (``*`` only — we crawl as the generic agent), ``Disallow`` path
prefixes, ``Crawl-delay`` in (possibly fractional) seconds, and
``Sitemap`` URLs (collected independent of any group, per the sitemaps
protocol). Unknown directives and comments are ignored, per the robots
exclusion protocol (RFC 9309)."""

from __future__ import annotations

from typing import Dict, List

DEFAULT_CRAWL_DELAY_MS = 1000


def parse_robots_txt(text: str) -> dict:
    """-> {"crawl_delay_ms": int, "disallow": [path prefixes],
    "sitemaps": [urls]} — delay/disallow for the ``*`` user-agent
    group; Sitemap lines apply file-wide."""
    delay_ms = DEFAULT_CRAWL_DELAY_MS
    disallow: List[str] = []
    sitemaps: List[str] = []
    applies = False  # inside a group that includes User-agent: *
    seen_any_group = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, value = line.partition(":")
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            if seen_any_group and applies and value != "*":
                applies = False  # a new non-* group starts
            if value == "*":
                applies = True
                seen_any_group = True
        elif key == "disallow" and applies:
            if value:  # empty Disallow means allow-all
                disallow.append(value)
        elif key == "crawl-delay" and applies:
            try:
                delay_ms = int(round(float(value) * 1000))
            except ValueError:
                pass
        elif key == "sitemap" and value:
            sitemaps.append(value)
    return {"crawl_delay_ms": delay_ms, "disallow": disallow, "sitemaps": sitemaps}


def render_robots_txt(rules: dict) -> str:
    """Inverse of parse (used by the synthetic web): rules -> text."""
    lines = ["User-agent: *"]
    for p in rules.get("disallow", []):
        lines.append(f"Disallow: {p}")
    delay_ms = rules.get("crawl_delay_ms", DEFAULT_CRAWL_DELAY_MS)
    lines.append(f"Crawl-delay: {delay_ms / 1000:.3f}")
    for s in rules.get("sitemaps", []):
        lines.append(f"Sitemap: {s}")
    return "\n".join(lines) + "\n"


def parse_all(texts: Dict[str, str]) -> Dict[str, dict]:
    return {host: parse_robots_txt(t) for host, t in texts.items()}
