"""Link discovery (target-side operator; SURVEY.md §3.4 'extract_links').

The reference has no link discovery — its frontier is fed externally by
Event Grid (ref scripts/deploy-infrastructure.ps1:492-503). The crawl
engine discovers out-links from extracted text; shared by the Ray parse
stage and the oracle simulator so both see the identical link set.
"""

from __future__ import annotations

import re
from typing import List

_LINK_RE = re.compile(r"(NOFOLLOW:\s*)?(https://\S+)")


def extract_links(full_content: str) -> List[str]:
    """All https URLs in extracted text, first-occurrence order, deduped.
    URLs immediately preceded by a ``NOFOLLOW:`` marker (the synthetic
    web's rendering of rel=nofollow) are excluded from discovery — the
    crawler honors nofollow; only an UNMARKED occurrence makes a URL
    followable."""
    seen = set()
    out: List[str] = []
    for marked, url in _LINK_RE.findall(full_content):
        if marked:
            continue
        if url not in seen:
            seen.add(url)
            out.append(url)
    return out
