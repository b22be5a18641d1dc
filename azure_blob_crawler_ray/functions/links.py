"""Link discovery (target-side operator; SURVEY.md §3.4 'extract_links').

The reference has no link discovery — its frontier is fed externally by
Event Grid (ref scripts/deploy-infrastructure.ps1:492-503). The crawl
engine discovers out-links from extracted text; shared by the Ray parse
stage and the oracle simulator so both see the identical link set.
"""

from __future__ import annotations

import re
from typing import List

_LINK_RE = re.compile(r"https://\S+")


def extract_links(full_content: str) -> List[str]:
    """All https URLs in extracted text, first-occurrence order, deduped."""
    seen = set()
    out: List[str] = []
    for m in _LINK_RE.findall(full_content):
        if m not in seen:
            seen.add(m)
            out.append(m)
    return out
