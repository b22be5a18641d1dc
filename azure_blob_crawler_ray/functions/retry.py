"""Retry / backoff policy — the reference's ``shared/utils/retry.py``
semantics as pure decision functions (no HTTP, no sleeping; the engine
schedules, the policy only decides).

Reference behavior reproduced (ref shared/utils/retry.py:24-224,
shared/config/settings.py:42-52):

- 3 attempts with a fixed 2 s delay between them (ref settings.py:42-43);
- permanent status codes (400/401/403/404/405/409/422) are NEVER
  retried (ref retry.py:96-114);
- rate-limit responses (429, or a message matching
  ``r'retry after (\\d+) seconds?'``) wait the advertised time,
  upper-clamped to 300 s (ref retry.py:70,83 ``min(n, max_wait)``), with
  60 s used only as the DEFAULT when no hint can be parsed; they do NOT
  consume an attempt (ref retry.py:54-89, 150-158);
- after the attempts are exhausted the row is dead-lettered — the queue
  analogue is max-delivery-count 10 then the dead-letter queue
  (ref scripts/deploy-infrastructure.ps1:257-259, SURVEY.md §2.7 D3).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from enum import Enum

MAX_ATTEMPTS = 3
RETRY_DELAY_S = 2.0
RATE_LIMIT_MIN_WAIT_S = 60
RATE_LIMIT_MAX_WAIT_S = 300
PERMANENT_STATUS = frozenset({400, 401, 403, 404, 405, 409, 422})
MAX_DELIVERIES = 10

_RETRY_AFTER_RE = re.compile(r"retry after (\d+) seconds?", re.IGNORECASE)


class Action(Enum):
    RETRY = "retry"            # consume an attempt, wait RETRY_DELAY_S
    RATE_LIMIT_WAIT = "rate_limit_wait"  # wait, do NOT consume an attempt
    FAIL_PERMANENT = "fail_permanent"    # never retry (ack + skip)
    DEAD_LETTER = "dead_letter"          # attempts exhausted


@dataclass(frozen=True)
class Decision:
    action: Action
    wait_s: float = 0.0


def parse_retry_after(message: str) -> int | None:
    """ref retry.py:54-89 — parse 'retry after N seconds' from an error
    message. Only upper-clamped (ref retry.py:70,83); the 60 s floor is
    the *no-hint default* applied in :func:`decide`, not a clamp here."""
    m = _RETRY_AFTER_RE.search(message or "")
    if not m:
        return None
    return min(int(m.group(1)), RATE_LIMIT_MAX_WAIT_S)


def decide(
    status: int | None,
    message: str = "",
    *,
    attempt: int,
    max_attempts: int = MAX_ATTEMPTS,
) -> Decision:
    """One failure -> what to do next. ``attempt`` is 1-based (the
    attempt that just failed)."""
    if status is not None and status in PERMANENT_STATUS:
        return Decision(Action.FAIL_PERMANENT)
    wait = parse_retry_after(message)
    if status == 429 or wait is not None:
        return Decision(
            Action.RATE_LIMIT_WAIT,
            wait_s=float(wait if wait is not None else RATE_LIMIT_MIN_WAIT_S),
        )
    if attempt >= max_attempts:
        return Decision(Action.DEAD_LETTER)
    return Decision(Action.RETRY, wait_s=RETRY_DELAY_S)


def should_dead_letter(delivery_count: int) -> bool:
    """Queue-level poison handling — ref deploy-infrastructure.ps1:257-259."""
    return delivery_count >= MAX_DELIVERIES
