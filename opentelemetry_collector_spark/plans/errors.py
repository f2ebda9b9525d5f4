"""Error taxonomy — consumererror analog (SURVEY §2.5 F7).

The reference splits failures into permanent (never retry, drop/report:
consumer/consumererror/permanent.go:16-32) and retryable (back off and
retry: configretry/backoff.go:17-21). Our batch mapping:

* permanent  → row-level quarantine (parse_ok=false rows to a failure
  table) or job abort for config errors;
* retryable  → Spark task retries (spark.task.maxFailures) + stage
  re-run from checkpoint; sink commit retries with backoff.
"""

from __future__ import annotations

import time
from collections.abc import Callable
from typing import TypeVar

T = TypeVar("T")


class PermanentError(Exception):
    """Do not retry (consumererror.NewPermanent)."""


class RetryableError(Exception):
    """Transient; retry with backoff (consumererror default)."""


def is_permanent(err: BaseException) -> bool:
    return isinstance(err, PermanentError)


def with_retry(
    fn: Callable[[], T],
    initial_s: float = 5.0,
    multiplier: float = 1.5,
    max_interval_s: float = 30.0,
    max_elapsed_s: float = 300.0,
    sleep: Callable[[float], None] = time.sleep,
) -> T:
    """Exponential backoff with the reference's defaults (5s → ×1.5 →
    30s cap, 5m budget; config/configretry/backoff.go:17-21;
    retry_sender.go:71-149). Permanent errors propagate immediately.
    """
    interval = initial_s
    elapsed = 0.0
    while True:
        try:
            return fn()
        except PermanentError:
            raise
        except Exception:
            if elapsed + interval > max_elapsed_s:
                raise
            sleep(interval)
            elapsed += interval
            interval = min(interval * multiplier, max_interval_s)
