"""Structured scale-path logging ("no silent caps" rule).

Operators with scale-aware branches (driver fast path vs distributed,
broadcast vs shuffle join, capped cliques vs chains) record WHICH branch
ran and why via :func:`note`.  Each call emits one structured log line
on the ``engine.paths`` logger and increments an in-process counter so
tests — and a 100-TB operator reading driver logs — can see exactly
which path handled the data and whether any bound/cap was hit.
"""

from __future__ import annotations

import json
import logging
import threading
from collections import Counter

_log = logging.getLogger("engine.paths")
_lock = threading.Lock()
counters: Counter = Counter()


def note(op: str, branch: str, **info) -> None:
    """Record that operator `op` took `branch` (e.g. 'driver_fastpath',
    'distributed', 'broadcast', 'capped'). `info` carries the numbers
    that drove the decision (n, threshold, dropped, ...)."""
    with _lock:
        counters[(op, branch)] += 1
    _log.info(json.dumps({"op": op, "branch": branch, **info}, default=str))


def reset() -> None:
    with _lock:
        counters.clear()


def count(op: str, branch: str) -> int:
    with _lock:
        return counters[(op, branch)]
