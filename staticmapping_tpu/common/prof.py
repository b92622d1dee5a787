"""Named-block wall-time profiling — SimpleProf parity.

The reference aggregates scoped timers per named block and prints a
count/avg/sum/min/max table at exit (common/performance/simple_prof.h:44-113,
simple_prof.cc:61-122, enabled by -DENABLE_PROFILING).  Here: a context
manager / decorator appending durations to a per-block list, with the same
table at :func:`report`.  Disabled by default (zero overhead beyond one
``if``); enable with :func:`enable` or the CLI ``--profile`` flag.

Device-time caveat: JAX dispatch is asynchronous — a block that merely
launches device work measures launch time.  Blocks that must include the
device time should hold the result with ``jax.block_until_ready`` (the
pipeline's host-sync points already do).
"""
from __future__ import annotations

import atexit
import time
from collections import defaultdict
from contextlib import contextmanager
from typing import Dict, List

_enabled = False
_records: Dict[str, List[float]] = defaultdict(list)
_report_at_exit = False


def enable(report_at_exit: bool = True) -> None:
    global _enabled, _report_at_exit
    _enabled = True
    if report_at_exit and not _report_at_exit:
        _report_at_exit = True
        atexit.register(_atexit_report)


def disable() -> None:
    global _enabled
    _enabled = False


def reset() -> None:
    _records.clear()


@contextmanager
def block(name: str):
    """``with prof.block("scan match:align"): ...`` — REGISTER_BLOCK role
    (simple_prof.h:108-113)."""
    if not _enabled:
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        _records[name].append(time.perf_counter() - t0)


def func(fn):
    """Decorator form (REGISTER_FUNC role)."""
    def wrapper(*a, **k):
        if not _enabled:
            return fn(*a, **k)
        t0 = time.perf_counter()
        try:
            return fn(*a, **k)
        finally:
            _records[fn.__qualname__].append(time.perf_counter() - t0)
    wrapper.__name__ = getattr(fn, "__name__", "wrapped")
    wrapper.__qualname__ = getattr(fn, "__qualname__", wrapper.__name__)
    wrapper.__doc__ = fn.__doc__
    return wrapper


def stats() -> Dict[str, dict]:
    out = {}
    for name, xs in _records.items():
        if not xs:
            continue
        out[name] = {
            "count": len(xs),
            "sum": sum(xs),
            "avg": sum(xs) / len(xs),
            "min": min(xs),
            "max": max(xs),
        }
    return out


def report(unit: str = "ms") -> str:
    """Print + return the stats table (simple_prof.cc:61-122 UX)."""
    scale = {"s": 1.0, "ms": 1e3, "us": 1e6}[unit]
    rows = sorted(stats().items(), key=lambda kv: -kv[1]["sum"])
    name_w = max([len(n) for n, _ in rows] + [10])
    lines = [f"{'block':<{name_w}}  {'count':>7}  {'avg':>10}  "
             f"{'sum':>10}  {'min':>10}  {'max':>10}   [{unit}]"]
    for name, s in rows:
        lines.append(
            f"{name:<{name_w}}  {s['count']:>7d}  "
            f"{s['avg'] * scale:>10.3f}  {s['sum'] * scale:>10.3f}  "
            f"{s['min'] * scale:>10.3f}  {s['max'] * scale:>10.3f}")
    table = "\n".join(lines)
    print(table)
    return table


def _atexit_report():
    if _enabled and _records:
        report()
