"""Ordered stage-list runner (reference X2, modules/qa_api_handler.py:
296-317) with the recursion guard FIXED: the reference's guard prints
but does not skip (`full_run` passed inside the list would recurse);
ours actually skips and records it.
"""

from __future__ import annotations

import time
from collections.abc import Callable


def run_stages(stages: list[Callable[[], object]], console_output: bool = False) -> dict:
    """Run callables in order; skip self-referencing/None entries.

    Returns {name: {"status": ..., "seconds": ...}} in execution order.
    """
    results: dict[str, dict] = {}
    for fn in stages:
        name = getattr(fn, "__name__", repr(fn))
        if fn is None:  # reference bug (a): list built from call results
            results[name] = {"status": "skipped_none", "seconds": 0.0}
            continue
        if name == "run_stages" or getattr(fn, "__wrapped_runner__", False):
            # X2 guard, actually skipping (ref guard only printed)
            results[name] = {"status": "skipped_recursive", "seconds": 0.0}
            continue
        t0 = time.time()
        fn()
        dt = round(time.time() - t0, 4)
        results[name] = {"status": "ok", "seconds": dt}
        if console_output:
            print(f"{name}: {dt}s")
    return results
