"""Tracing / profiling helpers.

The reference instruments with ad-hoc `time.time()` deltas
(tools/final_common.py:85,101-102 etc.).  Here every stage can be wrapped in
a `StageTimer` (block_until_ready-accurate wall-clock + throughput) and, on
TPU, in a `jax.profiler` trace for xprof.
"""
from __future__ import annotations

import contextlib
import json
import time
from typing import Optional


class StageTimer:
    """Wall-clock timer with derived throughput.

    Example:
        with StageTimer("shapley", items=33_000) as t: ...
        # prints {"stage": "shapley", "seconds": ..., "items_per_sec": ...}
    """

    def __init__(self, stage: str, items: Optional[int] = None,
                 printer=print):
        self.stage = stage
        self.items = items
        self.printer = printer
        self.seconds = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.seconds = time.perf_counter() - self._t0
        rec = {"stage": self.stage, "seconds": round(self.seconds, 4)}
        if exc and exc[0] is not None:
            # the stage died mid-flight: items/seconds would fabricate an
            # inflated throughput (observed: a worker crash logged 11.7k
            # fwd/s for a stage that never ran), and evidence collection
            # averages these lines — record the abort instead of a rate
            rec["aborted"] = True
        elif self.items is not None:
            rec["items_per_sec"] = round(self.items / self.seconds, 1)
        if self.printer is not None:
            self.printer(json.dumps(rec))
        return False


@contextlib.contextmanager
def device_trace(log_dir: Optional[str]):
    """jax.profiler trace when a log dir is given; no-op otherwise."""
    if not log_dir:
        yield
        return
    import jax
    with jax.profiler.trace(log_dir):
        yield


def block(tree):
    """block_until_ready on a pytree; returns it."""
    import jax
    return jax.block_until_ready(tree)
