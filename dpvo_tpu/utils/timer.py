"""Timing utilities (ref dpvo/utils.py:8-29 Timer).

The reference synchronizes CUDA events; the JAX equivalent blocks on
device completion via block_until_ready around the timed region.
"""

from __future__ import annotations

import time
from contextlib import ContextDecorator

import jax

all_times = {}


class Timer(ContextDecorator):
    """Context decorator: `with Timer("BA", enabled=True): ...`"""

    def __init__(self, name: str, enabled: bool = True, sync=None):
        self.name = name
        self.enabled = enabled
        self.sync = sync  # optional array/pytree to block on at exit

    def __enter__(self):
        if self.enabled:
            self.start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self.enabled:
            if self.sync is not None:
                jax.block_until_ready(self.sync)
            elapsed = (time.perf_counter() - self.start) * 1000.0
            all_times.setdefault(self.name, []).append(elapsed)
            print(f"{self.name} {elapsed:.03f}")
        return False
