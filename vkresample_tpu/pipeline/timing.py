"""Dispatch-overhead-amortized timing, reproducing the reference's -n
measurement semantics: X pipeline repeats per submit, one sync at the end,
wall-clock / X (VkResample.cpp:1249-1279: chrono around vkQueueSubmit +
fence wait, divided by numIter)."""
from __future__ import annotations

import time
from typing import Callable, Tuple

import jax


def time_amortized(fn: Callable, args: tuple, num_iter: int) -> Tuple[object, float]:
    """Run fn(*args) num_iter times, sync once, return (result, ms/iter).

    The first (compile/warmup) call is excluded, matching the reference
    where plan/pipeline creation happens in initializeVulkanFFT before the
    timed submit.
    """
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(max(1, num_iter)):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    return out, dt * 1000.0 / max(1, num_iter)
