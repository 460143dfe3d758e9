"""Robust device-side benchmark harness.

Two hazards motivate this design:
  1. On tunneled/remote PJRT backends, ``block_until_ready`` can ack before
     device execution completes, making host-side dispatch loops measure
     nothing.  We therefore time a SINGLE device program containing a
     ``lax.fori_loop`` of K pipeline iterations with a data dependency
     chained through the loop carry (so XLA cannot hoist or parallelize
     them), and force completion with a scalar readback.
  2. One-time costs (program launch, readback latency) are removed by
     measuring two loop lengths and using the difference quotient:
     t_per_iter = (T(k2) - T(k1)) / (k2 - k1).

This reproduces the reference's ``-n`` semantics — X pipeline repeats per
submit, one sync (VkResample.cpp:1249-1279) — but with the repeats inside
one XLA program (the analog of recording X iterations into one command
buffer) and a forced result fetch as the fence.
"""
from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp


def make_looped(pipeline: Callable) -> Callable:
    """Wrap a pipeline(x, aux) -> u8-image into run(x, aux, k) -> scalar
    that executes the pipeline k times serially on-device.  `aux` carries
    constant operands (e.g. DFT banks) as jit arguments, not HLO literals."""

    def run(x, aux, k):
        zero_in = (0,) * x.ndim  # rank-generic single-element probe

        def body(i, carry):
            # perturb one pixel with the carry so iteration i+1 depends on
            # iteration i's output — forbids hoisting/parallelizing
            xi = x.at[zero_in].set(carry.astype(x.dtype))
            out = pipeline(xi, aux)
            # probe EVERY leaf (fixed i32 carry): a single-leaf probe lets
            # XLA dead-code-eliminate the other outputs' computation in
            # pure-XLA pipelines (custom calls are opaque, einsums not)
            return sum(
                leaf[(0,) * leaf.ndim].astype(jnp.int32)
                for leaf in jax.tree_util.tree_leaves(out)
            )

        c = jax.lax.fori_loop(0, k, body, x[zero_in].astype(jnp.int32))
        return c

    return jax.jit(run)


def time_device(
    pipeline: Callable, x, aux=None, k1: int = 4, k2: int = 20, reps: int = 1
) -> float:
    """Returns ms per pipeline iteration, launch/readback overhead removed.

    reps > 1 repeats each loop-length measurement and uses the MIN of the
    t1s and the MIN of the t2s in ONE difference quotient — this host's
    noise is upward-only (thermal/tunnel stalls), so per-measurement
    minima cancel it, whereas min-of-quotients would be biased low (a
    stall inside a k1 measurement deflates that rep's quotient and the
    min would select exactly the corrupted rep)."""
    run = make_looped(pipeline)

    def measure(k) -> float:
        t0 = time.perf_counter()
        v = run(x, aux, k)
        int(v)  # forced scalar readback = real completion fence
        return time.perf_counter() - t0

    measure(k1)  # compile (k is traced) + warm path
    t1 = min(measure(k1) for _ in range(max(1, reps)))
    t2 = min(measure(k2) for _ in range(max(1, reps)))
    return max(t2 - t1, 1e-9) * 1000.0 / (k2 - k1)
