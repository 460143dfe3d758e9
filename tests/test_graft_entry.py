"""Driver-contract checks: entry() compiles single-chip; dryrun_multichip
executes a sharded batched step on the virtual 8-device CPU mesh."""
import os
import sys

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as ge  # noqa: E402


def test_entry_jits_and_runs():
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert out.shape == (512, 1024, 3)
    assert out.dtype == np.uint8


def test_dryrun_multichip_8():
    ge.dryrun_multichip(len(jax.devices()))
