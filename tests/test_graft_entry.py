"""Driver-contract tests: entry() compiles and dryrun_multichip(8) executes
on the virtual CPU mesh."""

import sys

sys.path.insert(0, "/root/repo")

import jax
import numpy as np

import __graft_entry__ as ge


def test_entry_compiles_and_runs():
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (8, 112, 112, 1)
    assert np.asarray(out).dtype == np.int32


def test_dryrun_multichip_8():
    ge.dryrun_multichip(8)
