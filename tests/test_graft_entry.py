"""The driver-facing entry points must stay jittable / shardable."""

import sys

sys.path.insert(0, "/root/repo")

import jax
import numpy as np


def test_entry_jits():
    import __graft_entry__ as g
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert all(np.isfinite(float(x)) for x in out)


def test_dryrun_multichip_8():
    import __graft_entry__ as g
    g.dryrun_multichip(8)
