"""The driver contract: entry() jits; dryrun_multichip runs on 8 virtual devs."""

import sys

import jax
import numpy as np


def test_entry_compiles():
    sys.path.insert(0, ".")
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (8, 96, 1)
    assert np.all(np.isfinite(np.asarray(out)))


def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_dryrun_multichip_4():
    import __graft_entry__ as ge

    ge.dryrun_multichip(4)


def test_dryrun_multichip_odd_and_single():
    import __graft_entry__ as ge

    ge.dryrun_multichip(1)
    ge.dryrun_multichip(3)
