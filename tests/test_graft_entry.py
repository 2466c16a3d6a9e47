"""Driver interface: entry() compiles; dryrun_multichip runs a train step."""

import sys

import numpy as np

import jax


def _load_entry():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__

    return __graft_entry__


def test_entry_is_jittable():
    g = _load_entry()
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (4, 768)
    assert np.isfinite(np.asarray(out)).all()


def test_dryrun_multichip_small():
    g = _load_entry()
    # full=False: the ~4-min full-dims step is the DRIVER's artifact (and is
    # covered fast by tests/test_fullsize_sharding.py GSPMD lowering)
    g.dryrun_multichip(4, full=False)  # conftest provides 8 CPU devices


def test_dryrun_scales_to_eight():
    g = _load_entry()
    g.dryrun_multichip(8, full=False)
