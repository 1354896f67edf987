"""Driver-contract checks: entry() compiles; dryrun_multichip runs on the
virtual 8-device CPU mesh (the same way the driver validates it)."""

import sys
import os

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out_shape = jax.eval_shape(fn, *args)
    assert out_shape.shape == (1, 100, 100, 7)


def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    assert len(jax.devices()) >= 8
    ge.dryrun_multichip(8)


def test_dryrun_multichip_2():
    import __graft_entry__ as ge

    ge.dryrun_multichip(2)
