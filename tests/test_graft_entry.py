"""Driver entry points: entry() must trace (abstract eval — cheap) and
dryrun_multichip must run one sharded step on the virtual mesh."""

import sys
import os

import jax
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __graft_entry__ as ge


def test_entry_traces_with_variables_as_argument(rng):
    fn, args = ge.entry()
    # params must be runtime inputs (baking them in blows compile-request
    # limits on the tunneled backend) — first arg is the variables pytree
    assert isinstance(args[0], dict) and "params" in args[0]
    out = jax.eval_shape(fn, *args)
    assert out.shape == (2, 63, 2000)


@pytest.mark.slow
def test_dryrun_multichip_8():
    ge.dryrun_multichip(8)
