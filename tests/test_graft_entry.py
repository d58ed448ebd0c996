"""Driver-contract checks for __graft_entry__.py on the CPU mesh."""

import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, ".")


def test_dryrun_multichip_8():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_entry_small_compiles():
    """entry() compiles the flagship forward; use small shapes here to keep
    CPU test time sane (the driver compiles the real 64^3 single-chip)."""
    import __graft_entry__ as ge
    model, variables, x = ge._flagship(patch=(16, 16, 16), channels=4,
                                       batch=1)

    def forward(variables, x):
        return model.apply(variables, x, train=False)

    out = jax.jit(forward)(variables, x)
    assert out.shape == (1, 16, 16, 16, 2)
    assert np.isfinite(np.asarray(out)).all()
