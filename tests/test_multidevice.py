"""Data-parallel training over the 8-device virtual CPU mesh — the TPU
analogue of the reference's (absent) fake-backend DDP test."""

import numpy as np
import jax
import pytest


@pytest.mark.slow
def test_dryrun_multichip_8dev():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__
    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    assert np.all(np.isfinite(np.asarray(out)[:, :, :]))
