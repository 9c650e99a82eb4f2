"""In-process regression test for the driver entry points.

Round 1's MULTICHIP artifact failed because dryrun_multichip was not
hermetic w.r.t. the registered axon TPU plugin (state init + device_put
landed on the plugin's default device). This test runs the dry run
in-process with the session-wide CPU default-device pin REMOVED, so any
placement leak onto a non-mesh platform resurfaces immediately.
"""

import jax
import pytest

import __graft_entry__ as graft


def test_dryrun_multichip_8_devices():
    prev = jax.config.jax_default_device
    # Simulate the driver: no default-device pin; dryrun must pin itself.
    jax.config.update("jax_default_device", None)
    try:
        graft.dryrun_multichip(8)
    finally:
        jax.config.update("jax_default_device", prev)


def test_entry_compiles_single_device():
    fn, args = graft.entry()
    out = jax.jit(fn).lower(*args).compile()(*args)
    assert out.shape == (args[0].shape[0], 12)
    # softmax rows sum to 1
    import numpy as np

    np.testing.assert_allclose(np.asarray(out).sum(-1), 1.0, rtol=1e-5)


@pytest.mark.slow
@pytest.mark.parametrize("n", [2, 4])
def test_dryrun_other_mesh_sizes(n):
    graft.dryrun_multichip(n)
