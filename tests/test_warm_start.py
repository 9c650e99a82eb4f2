"""Warm-start / partial-restore capability tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tcresnet_tpu.data.device_data import DeviceDataset
from tcresnet_tpu.data.synthetic import make_synthetic_dataset
from tcresnet_tpu.train.checkpoint import restore_params_partial
from tcresnet_tpu.train.trainer import Trainer

from tests.test_train import tiny_config


def test_warm_start_from_other_run(tmp_path):
    host = make_synthetic_dataset(num_samples=128, num_classes=4, desired_samples=4000, seed=7)

    cfg1 = tiny_config(tmp_path / "src", max_step=30)
    tr1 = Trainer(cfg1, DeviceDataset(host), workdir=tmp_path / "src")
    s1 = tr1.train()
    tr1.ckpt.wait()

    cfg2 = tiny_config(tmp_path / "dst", max_step=10)
    tr2 = Trainer(cfg2, DeviceDataset(host), workdir=tmp_path / "dst")
    fresh = np.asarray(jax.tree_util.tree_leaves(tr2.state.params)[0])
    tr2.warm_start(tmp_path / "src" / "ckpt")

    # params copied from the source run, step reset to 0
    warm = np.asarray(jax.tree_util.tree_leaves(tr2.state.params)[0])
    src = np.asarray(jax.tree_util.tree_leaves(s1.params)[0])
    np.testing.assert_allclose(warm, src, atol=1e-7)
    assert not np.allclose(warm, fresh)
    assert int(tr2.state.step) == 0
    s2 = tr2.train()
    assert int(s2.step) == 10


def test_partial_restore_scopes():
    params = {
        "conv0_conv": {"kernel": jnp.zeros((3,))},
        "fc": {"kernel": jnp.zeros((4,))},
    }
    restored = {
        "conv0_conv": {"kernel": jnp.ones((3,))},
        "fc": {"kernel": jnp.ones((4,))},
    }
    out = restore_params_partial(params, restored, exclude_scopes=["fc"])
    assert np.asarray(out["conv0_conv"]["kernel"]).sum() == 3
    assert np.asarray(out["fc"]["kernel"]).sum() == 0  # excluded -> fresh

    out = restore_params_partial(params, restored, include_scopes=["fc"])
    assert np.asarray(out["conv0_conv"]["kernel"]).sum() == 0
    assert np.asarray(out["fc"]["kernel"]).sum() == 4


def test_partial_restore_missing_raises():
    params = {"a": {"kernel": jnp.zeros((3,))}, "b": {"kernel": jnp.zeros((2,))}}
    restored = {"a": {"kernel": jnp.ones((3,))}}
    with pytest.raises(Exception):
        restore_params_partial(params, restored)
    out = restore_params_partial(params, restored, ignore_missing=True)
    assert np.asarray(out["a"]["kernel"]).sum() == 3
    assert np.asarray(out["b"]["kernel"]).sum() == 0
