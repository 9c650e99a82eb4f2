"""Trainable-scope freezing + multi-root datasets + audio summaries."""

import dataclasses

import jax
import numpy as np

from tcresnet_tpu.config import OptimConfig
from tcresnet_tpu.data.device_data import DeviceDataset
from tcresnet_tpu.data.synthetic import make_synthetic_dataset
from tcresnet_tpu.train.optim import trainable_mask
from tcresnet_tpu.train.trainer import Trainer

from tests.test_train import tiny_config


def test_trainable_mask():
    params = {
        "conv0_conv": {"kernel": np.zeros(3)},
        "fc": {"kernel": np.zeros(2)},
    }
    mask = trainable_mask(params, ["fc"])
    assert mask["fc"]["kernel"] is True
    assert mask["conv0_conv"]["kernel"] is False


def test_frozen_scopes_do_not_update(tmp_path):
    host = make_synthetic_dataset(num_samples=64, num_classes=4, desired_samples=4000)
    cfg = tiny_config(tmp_path / "r", max_step=10)
    cfg = cfg.replace(
        optim=dataclasses.replace(cfg.optim, trainable_scopes=("fc",))
    )
    tr = Trainer(cfg, DeviceDataset(host), workdir=tmp_path / "r")
    before = {
        "fc": np.asarray(tr.state.params["fc"]["kernel"]),
        "conv": np.asarray(tr.state.params["conv0_conv"]["kernel"]),
    }
    state = tr.train()
    after_fc = np.asarray(state.params["fc"]["kernel"])
    after_conv = np.asarray(state.params["conv0_conv"]["kernel"])
    assert not np.allclose(before["fc"], after_fc)  # fc trains
    np.testing.assert_array_equal(before["conv"], after_conv)  # conv frozen


def test_multi_root_dataset(tmp_path):
    from tcresnet_tpu.data import wav as wavlib
    from tcresnet_tpu.data.speech_commands import load_speech_commands

    rng = np.random.default_rng(0)
    for root in ["a", "b"]:
        for label in ["yes", "no"]:
            for i in range(2):
                wavlib.write_wav_pcm16(
                    tmp_path / root / "train" / label / f"{root}{i}.wav",
                    rng.uniform(-0.5, 0.5, 1000),
                )
    ds = load_speech_commands(
        [tmp_path / "a", tmp_path / "b"], "train", desired_samples=1000, num_silent=0
    )
    assert ds.num_samples == 8  # 4 per root

    # inconsistent labels across roots must fail
    wavlib.write_wav_pcm16(
        tmp_path / "b" / "train" / "maybe" / "x.wav", rng.uniform(-0.5, 0.5, 1000)
    )
    import pytest

    with pytest.raises(ValueError, match="Different labels"):
        load_speech_commands([tmp_path / "a", tmp_path / "b"], "train", 1000, 0)


def test_trainable_mask_is_prefix_anchored():
    """Reference scope matching is startswith (tf.get_collection scope /
    model_loader startswith): 'fc' must not match 'block3/fc_proj'."""
    params = {
        "fc": {"kernel": np.zeros(2)},
        "block3": {"fc_proj": {"kernel": np.zeros(2)}},
    }
    mask = trainable_mask(params, ["fc"])
    assert mask["fc"]["kernel"] is True
    assert mask["block3"]["fc_proj"]["kernel"] is False
