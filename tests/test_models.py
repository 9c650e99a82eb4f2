"""Shape / parameter-count / numerics tests for every model variant.

Parameter counts are verified against analytic counts derived from the
reference graphs (e.g. TCResNet8-1.0 = 65,264 trainable params including
the dead fc2 head per audio_nets/tc_resnet.py:50-52; we omit fc2, a
documented deviation, giving 65,168).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tcresnet_tpu.config import ModelConfig, PRESETS, get_preset
from tcresnet_tpu.models import MODELS, build_model, param_count
from tcresnet_tpu.ops import dsp


def _init_and_apply(model, shape, training=False, batch=2):
    x = jnp.asarray(np.random.default_rng(0).normal(size=(batch,) + shape).astype(np.float32))
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)}, x, training=True
    )
    out = model.apply(
        variables, x, training=training,
        rngs={"dropout": jax.random.key(2)} if training else None,
        mutable=["batch_stats"] if training else False,
    )
    logits = out[0] if training else out
    return variables, logits


ALL_MODEL_CASES = [
    # (model name, kws arch, feature shape, expected logits classes)
    ("TCResNet8", None, (98, 40, 1)),
    ("TCResNet14", None, (98, 40, 1)),
    ("ResNet2D8", None, (98, 40, 1)),
    ("ResNet2D8Pool", None, (98, 40, 1)),
    ("Res8", None, (98, 40, 1)),
    ("Res8Narrow", None, (98, 40, 1)),
    ("Res15", None, (98, 40, 1)),
    ("Res15Narrow", None, (98, 40, 1)),
    ("DSCNNS", None, (49, 10, 1)),
    ("DSCNNM", None, (49, 10, 1)),
    ("DSCNNL", None, (49, 10, 1)),
    ("KWS", "single_fc", (49, 40, 1)),
    ("KWS", "conv", (49, 40, 1)),
    ("KWS", "low_latency_conv", (49, 40, 1)),
    ("KWS", "one_fstride4", (49, 40, 1)),
    ("KWS", "trad_fpool3", (49, 40, 1)),
    ("KWS", "low_latency_svdf", (49, 40, 1)),
    ("KWS", "tiny_conv", (49, 40, 1)),
]


@pytest.mark.parametrize(
    "name,arch,shape",
    ALL_MODEL_CASES,
    ids=[f"{n}-{a}" if a else n for n, a, _ in ALL_MODEL_CASES],
)
def test_model_forward_shapes(name, arch, shape):
    cfg = ModelConfig(name=name, kws_architecture=arch or "conv")
    model = build_model(cfg, shape)
    variables, logits = _init_and_apply(model, shape, training=False)
    assert logits.shape == (2, 12)
    assert logits.dtype == jnp.float32
    assert np.isfinite(np.asarray(logits)).all()
    # train mode runs too (dropout + batch_stats update)
    _, logits_t = _init_and_apply(model, shape, training=True)
    assert logits_t.shape == (2, 12)


def test_tcresnet8_param_count():
    # Analytic count from audio_nets/tc_resnet.py:57-62 graph (excluding
    # the dead fc2 head): 65,168 trainable params for wm=1.0, 12 classes,
    # 40 MFCCs. Reference show_models prints 65,264 (includes fc2's 96).
    cfg = ModelConfig(name="TCResNet8", width_multiplier=1.0)
    model = build_model(cfg, (98, 40, 1))
    variables, _ = _init_and_apply(model, (98, 40, 1))
    assert param_count(variables["params"]) == 65168


def test_tcresnet14_param_count_positive_and_larger():
    v8, _ = _init_and_apply(build_model(ModelConfig(name="TCResNet8"), (98, 40, 1)), (98, 40, 1))
    v14, _ = _init_and_apply(build_model(ModelConfig(name="TCResNet14"), (98, 40, 1)), (98, 40, 1))
    assert param_count(v14["params"]) > param_count(v8["params"])


def test_width_multiplier_scales_params():
    v10, _ = _init_and_apply(
        build_model(ModelConfig(name="TCResNet8", width_multiplier=1.0), (98, 40, 1)), (98, 40, 1)
    )
    v15, _ = _init_and_apply(
        build_model(ModelConfig(name="TCResNet8", width_multiplier=1.5), (98, 40, 1)), (98, 40, 1)
    )
    assert param_count(v15["params"]) > 1.8 * param_count(v10["params"])


def test_res_has_no_batchnorm_params():
    # Res family BN: center=False scale=False -> no trainable BN params
    # (res.py:106-112); params are conv kernels + fc only.
    model = build_model(ModelConfig(name="Res8"), (98, 40, 1))
    variables, _ = _init_and_apply(model, (98, 40, 1))
    names = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    for path, _ in names:
        keys = "/".join(str(getattr(k, "key", k)) for k in path)
        assert "bn" not in keys.lower() or "kernel" in keys, keys
    assert "batch_stats" in variables  # running stats still tracked


def test_res15_dilation_receptive_field():
    # Res15 uses dilation 2^(idx//3) and no pooling: spatial dims preserved.
    model = build_model(ModelConfig(name="Res15"), (98, 40, 1))
    _, logits = _init_and_apply(model, (98, 40, 1))
    assert logits.shape == (2, 12)


def test_svdf_param_count():
    # weights_frequency [40, 2560] + weights_time [2560, 49] + bias 1280
    # + fc 1280*256+256 + 256*256+256 + 256*12+12 (kws.py:552-677)
    model = build_model(
        ModelConfig(name="KWS", kws_architecture="low_latency_svdf"), (49, 40, 1)
    )
    variables, _ = _init_and_apply(model, (49, 40, 1))
    want = (
        40 * 2560 + 2560 * 49 + 1280
        + 1280 * 256 + 256 + 256 * 256 + 256 + 256 * 12 + 12
    )
    assert param_count(variables["params"]) == want


def test_dropout_active_only_in_training():
    cfg = ModelConfig(name="TCResNet8")
    model = build_model(cfg, (98, 40, 1))
    x = jnp.asarray(np.random.default_rng(3).normal(size=(4, 98, 40, 1)).astype(np.float32))
    variables = model.init({"params": jax.random.key(0), "dropout": jax.random.key(1)}, x, training=True)
    # eval mode: deterministic
    a = model.apply(variables, x, training=False)
    b = model.apply(variables, x, training=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # train mode with different dropout keys: different logits
    c, _ = model.apply(variables, x, training=True, rngs={"dropout": jax.random.key(2)}, mutable=["batch_stats"])
    d, _ = model.apply(variables, x, training=True, rngs={"dropout": jax.random.key(3)}, mutable=["batch_stats"])
    assert not np.allclose(np.asarray(c), np.asarray(d))


def test_all_presets_build_and_run():
    for name in PRESETS:
        cfg = get_preset(name)
        shape = dsp.feature_shape(cfg.audio)
        model = build_model(cfg.model, shape, cfg.train.compute_dtype)
        _, logits = _init_and_apply(model, shape)
        assert logits.shape == (2, cfg.model.num_classes), name


def test_unknown_model_raises():
    with pytest.raises(KeyError):
        MODELS.get("NotAModel")


def test_bfloat16_compute_path():
    cfg = ModelConfig(name="TCResNet8")
    model = build_model(cfg, (98, 40, 1), compute_dtype="bfloat16")
    variables, logits = _init_and_apply(model, (98, 40, 1))
    # params stay fp32, logits come back fp32
    leaf = jax.tree_util.tree_leaves(variables["params"])[0]
    assert leaf.dtype == jnp.float32
    assert logits.dtype == jnp.float32


@pytest.mark.parametrize("name", ["Res8", "Res15"])
def test_res_im2col_backend_matches_xla(name):
    """conv_backend='im2col' (layers.Im2ColConv: taps*channels packed
    into one contraction dim for MXU utilization) is the same math and
    the same param tree as the lax.conv path — checkpoints interchange."""
    cfg = get_preset(name)
    shape = dsp.feature_shape(cfg.audio)
    import dataclasses

    m_xla = build_model(cfg.model, shape, "float32")
    m_i2c = build_model(
        dataclasses.replace(cfg.model, conv_backend="im2col"), shape, "float32"
    )
    x = jnp.asarray(
        np.random.default_rng(3).normal(size=(2,) + shape).astype(np.float32)
    )
    variables = m_xla.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        x, training=True,
    )
    a = m_xla.apply(variables, x, training=False)
    b = m_i2c.apply(variables, x, training=False)  # same tree, reused
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-5, atol=2e-5)

    # gradients agree too (the training path is the point of im2col)
    def loss(params, model):
        return jnp.sum(
            model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x, training=False,
            ) ** 2
        )

    ga = jax.grad(loss)(variables["params"], m_xla)
    gb = jax.grad(loss)(variables["params"], m_i2c)
    jax.tree_util.tree_map(
        lambda p, q: np.testing.assert_allclose(
            np.asarray(q), np.asarray(p), rtol=1e-4, atol=1e-4
        ),
        ga, gb,
    )
